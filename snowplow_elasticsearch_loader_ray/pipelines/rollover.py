"""ES ``_rollover`` — alias-managed index lifecycle.

Reference context: the loader writes to one configured index name
(``output.good.index``, config.aws.reference.hocon) and ES deployments
point that at a ROLLOVER alias so the write target rolls to a fresh
index when the current one hits ``max_docs`` (the ILM hot-phase
condition), with zero loader-config change; reads cover all rolled
generations.

Graft shape: generations are ordinary immutable index builds (the
inline fast path makes small generations cheap — the same economics as
ES sealing a shard); the write alias (``pipelines.alias``) atomically
advances at each roll, so a concurrent resolver sees the old or the
new target, never a torn state. The condition check runs after each
appended micro-batch — exactly the ILM poll-after-write ordering, so a
generation can overshoot ``max_docs`` by at most one batch (ES
documents the same overshoot).

Scale note: generation state is control-plane metadata; document
batches buffer as Arrow tables and become one resumable distributed
(or inline) ``build_index`` per generation. At 100 TB the buffered
batches would spill to a stream dir first (``sources.stream``) and the
build would read those parts — the roll/alias mechanics are unchanged.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import IndexConfig
from . import alias as AL
from . import build as B


def generation_name(base: str, i: int) -> str:
    """ES rollover naming: ``<base>-NNNNNN`` with a 1-based counter."""
    return f"{base}-{i + 1:06d}"


class RolloverWriter:
    """Append micro-batches; roll the write index at ``max_docs``.

    ``append`` buffers a batch into the current generation and seals it
    (builds the real index, advances the write alias) once the
    generation holds at least ``max_docs`` docs. ``finish`` builds the
    unsealed tail generation and leaves the write alias on it.
    """

    def __init__(self, root: str, write_alias: str = "docs-write",
                 base: str = "docs", max_docs: int = 150,
                 cfg: IndexConfig | None = None):
        self.root = root
        self.write_alias = write_alias
        self.base = base
        self.max_docs = int(max_docs)
        self.cfg = cfg or IndexConfig()
        # continue the rollover counter past any generations already in
        # the root (the ES semantics: docs-000001 exists → next roll is
        # docs-000002). Restarting at 0 would re-use docs-000001's dir,
        # and build_index's committed-manifest early-return would then
        # serve the PREVIOUS run's index for this run's docs.
        import glob as _glob
        import re as _re

        pat = _re.compile(rf"^{_re.escape(base)}-(\d{{6}})$")
        nums = [int(m.group(1))
                for d in _glob.glob(os.path.join(root, f"{base}-*"))
                if (m := pat.match(os.path.basename(d)))]
        self.gen = max(nums) if nums else 0
        self._pending: list[pa.Table] = []
        self._n_pending = 0
        self.generations: list[dict] = []   # sealed + finished gens

    def append(self, batch: pa.Table) -> None:
        if batch.num_rows == 0:
            return
        self._pending.append(batch)
        self._n_pending += batch.num_rows
        if self._n_pending >= self.max_docs:
            self._seal(sealed=True)

    def _seal(self, sealed: bool) -> None:
        name = generation_name(self.base, self.gen)
        gen_dir = os.path.join(self.root, name)
        docs_dir = os.path.join(gen_dir, "_docs")
        os.makedirs(docs_dir, exist_ok=True)
        pq.write_table(pa.concat_tables(self._pending),
                       os.path.join(docs_dir, "part-0000.parquet"))
        B.build_index(docs_dir, os.path.join(gen_dir, "index"), self.cfg)
        self.generations.append({
            "name": name,
            "index_dir": os.path.join(gen_dir, "index"),
            "n_docs": self._n_pending,
            "sealed": sealed,
        })
        self.gen += 1
        self._pending, self._n_pending = [], 0
        # the write alias always names the NEWEST generation's slot;
        # after a seal that is the (not yet materialized) next gen, so
        # point it at the sealed dir until the successor exists — a
        # resolver never sees a dangling target
        AL.set_alias(self.root, self.write_alias,
                     os.path.join(gen_dir, "index"))

    def finish(self) -> list[dict]:
        if self._n_pending:
            self._seal(sealed=False)
        return self.generations
