"""Streaming micro-batch ingest: the unbounded-source surface (S1+A1).

The reference consumes an unbounded Kinesis stream and flushes
super-batches on size OR age (``BatchUp.withTimeout``,
``Processing.scala:80``). The bounded-corpus pipelines in
``pipelines/`` cover the size half via Ray Data block/batch sizing;
this surface covers the TIME half for a tailing source: a payload
iterator drives ``stages.batchup.BatchUp`` and every flushed
micro-batch runs the purpose transform and commits its own parquet
part + manifest (checkpoint per micro-batch — the KCL-checkpoint
grain, C1).

The source loop is driver-side BY NATURE (a stream tail is a single
cursor — same as the reference's one consumer per shard); the
per-batch transform work is the same vectorized ``PurposeTransform``
the batch pipelines use, and on a real deployment each Kinesis shard
runs one such loop (shard-parallel, like KCL workers).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import IndexConfig, DEFAULT_CONFIG
from ..stages.batchup import BatchUp
from ..stages.transforms import PurposeTransform
from ..state import manifest as mf


def stream_ingest(payloads: Iterable[bytes], out_dir: str,
                  purpose: str = "json",
                  cfg: IndexConfig = DEFAULT_CONFIG,
                  clock: Callable[[], float] = time.monotonic) -> dict:
    """Consume a payload iterator into micro-batch-committed records.

    Returns counters {good, <error statuses>, batches, flush_size,
    flush_delay}. Resume note: each batch commits ``batch-K`` manifest
    AFTER its parquet part is in place; a killed run restarts the
    stream from the source's own checkpoint (Kinesis sequence number
    analogue — out of scope here) and overwrites uncommitted parts.
    """
    rec_dir = os.path.join(out_dir, "records")
    man_dir = os.path.join(out_dir, "manifests")
    os.makedirs(rec_dir, exist_ok=True)
    transform = PurposeTransform(purpose)
    batcher = BatchUp(cfg.flush_max_bytes, cfg.flush_max_delay_s, clock)
    counters: dict[str, int] = {"batches": 0, "flush_size": 0, "flush_delay": 0,
                                "checkpoints": 0}

    # checkpoint debounce (``debounceCheckpoints`` 10 s,
    # config.aws.reference.hocon:55): parquet parts land per micro-batch
    # (data is never withheld) but their MANIFESTS commit at most every
    # ``checkpoint_debounce_s`` — a crash replays the uncommitted tail
    # from the source cursor (the reference's at-least-once KCL grain).
    pending: list[tuple[str, dict]] = []
    last_ckpt = [-float("inf")]

    def _flush_checkpoints() -> None:
        for name, payload in pending:
            mf.commit(man_dir, name, payload)
        if pending:
            counters["checkpoints"] += 1
            pending.clear()
        last_ckpt[0] = clock()

    for k, batch in enumerate(batcher.feed((p, len(p)) for p in payloads)):
        out = transform(pa.table({"payload": pa.array(batch.items, pa.binary())}))
        part = os.path.join(rec_dir, f"batch-{k:06d}.parquet")
        tmp = part + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, part)
        for status in out["status"].to_pylist():
            counters[status] = counters.get(status, 0) + 1
        counters["batches"] += 1
        if batch.reason in ("size", "delay"):
            counters[f"flush_{batch.reason}"] += 1
        pending.append((f"batch-{k:06d}", {
            "stage": "stream-ingest",
            "batch": k,
            "rows": out.num_rows,
            "n_bytes": batch.n_bytes,
            "flush_reason": batch.reason,
            "outputs": [os.path.relpath(part, out_dir)],
        }))
        if clock() - last_ckpt[0] >= cfg.checkpoint_debounce_s:
            _flush_checkpoints()
    _flush_checkpoints()                     # end of stream: commit the tail
    counters.setdefault("good", 0)
    mf.commit(man_dir, "stream", {"stage": "stream-ingest", "counters": counters})
    return counters
