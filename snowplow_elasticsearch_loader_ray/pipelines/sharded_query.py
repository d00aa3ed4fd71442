"""Scatter-gather BM25 serving over term-shard reader actors.

The scale path for query serving (the single-process ``IndexReader``
notes this design in its docstring): each shard actor loads ONLY its
segment file's postings plus the (small relative to postings) global
doclen/stats tables, a query's terms scatter to the shards that own
them (``term_shard_one`` — the same routing the build used), each shard
returns partial per-doc scores for its terms, and the driver combines
partials and ranks. Rank-identity with the single reader is guaranteed
by summing partials in sorted-term order (each term's partial is
computed identically) and ranking with the same
``(round(score, 7) desc, doc_id asc)`` rule.

Partitioning assumptions (documented per SURVEY.md custom-op rule):
- terms route by ``term_shard_one(term) % num_term_shards`` — identical
  at build and query time;
- every shard actor holds the full ordinal-indexed doclen array (the
  ``docmap/`` tables, ~24 B/doc total) so partial scoring is a direct
  gather; at 10^12 docs the corpus is additionally doc-partitioned and
  the docmap parts are ordinal-range files, so each
  (term-shard × doc-partition) actor opens exactly its range's files.
- partials are keyed by doc ORDINAL; the driver combines on ordinals
  and maps the (pre-cut, ~k-sized) survivors to external doc_ids via
  the docmap at ranking time.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import ray

from .. import bm25
from ..codec import PostingList
from ..config import DOCLEN_TERM
from ..tokenizer import term_shard_one
from .build import index_stats, load_docmap
from .query import tokenize_query


# max_restarts/max_task_retries: a crashed reader actor restarts and
# reloads its shard from the committed index, and the in-flight method
# call re-executes transparently — the serving-layer analogue of the
# reference's ES-client reconnect (readers are stateless views over
# durable segments, so restart = reread).
@ray.remote(num_cpus=1, max_restarts=2, max_task_retries=2)
class ShardReader:
    """One term shard's postings + ordinal-indexed doc lengths."""

    def __init__(self, index_dir: str, shard: int, num_shards: int):
        st = index_stats(index_dir)
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) if st["avgdl"] else 1.0
        self.terms: dict[str, bytes] = {}
        # own segment: this shard's term postings (zero-copy views over
        # the segment's single Arrow data buffer)
        from ..codec import binary_views

        t = pq.read_table(os.path.join(index_dir, "segments",
                                       f"shard-{shard:04d}.parquet"))
        for term, buf in zip(t["term"].to_pylist(), binary_views(t["postings"])):
            if term != DOCLEN_TERM:
                self.terms[term] = buf
        _doc_ids, lens = load_docmap(index_dir)
        self.dl_lens = lens.astype(np.float64)

    def partial_scores(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (doc ordinals, per-doc partial scores) for this shard."""
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            buf = self.terms.get(t)
            if buf is None:
                continue
            docs, tfs = PostingList(buf).decode_all()
            w = bm25.idf(self.n_docs, len(docs))
            out[t] = (docs, w * bm25.tf_weight(tfs, self.dl_lens[docs], self.avgdl))
        return out


class ShardedQueryEngine:
    """Scatter-gather top-k over a pool of ShardReader actors."""

    def __init__(self, index_dir: str, cpus_per_reader: float | None = None):
        st = index_stats(index_dir)
        self.num_shards = int(st["num_term_shards"])
        # ordinal → external id for the final (pre-cut, ~k-sized) rank;
        # held whole here (8 B/doc) — a 10^12-doc deployment keeps this
        # doc-partitioned and fetches survivors' ids from the owning
        # partition instead
        self._doc_ids, _lens = load_docmap(index_dir)
        if cpus_per_reader is None:
            # fit the pool into the current cluster (a reader is mostly
            # waiting between queries; on a real cluster size this to
            # cores/shards-per-node)
            avail = max(1.0, ray.cluster_resources().get("CPU", 1.0))
            cpus_per_reader = min(1.0, max(0.1, (avail * 0.8) / self.num_shards))
        self.readers = [
            ShardReader.options(num_cpus=cpus_per_reader).remote(
                index_dir, s, self.num_shards)
            for s in range(self.num_shards)
        ]

    def topk(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        terms = tokenize_query(query)         # sorted, deduped
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(term_shard_one(t, self.num_shards), []).append(t)
        refs = [self.readers[s].partial_scores.remote(ts)
                for s, ts in sorted(by_shard.items())]
        by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for part in ray.get(refs):
            by_term.update(part)
        if not by_term:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # combine partials per doc in GLOBAL sorted-term order — the
        # same float-summation order as the single-process reader, so
        # scores are bit-identical (not merely rank-identical)
        docs = np.concatenate([by_term[t][0] for t in terms if t in by_term])
        scores = np.concatenate([by_term[t][1] for t in terms if t in by_term])
        order = np.argsort(docs, kind="stable")   # stable: keeps term order per doc
        docs_s, scores_s = docs[order], scores[order]
        boundaries = np.concatenate(
            ([0], np.nonzero(docs_s[1:] != docs_s[:-1])[0] + 1))
        uniq = docs_s[boundaries]                 # ordinals
        sums = np.add.reduceat(scores_s, boundaries)
        return bm25.rank_topk(self._doc_ids[uniq], sums, k)

    def shutdown(self) -> None:
        for r in self.readers:
            ray.kill(r)
        self.readers = []
