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
- every shard actor holds the full doclen array for ITS postings' docs:
  here the standalone ``doclens/shard-*.parquet`` tables (written by the
  build's shard tasks, ~16 B/doc total) are loaded once per actor; at
  10^12 docs the corpus is additionally doc-partitioned, and because
  doclen files are doc-hashed each (term-shard × doc-partition) actor
  opens exactly its partition's files.
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
from .build import index_stats
from .query import tokenize_query


@ray.remote(num_cpus=1)
class ShardReader:
    """One term shard's postings + global doc lengths, held in-actor."""

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
        # global doc lengths come from the standalone doclens table the
        # build's shard tasks wrote (~16 B/doc total): O(1) columnar
        # reads per actor instead of decoding every segment's postings
        # (which was O(num_shards) full segment reads per actor)
        import glob as _glob

        dl_files = sorted(_glob.glob(
            os.path.join(index_dir, "doclens", "shard-*.parquet")))
        if dl_files:
            dl = pq.read_table(dl_files)
            docs = dl["doc_id"].to_numpy(zero_copy_only=False)
            lens = dl["doclen"].to_numpy(zero_copy_only=False)
        else:  # pre-doclens index layout: decode segments (legacy path)
            dl_docs, dl_lens = [], []
            for s in range(num_shards):
                seg = pq.read_table(
                    os.path.join(index_dir, "segments", f"shard-{s:04d}.parquet"))
                for term, buf in zip(seg["term"].to_pylist(),
                                     seg["postings"].to_pylist()):
                    if term == DOCLEN_TERM:
                        d, ln = PostingList(buf).decode_all()
                        dl_docs.append(d)
                        dl_lens.append(ln)
            docs = np.concatenate(dl_docs) if dl_docs else np.empty(0, np.int64)
            lens = np.concatenate(dl_lens) if dl_lens else np.empty(0, np.int64)
        order = np.argsort(docs, kind="stable")
        self.dl_doc_ids = docs[order]
        self.dl_lens = lens[order].astype(np.float64)

    def partial_scores(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (doc_ids, per-doc partial scores) for this shard's terms."""
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            buf = self.terms.get(t)
            if buf is None:
                continue
            docs, tfs = PostingList(buf).decode_all()
            w = bm25.idf(self.n_docs, len(docs))
            dls = self.dl_lens[np.searchsorted(self.dl_doc_ids, docs)]
            out[t] = (docs, w * bm25.tf_weight(tfs, dls, self.avgdl))
        return out


class ShardedQueryEngine:
    """Scatter-gather top-k over a pool of ShardReader actors."""

    def __init__(self, index_dir: str, cpus_per_reader: float | None = None):
        st = index_stats(index_dir)
        self.num_shards = int(st["num_term_shards"])
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
        uniq = docs_s[boundaries]
        sums = np.add.reduceat(scores_s, boundaries)
        return bm25.rank_topk(uniq, sums, k)

    def shutdown(self) -> None:
        for r in self.readers:
            ray.kill(r)
        self.readers = []
