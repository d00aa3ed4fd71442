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
from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq
import ray

from .. import bm25
from ..codec import PostingList
from ..config import DOCLEN_TERM
from ..tokenizer import term_shard_one
from .build import index_stats, load_docmap
from .query import tokenize_query
from .servecache import (
    CappedLRU,
    RequestCache,
    champion_topk,
    dense_combine,
    fused_combine_rank,
    env_cap,
)


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
        self.doc_ids, lens = load_docmap(index_dir)
        self.dl_lens = lens.astype(np.float64)
        # hot-list cache: term → (doc ordinals, BM25 partials), both
        # deterministic per (term, corpus) so caching cannot change a
        # score bit. LRU capped by total decoded postings (16 B each):
        # a Zipf head term costs its df every query otherwise — decode
        # + weigh 10^6 postings was the sharded plane's p99 at 1M docs.
        # The serving-cache role of the reference's ES node (filesystem
        # + query cache) — here explicit and bounded.
        self._hot: CappedLRU = CappedLRU(
            env_cap("GRAFT_SHARD_HOT_POSTINGS", 8_000_000),  # ≈128 MB/actor
            size_of=lambda v: len(v[0]))
        # champion lists (lazy impact ordering): per-term ranked
        # top-CHAMP_K prefix — a head term's single-term top-k ranks
        # its df-sized list ONCE, then serves O(k). See
        # servecache.champion_topk for the exactness argument.
        self._champ: CappedLRU = CappedLRU(
            env_cap("GRAFT_SHARD_CHAMP_ROWS", 1_000_000),
            size_of=lambda v: max(1, len(v[0])))

    def _scored(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        hit = self._hot.get(term)
        if hit is not None:
            return hit
        buf = self.terms.get(term)
        if buf is None:
            return None
        docs, tfs = PostingList(buf).decode_all()
        w = bm25.idf(self.n_docs, len(docs))
        return self._hot.put(term, (docs, w * bm25.tf_weight(
            tfs, self.dl_lens[docs], self.avgdl)))

    def topk_single(self, term: str, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Single-term top-k ranked ON the shard — ships k rows instead
        of a full head-term partial (df×16 B; the p99 driver at 10^6+
        docs was exactly this ship + driver-side combine). Identical
        floats and rank rule to the driver path: the combine of one
        term is the identity."""
        scored = self._scored(term)
        if scored is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, scores = scored
        return champion_topk(
            self._champ, term, k,
            lambda kk: bm25.rank_topk(self.doc_ids[docs], scores, kk))

    def topk_single_many(self, terms: list[str], k: int,
                         ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Batched ``topk_single`` — one RPC ranks every requested term
        on its owning shard (champion-cached), shipping k rows per term
        instead of df-sized partials (the msearch fan-in path)."""
        return {t: self.topk_single(t, k) for t in terms}

    def tf_partials(self, terms: list[str]
                    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (doc ordinals, RAW tf values) — the un-weighted
        postings a cross-field scorer (combined_fields/BM25F) combines
        BEFORE any idf/saturation, since those apply to the combined
        statistics, not per field. LRU-cached like the scored lists."""
        cache = getattr(self, "_hot_tf", None)
        if cache is None:
            cache = self._hot_tf = CappedLRU(
                env_cap("GRAFT_SHARD_HOT_POSTINGS", 8_000_000),
                size_of=lambda v: len(v[0]))
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            hit = cache.get(t)
            if hit is None:
                buf = self.terms.get(t)
                if buf is None:
                    continue
                docs, tfs = PostingList(buf).decode_all()
                hit = cache.put(t, (docs, tfs.astype(np.float64)))
            out[t] = hit
        return out

    def partial_scores(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (doc ordinals, per-doc partial scores) for this shard."""
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            scored = self._scored(t)
            if scored is not None:
                out[t] = scored
        return out

    def term_meta(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, global max tf) for the driver's MaxScore upper
        bounds — block-max metadata only, no posting decode."""
        out: dict[str, tuple[int, int]] = {}
        for t in terms:
            buf = self.terms.get(t)
            if buf is not None:
                pl = PostingList(buf)
                out[t] = (pl.n, int(pl.max_tf.max()) if pl.n_blocks else 0)
        return out

    def candidate_scores(self, terms: list[str], cand: np.ndarray,
                         ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (candidate ordinals hit, partial scores), decoding
        only the posting blocks that contain candidates
        (``PostingList.decode_for``) — the distributed tail-term rescore
        of the driver-side MaxScore plan. ``cand`` sorted ascending."""
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            hot = self._hot.get(t)
            if hot is not None:                  # already decoded+scored:
                docs, scores = hot               # intersect beats re-decode
                pos = np.searchsorted(docs, cand)
                sel = pos < len(docs)
                sel[sel] = docs[pos[sel]] == cand[sel]
                j = pos[sel]
                if len(j):
                    out[t] = (docs[j], scores[j])
                continue
            buf = self.terms.get(t)
            if buf is None:
                continue
            pl = PostingList(buf)
            docs, tfs = pl.decode_for(cand)
            if len(docs):
                w = bm25.idf(self.n_docs, pl.n)
                out[t] = (docs, w * bm25.tf_weight(tfs, self.dl_lens[docs],
                                                   self.avgdl))
        return out


class ShardedQueryEngine:
    """Scatter-gather top-k over a pool of ShardReader actors."""

    def __init__(self, index_dir: str, cpus_per_reader: float | None = None):
        st = index_stats(index_dir)
        self.num_shards = int(st["num_term_shards"])
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) if st["avgdl"] else 1.0
        # ordinal → external id for the final (pre-cut, ~k-sized) rank;
        # held whole here (8 B/doc) — a 10^12-doc deployment keeps this
        # doc-partitioned and fetches survivors' ids from the owning
        # partition instead
        self.index_dir = index_dir
        self._doc_ids, self._dl_lens = load_docmap(index_dir)
        _lens = self._dl_lens
        self._dl_min = float(_lens.min()) if len(_lens) else 1.0
        # bounded term-meta cache (LRU): at web vocab an unbounded dict
        # grows with every distinct query term ever seen
        self._meta_cache: "OrderedDict[str, tuple[int, int] | None]" = \
            OrderedDict()
        self._meta_cache_cap = 200_000
        # hot-partial cache (see _scatter): zero-copy plasma-backed
        # arrays, postings-capped
        self._partials: CappedLRU = CappedLRU(
            env_cap("GRAFT_COORD_HOT_POSTINGS", 16_000_000),  # ≈256 MB
            size_of=lambda v: len(v[0]))
        # ES shard-request-cache role: final (ids, rounded scores) per
        # normalized (live terms, k) — sound because this engine serves
        # one committed immutable index dir (see servecache.RequestCache)
        self._requests = RequestCache(env_cap("GRAFT_REQ_CACHE_ROWS",
                                              4_000_000))
        #: benches flip this off to expose the distinct-query (champion
        #: list / dense-combine) steady state under repeated traffic
        self.request_cache_enabled = True
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

    def _scatter(self, method: str, terms: list[str], *args
                 ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        if method == "partial_scores":
            # coordinator-side hot-partial cache: a term's (ordinals,
            # partial scores) is deterministic per corpus, so re-fetching
            # a head term's df-sized partial every query only re-ships
            # the same 16 B/posting over the object store. LRU capped by
            # postings, same policy as the shard-side cache — the ES
            # query-node cache role.
            out = {}
            missing = []
            for t in terms:
                hit = self._partials.get(t)
                if hit is not None:
                    out[t] = hit
                else:
                    missing.append(t)
            if missing:
                for t, ds in self._scatter_raw(method, missing, *args).items():
                    out[t] = self._partials.put(t, ds)
            return out
        return self._scatter_raw(method, terms, *args)

    def _scatter_raw(self, method: str, terms: list[str], *args
                     ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(term_shard_one(t, self.num_shards), []).append(t)
        refs = [getattr(self.readers[s], method).remote(ts, *args)
                for s, ts in sorted(by_shard.items())]
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for part in ray.get(refs):
            out.update(part)
        return out

    def _metas(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """(df, max_tf) per term, cached across queries (metadata-only
        shard round for terms not yet seen)."""
        unknown = [t for t in terms if t not in self._meta_cache]
        if unknown:
            fetched = self._scatter("term_meta", unknown)
            for t in unknown:
                self._meta_cache[t] = fetched.get(t)
        out = {}
        for t in terms:
            self._meta_cache.move_to_end(t)          # LRU touch
            if (m := self._meta_cache[t]) is not None:
                out[t] = m
        while len(self._meta_cache) > self._meta_cache_cap:
            self._meta_cache.popitem(last=False)
        return out

    def _combine(self, terms: list[str],
                 by_term: dict[str, tuple[np.ndarray, np.ndarray]],
                 ) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc sums in GLOBAL sorted-term order via the shared
        dense-accumulator kernel (``servecache.dense_combine``) —
        bit-identical float summation order to the single reader."""
        return dense_combine(
            self, self.n_docs, terms,
            lambda t: ([by_term[t]] if t in by_term else ()))

    def topk(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Distributed MaxScore: the driver splits terms into essential
        (high upper bound) and tail (head/stopword) sets using cached
        per-term (df, max_tf) metadata; phase 1 scatters only the
        essential terms, and if the tail's summed upper bound cannot
        disturb the essential kth (rounding-safe margin), phase 2 asks
        the tail terms' shards for CANDIDATE-ONLY contributions
        (block-pruned decode) instead of full postings — the stopword
        decode never happens. Falls back to the full one-phase scatter
        whenever pruning cannot pay. Scores are bit-identical to the
        single reader either way (same per-doc float summation order,
        same margins as ``query.score_maxscore``)."""
        terms = tokenize_query(query)         # sorted, deduped
        metas = self._metas(terms)
        live = [t for t in terms if t in metas]
        if not live:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if not self.request_cache_enabled:
            return self._topk_impl(live, metas, k)
        key = RequestCache.key(live, k)
        if (hit := self._requests.get(key)) is not None:
            return hit[0].copy(), hit[1].copy()   # k rows; copy guards callers
        ids, scores = self._topk_impl(live, metas, k)
        self._requests.put(key, (ids.copy(), scores.copy()))
        return ids, scores

    def _topk_impl(self, live: list[str], metas: dict, k: int,
                   ) -> tuple[np.ndarray, np.ndarray]:
        if len(live) == 1:
            # one term → rank on its owning shard, ship only k rows
            t = live[0]
            return ray.get(self.readers[
                term_shard_one(t, self.num_shards)].topk_single.remote(t, k))
        ubs = {}
        for t in live:
            df, max_tf = metas[t]
            idf = bm25.idf(self.n_docs, df)
            ubs[t] = idf * float(bm25.tf_weight(
                np.float64(max_tf), np.float64(self._dl_min), self.avgdl))
        by_ub = sorted(live, key=lambda t: (-ubs[t], t))
        max_ub = ubs[by_ub[0]]
        essential = [t for t in by_ub if ubs[t] > 0.25 * max_ub]
        tail = [t for t in by_ub if ubs[t] <= 0.25 * max_ub]

        if not tail:                           # comparable impacts: full path
            by_term = self._scatter("partial_scores", live)
            uniq, sums = self._combine(live, by_term)
            return bm25.rank_topk(self._doc_ids[uniq], sums, k)

        ess_parts = self._scatter("partial_scores", essential)
        uniq, sums = self._combine(essential, ess_parts)
        tail_ub = float(sum(ubs[t] for t in tail))
        margin = 1e-6
        if len(uniq) >= k:
            kth = float(np.partition(sums, len(sums) - k)[len(sums) - k])
        else:
            kth = 0.0
        cand = uniq[sums + tail_ub >= kth - margin] if kth > 0.0 else uniq
        if kth <= 0.0 or tail_ub >= kth - margin or len(cand) > max(64, 8 * k):
            # pruning cannot pay (or isn't safe): fetch the tail fully
            tail_parts = self._scatter("partial_scores", tail)
            by_term = {**ess_parts, **tail_parts}
            uniq, sums = self._combine(live, by_term)
            return bm25.rank_topk(self._doc_ids[uniq], sums, k)

        # phase 2: candidate-only tail contributions, block-pruned
        tail_parts = self._scatter("candidate_scores", tail, cand)
        # final rescore in sorted-term order over the candidate set:
        # essential arrays filter to candidates, tails are already
        # candidate-only — identical float order to the single reader
        cand_scores = np.zeros(len(cand), dtype=np.float64)
        for t in live:                         # sorted-term order
            hit = ess_parts.get(t) if t in essential else tail_parts.get(t)
            if hit is None:
                continue
            docs, scores = hit
            if t in essential:
                pos = np.searchsorted(cand, docs)
                valid = pos < len(cand)
                sel = np.zeros(len(docs), dtype=bool)
                sel[valid] = cand[pos[valid]] == docs[valid]
                docs, scores = docs[sel], scores[sel]
            j = np.searchsorted(cand, docs)
            cand_scores[j] += scores
        return bm25.rank_topk(self._doc_ids[cand], cand_scores, k)

    def match_scores(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        """All matching (external doc_ids, raw BM25 sums) — the full
        TAAT result through the scatter plane (bit-identical to the
        single reader's ``_taat_scores``: same partials, same
        sorted-term dense combine). The multi-field engine's per-field
        scorer."""
        terms = tokenize_query(query)
        by_term = self._scatter("partial_scores", terms)
        live = [t for t in terms if t in by_term]
        if not live:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniq, sums = self._combine(live, by_term)
        return self._doc_ids[uniq], sums

    def _match_ords(self, query: str) -> np.ndarray:
        """Full match-set ordinals (postings union across the owning
        shards) — the aggregation input. Rides the coordinator's hot
        partial cache, so a facet after a topk on the same terms ships
        nothing."""
        terms = sorted(set(tokenize_query(query)))
        by_term = self._scatter("partial_scores", terms)
        hits = [v[0] for v in by_term.values() if len(v[0])]
        if not hits:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(hits))

    def facet_lang_counts(self, query: str) -> dict[str, int]:
        """Distributed ES ``terms`` aggregation on the ``lang``
        doc-value: matched ordinals scatter-gathered from the term
        shards, lang keys by coordinator-side ordinal gather —
        bit-identical to the single reader's facet (pinned in
        tests/test_sharded_query.py)."""
        langs = getattr(self, "_dl_langs", None)
        if langs is None:
            from .build import load_docvalues

            langs = load_docvalues(self.index_dir, "lang")
            if langs is None:
                raise ValueError("index has no 'lang' doc-value")
            self._dl_langs = langs
        ords = self._match_ords(query)
        if not len(ords):
            return {}
        vals = langs[ords]
        vals = vals[vals != None]  # noqa: E711 — ES terms aggs skip
        u, c = np.unique(vals, return_counts=True)  # missing-field docs
        return dict(zip(u.tolist(), c.tolist()))

    def facet_doclen_stats(self, query: str) -> dict:
        """Distributed ES ``stats`` aggregation on doclen over the full
        match set — same contract as the single reader's. Lens come
        from the docmap already loaded at construction (no second
        corpus-sized read)."""
        lens = self._dl_lens
        ords = self._match_ords(query)
        if not len(ords):
            return {"n_docs": 0, "min_dl": 0, "max_dl": 0, "sum_dl": 0,
                    "avg_dl": 0.0}
        dl = lens[ords].astype(np.int64)
        return {
            "n_docs": int(len(ords)),
            "min_dl": int(dl.min()),
            "max_dl": int(dl.max()),
            "sum_dl": int(dl.sum()),
            "avg_dl": float(dl.sum()) / float(len(ords)),
        }

    def msearch(self, queries: list[str], k: int = 10,
                ) -> list[tuple[np.ndarray, np.ndarray]]:
        """ES ``_msearch``: N queries through ONE metadata round and
        ONE partial scatter for the union of their (uncached) terms,
        then per-query combine + rank on the coordinator — the
        round-trip count no longer scales with the query count.
        Results are bit-identical to per-query ``topk``: same partials,
        same sorted-term summation order (and topk's two-phase plan is
        itself pinned bit-identical to this full path)."""
        toks = [tokenize_query(q) for q in queries]
        all_terms = sorted({t for ts in toks for t in ts})
        metas = self._metas(all_terms)
        lives = [[t for t in ts if t in metas] for ts in toks]
        out: list = [None] * len(queries)
        need: list[int] = []
        for i, live in enumerate(lives):
            if not live:
                out[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
            elif self.request_cache_enabled and (
                    hit := self._requests.get(RequestCache.key(live, k))
                  ) is not None:               # request-cache hit: O(k)
                out[i] = (hit[0].copy(), hit[1].copy())
            else:
                need.append(i)
        # single-term queries rank on their owning shards in ONE batched
        # RPC per shard (champion-cached, k rows shipped per term) —
        # never a df-sized partial for a fused head-term lookup
        singles = sorted({lives[i][0] for i in need if len(lives[i]) == 1})
        single_res: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if singles:
            by_shard: dict[int, list[str]] = {}
            for t in singles:
                by_shard.setdefault(
                    term_shard_one(t, self.num_shards), []).append(t)
            refs = [self.readers[s].topk_single_many.remote(ts, k)
                    for s, ts in sorted(by_shard.items())]
            for part in ray.get(refs):
                single_res.update(part)
        union = sorted({t for i in need if len(lives[i]) > 1
                        for t in lives[i]})
        by_term = self._scatter("partial_scores", union) if union else {}
        jobs: list[tuple[int, list[str]]] = []
        for i in need:
            if len(lives[i]) == 1:             # pre-ranked on the shard
                live = lives[i]
                res = single_res.get(live[0], (np.empty(0, np.int64),
                                               np.empty(0, np.float64)))
                self._requests.put(RequestCache.key(live, k),
                                   (res[0].copy(), res[1].copy()))
                out[i] = res
                continue
            live = [t for t in lives[i] if t in by_term]
            if not live:
                out[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
            else:
                jobs.append((i, live))
        # multi-term combines + ranks run on the coordinator's combine
        # thread pool (GIL-releasing numpy; per-thread accumulators;
        # bit-identical per query) — cache puts stay on this thread
        for i, live, res in fused_combine_rank(
                self, self.n_docs, jobs,
                lambda t: ([by_term[t]] if t in by_term else ()),
                k, self._doc_ids):
            self._requests.put(RequestCache.key(live, k),
                               (res[0].copy(), res[1].copy()))
            out[i] = res
        return out

    def shutdown(self) -> None:
        for r in self.readers:
            ray.kill(r)
        self.readers = []
