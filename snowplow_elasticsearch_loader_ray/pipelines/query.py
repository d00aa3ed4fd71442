"""BM25 top-k query serving over merged segments.

The analogue of the reference IT harness's only query surface —
polling ES ``_search`` and reading ranked hits
(``TestHelpers.scala:157-201``, SURVEY.md Q1) — except the relevance
engine ES provided is implemented here from scratch.

Two execution strategies over the same segments, tested rank-identical:

- ``score_taat``: term-at-a-time scoring with numpy over fully decoded
  posting lists — vectorized, the throughput path for mid-size
  candidate sets.
- ``score_bmw``: document-at-a-time block-max WAND — skips whole
  blocks whose score upper bound can't enter the current top-k; the
  scale path for head-term queries over very long lists.

Determinism: terms are processed in sorted order in both strategies, so
per-doc float summation order is identical; ranking is by
``(round(score, 7) desc, doc_id asc)`` (bm25.py).

The ``QueryEngine`` actor holds the loaded index (term dict, doclen
arrays, stats) — built once in ``__init__``, the stateful-actor-pool
pattern the loader uses for its sink clients
(``ElasticsearchSink.scala:45-109``: one http client per pipe, reused).
"""

from __future__ import annotations

import glob
import heapq
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import bm25
from ..codec import PostingList
from ..config import DOCLEN_TERM
from ..pipelines.build import index_stats

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_query(q: str) -> list[str]:
    """Unique query terms, sorted (fixed scoring order; duplicates dropped)."""
    return sorted(set(_TOKEN_RE.findall(q.lower())))


class IndexReader:
    """In-memory view over an index directory's segments + docmap.

    Postings decode to dense doc ORDINALS (see stages/postings.py): the
    ordinal IS the score-accumulator position, so scoring does no
    binary search, and ``dl_doc_ids[ord]`` / ``dl_lens[ord]`` give the
    external doc_id / doclen directly. At sandbox scale the whole term
    dictionary and encoded postings fit in one process; at 1e12-doc
    scale this object would hold one term shard per reader actor (terms
    route by ``term_shard_one``) with postings mmap'd — the layout
    (per-shard segment files, ordinal-range docmap parts) is already
    partitioned for that.
    """

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        st = index_stats(index_dir)
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"]) if st["avgdl"] else 1.0
        self.terms: dict[str, tuple[int, int, bytes]] = {}
        from ..codec import binary_views

        for f in sorted(glob.glob(os.path.join(index_dir, "segments", "*.parquet"))):
            t = pq.read_table(f)
            # postings stay zero-copy views over the Arrow data buffer
            # (one buffer per segment file) — warm-up copies nothing
            views = binary_views(t["postings"])
            for term, df, cf, buf in zip(
                t["term"].to_pylist(), t["df"].to_pylist(),
                t["cf"].to_pylist(), views,
            ):
                if term != DOCLEN_TERM:          # legacy pseudo-term guard
                    self.terms[term] = (df, cf, buf)
        from .build import load_docmap

        # indexed by ordinal: external id + doclen per doc
        self.dl_doc_ids, lens = load_docmap(index_dir)
        self.dl_lens = lens.astype(np.float64)
        self._ext_sorted: np.ndarray | None = None
        self._ext_order: np.ndarray | None = None

    def ordinals_of(self, doc_ids: np.ndarray,
                    missing: str = "raise") -> np.ndarray:
        """Ordinals by EXTERNAL doc_id (lazy sorted lookup).
        ``missing="raise"``: unknown ids raise ``KeyError`` — a silent
        wrong-neighbor gather would serve another doc's data.
        ``missing="drop"``: unknown ids are omitted (the _explain /
        "not found" convention)."""
        if self._ext_sorted is None:
            self._ext_order = np.argsort(self.dl_doc_ids, kind="stable")
            self._ext_sorted = self.dl_doc_ids[self._ext_order]
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        if not len(doc_ids):
            return np.empty(0, dtype=np.int64)
        pos = np.searchsorted(self._ext_sorted, doc_ids)
        pos_c = np.minimum(pos, max(len(self._ext_sorted) - 1, 0))
        ok = (self._ext_sorted[pos_c] == doc_ids) \
            if len(self._ext_sorted) else np.zeros(len(doc_ids), bool)
        if missing == "drop":
            return self._ext_order[pos_c[ok]]
        if not ok.all():
            raise KeyError(
                f"doc_id(s) not in the index docmap, e.g. "
                f"{doc_ids[~ok][:3].tolist()}")
        return self._ext_order[pos_c]

    def doclen_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """Doc lengths by EXTERNAL doc_id (lazy sorted lookup — result
        paths that already hold ordinals index ``dl_lens`` directly).
        Unknown ids raise (see ``ordinals_of``)."""
        return self.dl_lens[self.ordinals_of(doc_ids)]

    def acc_buffer(self) -> np.ndarray:
        """Zeroed per-partition score accumulator (reused across queries)."""
        buf = getattr(self, "_acc", None)
        if buf is None or len(buf) != len(self.dl_doc_ids):
            buf = self._acc = np.zeros(len(self.dl_doc_ids), dtype=np.float64)
        else:
            buf.fill(0.0)
        return buf

    def positions_of(self, term: str, docs: np.ndarray) -> np.ndarray:
        """Accumulator positions of a term's decoded postings.

        With ordinal doc keys the posting value IS the position — the
        per-term binary search (and the position LRU cache that amortized
        it) is gone; this is now an identity kept for the call-site
        contract (a doc-partitioned reader would subtract its base)."""
        return docs

    def postings(self, term: str) -> PostingList | None:
        e = self.terms.get(term)
        return PostingList(e[2]) if e else None

    def df(self, term: str) -> int:
        e = self.terms.get(term)
        return e[0] if e else 0

    def doc_lengths_table(self) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(self.dl_doc_ids),
            "doclen": pa.array(self.dl_lens.astype(np.int64)),
        })

    def term_stats_table(self) -> pa.Table:
        items = sorted(self.terms.items())
        return pa.table({
            "term": pa.array([t for t, _ in items], type=pa.string()),
            "df": pa.array([e[0] for _, e in items], type=pa.int64()),
            "cf": pa.array([e[1] for _, e in items], type=pa.int64()),
        })


# --------------------------------------------------------------------------
# term-at-a-time (vectorized numpy)
# --------------------------------------------------------------------------

def score_taat(reader: IndexReader, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (doc_ids, rounded scores) by exhaustive term-at-a-time BM25.

    Uses a dense per-partition accumulator indexed by the reader's
    sorted-doc position (the classic TAAT score-array design): each
    term's postings scatter-add in sorted-term order, so per-doc float
    summation order is fixed (determinism contract). The accumulator is
    one float64 per doc in THIS reader's partition — at 10^12 docs the
    corpus is doc-partitioned across query shards (see ``IndexReader``),
    each holding ~10^7-10^8 docs, so the array stays ~100 MB-scale.
    """
    cand_ids, cand_scores = _taat_scores(reader, query)
    return bm25.rank_topk(cand_ids, cand_scores, k)


def _taat_scores(reader: IndexReader, query: str) -> tuple[np.ndarray, np.ndarray]:
    """All matching (external doc_ids, raw scores) by TAAT accumulation
    — the shared core of ``score_taat`` / ``score_taat_after``."""
    ords, scores = _taat_scores_ords(reader, query)
    return reader.dl_doc_ids[ords] if len(ords) else ords, scores


def _taat_scores_ords(reader: IndexReader, query: str) -> tuple[np.ndarray, np.ndarray]:
    """All matching (ordinals, raw scores) — result surfaces that need
    doc-values gather by ordinal consume this directly."""
    terms = tokenize_query(query)
    acc = reader.acc_buffer()
    matched = False
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        matched = True
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        w = bm25.idf(reader.n_docs, len(docs))
        acc[pos] += w * bm25.tf_weight(tfs, reader.dl_lens[pos], reader.avgdl)
    if not matched:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    # BM25 partial scores are strictly positive, so nonzero == matched
    cand = np.nonzero(acc)[0]
    return cand, acc[cand]


def score_dismax(reader: IndexReader, query: str, k: int,
                 tie_breaker: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """ES ``dis_max`` over the query's terms: a doc scores
    max(term BM25 partials) + tie_breaker × (sum − max) — the
    best-field disjunction shape, degenerating to plain TAAT at
    tie_breaker=1. Two dense accumulators (sum via scatter-add, max via
    ``np.maximum.at``) in one postings pass; ranking/tie rules are the
    BM25 contract (round 7, doc_id asc)."""
    terms = tokenize_query(query)
    acc_sum = reader.acc_buffer()
    acc_max = np.zeros_like(acc_sum)
    matched = False
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        matched = True
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        w = bm25.idf(reader.n_docs, len(docs))
        s = w * bm25.tf_weight(tfs, reader.dl_lens[pos], reader.avgdl)
        acc_sum[pos] += s
        np.maximum.at(acc_max, pos, s)
    if not matched:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = np.nonzero(acc_sum)[0]
    score = acc_max[cand] + tie_breaker * (acc_sum[cand] - acc_max[cand])
    return bm25.rank_topk(reader.dl_doc_ids[cand], score, k)


def score_text_expansion(reader: IndexReader, weights: dict[str, int],
                         k: int) -> tuple[np.ndarray, np.ndarray]:
    """ES ``text_expansion`` / ``sparse_vector`` query (the ELSER
    learned-sparse shape): the query is a (token, weight) bag produced
    upstream by a model; a doc scores Σ weight(t) · tf(t, doc) over the
    expansion tokens. Document-side activations are the index's term
    frequencies, so scoring is one integer scatter-add pass over the
    expansion tokens' posting lists — EXACT (no floats anywhere), which
    is what makes this surface fully value-oracle-able. Ranking ties
    break by doc_id ascending (the BM25 contract)."""
    acc = np.zeros(len(reader.dl_doc_ids), dtype=np.int64)
    matched = False
    for t in sorted(weights):
        pl = reader.postings(t)
        if pl is None:
            continue
        matched = True
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        acc[pos] += int(weights[t]) * tfs.astype(np.int64)
    if not matched:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cand = np.nonzero(acc)[0]
    d, s = bm25.rank_topk(reader.dl_doc_ids[cand],
                          acc[cand].astype(np.float64), k)
    return d, s.astype(np.int64)


def score_boosting(reader: IndexReader, positive: str, negative: str,
                   k: int, negative_boost: float = 0.5
                   ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``boosting`` query: rank by the positive query's BM25, but
    multiply the score by ``negative_boost`` for any doc matching ANY
    of the negative query's terms (demotion, not exclusion — the
    Lucene BoostingQuery contract). One TAAT pass for the positive
    side plus one sorted-membership probe per negative term."""
    ords, scores = _taat_scores_ords(reader, positive)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    demoted = np.zeros(len(ords), dtype=bool)
    for t in sorted(set(tokenize_query(negative))):
        pl = reader.postings(t)
        if pl is None:
            continue
        neg = np.sort(reader.positions_of(t, pl.decode_all()[0]))
        demoted |= isin_sorted(neg, ords)
    scores = np.where(demoted, scores * negative_boost, scores)
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores, k)


def isin_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in an ascending ``sorted_arr`` via one
    searchsorted probe (the clip keeps past-the-end probes in bounds);
    empty haystack -> all False."""
    if not len(sorted_arr):
        return np.zeros(len(values), dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_arr, values),
                     len(sorted_arr) - 1)
    return sorted_arr[pos] == values


#: safety margin over the 1e-7 score-rounding granularity: pruning only
#: discards docs whose reachable score is below the kth lower bound by
#: MORE than this, so rounding ties can never be lost
_PRUNE_MARGIN = 1e-6


def _term_upper_bound(reader: IndexReader, pl: PostingList, idf: float) -> float:
    """Safe per-term max contribution: idf × tf_weight at the term's
    global max tf (block-max metadata) and the corpus minimum doclen —
    every actual contribution is ≤ this."""
    if not pl.n_blocks:
        return 0.0
    max_tf = float(pl.max_tf.max())
    dl_min = getattr(reader, "_dl_min", None)
    if dl_min is None:
        dl_min = reader._dl_min = float(reader.dl_lens.min()) if len(reader.dl_lens) else 1.0
    return idf * float(bm25.tf_weight(np.float64(max_tf),
                                      np.float64(dl_min), reader.avgdl))


def score_maxscore(reader: IndexReader, query: str, k: int = 10,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Top-k BM25 via vectorized MaxScore: bit-identical to
    ``score_taat`` by construction, but head (low-idf) terms whose
    summed upper bounds cannot disturb top-k membership are never fully
    decoded.

    Plan: (1) accumulate terms in upper-bound-descending order until
    the remaining terms' UB sum drops below the current kth partial
    score minus a rounding-safe margin — every doc outside the
    accumulator is then provably outside the top-k; (2) shrink to the
    candidate set (docs whose partial + remaining UB can still reach
    the kth bound); (3) recompute the candidates' scores from scratch
    in SORTED-TERM order — the same float summation order as
    ``score_taat``, so scores are bit-identical — decoding only the
    posting blocks that contain candidates (``PostingList.decode_for``,
    block-max skip metadata as a read pruner). Skipped work is the full
    decode + weight of every pruned head term: exactly the stopword
    lists that dominate TAAT latency at 10^6+ docs.
    """
    terms = tokenize_query(query)
    entries = []
    for t in terms:
        pl = reader.postings(t)
        if pl is not None and pl.n:
            idf = bm25.idf(reader.n_docs, pl.n)
            entries.append((t, pl, idf, _term_upper_bound(reader, pl, idf)))
    if not entries:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if len(entries) == 1:
        # one term: no accumulator, no nonzero scan — decode, weight,
        # rank. Identical floats to score_taat (the accumulator would
        # hold exactly these products at exactly these docs).
        _t, pl, idf, _ub = entries[0]
        docs, tfs = pl.decode_all()
        return bm25.rank_topk(
            reader.dl_doc_ids[docs],
            idf * bm25.tf_weight(tfs, reader.dl_lens[docs], reader.avgdl), k)
    if min(e[1].n for e in entries) > reader.n_docs // 4:
        # every term is a head term: no selective term can bound the
        # kth above the tail's reach, so pruning cannot pay — take the
        # plain vectorized path with zero bookkeeping overhead
        return score_taat(reader, query, k)
    entries.sort(key=lambda e: (-e[3], e[0]))       # UB desc, term asc
    ubs = np.array([e[3] for e in entries])
    if len(ubs) > 1 and ubs[-1] > 0.25 * ubs[0]:
        # all terms have comparable max impact: no term can bound the
        # others out, pruning cannot pay — plain path, zero bookkeeping
        return score_taat(reader, query, k)
    suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))

    acc = reader.acc_buffer()
    # kth lower bound, maintained cheaply: the kth largest of the
    # partials at each processed term's OWN posting positions is the
    # kth largest of a subset of all partials, hence ≤ the true kth —
    # a valid (and O(df)-cheap) prune bound without scanning `acc`
    kth_lb = 0.0
    cand_cap = max(64, 8 * k)
    pool: list[np.ndarray] = []
    attempts = 2          # failed prune attempts allowed before giving up
    cut, cand = len(entries), None
    for i, (t, pl, idf, _ub) in enumerate(entries):
        if (attempts and i >= 1 and kth_lb > 0.0
                and suffix[i] < kth_lb - _PRUNE_MARGIN):
            nz = np.nonzero(acc)[0]
            maybe = nz[acc[nz] + suffix[i] >= kth_lb - _PRUNE_MARGIN]
            if len(maybe) <= cand_cap:   # prune pays only when selective
                cut, cand = i, maybe
                break
            # dense score boundary: many docs sit within the tail's
            # reach of the kth — pruning cannot pay, stop trying soon
            attempts -= 1
        docs, tfs = pl.decode_all()
        acc[docs] += idf * bm25.tf_weight(tfs, reader.dl_lens[docs],
                                          reader.avgdl)
        # tighten the bound only when it could still unlock a prune
        # (there ARE cheaper terms left, and the current bound is too
        # weak to prune them); partials are pooled across processed
        # terms so even tiny-df terms contribute, and the pool is
        # stride-capped — the kth of any subset of partials is a valid
        # lower bound of the true kth
        if (attempts and i + 1 < len(entries)
                and kth_lb - _PRUNE_MARGIN < suffix[i + 1]):
            pool.append(docs[:: max(1, len(docs) // 50_000)])
            # dedupe: a doc pooled twice would repeat its partial and
            # could inflate the kth above the true distinct-doc kth
            pooled = np.unique(np.concatenate(pool)) if len(pool) > 1 else pool[0]
            if len(pooled) >= k:
                part = acc[pooled]
                kth_lb = max(kth_lb, float(
                    np.partition(part, len(part) - k)[len(part) - k]))
    if cand is None:                                 # nothing pruned
        cand = np.nonzero(acc)[0]
        return bm25.rank_topk(reader.dl_doc_ids[cand], acc[cand], k)

    # exact rescore in sorted-term order (score_taat's summation order)
    cand_scores = np.zeros(len(cand), dtype=np.float64)
    for t, pl, idf, _ub in sorted(entries, key=lambda e: e[0]):
        docs, tfs = pl.decode_for(cand)
        if not len(docs):
            continue
        j = np.searchsorted(cand, docs)
        cand_scores[j] += idf * bm25.tf_weight(
            tfs, reader.dl_lens[docs], reader.avgdl)
    keep = cand_scores > 0.0
    return bm25.rank_topk(reader.dl_doc_ids[cand[keep]], cand_scores[keep], k)


def score_taat_after(reader: IndexReader, query: str, k: int = 10,
                     after: tuple[float, int] | None = None,
                     ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``search_after`` pagination: the next ``k`` results strictly
    AFTER the cursor in the engine's total order (rounded score desc,
    doc_id asc). The cursor is the last hit of the previous page as
    ``(rounded_score, doc_id)`` — exactly the sort values ES asks
    clients to replay, so deep pagination never re-ships earlier pages
    and is stable under concurrent upserts before the cursor.
    """
    cand_ids, cand_scores = _taat_scores(reader, query)
    if after is not None and len(cand_ids):
        r = np.round(cand_scores, bm25.SCORE_ROUND)
        a_score, a_doc = np.round(after[0], bm25.SCORE_ROUND), after[1]
        keep = (r < a_score) | ((r == a_score) & (cand_ids > a_doc))
        cand_ids, cand_scores = cand_ids[keep], cand_scores[keep]
    return bm25.rank_topk(cand_ids, cand_scores, k)


def expand_prefix(reader: IndexReader, prefix: str) -> list[str]:
    """Vocabulary terms starting with ``prefix`` (ES ``prefix`` query
    expansion), term-ascending. At 10^12-doc scale the vocabulary is
    term-shard-partitioned; a prefix scan runs per shard and the
    expansions union — same shape as this single-shard scan."""
    return sorted(t for t in reader.terms if t.startswith(prefix))


def prefix_match(reader: IndexReader, prefix: str) -> tuple[int, np.ndarray]:
    """ES ``prefix`` query: (number of expanded terms, ascending
    doc_ids containing ANY expanded term — constant-score semantics,
    like ES's default rewrite)."""
    terms = expand_prefix(reader, prefix)
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return 0, np.empty(0, dtype=np.int64)
    uniq = np.unique(np.concatenate(hits))
    # ordinals are input-file order, not external-id order — sort so
    # the documented ascending-doc_ids contract holds on ANY corpus
    return len(terms), np.sort(reader.dl_doc_ids[uniq].astype(np.int64))


def expand_regexp(reader: IndexReader, pattern: str) -> list[str]:
    """ES ``regexp`` query expansion: vocabulary terms whose WHOLE text
    matches ``pattern`` (Lucene regexps are implicitly anchored).

    The scan runs through pyarrow's RE2 kernel — the same regex engine
    DuckDB uses — so the oracle's ``regexp_matches(term, '^(?:p)$')``
    agrees exactly. Shards scan their own dictionary slice at web
    vocab, same shape as ``expand_prefix``."""
    import pyarrow.compute as pc

    terms = sorted(reader.terms)
    m = pc.match_substring_regex(pa.array(terms, pa.string()),
                                 f"^(?:{pattern})$")
    return [t for t, ok in zip(terms, m.to_pylist()) if ok]


def wildcard_to_regexp(pattern: str) -> str:
    """ES ``wildcard`` → regexp: ``*`` = any run, ``?`` = any char,
    everything else literal."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _docs_of_terms(reader: IndexReader, terms: list[str]) -> pa.Table:
    """Constant-score union of the terms' postings: (doc_id, number of
    distinct matching terms) via one bincount over ordinals."""
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_matched_terms": pa.array([], pa.int64())})
    ords = np.concatenate(hits)
    cnt = np.bincount(ords, minlength=len(reader.dl_doc_ids))
    nz = np.flatnonzero(cnt)
    return pa.table({
        "doc_id": pa.array(reader.dl_doc_ids[nz].astype(np.int64)),
        "n_matched_terms": pa.array(cnt[nz].astype(np.int64)),
    })


def regexp_search(reader: IndexReader, pattern: str) -> pa.Table:
    """ES ``regexp`` query (constant-score rewrite): docs containing
    ANY matching term, with the count of distinct matching terms each
    doc contains. One postings decode per expanded term, one bincount
    over ordinals — no corpus scan."""
    return _docs_of_terms(reader, expand_regexp(reader, pattern))


def _trigram_index(reader: IndexReader):
    """Trigram → owning-term index over the vocabulary (the structure
    behind the ES ``wildcard`` field type): two SORTED int64 arrays
    (trigram hash → vocab ordinal, deduped pairs) built with the same
    Arrow slice-explode pass as the fuzzy delete-1 index — one kernel
    call per slice POSITION, no per-term Python. ~16 B per (term ×
    distinct position) entry; at web vocab it shards with the term
    dictionary. Hash collisions only over-generate candidates, which
    the substring verification removes."""
    idx = getattr(reader, "_tri_index", None)
    if idx is None:
        import pyarrow.compute as pc

        vocab = np.asarray(sorted(reader.terms), dtype=object)
        va = pa.array(vocab, type=pa.string())
        lens = pc.utf8_length(va).to_numpy()
        ids = np.arange(len(vocab), dtype=np.int64)
        tri_chunks, owner_chunks = [], []
        maxlen = int(lens.max()) if len(lens) else 0
        for p in range(max(0, maxlen - 2)):
            mask = lens >= p + 3
            sub = va.filter(pa.array(mask)) if not mask.all() else va
            tri = pc.utf8_slice_codeunits(sub, p, p + 3)
            tri_chunks.append(tri.to_numpy(zero_copy_only=False))
            owner_chunks.append(ids[mask])
        if tri_chunks:
            h = _hash_prefix64(np.concatenate(tri_chunks))
            o = np.concatenate(owner_chunks)
            order = np.lexsort((o, h))
            h, o = h[order], o[order]
            keep = np.concatenate(
                ([True], (h[1:] != h[:-1]) | (o[1:] != o[:-1])))
            h, o = h[keep], o[keep]
        else:
            h = np.empty(0, np.int64)
            o = np.empty(0, np.int64)
        reader._tri_index = idx = (h, o, vocab)
    return idx


def infix_expand(reader: IndexReader, infix: str) -> list[str]:
    """Vocabulary terms CONTAINING ``infix`` via the trigram index:
    intersect the owner sets of every trigram of the infix, then
    verify candidates by exact substring — identical results to the
    RE2 vocabulary scan (``expand_regexp('.*infix.*')``), but the work
    is proportional to the rarest trigram's owner list, not the vocab.
    Infixes shorter than 3 chars have no trigram and fall back to the
    scan (the ES wildcard field does the same)."""
    import pyarrow.compute as pc

    if len(infix) < 3:
        return expand_regexp(reader, f".*{re.escape(infix)}.*")
    h, o, vocab = _trigram_index(reader)
    cand = None
    for i in range(len(infix) - 2):
        gh = _hash_prefix64(np.asarray([infix[i:i + 3]], dtype=object))
        lo = np.searchsorted(h, gh[0], "left")
        hi = np.searchsorted(h, gh[0], "right")
        owners = o[lo:hi]
        cand = owners if cand is None else \
            np.intersect1d(cand, owners, assume_unique=True)
        if not len(cand):
            return []
    terms = vocab[cand]
    ok = pc.match_substring(pa.array(terms, pa.string()), infix) \
        .to_numpy(zero_copy_only=False)
    return sorted(terms[ok].tolist())


def infix_search(reader: IndexReader, infix: str) -> pa.Table:
    """ES ``wildcard`` FIELD infix query (``*infix*``): trigram-index
    expansion + constant-score union — rank/result-identical to
    routing the same pattern through the RE2 wildcard scan."""
    return _docs_of_terms(reader, infix_expand(reader, infix))


def _deletes1(term: str) -> set[str]:
    return {term[:i] + term[i + 1:] for i in range(len(term))}


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein distance <= 1 (no transpositions)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                         # exactly one substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0                                # one insertion into the shorter
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


#: del-1 variant hash width: tokens are [a-z0-9] (tokenizer.py), so a
#: zero-padded 32-byte prefix uniquely encodes every variant <= 32 chars;
#: longer variants sharing a prefix merely collide, which only ADDS
#: candidates that exact Levenshtein verification removes.
_DEL1_HASH_BYTES = 32


def _hash_prefix64(strs: np.ndarray) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of ASCII strings: a
    polynomial (mod 2^64) over the zero-padded first 32 bytes. One
    numpy matmul-shaped pass instead of a per-string digest call —
    both the index build and the probe use this same function, so
    candidate generation is exact up to collisions (verified away)."""
    b = np.asarray(strs, dtype=f"S{_DEL1_HASH_BYTES}")
    m = b.view(np.uint8).reshape(len(b), _DEL1_HASH_BYTES).astype(np.uint64)
    mult = np.empty(_DEL1_HASH_BYTES, np.uint64)
    acc = 1
    for i in range(_DEL1_HASH_BYTES):             # Python ints: mod 2^64
        mult[i] = acc
        acc = (acc * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return (m * mult).sum(axis=1, dtype=np.uint64).view(np.int64)


def fuzzy_expand(reader: IndexReader, query_term: str) -> list[str]:
    """ES ``fuzzy`` query expansion at edit distance <= 1: candidates
    via a SymSpell-style delete-1 neighborhood over the vocabulary,
    then exact Levenshtein verification — the delete intersection
    over-generates (e.g. transposed bigrams), so every candidate is
    checked. Term-ascending for determinism.

    The neighborhood index is two SORTED int64 arrays (variant hash →
    owning vocab ordinal), built once per reader: ~16 B per
    (term × variant) entry instead of a Python dict of strings-to-lists
    (an order of magnitude smaller at web vocab, and the probe is a
    batched searchsorted, not per-variant dict lookups). Hash
    collisions only add candidates, which exact verification removes —
    results are identical to the dict formulation. At 10^9-term vocab
    this index shards with the term dictionary (same routing), each
    shard answering its own candidates."""
    import pyarrow.compute as pc

    idx = getattr(reader, "_del1_index", None)
    if idx is None:
        # vectorized variant explode (the completion_suggest pattern):
        # one Arrow slice+join kernel pass per DELETE POSITION — a loop
        # over max term length, not over the vocabulary — then one
        # vectorized hash of every variant. No per-term Python.
        vocab = np.asarray(sorted(reader.terms), dtype=object)
        va = pa.array(vocab, type=pa.string())
        lens = pc.utf8_length(va).to_numpy()
        ids = np.arange(len(vocab), dtype=np.int64)
        var_chunks, owner_chunks = [vocab], [ids]      # the term itself
        for p in range(int(lens.max()) if len(lens) else 0):
            mask = lens > p
            sub = va.filter(pa.array(mask)) if not mask.all() else va
            pre = pc.utf8_slice_codeunits(sub, 0, p)
            post = pc.utf8_slice_codeunits(sub, p + 1, 1 << 30)
            var = pc.binary_join_element_wise(pre, post, "")
            var_chunks.append(var.to_numpy(zero_copy_only=False))
            owner_chunks.append(ids[mask])
        h = _hash_prefix64(np.concatenate(var_chunks))
        o = np.concatenate(owner_chunks)
        order = np.argsort(h, kind="stable")
        reader._del1_index = idx = (h[order], o[order], vocab)
    hs, owners, vocab = idx
    probe = _deletes1(query_term)
    probe.add(query_term)
    ph = _hash_prefix64(np.asarray(sorted(probe), dtype=object))
    lo = np.searchsorted(hs, ph, "left")
    hi = np.searchsorted(hs, ph, "right")
    spans = [owners[a:b] for a, b in zip(lo, hi) if b > a]
    if not spans:
        return []
    cand_idx = np.unique(np.concatenate(spans))
    return sorted(t for t in vocab[cand_idx].tolist()
                  if _lev_le1(query_term, t))


def more_like_this(reader: IndexReader, doc_id: int, text: str,
                   max_terms: int = 10, k: int = 10,
                   ) -> tuple[list[str], np.ndarray, np.ndarray]:
    """ES ``more_like_this``: select the source document's top
    ``max_terms`` terms by tf x idf (ties broken by term ascending —
    deterministic), then rank the corpus by disjunctive BM25 over the
    selected terms with the source document excluded. Term statistics
    come from the index (df per term), the source text from the doc
    store — the same two lookups ES's MLT performs.

    Returns (selected_terms, doc_ids, rounded_scores).
    """
    import collections
    import re

    tf = collections.Counter(re.findall(r"[a-z0-9]+", text.lower()))
    weighted = []
    for t, f in tf.items():
        df_t = reader.df(t)
        if df_t == 0:
            continue
        weighted.append((-f * bm25.idf(reader.n_docs, df_t), t))
    weighted.sort()
    sel = [t for _w, t in weighted[:max_terms]]
    cand_ids, cand_scores = _taat_scores(reader, " ".join(sel))
    keep = cand_ids != doc_id
    docs, scores = bm25.rank_topk(cand_ids[keep], cand_scores[keep], k)
    return sel, docs, scores


def lang_docvalues(reader: IndexReader) -> np.ndarray:
    """The per-ordinal ``lang`` doc-value column, loaded once per
    reader (ES keyword doc_values: columnar per-doc metadata — facets
    and keyword term filters gather by ordinal, never re-reading the
    corpus)."""
    langs = getattr(reader, "_dl_langs", None)
    if langs is None:
        from .build import load_docvalues

        langs = load_docvalues(reader.index_dir, "lang")
        if langs is None:
            raise ValueError("index has no 'lang' doc-value")
        reader._dl_langs = langs
    return langs


def facet_lang_counts(reader: IndexReader, query: str) -> dict[str, int]:
    """ES ``terms`` aggregation on the ``lang`` doc-value over the full
    match set: matched ordinals from the postings union, lang keys by
    ordinal gather from the docmap's doc-value column — no corpus read,
    no match-set broadcast. A doc-partitioned reader computes its
    partition's counts the same way and partial counts sum (tiny:
    langs × partitions rows)."""
    langs = lang_docvalues(reader)
    terms = tokenize_query(query)
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return {}
    ords = np.unique(np.concatenate(hits))
    vals = langs[ords]
    # ES terms aggs SKIP missing-field docs: drop nulls (an
    # object-array unique over None raises) instead of crashing the
    # whole aggregation when one input file lacked the column
    vals = vals[vals != None]  # noqa: E711  (elementwise on object arr)
    u, c = np.unique(vals, return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def facet_doclen_stats(reader: IndexReader, query: str) -> dict:
    """ES ``stats`` aggregation over the full match set (docs containing
    ANY query term — aggregations see every hit, not the top-k page):
    count/min/max/sum/avg of document length, straight off the index's
    doclen table (no document fetch)."""
    ords = boolean_or_ords(reader, query)
    docs = ords
    if not len(docs):
        return {"n_docs": 0, "min_dl": 0, "max_dl": 0, "sum_dl": 0,
                "avg_dl": 0.0}
    dl = reader.dl_lens[ords].astype(np.int64)
    return {
        "n_docs": int(len(docs)),
        "min_dl": int(dl.min()),
        "max_dl": int(dl.max()),
        "sum_dl": int(dl.sum()),
        "avg_dl": float(dl.sum()) / float(len(docs)),
    }


def facet_doclen_extended_stats(reader: IndexReader, query: str) -> dict:
    """ES ``extended_stats`` aggregation over the full match set: the
    ``stats`` fields plus sum_of_squares, variance (population —
    sos/n − mean², the ES formula) and std_deviation. Both sums are
    exact int64, so the derived floats are identical regardless of
    accumulation order — the oracle recomputes them from the same
    integer sums."""
    import math

    ords = boolean_or_ords(reader, query)
    docs = ords
    if not len(docs):
        return {"n_docs": 0, "min_dl": 0, "max_dl": 0, "sum_dl": 0,
                "sum_squares": 0, "avg_dl": 0.0, "variance": 0.0,
                "std_dev": 0.0}
    dl = reader.dl_lens[ords].astype(np.int64)
    n = len(docs)
    s = int(dl.sum())
    sos = int((dl * dl).sum())
    avg = float(s) / float(n)
    var = max(float(sos) / float(n) - avg * avg, 0.0)
    return {
        "n_docs": int(n),
        "min_dl": int(dl.min()),
        "max_dl": int(dl.max()),
        "sum_dl": s,
        "sum_squares": sos,
        "avg_dl": avg,
        "variance": var,
        "std_dev": math.sqrt(var),
    }


def score_taat_filtered(reader: IndexReader, query: str, filter_term: str,
                        k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Top-k BM25 restricted to docs containing ``filter_term`` — the ES
    bool-query ``filter`` (non-scoring) + ``must`` (scoring) pattern.

    Accumulation is identical to ``score_taat`` (same sorted-term float
    order → same scores for surviving docs); the filter applies to the
    CANDIDATE set before ranking, so no scoring doc is lost to top-k
    truncation. The filter list rides the postings-position cache.
    """
    terms = tokenize_query(query)
    fpl = reader.postings(filter_term)
    if fpl is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    acc = reader.acc_buffer()
    matched = False
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        matched = True
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        w = bm25.idf(reader.n_docs, len(docs))
        acc[pos] += w * bm25.tf_weight(tfs, reader.dl_lens[pos], reader.avgdl)
    if not matched:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    fdocs = fpl.decode_all()[0]
    fpos = reader.positions_of(filter_term, fdocs)
    cand = fpos[acc[fpos] != 0.0]
    return bm25.rank_topk(reader.dl_doc_ids[cand], acc[cand], k)


# --------------------------------------------------------------------------
# boolean retrieval (the ES bool-query analogue of the IT harness's
# _search surface, SURVEY.md Q1 — conjunctive/disjunctive over postings)
# --------------------------------------------------------------------------

def boolean_and(reader: IndexReader, query: str) -> np.ndarray:
    """External doc_ids containing EVERY query term (ordinal order).

    Intersects posting lists smallest-df-first so the candidate set
    shrinks fastest; lists are ordinal-ascending by codec invariant, so
    each step is one sorted-array intersection; ordinals map to
    external ids once at the end.
    """
    terms = tokenize_query(query)
    if not terms:
        return np.empty(0, dtype=np.int64)
    pls = []
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            return np.empty(0, dtype=np.int64)
        pls.append(pl)
    lists = sorted((pl.decode_all()[0] for pl in pls), key=len)
    cur = lists[0]
    for d in lists[1:]:
        cur = np.intersect1d(cur, d, assume_unique=True)
        if not len(cur):
            break
    return reader.dl_doc_ids[cur].astype(np.int64)


def boolean_and_not(reader: IndexReader, query: str,
                    exclude_query: str) -> np.ndarray:
    """ES bool ``must`` + ``must_not``: external doc_ids containing
    EVERY ``query`` term and NONE of ``exclude_query``'s terms.

    The exclusion is a sorted-array difference per excluded term
    against the shrinking conjunctive set — the must_not postings are
    decoded once and never scored (non-scoring clause, as in ES)."""
    terms = tokenize_query(query)
    if not terms:
        return np.empty(0, dtype=np.int64)
    pls = []
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            return np.empty(0, dtype=np.int64)
        pls.append(pl)
    lists = sorted((pl.decode_all()[0] for pl in pls), key=len)
    cur = lists[0]
    for d in lists[1:]:
        cur = np.intersect1d(cur, d, assume_unique=True)
        if not len(cur):
            return np.empty(0, dtype=np.int64)
    for t in sorted(set(tokenize_query(exclude_query))):
        if not len(cur):
            break
        pl = reader.postings(t)
        if pl is None:
            continue
        ex = pl.decode_all()[0]
        if len(ex):
            pos = np.minimum(np.searchsorted(ex, cur), len(ex) - 1)
            cur = cur[ex[pos] != cur]
    return reader.dl_doc_ids[cur].astype(np.int64)


def score_taat_range(reader: IndexReader, query: str, dl_lo: int, dl_hi: int,
                     k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Top-k BM25 restricted to docs whose doclen doc-value lies in
    [dl_lo, dl_hi] — the ES numeric ``range`` filter (non-scoring) +
    ``must`` (scoring) bool shape. Accumulation is score_taat's exact
    float order; the range applies to the full candidate set before
    ranking (no scoring doc lost to top-k truncation), served from the
    in-memory doclen doc-values by ordinal gather — no corpus read."""
    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    dl = reader.dl_lens[ords]
    keep = (dl >= dl_lo) & (dl <= dl_hi)
    return bm25.rank_topk(reader.dl_doc_ids[ords[keep]], scores[keep], k)


def score_function_gauss(reader: IndexReader, query: str, k: int = 10, *,
                         origin: float, scale: float, decay: float = 0.5
                         ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``function_score`` with a ``gauss`` decay on the doclen
    doc-value, multiplied into the BM25 query score (the
    ``boost_mode: multiply`` default): score(d) = bm25(q, d) ×
    exp(-(doclen(d) − origin)² / 2σ²) with σ² = scale² / (−2 ln decay),
    so a doc at distance ``scale`` from ``origin`` keeps ``decay`` of
    its relevance — Elasticsearch's decay parameterization exactly.

    The decay rescores the FULL match set (not a top-k reranking — a
    decayed tail doc can still beat an off-origin head doc), served by
    ordinal gather from the in-memory doclen doc-values; accumulation
    keeps score_taat's float order, so results are deterministic and
    oracle-replicable. Doc-value decays are the scale path ES itself
    uses: no stored field, no corpus read, one multiply per candidate.
    """
    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    sigma2 = (scale * scale) / (-2.0 * np.log(decay))
    dl = reader.dl_lens[ords].astype(np.float64)
    mult = np.exp(-np.square(dl - origin) / (2.0 * sigma2))
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores * mult, k)


def score_field_value_factor(reader: IndexReader, query: str, k: int = 10,
                             *, factor: float = 1.0
                             ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``function_score`` ``field_value_factor`` on the doclen
    doc-value with the ``ln1p`` modifier: score(d) = bm25(q, d) ×
    ln(1 + factor · doclen(d)) — the "boost by a numeric field"
    primitive (popularity, length, click count). Same full-match-set
    rescore + doc-value-gather plan as ``score_function_gauss``.

    Computed as np.log(1.0 + factor·dl), NOT np.log1p: the DuckDB
    oracle only has ln(1 + x), and the two differ in the last ulp for
    small x — the engine replays the oracle's exact float path.
    """
    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    dl = reader.dl_lens[ords].astype(np.float64)
    mult = np.log(1.0 + factor * dl)
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores * mult, k)


def score_function_exp(reader: IndexReader, query: str, k: int = 10, *,
                       origin: float, scale: float, decay: float = 0.5
                       ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``function_score`` with an ``exp`` decay on the doclen
    doc-value (``boost_mode: multiply``): score(d) = bm25(q, d) ×
    exp(λ·|doclen(d) − origin|) with λ = ln(decay)/scale, so a doc at
    distance ``scale`` keeps exactly ``decay`` of its relevance —
    Elasticsearch's exp parameterization. λ is precomputed in Python
    float64 so the SQL oracle replays the identical float path. Same
    full-match-set rescore + doc-value gather plan as gauss."""
    import math

    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    lam = math.log(decay) / scale
    dl = reader.dl_lens[ords].astype(np.float64)
    mult = np.exp(lam * np.abs(dl - origin))
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores * mult, k)


def score_function_linear(reader: IndexReader, query: str, k: int = 10, *,
                          origin: float, scale: float, decay: float = 0.5
                          ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``function_score`` with a ``linear`` decay on doclen:
    score(d) = bm25(q, d) × max(0, (s − |doclen(d) − origin|)/s) with
    s = scale/(1 − decay) — relevance falls linearly and hits ZERO at
    distance s (ES keeps the doc in the hit set with score 0, as does
    the engine: zero-score docs rank after every positive score, ties
    by doc_id)."""
    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    s = scale / (1.0 - decay)
    dl = reader.dl_lens[ords].astype(np.float64)
    mult = np.maximum(0.0, (s - np.abs(dl - origin)) / s)
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores * mult, k)


def score_rank_feature(reader: IndexReader, query: str, k: int = 10, *,
                       pivot: float, boost: float = 1.0
                       ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``rank_feature`` query (saturation function) in a bool
    ``should`` beside the scoring match — the static-signal boost
    (pagerank, popularity; here the doclen doc-value): score(d) =
    bm25(q, d) + boost × dl/(dl + pivot). A doc at dl = pivot gets
    exactly boost/2; the additive ES ``should`` combination means the
    signal can promote but never veto. One doc-value gather + one
    fused multiply-add over the match set — the same O(match set)
    plan ES runs its rank_feature scorer with."""
    ords, scores = _taat_scores_ords(reader, query)
    if not len(ords):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    dl = reader.dl_lens[ords].astype(np.float64)
    sat = dl / (dl + pivot)
    return bm25.rank_topk(reader.dl_doc_ids[ords], scores + boost * sat, k)


def facet_doclen_ranges(reader: IndexReader, query: str,
                        ranges: list[tuple[int | None, int | None]]
                        ) -> list[int]:
    """ES ``range`` aggregation over the full match set on the doclen
    doc-value: per bucket, the count of matched docs with
    from ≤ doclen < to (ES's inclusive-from / exclusive-to rule; None
    = open end). Buckets may overlap or leave gaps — each is counted
    independently, exactly as ES does. Vectorized comparisons over the
    gathered doc-values; a doc-partitioned reader sums partial counts
    (n_buckets × partitions rows)."""
    ords = boolean_or_ords(reader, query)
    if not len(ords):
        return [0] * len(ranges)
    dl = reader.dl_lens[ords].astype(np.int64)
    out = []
    for lo, hi in ranges:
        m = np.ones(len(dl), dtype=bool)
        if lo is not None:
            m &= dl >= lo
        if hi is not None:
            m &= dl < hi
        out.append(int(m.sum()))
    return out


def explain_score(reader: IndexReader, query: str, doc_ids: np.ndarray
                  ) -> list[tuple[int, str, int, float]]:
    """ES ``_explain`` analogue: the per-term BM25 breakdown for given
    EXTERNAL doc_ids — rows (doc_id, term, tf, contribution) for each
    query term present in the doc, contribution = idf(t) ×
    tf_weight(tf, doclen, avgdl), exactly the summand ``score_taat``
    accumulates (so sum(contribution) per doc == the ranked score).
    Each term costs one posting decode + one searchsorted into the
    requested ordinal set — no accumulator, no corpus read."""
    targets = np.asarray(doc_ids, dtype=np.int64)
    # ordinals via the reader's cached ext->ord lookup; _explain on an
    # unknown id is "not found" (no rows), not an error
    tgt_sorted = np.sort(reader.ordinals_of(targets, missing="drop"))
    out: list[tuple[int, str, int, float]] = []
    for t in sorted(set(tokenize_query(query))):
        pl = reader.postings(t)
        if pl is None:
            continue
        docs, tfs = pl.decode_all()
        hit = np.searchsorted(docs, tgt_sorted)
        hit = np.minimum(hit, len(docs) - 1)
        m = docs[hit] == tgt_sorted
        if not m.any():
            continue
        ords = tgt_sorted[m]
        tf = tfs[hit[m]].astype(np.float64)
        w = bm25.idf(reader.n_docs, len(docs))
        contrib = w * bm25.tf_weight(tf, reader.dl_lens[ords], reader.avgdl)
        ext = reader.dl_doc_ids[ords]
        out.extend(zip(ext.tolist(), [t] * len(ext),
                       tf.astype(np.int64).tolist(), contrib.tolist()))
    return out


def sort_by_doclen(reader: IndexReader, query: str, k: int = 10
                   ) -> tuple[np.ndarray, np.ndarray]:
    """ES sort-by-field: the conjunctive match set ordered by the
    doclen doc-value (desc, doc_id asc tiebreak — deterministic),
    top-k. No scoring: postings intersect, doc-values gather, one
    partial sort. Returns (external doc_ids, doclens)."""
    terms = tokenize_query(query)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    pls = []
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pls.append(pl)
    lists = sorted((pl.decode_all()[0] for pl in pls), key=len)
    cur = lists[0]
    for d in lists[1:]:
        cur = np.intersect1d(cur, d, assume_unique=True)
        if not len(cur):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ext = reader.dl_doc_ids[cur].astype(np.int64)
    dl = reader.dl_lens[cur].astype(np.int64)
    order = np.lexsort((ext, -dl))[:k]
    return ext[order], dl[order]


#: function_score random_score constants: a seeded LCG over the id
#: doc-value (ES hashes _seq_no/_id with murmur; the graft pins an
#: explicit LCG so oracles replay it as pure int64 math — both factors
#: stay < 2^31, so every product fits int64)
RANDOM_PRIME = 2147483629
RANDOM_MUL = 1103515245
RANDOM_ADD = 12345


def score_random(reader: IndexReader, query: str, k: int = 10
                 ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``function_score`` + ``random_score`` (seeded, field=doc_id):
    rank the match set (bool-should union over the query terms) by the
    deterministic per-doc hash desc, ties to the smaller id. Scores are
    the raw hash values as float64 (ES maps them into [0,1) — a
    monotone transform, so rank order is the hash order). O(df) over
    the posting lists; never a corpus scan."""
    terms = tokenize_query(query)
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ords = np.unique(np.concatenate(hits))
    ids = reader.dl_doc_ids[ords].astype(np.int64)
    h = ((ids % RANDOM_PRIME) * RANDOM_MUL + RANDOM_ADD) % RANDOM_PRIME
    top = np.lexsort((ids, -h))[:k]
    return ids[top], h[top].astype(np.float64)


def boolean_or_ords(reader: IndexReader, query: str) -> np.ndarray:
    """Matched ORDINALS (postings union) — the aggregation input; the
    doclen facets gather ``reader.dl_lens[ords]`` directly instead of
    round-tripping external ids through the docmap lookup."""
    terms = tokenize_query(query)
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(hits))


def boolean_or(reader: IndexReader, query: str) -> tuple[np.ndarray, np.ndarray]:
    """(external doc_ids in ordinal order, distinct query terms matched)."""
    terms = tokenize_query(query)
    hits = [pl.decode_all()[0] for t in terms
            if (pl := reader.postings(t)) is not None]
    if not hits:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    uniq, counts = np.unique(np.concatenate(hits), return_counts=True)
    return reader.dl_doc_ids[uniq].astype(np.int64), counts.astype(np.int64)


def score_min_should_match(reader: IndexReader, query: str, m: int,
                           k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """ES bool ``should`` + ``minimum_should_match``: BM25 top-k over
    docs matching at least ``m`` DISTINCT query terms, scoring only the
    matched clauses (each distinct term is one should clause — ES
    semantics). Accumulation runs in sorted-distinct-term order (fixed
    float order, the determinism contract); the clause counter is a
    dense per-partition int16 beside the score accumulator, so the
    pass stays one scatter-add per term with no candidate re-walk."""
    terms = sorted(set(tokenize_query(query)))
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    acc = reader.acc_buffer()
    cnt = np.zeros(len(acc), dtype=np.int16)
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        w = bm25.idf(reader.n_docs, len(docs))
        acc[pos] += w * bm25.tf_weight(tfs, reader.dl_lens[pos], reader.avgdl)
        cnt[pos] += 1
    cand = np.nonzero(cnt >= m)[0]
    if not len(cand):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return bm25.rank_topk(reader.dl_doc_ids[cand], acc[cand], k)


def score_terms_set(reader: IndexReader, query: str, k: int = 10,
                    m_div: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """ES ``terms_set`` with ``minimum_should_match_field``: the
    required distinct-term count is PER-DOC, derived from a numeric
    doc-value — here ``required(doc) = min(n_terms, 1 + doclen //
    m_div)`` (longer docs must match more terms; the engine's numeric
    field is doclen). Same one-pass dense counter as
    ``score_min_should_match``; only the threshold comparison gathers
    the doc-value."""
    terms = sorted(set(tokenize_query(query)))
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    acc = reader.acc_buffer()
    cnt = np.zeros(len(acc), dtype=np.int16)
    for t in terms:
        pl = reader.postings(t)
        if pl is None:
            continue
        docs, tfs = pl.decode_all()
        pos = reader.positions_of(t, docs)
        w = bm25.idf(reader.n_docs, len(docs))
        acc[pos] += w * bm25.tf_weight(tfs, reader.dl_lens[pos], reader.avgdl)
        cnt[pos] += 1
    need = np.minimum(len(terms),
                      1 + reader.dl_lens.astype(np.int64) // m_div)
    cand = np.nonzero(cnt >= need)[0]
    if not len(cand):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return bm25.rank_topk(reader.dl_doc_ids[cand], acc[cand], k)


def rescore_topk(reader: IndexReader, pos_reader, query: str,
                 window: int = 50, k: int = 10, boost: float = 5.0
                 ) -> tuple[np.ndarray, np.ndarray]:
    """ES ``rescore`` (query rescorer with ``window_size``): rank the
    BM25 top-``window`` candidates, add ``boost`` to every candidate
    containing the query's LEADING BIGRAM as an exact phrase (verified
    against the positional index — no text re-read), re-rank, return
    top-k. Window cut and final order both use ``rank_topk``'s rounded
    (score desc, doc_id asc) rule, so the whole op is deterministic.

    ``pos_reader`` is a ``PositionalReader`` or
    ``ShardedPositionalEngine`` (anything ``phrase_search`` accepts);
    at scale the window is k-bounded per shard, the phrase set resolves
    inside the positional shards, and only window-sized id arrays meet
    on the coordinator."""
    from .positions import phrase_search

    win_ids, win_scores = score_taat(reader, query, window)
    if not len(win_ids):
        return win_ids, win_scores
    # leading bigram in QUERY-TEXT order (tokenize_query sorts/dedupes,
    # which would scramble the phrase)
    terms = _TOKEN_RE.findall(query.lower())
    phrase = " ".join(terms[:2]) if len(terms) >= 2 else (
        terms[0] if terms else "")
    phrase_ids = phrase_search(pos_reader, phrase)
    final = win_scores + np.where(np.isin(win_ids, phrase_ids), boost, 0.0)
    return bm25.rank_topk(win_ids, final, k)


# --------------------------------------------------------------------------
# block-max WAND (document-at-a-time with block skipping)
# --------------------------------------------------------------------------

class _Cursor:
    __slots__ = ("term", "pl", "idf", "ub", "bi", "docs", "tfs", "pos", "cur")

    def __init__(self, term: str, pl: PostingList, idf_t: float):
        self.term = term
        self.pl = pl
        self.idf = idf_t
        self.ub = bm25.upper_bound(idf_t, int(pl.max_tf.max()))
        self.bi = -1
        self.docs = self.tfs = None
        self.pos = 0
        self.cur = -1
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.pl.n_blocks:
            self.cur = np.iinfo(np.int64).max
            return
        self.bi = bi
        self.docs, self.tfs = self.pl.decode_block(bi)
        self.pos = 0
        self.cur = int(self.docs[0])

    def block_ub(self) -> float:
        if self.bi >= self.pl.n_blocks:
            return 0.0
        return bm25.upper_bound(self.idf, int(self.pl.max_tf[self.bi]))

    def next_geq(self, target: int) -> None:
        if self.cur >= target:
            return
        if self.bi >= self.pl.n_blocks or target > self.pl.last_doc[self.bi]:
            bi = self.pl.first_block_geq(target)
            if bi >= self.pl.n_blocks:
                self.cur = np.iinfo(np.int64).max
                self.bi = self.pl.n_blocks
                return
            if bi != self.bi:
                self._load_block(bi)
        self.pos += int(np.searchsorted(self.docs[self.pos:], target))
        self.cur = int(self.docs[self.pos])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_block(self.bi + 1)
        else:
            self.cur = int(self.docs[self.pos])

    def tf(self) -> int:
        return int(self.tfs[self.pos])


_MAXDOC = np.iinfo(np.int64).max


def score_bmw(reader: IndexReader, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Top-k via block-max WAND; rank-identical to score_taat by contract.

    Performance honesty (measured, BASELINE.md): this is the SKIPPING
    ALGORITHM realized faithfully (pivoting, block-max refinement,
    block-boundary jumps), but its per-document Python cursor loop
    loses to the vectorized TAAT path by ~50× at 10^6 docs (p50 ~1 s vs
    ~20 ms) — document-at-a-time traversal needs compiled code to win,
    and this sandbox has no numba/C toolchain. It exists to pin WAND's
    semantics (`test_bmw_matches_taat`) and to document where the
    compiled kernel plugs in; the serving latency paths at scale are
    vectorized TAAT with the accumulator divided across doc-partitioned
    readers (grid), plus the BMW block-max metadata already in the
    codec for when a compiled kernel lands."""
    terms = tokenize_query(query)
    cursors: list[_Cursor] = []
    for t in terms:
        pl = reader.postings(t)
        if pl is not None and pl.n:
            cursors.append(_Cursor(t, pl, bm25.idf(reader.n_docs, pl.n)))
    if not cursors:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    # fixed scoring order = sorted term order (same as TAAT)
    heap: list[tuple[float, int]] = []   # (score, -doc_id) min-heap of top-k
    theta = -np.inf
    while True:
        live = sorted((c for c in cursors if c.cur != _MAXDOC), key=lambda c: c.cur)
        if not live:
            break
        # pivot: smallest doc where the prefix upper-bound sum can beat theta
        acc_ub = 0.0
        pivot = None
        for c in live:
            acc_ub += c.ub
            # margin mirrors score_maxscore's _PRUNE_MARGIN: theta is
            # the kth ROUNDED score, so a doc whose raw score rounds
            # INTO the kth tie class (within 0.5e-7 below theta) must
            # still be scored — its smaller doc_id can win the tie
            if acc_ub > theta - _PRUNE_MARGIN or len(heap) < k:
                pivot = c.cur
                break
        if pivot is None:
            break
        # block-max refinement: sum of block UBs at the pivot
        block_ub = 0.0
        for c in live:
            if c.cur > pivot:
                break
            c_bi = c.pl.first_block_geq(pivot)
            if c_bi < c.pl.n_blocks:
                block_ub += bm25.upper_bound(c.idf, int(c.pl.max_tf[c_bi]))
        if len(heap) >= k and block_ub <= theta - _PRUNE_MARGIN:
            # skip: advance cursors at/before the pivot past the nearest
            # block boundary — capped by the first cursor beyond the
            # pivot (its ub wasn't counted in block_ub, so docs at or
            # after its position must be re-evaluated)
            nxt = _MAXDOC
            for c in live:
                if c.cur > pivot:
                    nxt = min(nxt, c.cur)
                    break
                bi = c.pl.first_block_geq(pivot)
                if bi < c.pl.n_blocks:
                    nxt = min(nxt, int(c.pl.last_doc[bi]) + 1)
            for c in live:
                if c.cur <= pivot:
                    c.next_geq(nxt)
            continue
        # align all cursors <= pivot onto pivot and score it
        for c in live:
            if c.cur < pivot:
                c.next_geq(pivot)
        score = 0.0
        dl = float(reader.dl_lens[pivot])        # pivot IS the ordinal
        for c in cursors:           # fixed (sorted-term) order for determinism
            if c.cur == pivot:
                score += c.idf * float(bm25.tf_weight(
                    np.float64(c.tf()), np.float64(dl), reader.avgdl))
        for c in cursors:
            if c.cur == pivot:
                c.advance()
        # heap entries use the ROUNDED score and the EXTERNAL doc_id so
        # eviction ties break exactly as rank_topk does in TAAT
        # (rank-identity contract); the rounded theta is <= the raw
        # one, so pruning with it only admits more candidates — never
        # unsafe.
        # np.round, not Python round(): rank_topk rounds with
        # np.round and the two can disagree by 1 ulp at .5
        # boundaries — identical rounding keeps scores bit-equal
        entry = (float(np.round(score, bm25.SCORE_ROUND)),
                 -int(reader.dl_doc_ids[pivot]))
        if len(heap) < k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)
        if len(heap) >= k:
            theta = heap[0][0]

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    docs = np.array([-nd for _, nd in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return docs, scores


# --------------------------------------------------------------------------
# batch query surface
# --------------------------------------------------------------------------

class QueryEngine:
    """Stateful query server: index loaded once, queries served per call.

    Usable directly or as a ``map_batches`` actor class over a query
    dataset (``concurrency=N`` replicates the reader, the query-side
    actor-pool analogue of ``uploadParallelism``).
    """

    _STRATEGIES = {"taat": score_taat, "maxscore": score_maxscore,
                   "bmw": score_bmw}

    def __init__(self, index_dir: str, strategy: str = "maxscore"):
        from ..health import HealthMonitor

        if strategy not in self._STRATEGIES:
            # a typo must not silently serve the ~50x-slower BMW
            # algorithm-spec path
            raise ValueError(
                f"unknown strategy {strategy!r} — one of "
                f"{sorted(self._STRATEGIES)}")
        self.reader = IndexReader(index_dir)
        self.strategy = strategy
        # H1: the probe the serving layer polls (RuntimeService analogue;
        # unhealthyLatency default per reference.conf:49-52)
        self.health = HealthMonitor()

    def topk(self, query: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        fn = self._STRATEGIES[self.strategy]
        op = self.health.begin("query")
        try:
            out = fn(self.reader, query, k)
        except Exception as e:
            self.health.end(op, ok=False, error=str(e))
            raise
        self.health.end(op, ok=True)
        return out

    def msearch(self, queries: list[str], k: int = 10,
                ) -> list[tuple[np.ndarray, np.ndarray]]:
        """ES ``_msearch`` — in-process there is no round trip to fuse,
        so this is the API-parity loop (the distributed planes fuse the
        scatter; see ``ShardedQueryEngine.msearch``)."""
        return [self.topk(q, k) for q in queries]

    def healthy(self) -> bool:
        return self.health.healthy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        ranks: list[int] = []
        docs: list[int] = []
        scores: list[float] = []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [10] * batch.num_rows
        for qid, q, k in zip(batch["qid"].to_pylist(), batch["query"].to_pylist(), ks):
            d, s = self.topk(q, int(k))
            for r in range(len(d)):
                qids.append(int(qid))
                ranks.append(r + 1)
                docs.append(int(d[r]))
                scores.append(float(s[r]))
        return pa.table({
            "qid": pa.array(qids, type=pa.int32()),
            "rank": pa.array(ranks, type=pa.int32()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        })
