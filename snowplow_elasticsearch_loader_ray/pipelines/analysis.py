"""Text analysis over document tables: quality stats, language ID,
token counting, document fingerprinting.

These are the "large-scale training-data pipeline" operators layered on
the same tokenizer hot path as the index build. All stages are
stateless-vectorized ``map_batches`` transforms over Arrow batches —
language profiles and stopword sets are compiled once per actor when
run with ``concurrency=N``.

Oracle parity: ``quality_stats`` emits only integers and exact integer
ratios so the DuckDB oracle hashes bit-identically; ``lang_id`` and
``fingerprint`` are engine-defined (rows-only checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenizer import tokenize_to_terms

#: fixed stopword list (documented; the oracle SQL embeds the same list)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]

#: per-language marker-token profiles for the n-gram/stopword heuristic
#: language ID. Deterministic tie-break: first language in this dict
#: order wins; no markers at all → "und".
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "it", "for", "on", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "da": ["og", "er", "det", "en", "til", "af", "med", "som", "den"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "con", "que"],
    "zh": ["de5", "shi4", "zai4"],  # pinyin-ish placeholders; html corpora are latin-tokenized
}


def _flat_tokens(batch_texts) -> tuple[pa.Array, np.ndarray, int]:
    flat, idx = tokenize_to_terms(batch_texts)
    return flat, idx.to_numpy(zero_copy_only=False), len(batch_texts)


class QualityStats:
    """doc → integer quality metrics (+ exact-division double ratio).

    Columns: n_tokens, n_types (distinct terms), n_stopwords, max_tf,
    stopword_ratio (= n_stopwords / n_tokens as float64 — identical in
    engine and oracle because both divide the same exact integers).
    """

    def __init__(self, stopwords: list[str] = STOPWORDS):
        self.stop = pa.array(stopwords, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        n_tokens = np.bincount(idx, minlength=n).astype(np.int64)

        is_stop = pc.is_in(flat, value_set=self.stop).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(idx[is_stop], minlength=n).astype(np.int64)

        pairs = pa.table({"i": pa.array(idx), "term": flat})
        tf = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
        ti = tf["i"].to_numpy(zero_copy_only=False)
        tc = tf["term_count"].to_numpy(zero_copy_only=False)
        n_types = np.bincount(ti, minlength=n).astype(np.int64)
        max_tf = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_tf, ti, tc)

        ratio = np.divide(n_stop, n_tokens, out=np.zeros(n, dtype=np.float64),
                          where=n_tokens > 0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_types": pa.array(n_types),
            "n_stopwords": pa.array(n_stop),
            "max_tf": pa.array(max_tf),
            "stopword_ratio": pa.array(ratio),
        })


class LangId:
    """Marker-token language ID (n-gram-heuristic family; engine-defined)."""

    def __init__(self, profiles: dict[str, list[str]] | None = None):
        profs = profiles or LANG_PROFILES
        self.langs = list(profs)
        self.sets = [pa.array(v, type=pa.string()) for v in profs.values()]

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        scores = np.zeros((len(self.langs), n), dtype=np.int64)
        for li, vs in enumerate(self.sets):
            hit = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            if hit.any():
                scores[li] = np.bincount(idx[hit], minlength=n)
        best = scores.argmax(axis=0)           # ties → first profile order
        none = scores.max(axis=0) == 0
        langs = np.array(self.langs, dtype=object)[best]
        langs[none] = "und"
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(langs, type=pa.string()),
            "marker_hits": pa.array(scores.max(axis=0)),
        })


def _hash_tokens(flat: pa.Array) -> np.ndarray:
    """Per-token 64-bit hashes via dictionary encode + per-unique blake2b."""
    import hashlib

    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    vocab = d.dictionary.to_pylist()
    lut = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
         for t in vocab),
        dtype=np.uint64, count=len(vocab),
    )
    return lut[d.indices.to_numpy(zero_copy_only=False)]


#: Fingerprint token-hash parameters — shared verbatim by the DuckDB
#: oracle (driver_queries._fingerprints_sql), which replays the whole
#: fingerprint in HUGEINT mod-2^64 arithmetic. The token hash is a
#: byte polynomial h = Σ byte_j·P^j (mod 2^64) over the first
#: FP_MAX_TOKEN_BYTES bytes — SQL-expressible, unlike a digest — and
#: tokens are [a-z0-9] so zero-padding is unambiguous.
FP_POLY_P = 0x00000100000001B3          # FNV-1a 64 prime
FP_MAX_TOKEN_BYTES = 64
FP_POS_MUL = 0x9E3779B97F4A7C15
FP_POS_ADD = 0x2545F4914F6CDD1D
FP_MIX_MUL = 0xFF51AFD7ED558CCD
_M64 = (1 << 64) - 1


def _fp_poly_pows(n: int) -> np.ndarray:
    pows = np.empty(n, np.uint64)
    acc = 1
    for j in range(n):
        pows[j] = acc
        acc = (acc * FP_POLY_P) & _M64
    return pows


def _poly_hash_tokens(flat: pa.Array) -> np.ndarray:
    """Per-token polynomial byte hash via dictionary encode + one
    padded-byte-matrix multiply over the (small) vocabulary."""
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    vocab = d.dictionary
    maxlen = min(FP_MAX_TOKEN_BYTES,
                 int(pc.max(pc.binary_length(vocab)).as_py() or 1))
    b = np.asarray(vocab.to_pylist(), dtype=f"S{maxlen}")
    m = b.view(np.uint8).reshape(len(b), maxlen).astype(np.uint64)
    lut = (m * _fp_poly_pows(maxlen)).sum(axis=1, dtype=np.uint64)
    return lut[d.indices.to_numpy(zero_copy_only=False)]


class Fingerprint:
    """Order-sensitive 64-bit document fingerprint (rolling-hash family).

    fp(doc) = XOR over tokens of mix(h(token) ^ rot(position)) — position
    is mixed in so permuted documents fingerprint differently; XOR-reduce
    makes it one vectorized ``bitwise_xor.reduceat`` per batch. Every
    step is mod-2^64 integer arithmetic on a polynomial token hash, so
    the DuckDB oracle replays it exactly in HUGEINT (value-oracled).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        h = _poly_hash_tokens(flat) if len(flat) else np.empty(0, np.uint64)
        # position within doc
        counts = np.bincount(idx, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(h), dtype=np.uint64) - starts[idx].astype(np.uint64)
        x = h ^ (pos * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0x2545F4914F6CDD1D))
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        fp = np.zeros(n, dtype=np.uint64)
        nz = counts > 0
        if len(h):
            red = np.bitwise_xor.reduceat(x, starts[nz])
            fp[nz] = red
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fp.view(np.int64)),
            "n_tokens": pa.array(counts.astype(np.int64)),
        })


#: Gopher-rule thresholds (Rae et al. 2021 §A1.1, adapted to the
#: tokenizer): docs whose most frequent bigram exceeds this fraction of
#: all bigrams, or whose duplicate-trigram fraction exceeds the second
#: threshold, are repetition-flagged. Both ratios are exact int/int
#: divisions so the DuckDB oracle evaluates identical doubles.
TOP_BIGRAM_FRAC = 0.08
DUP_TRIGRAM_FRAC = 0.01

_RP1 = np.uint64(0x9E3779B97F4A7C15)
_RP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_RP3 = np.uint64(0x165667B19E3779F9)


def _gram_counts(h: np.ndarray, idx: np.ndarray, n_docs: int, k: int):
    """(total grams, distinct grams, max gram count) per doc, vectorized.

    All-integer: k-gram hashes (distinct multiplier per position) →
    one lexsort by (doc, hash) → run-length boundaries give distinct
    and top counts with bincount / maximum.at — no per-doc Python loop.
    """
    tot = np.zeros(n_docs, np.int64)
    dis = np.zeros(n_docs, np.int64)
    top = np.zeros(n_docs, np.int64)
    if len(h) < k:
        return tot, dis, top
    muls = [_RP1, _RP2, _RP3][:k]
    parts = [h[i: len(h) - (k - 1) + i] * muls[i] for i in range(k)]
    g = np.bitwise_xor.reduce(parts)
    g ^= g >> np.uint64(33)
    g *= np.uint64(0xFF51AFD7ED558CCD)
    same = idx[: len(h) - (k - 1)] == idx[k - 1:]
    g, gdoc = g[same], idx[: len(h) - (k - 1)][same]
    if not len(g):
        return tot, dis, top
    order = np.lexsort((g, gdoc))
    g, gdoc = g[order], gdoc[order]
    tot = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
    new_run = np.concatenate(([True], (g[1:] != g[:-1]) | (gdoc[1:] != gdoc[:-1])))
    starts = np.flatnonzero(new_run)
    run_len = np.diff(np.concatenate((starts, [len(g)])))
    run_doc = gdoc[starts]
    dis = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
    np.maximum.at(top, run_doc, run_len)
    return tot, dis, top


class RepetitionStats:
    """Gopher-style repetition metrics per doc (the web-corpus cleaning
    rules of Rae et al. 2021): most-frequent-bigram fraction and
    duplicate-trigram fraction, plus the combined flag.

    Docs with fewer than 3 tokens carry no trigram and are excluded
    (the oracle's ``WHERE len(toks) >= 3``).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        h = _hash_tokens(flat) if len(flat) else np.empty(0, np.uint64)
        n_tok = np.bincount(idx, minlength=n).astype(np.int64)
        bg_tot, _, bg_top = _gram_counts(h, idx, n, 2)
        tg_tot, tg_dis, _ = _gram_counts(h, idx, n, 3)
        keep = n_tok >= 3
        dup_tg = tg_tot - tg_dis
        with np.errstate(divide="ignore", invalid="ignore"):
            # a bigram seen once is not repetition, whatever its
            # fraction of a short doc — the top-bigram rule needs an
            # actual repeat (Gopher applies it to long web docs only)
            flagged = (((bg_top >= 2) & (bg_top / bg_tot > TOP_BIGRAM_FRAC))
                       | (dup_tg / tg_tot > DUP_TRIGRAM_FRAC))
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "n_bigrams": pa.array(bg_tot[keep]),
            "top_bigram_n": pa.array(bg_top[keep]),
            "n_trigrams": pa.array(tg_tot[keep]),
            "dup_trigram_n": pa.array(dup_tg[keep]),
            "flagged": pa.array(flagged[keep]),
        })


def repetition_stats(ds, concurrency=None):
    return _apply(ds, RepetitionStats, concurrency)


#: Misra-Gries counter budget (heavy-hitters sketch width)
MG_K = 64


def _mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Compress exact (term, count) pairs to ≤ k Misra-Gries counters:
    subtract the (k+1)-th largest count from every counter and drop the
    non-positive — the summary underestimates each kept term by at most
    the subtracted total and never overestimates."""
    if len(terms) <= k:
        return terms, counts
    thr = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    est = counts - thr
    keep = est > 0
    return terms[keep], est[keep]


class _MGBlock:
    """One block → its ≤ MG_K-counter summary + the block token total
    (the error-budget numerator rides with every summary row)."""

    def __init__(self, k: int = MG_K):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, _idx, _n = _flat_tokens(batch["text"])
        n_tokens = len(flat)
        if n_tokens == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "est": pa.array([], pa.int64()),
                             "block_tokens": pa.array([], pa.int64())})
        # exact block counts via the Arrow kernel — no Python-object
        # token materialization; only the <= k KEPT terms cross to
        # Python (compress runs on the counts array alone)
        vc = pc.value_counts(flat)
        c_all = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c_all) > self.k:
            thr = np.partition(c_all, len(c_all) - self.k - 1)[len(c_all) - self.k - 1]
            keep_idx = np.flatnonzero(c_all - thr > 0)
            c = c_all[keep_idx] - thr
        else:
            keep_idx = np.arange(len(c_all))
            c = c_all
        u = np.asarray(vc.field("values").take(pa.array(keep_idx)).to_pylist(),
                       dtype=object)
        if len(u) == 0:
            # compress can zero out a block of all-equal counts; its
            # token total must still reach the error budget — ship an
            # est=0 sentinel (dropped by the final compress)
            return pa.table({"term": pa.array([""], pa.string()),
                             "est": pa.array([0], pa.int64()),
                             "block_tokens": pa.array([n_tokens], pa.int64())})
        # the block token total rides on the FIRST summary row only
        # (zeros elsewhere), so the driver's n_total is a plain sum
        bt = np.zeros(len(u), dtype=np.int64)
        bt[0] = n_tokens
        return pa.table({
            "term": pa.array(u.tolist(), pa.string()),
            "est": pa.array(c, pa.int64()),
            "block_tokens": pa.array(bt),
        })


def heavy_hitters(ds, k: int = MG_K, top: int = 15) -> tuple[pa.Table, int]:
    """Distributed heavy hitters (Misra-Gries / space-saving):
    per-block summaries (≤ k counters each — the only thing that
    leaves a task), merged by summing matching counters and
    re-compressing, giving the classic mergeable guarantee: every term
    with true count > N/(k+1) survives, with underestimate ≤ N/(k+1)
    and NO overestimate. Returns (top rows sorted est desc / term asc,
    error_bound = N // (k+1)).

    The merge input is blocks × k rows regardless of corpus size —
    the sketch is what makes "top terms over 100 TB" a driver-sized
    reduction instead of a vocabulary-wide shuffle (the exact
    `top_terms` groupby is the other path when the index exists).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    # the counter merge is a Ray groupby over blocks × k summary rows;
    # the driver lands only the pre-summed distinct-term partials. At
    # extreme block counts (blocks × k beyond one reduce), MG merges
    # are associative — chain pairwise merges as a tree; the bound
    # still telescopes to N/(k+1).
    merged = (ds.map_batches(_MGBlock(k), batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("est", alias_name="est"),
                         Sum("block_tokens", alias_name="bt"))
              .to_pandas())
    n_total = int(merged["bt"].sum()) if len(merged) else 0
    u, c = _mg_compress(merged["term"].to_numpy(object),
                        merged["est"].to_numpy(np.int64), k)
    out = (pd.DataFrame({"term": u, "est": c})
           .query("est > 0")
           .sort_values(["est", "term"], ascending=[False, True])
           .head(top).reset_index(drop=True))
    bound = n_total // (k + 1)
    return pa.table({"term": pa.array(out["term"], pa.string()),
                     "est": pa.array(out["est"], pa.int64())}), bound


def heavy_hitters_verified(ds, k: int = MG_K) -> pa.Table:
    """EXACT heavy hitters via the classic two-phase plan: the
    Misra-Gries sketch proposes candidates (phase 1 — bounded memory,
    no vocabulary-wide shuffle), then one more streaming pass counts
    ONLY those ≤ k candidates exactly (phase 2 — the candidate set is
    broadcast, each batch emits ≤ k partial rows). Every term with
    true count > N/(k+1) is guaranteed to be in the sketch, so
    filtering the exact counts at that threshold yields exactly the
    terms a full groupby would — deterministic, value-oracle-checkable
    — while the data moved stays blocks × k rows at any corpus size.

    → (term, n) rows with EXACT counts, n > N // (k+1), sorted
    n desc / term asc.
    """
    from ray.data.aggregate import Sum

    empty = pa.table({"term": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    sketch, bound = heavy_hitters(ds, k=k, top=k)
    cands = sketch["term"].to_pylist()
    if not cands:
        return empty
    vs = pa.array(cands, pa.string())

    def _count_candidates(batch: pa.Table) -> pa.Table:
        flat, _idx, _n = _flat_tokens(batch["text"])
        sub = flat.filter(pc.is_in(flat, value_set=vs))
        if len(sub) == 0:
            return empty
        vc = pc.value_counts(sub)
        return pa.table({"term": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    merged = (ds.map_batches(_count_candidates, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    keep = (merged[merged["n"] > bound]
            .sort_values(["n", "term"], ascending=[False, True])
            .reset_index(drop=True))
    return pa.table({"term": pa.array(keep["term"], pa.string()),
                     "n": pa.array(keep["n"], pa.int64())})


def _apply(ds, cls, concurrency):
    # concurrency=None → stateless tasks over a prebuilt instance (state
    # serialized once into the task closure); concurrency=N → actor pool
    # with per-actor __init__ (the stateful-stage pattern)
    if concurrency is None:
        return ds.map_batches(cls(), batch_format="pyarrow")
    return ds.map_batches(cls, batch_format="pyarrow", concurrency=concurrency)


def quality_stats(ds, concurrency=None):
    return _apply(ds, QualityStats, concurrency)


def lang_id(ds, concurrency=None):
    return _apply(ds, LangId, concurrency)


def fingerprints(ds, concurrency=None):
    return _apply(ds, Fingerprint, concurrency)


# --------------------------------------------------------------------------
# BPE-ish token counting (the "how many LLM tokens is this corpus"
# estimator a training-data pipeline budgets with)
# --------------------------------------------------------------------------

#: GPT-2-style pretokenizer shape, restricted to RE2 syntax (no
#: lookahead) so the SAME pattern runs through Arrow's
#: count_substring_regex kernel and DuckDB's regexp_extract_all (both
#: RE2, both leftmost-first alternation) — counts match exactly.
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"   # English contractions
    r"| ?\pL+"                 # letter runs (optional leading space)
    r"| ?\pN+"                 # digit runs
    r"| ?[^\s\pL\pN]+"         # punctuation / symbol runs
    r"|\s+"                    # residual whitespace
)


class BpeTokenCount:
    """Per-doc token counts: whitespace tokens and BPE-ish pretokens.
    Two vectorized RE2 kernels per batch — no Python loop, no token
    materialization (counting only)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens_ws": pc.count_substring_regex(
                txt, r"\S+").cast(pa.int64()),
            "n_tokens_bpe": pc.count_substring_regex(
                txt, BPE_PRETOKEN_RE).cast(pa.int64()),
        })


def bpe_token_counts(ds, concurrency=None):
    return _apply(ds, BpeTokenCount, concurrency)


def bpe_apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode ONE word with a fixed merge table: start from characters,
    apply each merge rank in order as a greedy left-to-right
    non-overlapping pass — the HF-tokenizers/GPT-2 application rule
    (training's `learn_bpe_merges` applies merges the same way)."""
    syms = list(word)
    for l, r in merges:
        j, out = 0, []
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


class BpeEncodeLengths:
    """doc → BPE token count under a FIXED published merge table (the
    production shape: a released tokenizer's merges ship with the job;
    training happened once, elsewhere). Actor-pool stage: the merge
    table and the word→length cache live for the actor's lifetime, so
    each distinct word is encoded once per actor, not once per
    occurrence — per batch the only Python loop is over the batch's
    UNSEEN vocabulary (cache misses), while occurrence counting is a
    dictionary-encode + bincount."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self._cache: dict[str, int] = {}

    def _enc_len(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = len(bpe_apply_merges(w, self.merges))
            self._cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        if not len(flat):
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_bpe": pa.array(np.zeros(n, dtype=np.int64)),
            })
        if isinstance(flat, pa.ChunkedArray):
            flat = (flat.chunk(0) if flat.num_chunks == 1
                    else pa.concat_arrays(flat.chunks))
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        lens = np.array([self._enc_len(w)
                         for w in de.dictionary.to_pylist()], dtype=np.int64)
        n_bpe = np.bincount(idx, weights=lens[codes].astype(np.float64),
                            minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe": pa.array(n_bpe),
        })


def bpe_encode_lengths(ds, merges: list[tuple[str, str]],
                       concurrency=None):
    if concurrency is None:
        return ds.map_batches(BpeEncodeLengths(merges),
                              batch_format="pyarrow")
    return ds.map_batches(BpeEncodeLengths, fn_constructor_args=(merges,),
                          batch_format="pyarrow", concurrency=concurrency)


# --------------------------------------------------------------------------
# HyperLogLog cardinality (the ES `cardinality` aggregation's sketch;
# the "novel sketch" custom-operator family)
# --------------------------------------------------------------------------
# Distributed shape: each block collapses to one 2^p-byte register
# array inside map_batches (np.maximum.at over hashed values) and the
# driver merges register arrays by elementwise max — HLL's merge is
# exactly the same max, so block sketches compose associatively and the
# combine moves 2^p bytes per block, never values. At 100 TB this is
# the canonical pre-aggregated sketch pattern: a groupby-key variant
# would emit one register row per (key, block) and merge with a tiny
# groupby.

HLL_P = 14                    # 2^14 registers = 16 KiB, rel. error ~0.81%


def _mix64(x: np.ndarray) -> np.ndarray:
    """Splitmix64 finalizer — the deterministic 64-bit value hash."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hll_block_registers(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """One block of int64 values → its HLL register array (uint8[2^p]).

    Register index = top ``p`` hash bits; rank = trailing-zero count of
    the remaining bits + 1 (the trailing-zero convention — same
    geometric distribution as leading-zero HLL, and ntz vectorizes
    exactly in numpy: the isolated lowest set bit is a power of two,
    whose float64 log2 is exact).
    """
    m = 1 << p
    h = _mix64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    lsb = (w & (~w + np.uint64(1))).astype(np.float64)
    rho = np.where(w == 0, 64 - p + 1,
                   np.log2(np.where(lsb == 0, 1.0, lsb)).astype(np.int64) + 1
                   ).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small-range linear counting."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_merged_registers(ds, column: str, p: int = HLL_P) -> np.ndarray:
    """Merged HLL register array of an int64 column: one 2^p-byte
    register row per block, elementwise-max merge — the full sketch
    state (deterministic: splitmix64), one streaming pass."""

    def block(batch: pa.Table) -> pa.Table:
        vals = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"regs": pa.array([hll_block_registers(vals, p).tobytes()],
                                          pa.binary())})

    parts = ds.map_batches(block, batch_format="pyarrow").take_all()
    regs = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.uint8))
    return regs


def hll_cardinality(ds, column: str, p: int = HLL_P) -> float:
    """Approximate count-distinct of an int64 column, one streaming pass."""
    return hll_estimate(hll_merged_registers(ds, column, p))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local document fingerprinting scheme)
# ---------------------------------------------------------------------------

#: winnowing parameters: k-token grams, windows of WIN_W consecutive
#: gram hashes; guarantee: any match of >= k + WIN_W - 1 tokens shares
#: at least one selected fingerprint
WIN_K = 3
WIN_W = 4
#: per-gram-slot multipliers (public golden-ratio / xxhash constants,
#: the same family the repetition-rule gram hash uses)
WIN_MULS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _winnow_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, gram_pos, fp) rows of the selected fingerprints.

    Fully vectorized across the batch: gram hashes combine the
    SQL-replayable polynomial token hashes with per-slot multipliers
    (uint64 wrap); full windows take the RIGHTMOST minimal gram
    (reversed-argmin); docs with fewer grams than a window contribute
    their single whole-doc rightmost min. Distinct (doc, pos) selections
    dedupe before emit."""
    flat, idx, n = _flat_tokens(batch["text"])
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if not len(flat):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "gram_pos": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    h = _poly_hash_tokens(flat)
    counts = np.bincount(idx, minlength=n)
    # gram g[p] spans tokens p..p+K-1 WITHIN a doc: global positions
    # whose K-1 successors stay in the same doc
    k, w = WIN_K, WIN_W
    valid = np.ones(len(h) - (k - 1), dtype=bool) if len(h) >= k \
        else np.zeros(0, dtype=bool)
    gdoc = idx[: len(valid)]
    if len(valid):
        valid &= idx[k - 1:] == gdoc
    g = np.zeros(len(valid), dtype=np.uint64)
    for j, m in enumerate(WIN_MULS[:k]):
        g += h[j: j + len(valid)] * np.uint64(m)
    g, gdoc = g[valid], gdoc[valid]
    gpos_in_doc = (np.arange(len(idx))[: len(valid)][valid]
                   - (np.cumsum(counts) - counts)[gdoc])
    if not len(g):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "gram_pos": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})

    sel = np.zeros(len(g), dtype=bool)
    # full windows: start s valid iff gram s+w-1 exists in same doc
    if len(g) >= w:
        from numpy.lib.stride_tricks import sliding_window_view
        W = sliding_window_view(g, w)
        full = gdoc[: len(W)] == gdoc[w - 1: w - 1 + len(W)]
        rarg = w - 1 - np.argmin(W[:, ::-1], axis=1)
        starts = np.nonzero(full)[0]
        sel[starts + rarg[starts]] = True
    # short docs (< w grams): whole doc is one window
    gcounts = np.bincount(gdoc, minlength=n)
    short = np.nonzero((gcounts > 0) & (gcounts < w))[0]
    if len(short):
        gstarts = np.cumsum(gcounts) - gcounts
        for d in short:
            s, e = gstarts[d], gstarts[d] + gcounts[d]
            seg = g[s:e]
            sel[s + (len(seg) - 1 - np.argmin(seg[::-1]))] = True
    pick = np.nonzero(sel)[0]
    out_doc = doc_ids[gdoc[pick]]
    out_pos = gpos_in_doc[pick]
    out_fp = g[pick].view(np.int64)
    return pa.table({
        "doc_id": pa.array(out_doc.astype(np.int64)),
        "gram_pos": pa.array(out_pos.astype(np.int64)),
        "fp": pa.array(out_fp),
    })


def winnow_fingerprints(ds) -> pa.Table:
    """Distributed winnowing: one streaming map_batches pass; selected
    fingerprints are already per-doc-local so no shuffle is needed
    (a dedup consumer would groupby fp — tiny rows)."""
    import ray as _ray

    parts = _ray.get(
        ds.map_batches(_winnow_batch,
                       batch_format="pyarrow").to_arrow_refs())
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer training: Sennrich et al. 2016)
# ---------------------------------------------------------------------------

def bpe_word_counts(ds) -> "pa.Table":
    """Distributed (token, count) extraction — the ONLY corpus-sized
    stage of BPE training (HF-tokenizers-shaped: aggregate word counts
    across the corpus, then train on the tiny vocab table). Per-batch
    partial counts ride one term-keyed groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _idx, _n = _flat_tokens(batch["text"])
        if not len(flat):
            return pa.table({"tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"tok": flat}).group_by("tok").aggregate(
            [([], "count_all")])
        return t.rename_columns(["tok", "n"])

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("tok").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    rows = rows.sort_values("tok").reset_index(drop=True)
    return pa.table({"tok": pa.array(rows["tok"], pa.string()),
                     "n": pa.array(rows["n"], pa.int64())})


def bpe_pair_stats(words: "pa.Table") -> dict[tuple[str, str], int]:
    """Adjacent-symbol pair counts over a (symbols, count) vocab —
    every adjacent position counts (overlapping pairs included), each
    weighted by the word's corpus count."""
    stats: dict[tuple[str, str], int] = {}
    for syms, n in zip(words["syms"].to_pylist(),
                       words["n"].to_pylist()):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + n
    return stats


def learn_bpe_merges(word_counts: "pa.Table", n_merges: int
                     ) -> list[tuple[str, str, int]]:
    """Deterministic BPE trainer over the aggregated vocab: each round
    merges the highest-count adjacent pair (ties: lexicographically
    smallest pair) in every word, greedy left-to-right. Returns
    [(left, right, count_at_merge_time)]. Driver-local by design —
    the vocab table is tiny next to the corpus, exactly like
    production tokenizer trainers."""
    words = pa.table({
        "syms": pa.array([list(t) for t in word_counts["tok"].to_pylist()],
                         pa.list_(pa.string())),
        "n": word_counts["n"],
    })
    syms_list = [list(s) for s in words["syms"].to_pylist()]
    counts = words["n"].to_pylist()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, n in zip(syms_list, counts):
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r, c))
        tgt = l + r
        for i, syms in enumerate(syms_list):
            j = 0
            out = []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(tgt)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms_list[i] = out
    return merges


# --------------------------------------------------------------------------
# bigram language-model quality scoring (KenLM-style stupid backoff)
# --------------------------------------------------------------------------

def bigram_lm_scores(ds, min_count: int = 2,
                     max_bigrams: int = 50_000_000,
                     concurrency: int | None = 2):
    """Per-doc stupid-backoff bigram LM score in exact integer
    micro-nats — the CCNet/KenLM-shaped quality signal one LM order up
    from ``unigram_lm_scores``.

    Model: a same-doc adjacent pair (w1, w2) contributes
    ``floor(1e6·ln(c(w1 w2)/cf(w1)))`` when the corpus bigram count
    clears ``min_count``, else the backoff
    ``floor(1e6·ln(0.4·cf(w2)/N))`` (stupid backoff, alpha = 0.4).
    Every contribution is an integer, so per-doc sums are order-free
    and a SQL oracle replays them bit-for-bit.

    Scale shape: two streaming passes. Pass 1 collapses each block to
    distinct-pair partial counts before ONE (w1, w2) groupby (plus the
    unigram groupby); pairs below ``min_count`` are dropped after the
    global reduce — the surviving table is the LM. It is broadcast once
    via ``ray.put`` as (vocab, cf, sorted int64 pair keys, counts);
    ``max_bigrams`` fails loudly instead of silently truncating (at web
    scale raise it and shard the LM with the term dictionary). Pass 2
    maps tokens to vocab ids with one ``index_in`` gather per batch,
    probes the sorted key array with ``searchsorted`` and reduces with
    two bincounts — no per-token Python."""
    import ray
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    def _uni_partial(b: pa.Table) -> pa.Table:
        flat, _idx = tokenize_to_terms(b["text"])
        g = pa.table({"t": flat}).group_by("t").aggregate([([], "count_all")])
        return g.rename_columns(["t", "cf"])

    def _pair_partial(b: pa.Table) -> pa.Table:
        flat, idx = tokenize_to_terms(b["text"])
        idx_np = idx.to_numpy(zero_copy_only=False)
        if len(idx_np) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        same = pa.array(idx_np[1:] == idx_np[:-1])
        w1 = flat.slice(0, len(flat) - 1).filter(same)
        w2 = flat.slice(1).filter(same)
        g = pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"]) \
             .aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "c"])

    uni = (ds.map_batches(_uni_partial, batch_format="pyarrow")
           .groupby("t").aggregate(Sum("cf", alias_name="cf"))
           .to_pandas())
    uni = uni.sort_values("t").reset_index(drop=True)
    vocab = pa.array(uni["t"], pa.string())
    cf = uni["cf"].to_numpy(np.int64).astype(np.float64)
    nt = float(cf.sum())
    v = len(uni)

    bi = (ds.map_batches(_pair_partial, batch_format="pyarrow")
          .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c")))
    bi = bi.filter(expr=f"c >= {int(min_count)}")
    bi_tab = bi.to_pandas()
    if len(bi_tab) > max_bigrams:
        raise ValueError(
            f"bigram LM table has {len(bi_tab)} rows > max_bigrams="
            f"{max_bigrams}; raise the cap or shard the LM")
    id1 = pc.index_in(pa.array(bi_tab["w1"], pa.string()), value_set=vocab) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    id2 = pc.index_in(pa.array(bi_tab["w2"], pa.string()), value_set=vocab) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keys = id1 * v + id2
    bic = bi_tab["c"].to_numpy(np.int64).astype(np.float64)
    order = np.argsort(keys)
    lm_ref = ray.put((vocab, cf, nt, keys[order], bic[order]))

    out = ds.map_batches(_BigramLmScore, batch_format="pyarrow",
                         concurrency=concurrency,
                         fn_constructor_kwargs={"lm_ref": lm_ref})
    return out


class _BigramLmScore:
    """Actor-pool stupid-backoff scorer: LM fetched once per actor."""

    def __init__(self, lm_ref):
        import ray
        self.vocab, self.cf, self.nt, self.keys, self.bic = ray.get(lm_ref)
        self.v = len(self.cf)

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, idx_arr = tokenize_to_terms(b["text"])
        n = b.num_rows
        idx = idx_arr.to_numpy(zero_copy_only=False)
        if len(idx) < 2:
            z = np.zeros(n, dtype=np.int64)
            return pa.table({"doc_id": b["doc_id"], "n_bigrams": pa.array(z),
                             "lp_micro": pa.array(z)})
        code = pc.fill_null(pc.index_in(flat, value_set=self.vocab), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        same = idx[1:] == idx[:-1]
        p, c = code[:-1][same], code[1:][same]
        docp = idx[1:][same]
        key = p * self.v + c
        if len(self.keys):
            pos = np.clip(np.searchsorted(self.keys, key), 0,
                          len(self.keys) - 1)
            found = self.keys[pos] == key
            cbi = self.bic[pos]
        else:
            found = np.zeros(len(key), dtype=bool)
            cbi = np.ones(len(key), dtype=np.float64)
        m = np.where(
            found,
            np.floor(1e6 * np.log(cbi / self.cf[p])),
            np.floor(1e6 * np.log((0.4 * self.cf[c]) / self.nt)),
        ).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bigrams": pa.array(np.bincount(docp, minlength=n)
                                  .astype(np.int64)),
            "lp_micro": pa.array(np.bincount(docp, weights=m, minlength=n)
                                 .astype(np.int64)),
        })


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models" —
# the document-level filters every web-scale training pipeline applies
# before tokenization; the repetition family lives in RepetitionStats)
# --------------------------------------------------------------------------

#: rule thresholds (the published Gopher values)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3    # mean word length in [3, 10]
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5   # ≥ 80% words with a letter
GOPHER_MIN_STOPWORDS = 2
GOPHER_SYMBOL_DEN = 10          # symbol-to-word ratio ≤ 0.1

#: Gopher's own stopword list (distinct from the scoring STOPWORDS)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


class GopherRules:
    """doc → Gopher rule counters + per-rule pass flags, all integer
    arithmetic (ratio rules compare cross-multiplied ints, never
    floats). Words are RE2 ``\\s+`` splits of the RAW text (not index
    terms — Gopher filters run before tokenization); symbols are '#'
    occurrences plus non-overlapping '...' runs. One vectorized pass:
    split → flatten → bincount per doc; no Python loop."""

    def __init__(self):
        self.stop = pa.array(GOPHER_STOPWORDS, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n = len(txt)
        words = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(words)
        idx = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # regexp_split_to_array emits '' at boundaries — drop them like
        # the oracle's list_filter(x -> x <> '')
        keep = wlen > 0
        flat, idx, wlen = flat.filter(pa.array(keep)), idx[keep], wlen[keep]

        n_words = np.bincount(idx, minlength=n).astype(np.int64)
        sum_wlen = np.bincount(idx, weights=wlen, minlength=n) \
            .astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]") \
            .to_numpy(zero_copy_only=False)
        n_alpha = np.bincount(idx[alpha], minlength=n).astype(np.int64)
        stop = pc.is_in(pc.utf8_lower(flat), value_set=self.stop) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.bincount(idx[stop], minlength=n).astype(np.int64)
        n_sym = (pc.count_substring(txt, "#").to_numpy(zero_copy_only=False)
                 .astype(np.int64)
                 + pc.count_substring(txt, "...")
                 .to_numpy(zero_copy_only=False).astype(np.int64))

        ok_words = (n_words >= GOPHER_MIN_WORDS) \
            & (n_words <= GOPHER_MAX_WORDS)
        ok_mwl = (GOPHER_MIN_MEAN_WORD_LEN * n_words <= sum_wlen) \
            & (sum_wlen <= GOPHER_MAX_MEAN_WORD_LEN * n_words)
        ok_alpha = GOPHER_ALPHA_DEN * n_alpha \
            >= GOPHER_ALPHA_NUM * n_words
        ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
        ok_sym = GOPHER_SYMBOL_DEN * n_sym <= n_words
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "sum_word_len": pa.array(sum_wlen),
            "n_alpha_words": pa.array(n_alpha),
            "n_stopwords": pa.array(n_stop),
            "n_symbols": pa.array(n_sym),
            "ok_word_count": pa.array(ok_words),
            "ok_mean_word_len": pa.array(ok_mwl),
            "ok_alpha_frac": pa.array(ok_alpha),
            "ok_stopwords": pa.array(ok_stop),
            "ok_symbol_ratio": pa.array(ok_sym),
            "pass_all": pa.array(ok_words & ok_mwl & ok_alpha
                                 & ok_stop & ok_sym),
        })


def gopher_rules(ds, concurrency=None):
    return _apply(ds, GopherRules, concurrency)


# --------------------------------------------------------------------------
# Flesch reading-ease (readability scoring — the classic quality signal
# readability-filtered corpora like C4/CCNet variants bucket on)
# --------------------------------------------------------------------------

#: micro-unit scale for the FRE score (the unigram_lm_scores pattern:
#: floor(1e6·x) makes float scores order-free-summable and SQL-hashable)
FRE_SCALE = 1_000_000.0


class FleschScore:
    """doc → Flesch reading-ease counters + score in integer micro-units.

    Words are the index tokenizer's ``[a-z0-9]+`` runs of lower(text);
    sentences are non-overlapping ``[.!?]+`` runs of the RAW text with a
    floor of 1 (a fragment with no terminator is one sentence, the
    textstat convention); syllables are the vowel-group count
    (``[aeiouy]+`` runs — vowel groups cannot cross token boundaries
    because separators are non-alphanumeric) plus one per vowel-less
    word (the per-word max(1,·) floor). ``fre_micro =
    floor(1e6 * (206.835 - 1.015*(W/S) - 84.6*(Syl/W)))`` evaluated
    left-to-right in float64 so the DuckDB oracle replays it
    bit-identically. Docs with zero words are dropped (FRE undefined).

    All five counters come from ``pc.count_substring_regex`` (RE2) over
    the batch — no per-row Python, no token materialization."""

    def __call__(self, b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        low = pc.utf8_lower(txt)

        def cnt(arr, pat):
            return pc.count_substring_regex(arr, pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)

        n_words = cnt(low, "[a-z0-9]+")
        n_sent_raw = cnt(txt, "[.!?]+")
        vowel_groups = cnt(low, "[aeiouy]+")
        vowel_words = cnt(low, "[a-z0-9]*[aeiouy][a-z0-9]*")

        keep = n_words > 0
        n_words, n_sent_raw = n_words[keep], n_sent_raw[keep]
        n_syll = vowel_groups[keep] + (n_words - vowel_words[keep])
        n_sent = np.maximum(n_sent_raw, 1)

        w = n_words.astype(np.float64)
        fre = 206.835 - 1.015 * (w / n_sent) - 84.6 * (n_syll / w)
        fre_micro = np.floor(FRE_SCALE * fre).astype(np.int64)
        kept = pa.array(keep)
        return pa.table({
            "doc_id": b["doc_id"].filter(kept),
            "source": b["source"].filter(kept),
            "n_words": pa.array(n_words),
            "n_sentences": pa.array(n_sent),
            "n_syllables": pa.array(n_syll),
            "fre_micro": pa.array(fre_micro),
        })


def flesch_scores(ds, concurrency=None):
    return _apply(ds, FleschScore, concurrency)


# --------------------------------------------------------------------------
# Blocklist filter (the C4 "bad words" document filter: drop/flag any
# document containing a blocklisted WORD — token-level, not substring)
# --------------------------------------------------------------------------

class BlocklistFlag:
    """doc → flagged bool: does the document contain any blocklisted
    token? One RE2 alternation with explicit ``[^a-z0-9]``/anchor
    boundaries (RE2 has no lookaround) over lower(text) — token-level
    semantics identical to ``term IN (list)`` over the tokenized
    corpus, which is exactly what the oracle checks. The compiled
    pattern is built once per actor from the blocklist."""

    def __init__(self, terms: list[str]):
        import re as _re

        if not terms:
            # an empty alternation "()" matches any separator — an empty
            # blocklist would flag nearly everything instead of nothing
            raise ValueError("blocklist must contain at least one term")
        alts = "|".join(_re.escape(t) for t in terms)
        self.pattern = f"(^|[^a-z0-9])({alts})([^a-z0-9]|$)"

    def __call__(self, b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        hit = pc.match_substring_regex(pc.utf8_lower(txt), self.pattern) \
            .to_numpy(zero_copy_only=False)
        # per-batch partial per-source counts: the shuffle moves
        # (source, n_docs, n_flagged) rows, never text
        t = pa.table({"source": b["source"],
                      "flagged": pa.array(hit.astype(np.int64))})
        g = t.group_by("source").aggregate(
            [("flagged", "sum"), ([], "count_all")])
        return g.rename_columns(["source", "n_flagged", "n_docs"])


# --------------------------------------------------------------------------
# Linear quality classifier (the fasttext/logistic quality-model role:
# a fixed-weight linear model over cheap text features gates documents
# into keep/drop — CCNet/C4-style model-based filtering, here with a
# deterministic published weight vector so the score is value-oracled)
# --------------------------------------------------------------------------

#: fixed model weights: bias, stopword_frac, mean_word_len,
#: type_token_ratio, ln(1+n_tokens)
QC_WEIGHTS = (-1.55, 6.0, -0.15, 1.5, 0.2)


class QualityClassifier:
    """doc → linear quality score in floor-micro units + keep flag.

    Features (exact integer counters divided as float64): stopword
    fraction, mean token length, type-token ratio, ln(1+n_tokens).
    ``score = w0 + w1·sf + w2·mwl + w3·ttr + w4·ln(1+n)`` evaluated
    left-to-right so the DuckDB oracle replays the float64 arithmetic
    bit-identically; ``keep = qscore_micro > 0`` (the integer gate, so
    the flag is exactly replayable). Zero-token docs are dropped
    (no features). One vectorized pass per batch — token flatten,
    three bincounts, one group_by for distinct types."""

    def __init__(self, stopwords: list[str] = STOPWORDS):
        self.stop = pa.array(stopwords, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx, n = _flat_tokens(batch["text"])
        n_tokens = np.bincount(idx, minlength=n).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=self.stop) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.bincount(idx[is_stop], minlength=n).astype(np.int64)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sum_len = np.bincount(idx, weights=wlen, minlength=n) \
            .astype(np.int64)
        pairs = pa.table({"i": pa.array(idx), "term": flat})
        ti = pairs.group_by(["i", "term"]).aggregate([([], "count_all")]) \
            ["i"].to_numpy(zero_copy_only=False)
        n_types = np.bincount(ti, minlength=n).astype(np.int64)

        keep_rows = n_tokens > 0
        nt = n_tokens[keep_rows].astype(np.float64)
        sf = n_stop[keep_rows] / nt
        mwl = sum_len[keep_rows] / nt
        ttr = n_types[keep_rows] / nt
        w0, w1, w2, w3, w4 = QC_WEIGHTS
        score = w0 + w1 * sf + w2 * mwl + w3 * ttr + w4 * np.log(1.0 + nt)
        micro = np.floor(1e6 * score).astype(np.int64)
        kept = pa.array(keep_rows)
        return pa.table({
            "doc_id": batch["doc_id"].filter(kept),
            "n_tokens": pa.array(n_tokens[keep_rows]),
            "n_types": pa.array(n_types[keep_rows]),
            "n_stopwords": pa.array(n_stop[keep_rows]),
            "sum_token_len": pa.array(sum_len[keep_rows]),
            "qscore_micro": pa.array(micro),
            "keep": pa.array(micro > 0),
        })


def quality_classifier(ds, concurrency=None):
    return _apply(ds, QualityClassifier, concurrency)


def blocklist_flags(ds, terms: list[str]):
    """Per-source blocklist-filter counts (partial per-batch combine →
    one tiny groupby Sum — at 10^12 docs the exchange is
    n_sources×n_blocks rows)."""
    from ray.data.aggregate import Sum

    flagger = BlocklistFlag(terms)
    return (ds.map_batches(flagger, batch_format="pyarrow")
              .groupby("source")
              .aggregate(Sum("n_flagged", alias_name="n_flagged"),
                         Sum("n_docs", alias_name="n_docs")))
