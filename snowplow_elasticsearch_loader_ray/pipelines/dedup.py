"""Deduplication family: exact, exact n-gram Jaccard, MinHash+LSH, SimHash.

Reference context: the loader's only dedup mechanism is ES
upsert-by-id (``ElasticsearchSink.scala:92``, SURVEY.md W5) — keyed
idempotency, realized here as ``exact_dedup``. The near-dup operators
are the training-data-pipeline extensions (SURVEY.md "beyond the
reference").

Scale notes (each documented on the operator):
- shingling / signatures are vectorized per batch (flat arrays +
  ``reduceat`` segment reductions, no per-doc Python loop);
- candidate generation is a ``groupby`` on a small exploded key
  (band hash / shingle hash / simhash chunk), i.e. the shuffle moves
  fixed-size signature rows — never document text;
- pair verification fetches only candidate docs' features.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import DedupConfig, DEFAULT_DEDUP
from ..tokenizer import tokenize_to_terms
from .analysis import _hash_tokens

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


# --------------------------------------------------------------------------
# exact dedup (hash-partition + per-group min — the W5 upsert analogue)
# --------------------------------------------------------------------------

def content_hash64(text: str) -> int:
    h = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF


class AddContentHash:
    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (content_hash64(t) for t in batch["text"].to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return pa.table({"doc_id": batch["doc_id"], "content_hash": pa.array(hs)})


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Survivors of exact-text dedup: ``(doc_id=min id per text, n_dups)``.

    Pre-hash in map_batches so the groupby shuffles 16-byte rows, not
    document text; the grouped aggregate is Ray's hash shuffle.
    """
    hashed = ds.map_batches(AddContentHash(), batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_dups"),
    )
    return agg.select_columns(["doc_id", "n_dups"])


# --------------------------------------------------------------------------
# shingling (shared by Jaccard + MinHash)
# --------------------------------------------------------------------------

def _mix(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


def distinct_shingles(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch texts → (flat distinct shingle hashes, doc row index, per-row counts).

    k-token shingles hashed to 64 bits; distinct per doc. Docs with
    fewer than k tokens have zero shingles (excluded from Jaccard — the
    oracle mirrors this).
    """
    flat, idx_arr = tokenize_to_terms(texts)
    idx = idx_arr.to_numpy(zero_copy_only=False)
    n = len(texts)
    h = _hash_tokens(flat) if len(flat) else np.empty(0, dtype=np.uint64)
    if len(h) < k:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64),
                np.zeros(n, dtype=np.int64))
    parts = [h[i : len(h) - (k - 1) + i] * np.uint64([_P1, _P2, _P3][i % 3]) for i in range(k)]
    sh = _mix(np.bitwise_xor.reduce(parts))
    same_doc = idx[: len(h) - (k - 1)] == idx[k - 1 :]
    sh = sh[same_doc]
    sdoc = idx[: len(h) - (k - 1)][same_doc]
    # distinct per doc: sort by (doc, hash), drop consecutive dups
    order = np.lexsort((sh, sdoc))
    sh, sdoc = sh[order], sdoc[order]
    keep = np.concatenate(([True], (sh[1:] != sh[:-1]) | (sdoc[1:] != sdoc[:-1])))
    sh, sdoc = sh[keep], sdoc[keep]
    counts = np.bincount(sdoc, minlength=n).astype(np.int64)
    return sh, sdoc.astype(np.int64), counts


class ShingleRows:
    """docs → exploded rows (doc_id, shingle: int64) of distinct shingles."""

    def __init__(self, cfg: DedupConfig = DEFAULT_DEDUP):
        self.k = cfg.shingle_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh, sdoc, _ = distinct_shingles(batch["text"], self.k)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_ids[sdoc], type=pa.int64()),
            "shingle": pa.array(sh.view(np.int64)),
        })


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs (oracle-checkable)
# --------------------------------------------------------------------------

def _pairs_in_group(g: pa.Table) -> pa.Table:
    """All (a<b) doc pairs sharing this shingle, vectorized."""
    ids = np.sort(g["doc_id"].to_numpy(zero_copy_only=False))
    m = len(ids)
    if m < 2:
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64())})
    ai, bi = np.triu_indices(m, k=1)
    return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})


def jaccard_dup_pairs(ds: ray.data.Dataset, cfg: DedupConfig = DEFAULT_DEDUP,
                      threshold: float | None = None) -> pa.Table:
    """Exact word-k-gram Jaccard duplicate pairs (jaccard >= threshold).

    Distributed plan: explode distinct shingles → ``groupby(shingle)``
    emits co-occurring pairs → ``groupby(pair)`` counts = |A∩B| →
    |A|,|B| from per-doc shingle counts (small, broadcast) → filter.
    The shuffle key is the 8-byte shingle hash; pair explosion is
    quadratic only within one shingle's group (rare-shingle groups are
    tiny; a production corpus would drop ultra-common shingles — at this
    exactness-checked tier no cap is applied).

    Returns a pyarrow Table (small result): doc_id_a, doc_id_b,
    intersection, union, jaccard.
    """
    t = threshold if threshold is not None else cfg.jaccard_threshold
    sh = ds.map_batches(ShingleRows(cfg), batch_format="pyarrow")
    # per-doc set sizes (drives |A|+|B|): small table → driver dict
    sizes_tbl = sh.groupby("doc_id").aggregate(Count(alias_name="n_shingles")).to_pandas()
    sizes = dict(zip(sizes_tbl["doc_id"], sizes_tbl["n_shingles"]))
    pairs = (
        sh.groupby("shingle")
        .map_groups(_pairs_in_group, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="intersection"))
        .to_pandas()
    )
    if len(pairs) == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "intersection": pa.array([], pa.int64()),
                         "union": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    inter = pairs["intersection"].to_numpy().astype(np.int64)
    na = np.array([sizes[x] for x in a], dtype=np.int64)
    nb = np.array([sizes[x] for x in b], dtype=np.int64)
    union = na + nb - inter
    jac = inter / union
    keep = jac >= t
    order = np.lexsort((b[keep], a[keep]))
    return pa.table({
        "doc_id_a": pa.array(a[keep][order], type=pa.int64()),
        "doc_id_b": pa.array(b[keep][order], type=pa.int64()),
        "intersection": pa.array(inter[keep][order]),
        "union": pa.array(union[keep][order]),
        "jaccard": pa.array(jac[keep][order], type=pa.float64()),
    })


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (approximate candidates, exact verification)
# --------------------------------------------------------------------------

class MinHashBands:
    """docs → LSH band rows (doc_id, band, band_hash).

    num_perm permutations h'_p = a_p*h + b_p over distinct shingle
    hashes (wrapping uint64 universal-ish hashing), min per doc via
    ``minimum.reduceat``; bands of ``num_perm // num_bands`` rows are
    combined into one 64-bit band hash.
    """

    def __init__(self, cfg: DedupConfig = DEFAULT_DEDUP):
        self.cfg = cfg
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, 2**63, size=cfg.num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, size=cfg.num_perm, dtype=np.uint64)

    def signatures(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """→ (doc row indices with >=1 shingle, sig matrix [n_docs_kept, num_perm])."""
        sh, sdoc, counts = distinct_shingles(texts, self.cfg.shingle_size)
        kept = np.nonzero(counts > 0)[0]
        if len(kept) == 0:
            return kept, np.empty((0, self.cfg.num_perm), dtype=np.uint64)
        starts = np.concatenate(([0], np.cumsum(counts[kept])[:-1]))
        sig = np.empty((len(kept), self.cfg.num_perm), dtype=np.uint64)
        for p in range(self.cfg.num_perm):
            y = self.a[p] * sh + self.b[p]
            sig[:, p] = np.minimum.reduceat(y, starts)
        return kept, sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        kept, sig = self.signatures(batch["text"])
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[kept]
        nb = self.cfg.num_bands
        rows = self.cfg.num_perm // nb
        bh = np.zeros((len(kept), nb), dtype=np.uint64)
        for r in range(rows):
            bh = _mix(bh ^ (sig[:, np.arange(nb) * rows + r] * _P2))
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, nb), type=pa.int64()),
            "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(kept))),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
        })


def _candidate_pairs(g: pa.Table) -> pa.Table:
    ids = np.unique(g["doc_id"].to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    ai, bi = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})


def minhash_lsh_pairs(ds: ray.data.Dataset, cfg: DedupConfig = DEFAULT_DEDUP) -> pa.Table:
    """Near-dup pairs: LSH candidates → exact-Jaccard verification.

    Candidate generation is fully distributed (band-hash groupby);
    verification re-shingles only candidate docs. The candidate set is
    assumed driver-small (near-dup pairs are rare); at larger rates the
    verify step becomes a shingle join keyed by pair — same primitives.
    """
    bands = ds.map_batches(MinHashBands(cfg), batch_format="pyarrow")
    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(_candidate_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
        .to_pandas()
    )
    if len(cand) == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    involved = pa.array(sorted(set(cand["a"]) | set(cand["b"])), type=pa.int64())

    def _only_candidates(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=involved))

    # re-shingle only the candidate docs (vectorized semi-join filter —
    # the broadcast-key-set pattern), then verify exact Jaccard
    sets: dict[int, set] = {}
    for b in ds.map_batches(_only_candidates, batch_format="pyarrow").map_batches(
        ShingleRows(cfg), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for d, s in zip(b["doc_id"].to_pylist(), b["shingle"].to_pylist()):
            sets.setdefault(d, set()).add(s)
    out_a, out_b, out_j = [], [], []
    for a, b_ in sorted(zip(cand["a"], cand["b"])):
        sa, sb = sets.get(a, set()), sets.get(b_, set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= cfg.jaccard_threshold:
            out_a.append(a); out_b.append(b_); out_j.append(j)
    return pa.table({
        "doc_id_a": pa.array(out_a, type=pa.int64()),
        "doc_id_b": pa.array(out_b, type=pa.int64()),
        "jaccard": pa.array(out_j, type=pa.float64()),
    })


def dedup_survivors(ds: ray.data.Dataset, cfg: DedupConfig = DEFAULT_DEDUP) -> pa.Table:
    """Keep-one-per-near-dup-cluster: the standard training-data pruning.

    MinHash+LSH pairs → union-find connected components (driver-side:
    the pair set is tiny relative to the corpus — near-dup clusters at
    web scale are <<1% of docs; the doc UNIVERSE never leaves the
    cluster) → survivor = min doc_id per cluster. Returns
    ``(doc_id, cluster_root, is_survivor)`` for every doc involved in
    at least one near-dup pair; docs with no pair are implicitly
    survivors.
    """
    pairs = minhash_lsh_pairs(ds, cfg)
    a = pairs["doc_id_a"].to_numpy(zero_copy_only=False)
    b = pairs["doc_id_b"].to_numpy(zero_copy_only=False)
    ids = np.unique(np.concatenate([a, b]))
    parent = dict(zip(ids.tolist(), ids.tolist()))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.array([find(int(i)) for i in ids], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "cluster_root": pa.array(roots),
        "is_survivor": pa.array(ids == roots),
    })


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

class SimHash:
    """docs → (doc_id, simhash: int64): tf-weighted 64-bit simhash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, idx_arr = tokenize_to_terms(batch["text"])
        idx = idx_arr.to_numpy(zero_copy_only=False)
        n = batch.num_rows
        fp = np.zeros(n, dtype=np.uint64)
        if len(flat):
            h = _hash_tokens(flat)
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            contrib = bits.astype(np.int32) * 2 - 1          # ±1 per bit
            counts = np.bincount(idx, minlength=n)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            nz = counts > 0
            acc = np.add.reduceat(contrib, starts[nz], axis=0)
            sig_bits = (acc > 0).astype(np.uint8)
            packed = np.packbits(sig_bits, axis=1, bitorder="little").copy().view(np.uint64)
            fp[nz] = packed.reshape(-1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(fp.view(np.int64)),
        })


def simhash_pairs(ds: ray.data.Dataset, cfg: DedupConfig = DEFAULT_DEDUP) -> pa.Table:
    """Pairs with hamming(simhash) <= max_hamming via pigeonhole bucketing.

    4 × 16-bit chunks: any pair within hamming 3 shares at least one
    chunk (pigeonhole), so candidates come from 4 chunk-equality
    bucketings — the SimHash analogue of LSH banding. Signatures are
    computed distributed (vectorized map_batches, 16 B/doc output); the
    signature table is then bucketed here on the driver, which holds to
    ~10^8 docs — beyond that the same chunk keys go through
    ``groupby(chunk)`` like the MinHash band rows do.
    """
    sigs = ds.map_batches(SimHash(), batch_format="pyarrow").to_pandas()
    ids = sigs["doc_id"].to_numpy()
    sh = sigs["simhash"].to_numpy().view(np.uint64)
    seen: set[tuple[int, int]] = set()
    out_a, out_b, out_h = [], [], []
    for c in range(4):
        chunk = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        cs = chunk[order]
        bounds = np.nonzero(np.concatenate(([True], cs[1:] != cs[:-1])))[0]
        bounds = np.concatenate((bounds, [len(cs)]))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:
                continue
            grp = order[lo:hi]
            for x, y in combinations(sorted(ids[grp].tolist()), 2):
                if (x, y) in seen:
                    continue
                seen.add((x, y))
        # verification below uses `seen` accumulated across chunks
    id_to_sig = dict(zip(ids.tolist(), sh.tolist()))
    for x, y in sorted(seen):
        d = int(bin(id_to_sig[x] ^ id_to_sig[y]).count("1"))
        if d <= cfg.simhash_max_hamming:
            out_a.append(x); out_b.append(y); out_h.append(d)
    return pa.table({
        "doc_id_a": pa.array(out_a, type=pa.int64()),
        "doc_id_b": pa.array(out_b, type=pa.int64()),
        "hamming": pa.array(out_h, type=pa.int32()),
    })
