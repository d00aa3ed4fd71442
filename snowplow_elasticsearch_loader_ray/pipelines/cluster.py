"""Distributed k-means over embedding columns (training-data curation:
cluster-conditioned sampling / SemDeDup-style bucketing / DCLM-shaped
corpus maps all start from "assign every document to a centroid").

Exactness contract (what makes the result hash-reproducible across any
cluster size, block order or batch size — the same discipline as the
engine's micro-unit float entries):

- Embeddings are QUANTIZED once: ``q_i = floor(e_i * 1e6) + 2^20`` per
  dimension (int64, strictly positive — the shift makes floor division
  and truncating division agree everywhere, and distances are
  shift-invariant).
- Per-cluster partial sums are INTEGER sums — order-free and exact, so
  the Ray reduction over blocks is associative by construction.
- Centroids are the elementwise floor ``sum // count`` (int64) — no
  float enters the loop, so a DuckDB replay of the same arithmetic is
  bit-identical (the kmeans oracle in driver_queries unrolls the
  iterations as chained CTEs).
- Assignment is ``argmin_j ||q - c_j||^2`` with ties to the smallest
  ``j`` (numpy argmin's first-occurrence rule == the SQL
  ``ORDER BY d, j`` window).

Scale plan (100 TB): each iteration is ONE streaming pass of
``map_batches`` over the embedding table — no shuffle at all. Only the
k x dim int64 centroid matrix (a few KB) is broadcast per iteration,
and only num_blocks x k tiny partial rows return to the driver for the
combine. Seeding is a distributed bottom-k over a Knuth-scrambled id
(per-block candidates, driver picks k). Assignments stream out as a
Dataset; nothing corpus-sized ever materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

#: fixed-point scale for embedding quantization (1e-6 resolution)
KM_SCALE = 1_000_000
#: positivity shift: |floor(e * 1e6)| < 2^20 for any |e| < 1.048
KM_OFFSET = 1 << 20
#: Knuth multiplicative seeding scramble (vec_ids are sequential);
#: residue reduced mod 2^31 BEFORE the multiply so the product stays
#: inside int64/BIGINT on both sides (same rule as mixture_sample)
KM_HASH_MUL = 2654435761
KM_RES_MOD = 2**31
KM_HASH_MOD = 2**32


def quantize(emb: np.ndarray) -> np.ndarray:
    """float32 (n, dim) -> strictly-positive int64 (n, dim).

    The positivity invariant (|e| < 2^20 / 1e6 = 1.048576) is what
    makes numpy's FLOOR division agree with DuckDB's TRUNCATING ``//``
    throughout the oracle replay — enforce it loudly rather than let
    one out-of-range component silently break engine/oracle parity."""
    q = np.floor(emb.astype(np.float64) * KM_SCALE).astype(np.int64) \
        + KM_OFFSET
    if len(q) and q.min() < 0:
        raise ValueError(
            f"embedding component below -{KM_OFFSET / KM_SCALE}: "
            f"min quantized value {q.min() - KM_OFFSET} breaks the "
            "positive-domain floor-division contract")
    return q


def _batch_q(batch: pa.Table, dim_slice: tuple[int, int] | None = None
             ) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values)
    dim = len(col[0])
    q = quantize(flat.reshape(len(ids), dim))
    if dim_slice is not None:
        q = q[:, dim_slice[0]:dim_slice[1]]
    return ids, q


def _assign(q: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_j ||q - c_j||^2 in exact int64; ties -> smallest j."""
    # (n, k, dim) diff tensor: batch sizes are capped so this stays
    # ~n*k*dim*8 bytes (16 MB at n=4096, k=8, dim=64)
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    j = d.argmin(axis=1)
    return j, d[np.arange(len(q)), j]


def seed_centroids(ds: ray.data.Dataset, k: int,
                   dim_slice: tuple[int, int] | None = None) -> np.ndarray:
    """Distributed bottom-k by scrambled vec_id -> (k, dim) int64.

    Each block emits its own k best candidates (a per-block
    argpartition); the driver picks the global k among the tiny
    num_blocks x k candidate set.
    """

    def candidates(batch: pa.Table) -> pa.Table:
        ids, q = _batch_q(batch, dim_slice)
        key = (ids.astype(np.uint64) % KM_RES_MOD * KM_HASH_MUL) \
            % KM_HASH_MOD
        take = min(k, len(ids))
        part = np.lexsort((ids, key))[:take]
        return pa.table({
            "skey": pa.array(key[part].astype(np.int64)),
            "vec_id": pa.array(ids[part]),
            "q": pa.array(list(q[part]), pa.list_(pa.int64())),
        })

    cand = ds.map_batches(candidates, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: (r["skey"], r["vec_id"]))
    return np.array([r["q"] for r in cand[:k]], dtype=np.int64)


def kmeans(ds: ray.data.Dataset, k: int, iters: int,
           batch_size: int = 4096,
           dim_slice: tuple[int, int] | None = None
           ) -> tuple[ray.data.Dataset, np.ndarray]:
    """Lloyd's iterations over a {vec_id, embedding} Dataset.

    Runs ``iters`` assignment rounds, updating centroids after every
    round but the last; returns (assignments Dataset with columns
    vec_id/cluster/dist_sq, final int64 centroid matrix). Empty
    clusters keep their previous centroid.
    """
    cent = seed_centroids(ds, k, dim_slice)
    dim = cent.shape[1]

    for _ in range(iters - 1):

        def partials(batch: pa.Table, cent_=cent) -> pa.Table:
            _ids, q = _batch_q(batch, dim_slice)
            j, _d = _assign(q, cent_)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, j, q)
            counts = np.bincount(j, minlength=k).astype(np.int64)
            live = counts > 0
            return pa.table({
                "j": pa.array(np.arange(k, dtype=np.int64)[live]),
                "n": pa.array(counts[live]),
                "s": pa.array(list(sums[live]), pa.list_(pa.int64())),
            })

        rows = ds.map_batches(partials, batch_format="pyarrow",
                              batch_size=batch_size).take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["j"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["j"]] += r["n"]
        live = counts > 0
        nxt = cent.copy()
        nxt[live] = sums[live] // counts[live, None]
        cent = nxt

    final = cent

    def assign_out(batch: pa.Table) -> pa.Table:
        ids, q = _batch_q(batch, dim_slice)
        j, d = _assign(q, final)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(j.astype(np.int64)),
            "dist_sq": pa.array(d.astype(np.int64)),
        })

    out = ds.map_batches(assign_out, batch_format="pyarrow",
                         batch_size=batch_size)
    return out, final


def pq_codes(ds: ray.data.Dataset, dim: int, m: int, k: int, iters: int,
             batch_size: int = 4096
             ) -> tuple[list[ray.data.Dataset], list[np.ndarray]]:
    """Product-quantization training: split the ``dim`` dimensions into
    ``m`` contiguous subspaces, train an independent exact-integer
    k-means codebook per subspace, and emit per-vector codes.

    Returns (per-subspace assignment Datasets with columns
    vec_id/cluster/dist_sq, per-subspace (k, dim/m) codebooks). The
    asymmetric-distance (ADC) approximation of ||a - b||^2 is then
    ``sum_m ||a_m - c_{m,code_m(b)}||^2`` — still EXACT integer
    arithmetic given the quantized inputs, which is what lets the PQ
    path carry a value oracle instead of a recall grader. This is the
    IVF-PQ scale path: at 10^12 vectors the codes (m bytes/vector at
    k<=256) replace the raw embeddings in the candidate scan.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    outs, books = [], []
    for i in range(m):
        out, cent = kmeans(ds, k, iters, batch_size=batch_size,
                           dim_slice=(i * w, (i + 1) * w))
        outs.append(out)
        books.append(cent)
    return outs, books


def pq_adc_topk(ds: ray.data.Dataset, books: list[np.ndarray],
                queries_q: np.ndarray, k: int,
                batch_size: int = 4096) -> pa.Table:
    """Asymmetric-distance (ADC) top-k: corpus vectors are represented
    ONLY by their PQ codes; each query precomputes an (M, K) integer
    distance table against the codebooks and a vector's approximate
    squared distance is the M-way table-gather sum. Exact int64
    arithmetic end to end, so ranks (dist asc, vec_id asc) carry a
    value oracle. Per batch: one code assignment + one fancy-indexed
    gather; per-block bottom-k candidates reduce to a tiny
    n_blocks x n_queries x k table."""
    m = len(books)
    w = books[0].shape[1]
    nq = len(queries_q)
    # (nq, M, K) int64 table: ||q_sub - c_{sub,j}||^2
    dtab = np.stack([
        ((queries_q[:, None, i * w:(i + 1) * w]
          - books[i][None, :, :]) ** 2).sum(axis=2)
        for i in range(m)], axis=1)
    bref = ray.put((np.stack(books), dtab))

    class _Cand:
        def __init__(self):
            self.books, self.dtab = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, q = _batch_q(batch)
            n = len(ids)
            dist = np.zeros((nq, n), dtype=np.int64)
            for i in range(m):
                j, _ = _assign(q[:, i * w:(i + 1) * w], self.books[i])
                dist += self.dtab[:, i, j]
            take = min(k, n)
            qid_c, id_c, d_c = [], [], []
            for qi in range(nq):
                best = np.lexsort((ids, dist[qi]))[:take]
                qid_c.append(np.full(take, qi, dtype=np.int64))
                id_c.append(ids[best])
                d_c.append(dist[qi][best])
            return pa.table({
                "query_id": pa.array(np.concatenate(qid_c)),
                "vec_id": pa.array(np.concatenate(id_c)),
                "adc_dist": pa.array(np.concatenate(d_c)),
            })

    cand = pa.concat_tables(list(
        ds.map_batches(_Cand, batch_format="pyarrow",
                       batch_size=batch_size, concurrency=2)
          .iter_batches(batch_format="pyarrow", batch_size=None)))
    qid = cand["query_id"].to_numpy(zero_copy_only=False)
    ids = cand["vec_id"].to_numpy(zero_copy_only=False)
    d = cand["adc_dist"].to_numpy(zero_copy_only=False)
    rows = []
    for qi in range(nq):
        msk = np.nonzero(qid == qi)[0]
        best = msk[np.lexsort((ids[msk], d[msk]))[:k]]
        for r, b in enumerate(best, 1):
            rows.append((qi, r, ids[b], d[b]))
    c = list(zip(*rows)) if rows else [[], [], [], []]
    return pa.table({
        "query_id": pa.array(c[0], pa.int64()),
        "rank": pa.array(c[1], pa.int64()),
        "vec_id": pa.array(c[2], pa.int64()),
        "adc_dist": pa.array(c[3], pa.int64()),
    })


def pq_refine_topk(ds: ray.data.Dataset, books: list[np.ndarray],
                   queries_q: np.ndarray, k: int, expand: int = 4,
                   batch_size: int = 4096) -> pa.Table:
    """Two-stage ANN serving (the production PQ pattern): the ADC scan
    shortlists ``expand * k`` candidates per query from codes alone,
    then ONLY those candidates' true (quantized) vectors are touched
    for an exact re-rank. The refine pass streams the corpus once with
    the tiny (query -> candidate-id set) broadcast — at scale it is a
    semi-join read of k' rows per query, not a second full scan of
    raw vectors. Exact int64 end to end (full value oracle)."""
    cand = pq_adc_topk(ds, books, queries_q, k=expand * k,
                       batch_size=batch_size)
    nq = len(queries_q)
    cq = cand["query_id"].to_numpy(zero_copy_only=False)
    cv = cand["vec_id"].to_numpy(zero_copy_only=False)
    cand_sets = [np.sort(cv[cq == qi]) for qi in range(nq)]
    ref = ray.put((queries_q, cand_sets))

    class _Refine:
        def __init__(self):
            self.qq, self.cands = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .query import isin_sorted

            ids, q = _batch_q(batch)
            qid_c, id_c, d_c = [], [], []
            for qi, cset in enumerate(self.cands):
                if not len(cset):
                    continue
                m = np.nonzero(isin_sorted(cset, ids))[0]
                if not len(m):
                    continue
                d = ((q[m] - self.qq[qi][None, :]) ** 2).sum(axis=1)
                qid_c.append(np.full(len(m), qi, dtype=np.int64))
                id_c.append(ids[m])
                d_c.append(d)
            if not qid_c:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "dist_sq": pa.array([], pa.int64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(qid_c)),
                "vec_id": pa.array(np.concatenate(id_c)),
                "dist_sq": pa.array(np.concatenate(d_c)),
            })

    exact = pa.concat_tables(list(
        ds.map_batches(_Refine, batch_format="pyarrow",
                       batch_size=batch_size, concurrency=2)
          .iter_batches(batch_format="pyarrow", batch_size=None)))
    qid = exact["query_id"].to_numpy(zero_copy_only=False)
    ids = exact["vec_id"].to_numpy(zero_copy_only=False)
    d = exact["dist_sq"].to_numpy(zero_copy_only=False)
    rows = []
    for qi in range(nq):
        msk = np.nonzero(qid == qi)[0]
        best = msk[np.lexsort((ids[msk], d[msk]))[:k]]
        for r, b in enumerate(best, 1):
            rows.append((qi, r, ids[b], d[b]))
    c = list(zip(*rows)) if rows else [[], [], [], []]
    return pa.table({
        "query_id": pa.array(c[0], pa.int64()),
        "rank": pa.array(c[1], pa.int64()),
        "vec_id": pa.array(c[2], pa.int64()),
        "dist_sq": pa.array(c[3], pa.int64()),
    })


def ivf_pq_topk(ds: ray.data.Dataset, coarse: np.ndarray,
                books: list[np.ndarray], queries_q: np.ndarray,
                nprobe: int, k: int,
                batch_size: int = 4096) -> pa.Table:
    """IVF-PQ: each query ranks the coarse cells by exact integer
    distance and probes only the ``nprobe`` nearest (ties: smallest
    cell); candidates in probed cells score by the PQ ADC gather-sum.
    At scale the coarse assignment is the IVF partition key — probed
    cells map to a block-pruned read instead of the full scan this
    single-table fixture does; the per-batch math is identical.
    Deterministic end to end (probing an empty cell is allowed and
    contributes nothing), so the full pipeline carries a value
    oracle."""
    m = len(books)
    w = books[0].shape[1]
    nq = len(queries_q)
    # per-query probed cell sets, ranked by exact distance then cell id
    cd = ((queries_q[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    probed = np.zeros((nq, coarse.shape[0]), dtype=bool)
    for qi in range(nq):
        cells = np.lexsort((np.arange(coarse.shape[0]), cd[qi]))[:nprobe]
        probed[qi, cells] = True
    dtab = np.stack([
        ((queries_q[:, None, i * w:(i + 1) * w]
          - books[i][None, :, :]) ** 2).sum(axis=2)
        for i in range(m)], axis=1)
    bref = ray.put((coarse, np.stack(books), dtab, probed))

    class _Cand:
        def __init__(self):
            (self.coarse, self.books, self.dtab, self.probed) = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, q = _batch_q(batch)
            n = len(ids)
            cell, _ = _assign(q, self.coarse)
            dist = np.zeros((nq, n), dtype=np.int64)
            for i in range(m):
                j, _ = _assign(q[:, i * w:(i + 1) * w], self.books[i])
                dist += self.dtab[:, i, j]
            qid_c, id_c, d_c = [], [], []
            for qi in range(nq):
                cand = np.nonzero(self.probed[qi][cell])[0]
                best = cand[np.lexsort((ids[cand], dist[qi][cand]))[:k]]
                qid_c.append(np.full(len(best), qi, dtype=np.int64))
                id_c.append(ids[best])
                d_c.append(dist[qi][best])
            return pa.table({
                "query_id": pa.array(np.concatenate(qid_c)),
                "vec_id": pa.array(np.concatenate(id_c)),
                "adc_dist": pa.array(np.concatenate(d_c)),
            })

    cand = pa.concat_tables(list(
        ds.map_batches(_Cand, batch_format="pyarrow",
                       batch_size=batch_size, concurrency=2)
          .iter_batches(batch_format="pyarrow", batch_size=None)))
    qid = cand["query_id"].to_numpy(zero_copy_only=False)
    ids = cand["vec_id"].to_numpy(zero_copy_only=False)
    d = cand["adc_dist"].to_numpy(zero_copy_only=False)
    rows = []
    for qi in range(nq):
        msk = np.nonzero(qid == qi)[0]
        best = msk[np.lexsort((ids[msk], d[msk]))[:k]]
        for r, b in enumerate(best, 1):
            rows.append((qi, r, ids[b], d[b]))
    c = list(zip(*rows)) if rows else [[], [], [], []]
    return pa.table({
        "query_id": pa.array(c[0], pa.int64()),
        "rank": pa.array(c[1], pa.int64()),
        "vec_id": pa.array(c[2], pa.int64()),
        "adc_dist": pa.array(c[3], pa.int64()),
    })
