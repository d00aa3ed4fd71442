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
    """float32 (n, dim) -> strictly-positive int64 (n, dim)."""
    return np.floor(emb.astype(np.float64) * KM_SCALE).astype(np.int64) \
        + KM_OFFSET


def _batch_q(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values)
    dim = len(col[0])
    return ids, quantize(flat.reshape(len(ids), dim))


def _assign(q: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_j ||q - c_j||^2 in exact int64; ties -> smallest j."""
    # (n, k, dim) diff tensor: batch sizes are capped so this stays
    # ~n*k*dim*8 bytes (16 MB at n=4096, k=8, dim=64)
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    j = d.argmin(axis=1)
    return j, d[np.arange(len(q)), j]


def seed_centroids(ds: ray.data.Dataset, k: int) -> np.ndarray:
    """Distributed bottom-k by scrambled vec_id -> (k, dim) int64.

    Each block emits its own k best candidates (a per-block
    argpartition); the driver picks the global k among the tiny
    num_blocks x k candidate set.
    """

    def candidates(batch: pa.Table) -> pa.Table:
        ids, q = _batch_q(batch)
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
           batch_size: int = 4096) -> tuple[ray.data.Dataset, np.ndarray]:
    """Lloyd's iterations over a {vec_id, embedding} Dataset.

    Runs ``iters`` assignment rounds, updating centroids after every
    round but the last; returns (assignments Dataset with columns
    vec_id/cluster/dist_sq, final int64 centroid matrix). Empty
    clusters keep their previous centroid.
    """
    cent = seed_centroids(ds, k)
    dim = cent.shape[1]

    for _ in range(iters - 1):

        def partials(batch: pa.Table, cent_=cent) -> pa.Table:
            _ids, q = _batch_q(batch)
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
        ids, q = _batch_q(batch)
        j, d = _assign(q, final)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(j.astype(np.int64)),
            "dist_sq": pa.array(d.astype(np.int64)),
        })

    out = ds.map_batches(assign_out, batch_format="pyarrow",
                         batch_size=batch_size)
    return out, final
