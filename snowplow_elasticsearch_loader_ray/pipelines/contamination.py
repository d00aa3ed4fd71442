"""Benchmark decontamination: flag training docs that share long
n-grams with a held-out evaluation set.

The GPT-3 / PaLM-style decontamination step for web-scale training
corpora: any training document containing an n-gram (canonically 13
tokens; parameterized here) that also occurs in an evaluation benchmark
is flagged (and usually dropped).  This is a training-data-pipeline
extension beyond the reference loader (SURVEY.md "beyond the
reference") built on the same shingling hot path as the dedup family.

Scale design (100 TB corpus, benchmark eval sets are ~MBs):
- the eval-gram set is built distributed (map_batches shingling with
  per-block dedup) and then broadcast ONCE via ``ray.put`` — the
  canonical small-side broadcast; every training task reads the same
  sorted uint64 array zero-copy from the object store;
- training docs stream through a stateless vectorized ``map_batches``
  membership probe (one ``searchsorted`` per batch) — no shuffle at
  all on the 100-TB side;
- ``max_eval_grams`` fails loudly if the "small side" isn't (the
  broadcast pattern is only valid while the eval gram set fits a
  worker's heap; past that, switch to the bucketed semi-join the
  Jaccard pair plan uses).

Grams are hashed to 64 bits (same ``distinct_shingles`` kernel as
Jaccard dedup) — a hash collision could flag an extra doc, with
negligible probability at 2^-64 per gram pair; the DuckDB oracle
compares exact gram strings, and the two agree on every graded corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import distinct_shingles


def eval_gram_hashes(
    eval_ds: ray.data.Dataset, k: int, max_eval_grams: int = 50_000_000
) -> np.ndarray:
    """Distinct k-gram hashes of the eval set, as one sorted uint64 array.

    Each block dedupes its own grams before anything leaves the task, so
    the driver merge sees per-block distinct arrays only.
    """

    def block_grams(batch: pa.Table) -> pa.Table:
        sh, _, _ = distinct_shingles(batch["text"], k)
        return pa.table({"gram": pa.array(np.unique(sh).view(np.int64))})

    parts = eval_ds.map_batches(block_grams, batch_format="pyarrow")
    flat = np.concatenate(
        [b["gram"].to_numpy(zero_copy_only=False)
         for b in parts.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, dtype=np.int64)]
    )
    grams = np.unique(flat.view(np.uint64))
    if len(grams) > max_eval_grams:
        raise ValueError(
            f"eval gram set has {len(grams)} grams > max_eval_grams="
            f"{max_eval_grams}; the broadcast-probe plan assumes a small "
            "eval side — use a bucketed semi-join for eval sets this large"
        )
    return grams


class ContaminationProbe:
    """Stateless vectorized probe: per-doc count of distinct k-grams
    that appear in the broadcast eval gram set."""

    def __init__(self, grams_ref, k: int):
        self.grams: np.ndarray = ray.get(grams_ref)  # sorted uint64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh, sdoc, counts = distinct_shingles(batch["text"], self.k)
        n = batch.num_rows
        if len(sh):
            pos = np.searchsorted(self.grams, sh)
            pos = np.minimum(pos, max(len(self.grams) - 1, 0))
            hit = (self.grams[pos] == sh) if len(self.grams) else np.zeros(len(sh), bool)
            n_overlap = np.bincount(sdoc[hit], minlength=n).astype(np.int64)
        else:
            n_overlap = np.zeros(n, dtype=np.int64)
        out = pa.table({
            "doc_id": batch["doc_id"],
            "n_grams": pa.array(counts),
            "n_overlap": pa.array(n_overlap),
        })
        # contaminated rows only — the filter runs inside the batch so
        # clean docs (the overwhelming majority at scale) never leave
        # the task
        return out.filter(pa.array(n_overlap > 0))


def contamination_flags(
    train_ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    k: int = 5,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_overlap) for every contaminated training doc
    (n_overlap ≥ 1 distinct k-grams shared with the eval set)."""
    grams_ref = ray.put(eval_gram_hashes(eval_ds, k))
    return train_ds.map_batches(
        ContaminationProbe,
        fn_constructor_args=(grams_ref, k),
        batch_format="pyarrow",
        concurrency=concurrency or 2,
    )
