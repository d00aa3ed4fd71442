"""Benchmark decontamination: broadcast-probe overlap vs planted grams,
and the shingle-hash permutation-collision regression."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from snowplow_elasticsearch_loader_ray.pipelines import contamination as C
from snowplow_elasticsearch_loader_ray.pipelines.dedup import distinct_shingles


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_shingle_hash_not_permutation_invariant():
    # with k=5, positions 0 and 3 must use DIFFERENT multipliers: the
    # old [i % 3] cycle hashed "a b c a x"-style position swaps equal
    a = pa.array(["alpha beta gamma delta epsilon"])
    b = pa.array(["delta beta gamma alpha epsilon"])  # swap pos 0 <-> 3
    ha, _, _ = distinct_shingles(a, k=5)
    hb, _, _ = distinct_shingles(b, k=5)
    assert len(ha) == len(hb) == 1
    assert ha[0] != hb[0]


def test_k3_hashes_unchanged_by_k5_fix():
    # the k=3 path (jaccard/minhash/simhash) keeps its original constants
    t = pa.array(["one two three four"])
    h, _, _ = distinct_shingles(t, k=3)
    assert len(h) == 2 and h[0] != h[1]


def test_contamination_flags_planted():
    shared = "quick brown fox jumps over"          # one 5-gram
    train = _ds([
        (1, f"start {shared} end of the doc"),     # contaminated
        (2, "totally unrelated words only here now friend"),
        (3, f"{shared} {shared}"),                 # dup gram counted once
    ])
    ev = _ds([(100, f"benchmark includes {shared} verbatim text")])
    out = (C.contamination_flags(train, ev, k=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_overlap"].tolist() == [1, 1]


def test_contamination_empty_eval():
    train = _ds([(1, "some words that make five grams easily here")])
    ev = _ds([(9, "ab")])  # < k tokens -> zero grams
    out = C.contamination_flags(train, ev, k=5).to_pandas()
    assert len(out) == 0


def test_eval_gram_cap_fails_loudly():
    ev = _ds([(1, "a b c d e f g h i j k l m n o p")])
    with pytest.raises(ValueError, match="max_eval_grams"):
        C.eval_gram_hashes(ev, k=5, max_eval_grams=3)
