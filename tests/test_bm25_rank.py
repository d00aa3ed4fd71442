"""rank_topk selection pre-cut ≡ brute-force lexsort, incl. huge tie classes."""

import numpy as np

from snowplow_elasticsearch_loader_ray.bm25 import rank_topk


def _brute(doc_ids, scores, k, score_round=7):
    r = np.round(scores, score_round)
    order = np.lexsort((doc_ids, -r))[:k]
    return doc_ids[order], r[order]


def _check(doc_ids, scores, k):
    d1, s1 = rank_topk(doc_ids, scores, k)
    d2, s2 = _brute(doc_ids, scores, k)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_rank_topk_massive_boundary_ties():
    # saturating head term: 100k docs round to 3 distinct values, the
    # k-th class holds ~all of them → tie-break is doc_id asc
    rng = np.random.default_rng(5)
    n = 100_000
    scores = rng.choice([2.0e-6, 2.1e-6, 2.2e-6], size=n)
    doc_ids = rng.permutation(n).astype(np.int64)
    for k in (1, 10, 100):
        _check(doc_ids, scores, k)


def test_rank_topk_all_one_class():
    doc_ids = np.arange(5_000, 0, -1, dtype=np.int64)
    scores = np.full(5_000, 0.123456789)
    d, s = rank_topk(doc_ids, scores, 10)
    np.testing.assert_array_equal(d, np.arange(1, 11))


def test_rank_topk_random_matches_brute():
    rng = np.random.default_rng(17)
    for n in (3, 50, 700, 20_000):
        scores = rng.random(n)
        # force rounding collisions on part of the range
        scores[: n // 2] = np.round(scores[: n // 2], 2)
        doc_ids = rng.integers(0, 2**62, size=n)
        for k in (1, 7, 10, min(n, 64)):
            _check(doc_ids, scores, k)


def test_rank_topk_k_exceeds_n():
    doc_ids = np.array([5, 3, 9], dtype=np.int64)
    scores = np.array([1.0, 1.0, 2.0])
    d, s = rank_topk(doc_ids, scores, 10)
    np.testing.assert_array_equal(d, [9, 3, 5])
