"""The one BM25 formula, shared by the engine, the oracle and the bench.

Fixed parameters k1=1.2, b=0.75 (SURVEY.md §7.4 "BM25 reproducibility").
Lucene-style idf (always positive)::

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Ranking is by ``round(score, SCORE_ROUND)`` descending, then doc_id
ascending — the documented deterministic tie-break that makes
"rank-identical" well-defined across float summation orders
(engine numpy vs DuckDB oracle).
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75
SCORE_ROUND = 7


def idf(n_docs: float, df: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight(tf: np.ndarray, doclen: np.ndarray, avgdl: float,
              k1: float = K1, b: float = B) -> np.ndarray:
    """Vectorized tf part; tf/doclen may be numpy arrays or scalars."""
    tf = np.asarray(tf, dtype=np.float64)
    doclen = np.asarray(doclen, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


def upper_bound(idf_t: float, max_tf: int, k1: float = K1, b: float = B) -> float:
    """Block score upper bound from block-max tf.

    tf_weight is increasing in tf and decreasing in doclen; dl→0 gives
    the supremum ``max_tf*(k1+1)/(max_tf + k1*(1-b))``. Looser than an
    exact precomputed block-max score but always a valid bound (used by
    block-max WAND skipping; see stages/segment.py for the metadata).
    """
    return idf_t * max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b))


def rank_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int,
              score_round: int = SCORE_ROUND) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (round(score) desc, doc_id asc); returns (doc_ids, rounded scores)."""
    if k <= 0:
        # size=0 is a legal ES request (aggs-only search): no hits
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    r = np.round(scores, score_round)
    if len(r) > 4 * k + 64:
        # pre-cut with selections, never a sort over the tie class:
        # everything STRICTLY above the k-th rounded score survives
        # (< k rows by construction), and the k-th-score boundary class
        # — which can hold 10^5+ docs when a saturating head term
        # rounds to few distinct values — contributes only its m
        # smallest doc_ids via argpartition. Identical result to
        # lexsorting all candidates.
        kth = np.partition(r, len(r) - k)[len(r) - k]
        above = np.nonzero(r > kth)[0]
        bnd = np.nonzero(r == kth)[0]
        m = k - len(above)
        if m > 0 and len(bnd) > m:
            bnd = bnd[np.argpartition(doc_ids[bnd], m - 1)[:m]]
        sel = np.concatenate((above, bnd))
        doc_ids, r = doc_ids[sel], r[sel]
    order = np.lexsort((doc_ids, -r))
    top = order[:k]
    return doc_ids[top], r[top]
