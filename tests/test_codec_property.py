"""Property-based codec tests (hypothesis): round-trip for arbitrary
sorted posting lists, block skipping consistency, width edge cases."""

import numpy as np
from hypothesis import given, settings, strategies as st

from snowplow_elasticsearch_loader_ray.codec import PostingList, encode_postings

gaps_strategy = st.lists(
    st.integers(min_value=1, max_value=1 << 40), min_size=1, max_size=700)
tfs_value = st.integers(min_value=0, max_value=(1 << 31) - 1)


@settings(max_examples=60, deadline=None)
@given(gaps=gaps_strategy, data=st.data(),
       block_size=st.sampled_from([4, 128, 256]),
       start=st.integers(min_value=0, max_value=1 << 60))
def test_roundtrip_arbitrary_lists(gaps, data, block_size, start):
    docs = start + np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(
        data.draw(st.lists(tfs_value, min_size=len(gaps), max_size=len(gaps))),
        dtype=np.int64)
    buf = encode_postings(docs, tfs, block_size=block_size)
    pl = PostingList(buf)
    d, t = pl.decode_all()
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    # block-max metadata is exact
    for bi in range(pl.n_blocks):
        bd, bt = pl.decode_block(bi)
        assert pl.last_doc[bi] == bd[-1]
        assert pl.max_tf[bi] == bt.max()
    # skip pointers: first_block_geq finds the containing block
    for probe in [int(docs[0]), int(docs[-1]), int(docs[len(docs) // 2])]:
        bi = pl.first_block_geq(probe)
        assert bi < pl.n_blocks and pl.last_doc[bi] >= probe


@settings(max_examples=30, deadline=None)
@given(n=st.integers(min_value=1, max_value=600))
def test_dense_doc_ids_zero_gaps(n):
    """Consecutive doc_ids → gap-1 coding stores zeros (1-byte width)."""
    docs = np.arange(1000, 1000 + n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    pl = PostingList(encode_postings(docs, tfs))
    d, t = pl.decode_all()
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)


def test_tf_overflow_rejected():
    import pytest
    with pytest.raises(ValueError, match="int32"):
        encode_postings(np.array([1], dtype=np.int64),
                        np.array([1 << 31], dtype=np.int64))
