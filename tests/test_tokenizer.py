import numpy as np
import pyarrow as pa

from snowplow_elasticsearch_loader_ray.tokenizer import (
    doc_term_frequencies, term_shard_one, term_shards, token_counts, doc_shard,
)


def test_doc_term_frequencies_basic():
    texts = pa.array(["Hello, World! hello 42", "", "foo-bar FOO foo"])
    doc_ids = np.array([10, 20, 30], dtype=np.int64)
    tf, doclen = doc_term_frequencies(doc_ids, texts)
    np.testing.assert_array_equal(doclen, [4, 0, 4])
    got = {(r["doc_id"], r["term"]): r["tf"] for r in tf.to_pylist()}
    assert got == {
        (10, "hello"): 2, (10, "world"): 1, (10, "42"): 1,
        (30, "foo"): 3, (30, "bar"): 1,
    }


def test_token_counts_matches_python():
    import re
    texts = ["The quick; brown_fox", "über café!", "", "a b  c   d"]
    expected = [len(re.findall(r"[a-z0-9]+", t.lower())) for t in texts]
    np.testing.assert_array_equal(token_counts(pa.array(texts)), expected)


def test_term_shards_deterministic_and_matching_scalar():
    terms = pa.array(["alpha", "beta", "alpha", "gamma"])
    s = term_shards(terms, 16)
    assert s[0] == s[2] == term_shard_one("alpha", 16)
    assert s[1] == term_shard_one("beta", 16)
    assert all(0 <= v < 16 for v in s)


def test_doc_shard_balanced():
    ids = np.arange(10_000, dtype=np.int64)
    s = doc_shard(ids, 16)
    counts = np.bincount(s, minlength=16)
    assert counts.min() > 400  # roughly uniform, not striped
    # deterministic
    np.testing.assert_array_equal(s, doc_shard(ids, 16))


def test_chunked_input():
    ch = pa.chunked_array([["one two", "three"], ["two two"]])
    doc_ids = np.array([1, 2, 3], dtype=np.int64)
    tf, doclen = doc_term_frequencies(doc_ids, ch)
    np.testing.assert_array_equal(doclen, [2, 1, 2])
    got = {(r["doc_id"], r["term"]): r["tf"] for r in tf.to_pylist()}
    assert got[(3, "two")] == 2
