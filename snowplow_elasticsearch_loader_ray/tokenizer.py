"""Vectorized tokenization over Arrow batches.

This is the engine's hot per-record transform — the analogue of the
reference's ``transformEnrichedEvent`` parse step
(``modules/core/src/main/scala/.../Processing.scala:152-182``), which is
per-record and embarrassingly parallel. Here the whole batch is
processed with pyarrow C++ kernels (``utf8_lower`` →
``split_pattern_regex`` → ``list_flatten`` + ``list_parent_indices`` →
``Table.group_by``): no Python loop over rows or tokens.

Tokenization rule (fixed; the DuckDB oracle mirrors it exactly as
``list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')``):
lowercase, split on runs of anything outside ``[a-z0-9]``, drop empties.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


def term_shard_one(term: str, num_shards: int) -> int:
    """Deterministic shard for a term: blake2b-64(term) % num_shards.

    Used by both the build shuffle key and the query-time segment lookup;
    plays the ES index-routing role (``ElasticsearchSink.scala:90-94``).
    """
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") % num_shards


def doc_shard(doc_ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Balanced shard for per-doc payloads (doclen pseudo-postings).

    Splitmix64-style integer mix so dense doc_ids don't all collide into
    ``doc_id % num_shards`` striping artifacts.
    """
    x = doc_ids.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_shards)).astype(np.int32)


def term_shards(terms: pa.Array, num_shards: int) -> np.ndarray:
    """Vectorized-ish term→shard: hash each *unique* term once.

    ``dictionary_encode`` collapses the batch to its (small) vocabulary;
    the Python loop runs per unique term, not per posting.
    """
    d = pc.dictionary_encode(terms)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    dict_vals = d.dictionary.to_pylist()
    lut = np.fromiter(
        (term_shard_one(t, num_shards) for t in dict_vals),
        dtype=np.int32,
        count=len(dict_vals),
    )
    idx = d.indices.to_numpy(zero_copy_only=False)
    return lut[idx]


def tokenize_to_terms(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """texts → (flat term array, parent row index array), empties dropped."""
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=TOKEN_SPLIT_PATTERN)
    flat = pc.list_flatten(toks)
    idx = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), idx.filter(mask)


def doc_term_frequencies(
    doc_ids: np.ndarray, texts: pa.Array | pa.ChunkedArray
) -> tuple[pa.Table, np.ndarray]:
    """One batch of docs → (tf table, doclen array).

    Returns a table ``(term: string, doc_id: int64, tf: int32)`` with one
    row per distinct (doc, term), and an int32 ``doclen`` per input row
    (0 for token-less docs — they still count toward N / avgdl).
    """
    n_docs = len(doc_ids)
    flat, idx = tokenize_to_terms(texts)
    idx_np = idx.to_numpy(zero_copy_only=False)
    doclen = np.bincount(idx_np, minlength=n_docs).astype(np.int32)

    pairs = pa.table({"i": idx, "term": flat})
    tf = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
    i_np = tf["i"].to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            "term": tf["term"],
            "doc_id": pa.array(doc_ids[i_np], type=pa.int64()),
            "tf": pc.cast(tf["term_count"], pa.int32()),
        }
    )
    return out, doclen


def token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row token count (the ``doclen`` scalar), vectorized — one
    rule, shared with every other tokenizing path (the tokenization
    rule is the engine's oracle-mirrored invariant)."""
    _flat, idx = tokenize_to_terms(texts)
    idx_np = idx.to_numpy(zero_copy_only=False)
    return np.bincount(idx_np, minlength=len(texts)).astype(np.int64)
