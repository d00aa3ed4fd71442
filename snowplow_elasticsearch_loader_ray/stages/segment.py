"""Per-shard segment encoding: sorted runs → compressed posting lists.

The from-scratch replacement for what the reference delegates to
Elasticsearch's bulk-index write (``ElasticsearchSink.scala:45-109``,
SURVEY.md W1): all run rows of one term shard are merged, sorted by
(term, doc_id) and encoded into delta/frame-of-reference posting blocks
with block-max metadata (codec.py). df and cf per term are the grouped
aggregates the reference's operator inventory calls out as engine-added
(SURVEY.md §2 notes).

Runs on one shard's data at a time — the shard exchange already
happened via the hive-partitioned run write, so this is an
embarrassingly parallel per-shard map (no second all-to-all).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import encode_postings

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("postings", pa.binary()),
    ]
)


def encode_shard_table(runs: pa.Table, block_size: int = 128) -> pa.Table:
    """All run rows of one shard → one segment table (term, df, cf, postings).

    Requires globally-unique (term, doc_id) pairs, which the build
    guarantees: every doc is tokenized in exactly one batch and the
    per-batch combiner already collapsed duplicates.
    """
    if runs.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    idx = pc.sort_indices(runs, sort_keys=[("term", "ascending"), ("doc_id", "ascending")])
    runs = runs.take(idx).combine_chunks()

    terms = runs["term"].to_numpy(zero_copy_only=False)
    doc_ids = runs["doc_id"].to_numpy(zero_copy_only=False)
    tfs = runs["tf"].to_numpy(zero_copy_only=False)

    change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(terms)]))

    out_terms: list[str] = []
    out_df = np.empty(len(starts), dtype=np.int64)
    out_cf = np.empty(len(starts), dtype=np.int64)
    out_post: list[bytes] = []
    for g, (lo, hi) in enumerate(zip(starts, ends)):
        d = doc_ids[lo:hi]
        t = tfs[lo:hi]
        out_terms.append(terms[lo])
        out_df[g] = hi - lo
        out_cf[g] = int(t.sum())
        out_post.append(encode_postings(d, t, block_size=block_size))
    return pa.table(
        {
            "term": pa.array(out_terms, type=pa.string()),
            "df": pa.array(out_df),
            "cf": pa.array(out_cf),
            "postings": pa.array(out_post, type=pa.binary()),
        }
    )
