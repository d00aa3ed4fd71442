"""SPIMI posting construction as a ``map_batches`` stage.

One batch of documents in → one sorted run of partial postings out:
``(shard: int32, term: string, doc_id: int64, tf: int32)``. This is the
per-batch combiner (SURVEY.md §7 stage 4): term frequencies are already
aggregated per (doc, term) inside the batch with Arrow ``group_by``, so
the downstream shard exchange moves one row per distinct (doc, term) —
not one row per token.

Doc lengths ride along as pseudo-postings of ``DOCLEN_TERM`` (term "")
with ``tf = doclen``, sharded by ``hash(doc_id)`` instead of
``hash(term)`` so 1e12 doc-length entries stay balanced across segments
rather than landing on a single term-hash bucket. N and avgdl then fall
out of the segment table as ``sum(df)`` / ``sum(cf)`` of the pseudo-term
— the engine's version of the reference's running counters
(``Processing.scala:102,111,237-249``).

The batch output is sorted by (shard, term, doc_id), which makes the
partitioned run files row-group-clustered for the phase-2 per-shard
read and keeps parquet encodings tight.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig, DEFAULT_CONFIG, DOCLEN_TERM
from ..tokenizer import doc_term_frequencies, doc_shard, term_shards

RUN_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
    ]
)


class TokenizePostings:
    """docs ``(doc_id, text)`` → sorted partial-posting run rows."""

    def __init__(self, cfg: IndexConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_table, doclen = doc_term_frequencies(doc_ids, batch["text"])

        shard = term_shards(tf_table["term"], self.cfg.num_term_shards)
        postings = pa.table(
            {
                "shard": pa.array(shard, type=pa.int32()),
                "term": tf_table["term"],
                "doc_id": tf_table["doc_id"],
                "tf": tf_table["tf"],
            }
        )
        dl_rows = pa.table(
            {
                "shard": pa.array(doc_shard(doc_ids, self.cfg.num_term_shards), type=pa.int32()),
                "term": pa.array(np.full(len(doc_ids), DOCLEN_TERM, dtype=object), type=pa.string()),
                "doc_id": pa.array(doc_ids),
                "tf": pa.array(doclen, type=pa.int32()),
            }
        )
        out = pa.concat_tables([postings, dl_rows]).combine_chunks()
        idx = pc.sort_indices(
            out, sort_keys=[("shard", "ascending"), ("term", "ascending"), ("doc_id", "ascending")]
        )
        return out.take(idx).cast(RUN_SCHEMA)
