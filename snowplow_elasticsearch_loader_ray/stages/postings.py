"""SPIMI posting construction as a ``map_batches`` stage.

One batch of documents in → one sorted run of partial postings out:
``(shard: int32, term: dictionary<string>, doc_id: int64, tf: int32)``.
This is the per-batch combiner (SURVEY.md §7 stage 4): term frequencies
are already aggregated per (doc, term) inside the batch, so the
downstream shard exchange moves one row per distinct (doc, term) — not
one row per token.

Hot-path design (this stage dominates build CPU — see BASELINE.md):
after tokenization the batch works entirely on integers — terms are
dictionary-encoded once, tf counting is one ``np.unique`` over
``doc*V + term_index`` composite keys, the output ordering is one
integer ``np.lexsort``, and the term column is emitted as a
``DictionaryArray`` (indices over the batch vocabulary), so no
per-posting string is ever materialized, hashed, sorted or copied.

Doc lengths ride along as pseudo-postings of ``DOCLEN_TERM`` (term "")
with ``tf = doclen``, sharded by ``hash(doc_id)`` instead of
``hash(term)`` so 1e12 doc-length entries stay balanced across segments
rather than landing on a single term-hash bucket. N and avgdl then fall
out of the segment table as ``sum(df)`` / ``sum(cf)`` of the pseudo-term
— the engine's version of the reference's running counters
(``Processing.scala:102,111,237-249``).

The batch output is sorted by (shard, term, doc) which makes the run
files shard-clustered per row group for the phase-2 pruned read and
keeps parquet encodings tight.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import IndexConfig, DEFAULT_CONFIG, DOCLEN_TERM
from ..tokenizer import doc_shard, term_shard_one, tokenize_to_terms

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
        n_docs = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, idx = tokenize_to_terms(batch["text"])
        idx_np = idx.to_numpy(zero_copy_only=False)
        doclen = np.bincount(idx_np, minlength=n_docs).astype(np.int32)

        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        vocab: list[str] = enc.dictionary.to_pylist()
        didx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(len(vocab), 1)

        # tf per (doc, term): one sort of composite integer keys
        comp = idx_np.astype(np.int64) * V + didx
        uniq, counts = np.unique(comp, return_counts=True)
        row_doc = uniq // V                       # batch row index
        row_tidx = (uniq % V).astype(np.int64)    # vocab index

        # shard per unique term, once (vocab is tiny vs postings)
        shard_lut = np.fromiter(
            (term_shard_one(t, self.cfg.num_term_shards) for t in vocab),
            dtype=np.int32, count=len(vocab),
        )
        post_shard = shard_lut[row_tidx]

        # append doclen pseudo-postings (vocab index V = DOCLEN_TERM)
        all_shard = np.concatenate(
            [post_shard, doc_shard(doc_ids, self.cfg.num_term_shards)])
        all_tidx = np.concatenate(
            [row_tidx, np.full(n_docs, len(vocab), dtype=np.int64)])
        all_doc = np.concatenate([doc_ids[row_doc], doc_ids])
        all_tf = np.concatenate([counts.astype(np.int32), doclen])

        order = np.lexsort((all_doc, all_tidx, all_shard))
        term_col = pa.DictionaryArray.from_arrays(
            pa.array(all_tidx[order].astype(np.int32)),
            pa.array(vocab + [DOCLEN_TERM], type=pa.string()),
        )
        return pa.table(
            {
                "shard": pa.array(all_shard[order]),
                "term": term_col.cast(pa.string()),
                "doc_id": pa.array(all_doc[order]),
                "tf": pa.array(all_tf[order]),
            },
            schema=RUN_SCHEMA,
        )
