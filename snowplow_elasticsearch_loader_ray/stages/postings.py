"""SPIMI posting construction over ordinal doc keys.

One chunk of documents in → one sorted run of partial postings out:
``(shard: int32, term: dictionary<string>, ord: int64, tf: int32,
doc_id: int64|null)``. This is the per-batch combiner (SURVEY.md §7
stage 4): term frequencies are already aggregated per (doc, term)
inside the chunk, so the downstream shard exchange moves one row per
distinct (doc, term) — not one row per token.

**Ordinal doc keys** (the docBase design, Lucene-style): posting lists
store the document's dense corpus ordinal — its position in the global
input-file order (``base_of_file + row_in_file``) — NOT the external
64-bit ``doc_id`` hash. Sorted random 64-bit ids defeat delta coding
(the average gap is ~2^63/n and every delta costs 8 bytes); dense
ordinals make the average gap ``n_docs/df``, so head terms compress to
~1 byte per posting and the whole index shrinks ~4x. The
``ord → (doc_id, doclen)`` mapping rides along as tagged docmap rows
(``shard = -1``) that phase 1 extracts into ``docmap/part-K.parquet``;
readers map ordinals back to external ids at result time, and the
dense ordinal doubles as the score-accumulator position (no binary
search per posting at query time).

Hot-path design (this stage dominates build CPU — see BASELINE.md):
after tokenization the chunk works entirely on integers — terms are
dictionary-encoded once, tf counting is one ``np.unique`` over
``row*V + term_index`` composite keys, the output ordering is one
integer ``np.lexsort``, and the term column is emitted as a
``DictionaryArray`` (indices over the chunk vocabulary), so no
per-posting string is ever materialized, hashed, sorted or copied.

The chunk output is sorted by (shard, term, ord) — docmap rows
(shard = -1) lead — which keeps the run files shard-clustered per row
group for the phase-2 pruned read and the parquet encodings tight.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import IndexConfig, DEFAULT_CONFIG, DOCMAP_SHARD
from ..tokenizer import term_shard_one, tokenize_to_terms

RUN_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("term", pa.string()),
        ("ord", pa.int64()),
        ("tf", pa.int32()),
        ("doc_id", pa.int64()),       # populated on docmap rows only
        ("lang", pa.string()),        # doc-value, docmap rows only
    ]
)


def postings_chunk(doc_ids: np.ndarray, ords: np.ndarray,
                   texts: pa.Array | pa.ChunkedArray,
                   cfg: IndexConfig,
                   langs: pa.Array | None = None) -> pa.Table:
    """One chunk of documents → sorted run rows (postings + docmap).

    ``langs`` (optional) is the per-doc ``lang`` doc-value: it rides the
    docmap rows into ``docmap/part-K.parquet`` so facet queries gather
    metadata by ordinal instead of re-reading the corpus (the ES
    doc_values design)."""
    n_docs = len(doc_ids)
    flat, idx = tokenize_to_terms(texts)
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
    row_doc = uniq // V                       # chunk row index
    row_tidx = (uniq % V).astype(np.int64)    # vocab index

    # shard per unique term, once (vocab is tiny vs postings)
    shard_lut = np.fromiter(
        (term_shard_one(t, cfg.num_term_shards) for t in vocab),
        dtype=np.int32, count=len(vocab),
    )

    # docmap rows lead (shard = -1, vocab index V as the placeholder)
    all_shard = np.concatenate(
        [shard_lut[row_tidx],
         np.full(n_docs, DOCMAP_SHARD, dtype=np.int32)])
    all_tidx = np.concatenate(
        [row_tidx, np.full(n_docs, len(vocab), dtype=np.int64)])
    all_ord = np.concatenate([ords[row_doc], ords])
    all_tf = np.concatenate([counts.astype(np.int32), doclen])
    all_doc = np.concatenate(
        [np.zeros(len(row_doc), dtype=np.int64), doc_ids])
    valid_doc = np.concatenate(
        [np.zeros(len(row_doc), dtype=bool), np.ones(n_docs, dtype=bool)])

    order = np.lexsort((all_ord, all_tidx, all_shard))
    term_col = pa.DictionaryArray.from_arrays(
        pa.array(all_tidx[order].astype(np.int32)),
        pa.array(vocab + [""], type=pa.string()),
    )
    if langs is not None:
        lang_np = np.asarray(langs.to_pylist(), dtype=object)
        all_lang = np.concatenate(
            [np.full(len(row_doc), None, dtype=object), lang_np])[order]
        lang_col = pa.array(all_lang.tolist(), type=pa.string())
    else:
        lang_col = pa.nulls(len(order), pa.string())
    return pa.table(
        {
            "shard": pa.array(all_shard[order]),
            "term": term_col.cast(pa.string()),
            "ord": pa.array(all_ord[order]),
            "tf": pa.array(all_tf[order]),
            "doc_id": pa.array(all_doc[order], type=pa.int64(),
                               mask=~valid_doc[order]),
            "lang": lang_col,
        },
        schema=RUN_SCHEMA,
    )


class TokenizeFilePostings:
    """``(path, base)`` items → run-row tables, one whole input file per
    item, streamed in row-chunks (a generator ``map_batches`` stage, so
    a large file never materializes its postings at once).

    The task reads its file directly (the same parquet scan
    ``ray.data.read_parquet`` would issue) because ordinal assignment
    needs the row's position WITHIN its file — ``base + row_index`` —
    which a block-level dataset read does not expose.
    """

    def __init__(self, cfg: IndexConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table):
        for path, base in zip(batch["path"].to_pylist(),
                              batch["base"].to_pylist()):
            pf = pq.ParquetFile(path)
            cols = ["doc_id", "text"]
            has_lang = "lang" in pf.schema_arrow.names
            if has_lang:
                cols.append("lang")
            off = 0
            for chunk in pf.iter_batches(batch_size=self.cfg.batch_size,
                                         columns=cols):
                t = pa.Table.from_batches([chunk])
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ords = base + off + np.arange(len(ids), dtype=np.int64)
                off += len(ids)
                yield postings_chunk(
                    ids, ords, t["text"], self.cfg,
                    langs=t["lang"].combine_chunks() if has_lang else None)
