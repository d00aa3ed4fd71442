"""Index merging: N committed indexes → one, with upsert-by-doc_id.

The incremental-indexing surface. The reference gets document-level
idempotency from Elasticsearch upsert-by-id (``ElasticsearchSink.scala:92``,
SURVEY.md W5): re-indexing a url replaces the previous document. Here
the same contract holds across whole index generations — merging
``[old, new]`` keeps the NEW posting for any doc_id present in both, so
"re-crawl a slice, build a small delta index, merge" is the engine's
re-index path (no full rebuild).

Physical plan: inputs are already term-sharded with the same shard
function, so the merge is embarrassingly parallel — one Ray task per
shard reads that shard's segment from every input, merges posting lists
term-by-term (doc_id-ascending order restored, last-input-wins on
duplicate doc_ids), re-encodes, and commits the output segment +
manifest. No shuffle: the expensive all-to-all happened when each input
was built.
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..codec import PostingList, encode_postings
from ..config import IndexConfig, DEFAULT_CONFIG, DOCLEN_TERM
from ..stages.segment import SEGMENT_SCHEMA
from ..state import manifest as mf
from .build import finalize, index_stats


def _in_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean membership of ``values`` in a sorted unique array."""
    pos = np.searchsorted(sorted_set, values)
    pos[pos == len(sorted_set)] = 0
    return (sorted_set[pos] == values) if len(sorted_set) else np.zeros(len(values), bool)


def _merge_lists(entries: list[tuple[int, bytes]], kill_after: list[np.ndarray],
                 block_size: int) -> tuple[bytes, int, int] | None:
    """Merge posting-list buffers tagged with their input index.

    → (encoded buffer, df, cf), or None if every posting was deleted.
    Upsert semantics (the document-replacement contract): a doc_id
    re-indexed by a NEWER input is dead in every older input —
    ``kill_after[i]`` is the sorted set of doc_ids superseded after
    input ``i``, and postings from input ``i`` are dropped against it.
    This removes stale terms that the new version of the document no
    longer contains (a plain last-wins dedupe would leak them).
    """
    docs_parts: list[np.ndarray] = []
    tfs_parts: list[np.ndarray] = []
    for i, buf in entries:
        d, t = PostingList(buf).decode_all()
        if len(kill_after[i]):
            live = ~_in_sorted(d, kill_after[i])
            d, t = d[live], t[live]
        if len(d):
            docs_parts.append(d)
            tfs_parts.append(t)
    if not docs_parts:
        return None
    if len(docs_parts) == 1:
        docs, tfs = docs_parts[0], tfs_parts[0]
    else:
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tfs_parts)
        order = np.argsort(docs, kind="stable")
        docs, tfs = docs[order], tfs[order]
        # survivors are disjoint across inputs post-kill except the
        # doclen pseudo-term rows, where last (newest) wins
        last = np.concatenate((docs[1:] != docs[:-1], [True]))
        docs, tfs = docs[last], tfs[last]
    return encode_postings(docs, tfs, block_size=block_size), len(docs), int(tfs.sum())


@ray.remote(num_cpus=1)
def _merge_shard(input_dirs: list[str], out_dir: str, shard: int,
                 block_size: int, kill_after: list[np.ndarray]) -> dict:
    # kill_after arrives as an ObjectRef argument (one ray.put on the
    # driver); Ray resolves it from the shared object store per node —
    # broadcast, not per-task pickling
    seg_dir = os.path.join(out_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    name = f"shard-{shard:04d}.parquet"

    from ..codec import binary_views

    by_term: dict[str, list[tuple[int, bytes]]] = {}
    tables = []                               # keep buffers alive for views
    for i, d in enumerate(input_dirs):        # input order = age order
        path = os.path.join(d, "segments", name)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        tables.append(t)
        for term, buf in zip(t["term"].to_pylist(), binary_views(t["postings"])):
            by_term.setdefault(term, []).append((i, buf))

    out_terms: list[str] = []
    out_post: list[bytes] = []
    out_df: list[int] = []
    out_cf: list[int] = []
    for term in sorted(by_term):
        merged = _merge_lists(by_term[term], kill_after, block_size)
        if merged is None:
            continue                           # all postings superseded
        buf, df, cf = merged
        out_terms.append(term)
        out_post.append(buf)
        out_df.append(df)
        out_cf.append(cf)
    seg = pa.table({
        "term": pa.array(out_terms, type=pa.string()),
        "df": pa.array(out_df, type=pa.int64()),
        "cf": pa.array(out_cf, type=pa.int64()),
        "postings": pa.array(out_post, type=pa.binary()),
    }, schema=SEGMENT_SCHEMA) if out_terms else SEGMENT_SCHEMA.empty_table()

    out = os.path.join(seg_dir, name)
    tmp = out + ".tmp"
    pq.write_table(seg, tmp, compression="zstd")
    os.replace(tmp, out)

    dl_mask = pa.compute.equal(seg["term"], DOCLEN_TERM) if seg.num_rows else None
    dl = seg.filter(dl_mask) if seg.num_rows else seg
    from .build import write_shard_doclens

    write_shard_doclens(out_dir, shard, dl)
    n_terms = seg.num_rows - dl.num_rows
    return {
        "part": shard,
        "stage": "segments",
        "input_files": [os.path.join(d, "segments", name) for d in input_dirs],
        "counters": {
            "terms": int(n_terms),
            "postings": int(pa.compute.sum(seg.filter(
                pa.compute.invert(dl_mask))["df"]).as_py() or 0) if seg.num_rows else 0,
            "docs": int(pa.compute.sum(dl["df"]).as_py() or 0),
            "tokens": int(pa.compute.sum(dl["cf"]).as_py() or 0),
            "bytes_written": os.path.getsize(out),
        },
        "outputs": [os.path.relpath(out, out_dir)],
        "content_hash": mf.content_hash([out]),
    }


def _doc_ids_of(index_dir: str) -> np.ndarray:
    """All doc_ids of an index (decoded doclen pseudo-postings), sorted."""
    parts = []
    for f in sorted(glob.glob(os.path.join(index_dir, "segments", "*.parquet"))):
        t = pq.read_table(f, columns=["term", "postings"])
        for term, buf in zip(t["term"].to_pylist(), t["postings"].to_pylist()):
            if term == DOCLEN_TERM:
                parts.append(PostingList(buf).decode_all()[0])
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def merge_indexes(input_dirs: list[str], out_dir: str,
                  cfg: IndexConfig = DEFAULT_CONFIG) -> dict:
    """Merge committed indexes (oldest first) into ``out_dir``; returns stats.

    All inputs must have the same ``num_term_shards`` (same shard
    function — checked). Resumable per shard via the same manifest
    machinery as the build. The per-input delete lists (doc_ids
    superseded by newer inputs) are computed once and broadcast via
    ``ray.put`` — sized by the NEWER inputs' corpora, so the intended
    usage is base-plus-deltas (re-crawl slices), where they stay small;
    merging two full-size generations means a corpus-sized broadcast
    and deserves a rebuild instead.
    """
    t0 = time.time()
    shards = {index_stats(d)["num_term_shards"] for d in input_dirs}
    if len(shards) != 1:
        raise ValueError(f"inputs disagree on num_term_shards: {sorted(shards)}")
    n_shards = shards.pop()
    os.makedirs(out_dir, exist_ok=True)
    man_dir = os.path.join(out_dir, "manifests")
    if mf.is_committed(man_dir, "index"):
        return mf.load(man_dir, "stats")["stats"]

    # kill_after[i] = docs re-indexed by any input newer than i
    kill_after: list[np.ndarray] = [np.empty(0, np.int64)] * len(input_dirs)
    newer = np.empty(0, np.int64)
    for i in range(len(input_dirs) - 1, -1, -1):
        kill_after[i] = newer
        if i:
            newer = np.union1d(newer, _doc_ids_of(input_dirs[i]))
    kill_ref = ray.put(kill_after)

    missing = [s for s in range(n_shards)
               if not mf.is_committed(man_dir, f"segment-shard-{s:04d}")]
    refs = [_merge_shard.remote(input_dirs, out_dir, s, cfg.block_size, kill_ref)
            for s in missing]
    for s, payload in zip(missing, ray.get(refs)):
        mf.commit(man_dir, f"segment-shard-{s:04d}", payload)
    merged_cfg = IndexConfig(num_term_shards=n_shards, block_size=cfg.block_size,
                             k1=cfg.k1, b=cfg.b)
    return finalize(out_dir, merged_cfg, time.time() - t0)
