"""Posting-list block codec: delta + byte-aligned frame-of-reference.

The reference keeps postings inside Elasticsearch; this codec is the
from-scratch replacement (SURVEY.md §7 stage 5). Layout goals: fast
vectorized (numpy) encode/decode, block-granular skipping for block-max
WAND, and doc_id-ascending order for delta coding.

Binary layout (little-endian), one buffer per posting list::

    u32 n_postings
    u32 block_size B            (postings per block, last may be short)
    u32 n_blocks
    int64[n_blocks]  last_doc   (block-max skip metadata)
    int32[n_blocks]  max_tf     (block-max score-bound metadata)
    u32[n_blocks]    offset     (byte offset of block payload, relative
                                 to payload start)
    u8[n_blocks]     widths     (low nibble: doc-delta byte width,
                                 high nibble: tf byte width; widths in
                                 {1,2,4,8})
    payload: per block
        int64 first_doc
        uint{w_d}[n_b - 1] doc deltas   (delta-1 coding: gap - 1)
        uint{w_t}[n_b]     tfs

Doc ids MUST be strictly increasing; tfs MUST be >= 1 (doclen
pseudo-postings may carry 0, so tf width covers the actual range).
"""

from __future__ import annotations

import numpy as np

_HEADER = np.dtype("<u4")


def _width_for(maxval: int) -> int:
    if maxval < 1 << 8:
        return 1
    if maxval < 1 << 16:
        return 2
    if maxval < 1 << 32:
        return 4
    return 8


_DTYPES = {1: np.dtype("<u1"), 2: np.dtype("<u2"), 4: np.dtype("<u4"), 8: np.dtype("<u8")}


def _vec_width(maxvals: np.ndarray) -> np.ndarray:
    return np.select(
        [maxvals < 1 << 8, maxvals < 1 << 16, maxvals < 1 << 32],
        [1, 2, 4], default=8,
    ).astype(np.int64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128) -> bytes:
    """Encode one posting list (sorted by doc_id ascending).

    Vectorized across blocks (the build-side hot loop: a head term at
    10^8 postings is ~10^6 blocks): per-block maxima via ``reduceat``,
    then per width class one u8 scatter writes every block's payload —
    no per-block Python iteration.
    """
    n = len(doc_ids)
    assert n == len(tfs)
    B = block_size
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n_blocks = (n + B - 1) // B if n else 0
    head = np.array([n, B, n_blocks], dtype=_HEADER).tobytes()
    if n == 0:
        return head

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    gaps[1:] -= 1
    if n > 1 and gaps[1:].min() < 0:
        raise ValueError("doc_ids must be strictly increasing")
    if int(tfs.max()) >= 1 << 31:
        # decode returns int32 tf arrays (a tf is bounded by document
        # length); reject rather than silently wrap
        raise ValueError("tf values must fit int32")
    starts = np.arange(0, n, B, dtype=np.int64)
    ends = np.minimum(starts + B, n)
    n_b = ends - starts
    gaps[starts] = 0                       # block-first gap isn't encoded

    max_gap = np.maximum.reduceat(gaps, starts)
    max_tf_v = np.maximum.reduceat(tfs, starts)
    wd = _vec_width(max_gap)
    wt = _vec_width(max_tf_v)
    block_bytes = 8 + wd * (n_b - 1) + wt * n_b
    offsets = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(block_bytes[:-1], out=offsets[1:])
    if int(block_bytes.sum()) >= 1 << 32:
        # offsets serialize as u32; a payload past 4 GiB (~5e8 postings)
        # would silently truncate them — fail loudly instead. Lists that
        # big should be split across more term shards.
        raise ValueError("posting-list payload exceeds u32 offset range; "
                         "increase num_term_shards for this corpus")
    out = np.empty(int(block_bytes.sum()), dtype=np.uint8)

    # first_doc of every block: one 8-byte scatter
    out[offsets[:, None] + np.arange(8)] = (
        doc_ids[starts].astype("<i8").view(np.uint8).reshape(-1, 8))

    full = n_b == B
    for w in np.unique(wd):
        # full blocks of this gap width: gather rows, view bytes, scatter
        blk = np.nonzero(full & (wd == w))[0]
        if len(blk):
            rows = starts[blk][:, None] + np.arange(1, B)
            data = gaps[rows].astype(_DTYPES[int(w)]).view(np.uint8)
            out[offsets[blk][:, None] + 8 + np.arange(w * (B - 1))] = (
                data.reshape(len(blk), -1))
    for w in np.unique(wt):
        blk = np.nonzero(full & (wt == w))[0]
        if len(blk):
            rows = starts[blk][:, None] + np.arange(B)
            data = tfs[rows].astype(_DTYPES[int(w)]).view(np.uint8)
            base = offsets[blk] + 8 + wd[blk] * (B - 1)
            out[base[:, None] + np.arange(w * B)] = data.reshape(len(blk), -1)
    if not full[-1]:                       # the single short tail block
        bi = n_blocks - 1
        lo, hi = int(starts[bi]), int(ends[bi])
        o = int(offsets[bi]) + 8
        g = gaps[lo + 1 : hi].astype(_DTYPES[int(wd[bi])]).view(np.uint8)
        out[o : o + len(g)] = g
        o += int(wd[bi]) * (hi - lo - 1)
        t = tfs[lo:hi].astype(_DTYPES[int(wt[bi])]).view(np.uint8)
        out[o : o + len(t)] = t

    return (
        head
        + doc_ids[ends - 1].astype("<i8").tobytes()   # last_doc per block
        + max_tf_v.astype("<i4").tobytes()
        + offsets.astype("<u4").tobytes()
        + (wd | (wt << 4)).astype("<u1").tobytes()
        + out.tobytes()
    )


class PostingList:
    """Decoded-on-demand view over an encoded posting list buffer."""

    __slots__ = ("buf", "n", "block_size", "n_blocks", "last_doc", "max_tf",
                 "offsets", "widths", "payload_start")

    def __init__(self, buf: bytes):
        self.buf = buf
        n, block_size, n_blocks = np.frombuffer(buf, dtype=_HEADER, count=3)
        self.n, self.block_size, self.n_blocks = int(n), int(block_size), int(n_blocks)
        o = 12
        self.last_doc = np.frombuffer(buf, dtype="<i8", count=self.n_blocks, offset=o)
        o += 8 * self.n_blocks
        self.max_tf = np.frombuffer(buf, dtype="<i4", count=self.n_blocks, offset=o)
        o += 4 * self.n_blocks
        self.offsets = np.frombuffer(buf, dtype="<u4", count=self.n_blocks, offset=o)
        o += 4 * self.n_blocks
        self.widths = np.frombuffer(buf, dtype="<u1", count=self.n_blocks, offset=o)
        o += self.n_blocks
        self.payload_start = o

    def decode_block(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        lo = bi * self.block_size
        n_b = min(self.block_size, self.n - lo)
        w = int(self.widths[bi])
        wd, wt = w & 0xF, w >> 4
        off = self.payload_start + int(self.offsets[bi])
        first = int(np.frombuffer(self.buf, dtype="<i8", count=1, offset=off)[0])
        off += 8
        gaps = np.frombuffer(self.buf, dtype=_DTYPES[wd], count=n_b - 1, offset=off)
        off += wd * (n_b - 1)
        tfs = np.frombuffer(self.buf, dtype=_DTYPES[wt], count=n_b, offset=off)
        docs = np.empty(n_b, dtype=np.int64)
        docs[0] = first
        if n_b > 1:
            np.cumsum(gaps.astype(np.int64) + 1, out=docs[1:])
            docs[1:] += first
        return docs, tfs.astype(np.int32)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode the whole list, vectorized across blocks.

        Full blocks sharing a width byte have identical byte size, so
        each width class decodes as one u8 gather → dtype views → one
        2-D cumsum — no per-block Python loop (the query-path hot spot:
        a head term at 10^8 postings is ~10^6 blocks). The (at most
        one) short tail block falls back to ``decode_block``.
        """
        if self.n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        docs = np.empty(self.n, dtype=np.int64)
        tfs = np.empty(self.n, dtype=np.int32)
        B = self.block_size
        n_full = self.n // B
        buf8 = np.frombuffer(self.buf, dtype=np.uint8)
        if n_full:
            w = self.widths[:n_full]
            run_starts = np.concatenate(([0], np.nonzero(w[1:] != w[:-1])[0] + 1))
            run_ends = np.concatenate((run_starts[1:], [n_full]))
            for lo, hi in zip(run_starts, run_ends):
                wd, wt = int(w[lo]) & 0xF, int(w[lo]) >> 4
                nbytes = 8 + wd * (B - 1) + wt * B
                # blocks are laid out sequentially, so an equal-width run
                # is one contiguous record array → zero-copy reshape
                base = self.payload_start + int(self.offsets[lo])
                mat = buf8[base : base + (hi - lo) * nbytes].reshape(hi - lo, nbytes)
                first = mat[:, :8].copy().view("<i8").reshape(-1)
                gaps = (
                    mat[:, 8 : 8 + wd * (B - 1)].copy().view(_DTYPES[wd])
                    .reshape(hi - lo, B - 1)
                )
                t = (
                    mat[:, 8 + wd * (B - 1) :].copy().view(_DTYPES[wt])
                    .reshape(hi - lo, B)
                )
                d = docs[lo * B : hi * B].reshape(hi - lo, B)
                d[:, 0] = first
                np.cumsum(gaps, axis=1, dtype=np.int64, out=d[:, 1:])
                d[:, 1:] += first[:, None] + np.arange(1, B, dtype=np.int64)
                tfs[lo * B : hi * B] = t.reshape(-1)
        if n_full < self.n_blocks:
            d, t = self.decode_block(self.n_blocks - 1)
            docs[n_full * B :] = d
            tfs[n_full * B :] = t
        return docs, tfs

    def first_block_geq(self, doc_id: int) -> int:
        """Index of the first block whose last_doc >= doc_id (n_blocks if none)."""
        return int(np.searchsorted(self.last_doc, doc_id, side="left"))

    def decode_blocks(self, bidx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode an arbitrary SUBSET of blocks → the union of their
        postings in DOCUMENT order (blocks are doc-ordered, so sorted
        block order IS doc order).

        Full blocks sharing a width byte have identical byte size, so
        each width class decodes as one fancy u8 gather → dtype views →
        one 2-D cumsum, mirroring ``decode_all``'s run decode but
        gathering non-contiguous records — no per-block Python loop
        (the candidate-rescore hot spot: a head term probed for 500
        candidates decodes ≤500 of its 10^6 blocks). The (at most one)
        short tail block falls back to ``decode_block``.
        """
        bidx = np.unique(np.asarray(bidx, dtype=np.int64))
        bidx = bidx[(bidx >= 0) & (bidx < self.n_blocks)]
        if self.n == 0 or not len(bidx):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        B = self.block_size
        n_full_total = self.n // B
        full_sel = bidx[bidx < n_full_total]
        has_tail = n_full_total < self.n_blocks and bidx[-1] == self.n_blocks - 1
        nf = len(full_sel)
        tail_len = (self.n - n_full_total * B) if has_tail else 0
        docs = np.empty(nf * B + tail_len, dtype=np.int64)
        tfs = np.empty(nf * B + tail_len, dtype=np.int32)
        if nf:
            buf8 = np.frombuffer(self.buf, dtype=np.uint8)
            w = self.widths[full_sel]
            d_full = docs[: nf * B].reshape(nf, B)
            t_full = tfs[: nf * B].reshape(nf, B)
            for wv in np.unique(w):
                rows = np.nonzero(w == wv)[0]     # ranks in sorted bidx
                blk = full_sel[rows]
                wd, wt = int(wv) & 0xF, int(wv) >> 4
                nbytes = 8 + wd * (B - 1) + wt * B
                base = self.payload_start + self.offsets[blk].astype(np.int64)
                mat = buf8[base[:, None] + np.arange(nbytes)]
                first = mat[:, :8].copy().view("<i8").reshape(-1)
                gaps = (
                    mat[:, 8 : 8 + wd * (B - 1)].copy().view(_DTYPES[wd])
                    .reshape(len(blk), B - 1)
                )
                t = (
                    mat[:, 8 + wd * (B - 1) :].copy().view(_DTYPES[wt])
                    .reshape(len(blk), B)
                )
                d = np.empty((len(blk), B), dtype=np.int64)
                d[:, 0] = first
                np.cumsum(gaps, axis=1, dtype=np.int64, out=d[:, 1:])
                d[:, 1:] += first[:, None] + np.arange(1, B, dtype=np.int64)
                d_full[rows] = d
                t_full[rows] = t
        if has_tail:
            d, t = self.decode_block(self.n_blocks - 1)
            docs[nf * B :] = d
            tfs[nf * B :] = t
        return docs, tfs

    def decode_for(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(docs ∩ cand, their tfs) decoding ONLY the blocks that can
        contain a candidate — the block-max skip metadata as a read
        pruner. ``cand`` must be sorted ascending. A head term with 10^5
        blocks decodes ≤ |cand| of them; the per-block loop is bounded
        by the candidate count, not the posting count.
        """
        if self.n == 0 or not len(cand):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        if len(cand) > 1 and not (cand[1:] >= cand[:-1]).all():
            # the sorted-ascending contract is load-bearing for the
            # searchsorted intersection below; normalize rather than
            # silently drop hits (cand is candidate-set-sized: cheap)
            cand = np.unique(cand)
        bis = np.unique(np.searchsorted(self.last_doc, cand, side="left"))
        bis = bis[bis < self.n_blocks]
        d, t = self.decode_blocks(bis)           # doc-ordered union
        pos = np.searchsorted(cand, d)
        sel = pos < len(cand)
        sel[sel] = cand[pos[sel]] == d[sel]
        return d[sel], t[sel]


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return PostingList(buf).decode_all()


def binary_views(arr) -> list[memoryview]:
    """Zero-copy per-row memoryviews over a Binary/LargeBinary array.

    Reader warm-up path: ``to_pylist()`` copies every posting buffer
    into a Python bytes object; a memoryview slice over the single
    Arrow data buffer shares it instead (``PostingList`` /
    ``np.frombuffer`` accept any buffer protocol object). The returned
    views keep the Arrow buffer alive via their base object.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1]
    data = memoryview(arr.buffers()[2])
    return [data[offs[i]:offs[i + 1]] for i in range(len(arr))]
