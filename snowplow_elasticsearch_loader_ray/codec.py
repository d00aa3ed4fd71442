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


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128) -> bytes:
    """Encode one posting list (sorted by doc_id ascending)."""
    n = len(doc_ids)
    assert n == len(tfs)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if n > 1 and int(np.diff(doc_ids).min()) <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    n_blocks = (n + block_size - 1) // block_size if n else 0

    last_doc = np.empty(n_blocks, dtype="<i8")
    max_tf = np.empty(n_blocks, dtype="<i4")
    offsets = np.empty(n_blocks, dtype="<u4")
    widths = np.empty(n_blocks, dtype="<u1")
    chunks: list[bytes] = []
    pos = 0
    for bi in range(n_blocks):
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        d = doc_ids[lo:hi]
        t = tfs[lo:hi]
        gaps = np.diff(d) - 1  # strictly increasing → gaps >= 0
        wd = _width_for(int(gaps.max()) if len(gaps) else 0)
        wt = _width_for(int(t.max()) if len(t) else 0)
        payload = (
            d[:1].astype("<i8").tobytes()
            + gaps.astype(_DTYPES[wd]).tobytes()
            + t.astype(_DTYPES[wt]).tobytes()
        )
        last_doc[bi] = d[-1]
        max_tf[bi] = t.max()
        offsets[bi] = pos
        widths[bi] = wd | (wt << 4)
        chunks.append(payload)
        pos += len(payload)

    head = np.array([n, block_size, n_blocks], dtype=_HEADER).tobytes()
    return (
        head
        + last_doc.tobytes()
        + max_tf.tobytes()
        + offsets.tobytes()
        + widths.tobytes()
        + b"".join(chunks)
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


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return PostingList(buf).decode_all()
