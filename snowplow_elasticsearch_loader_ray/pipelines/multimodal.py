"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata columns next to them — the same shape the pages corpus
uses for ``html``. Stages follow the actor-pool ``map_batches``
contract (decoder state built once per actor in ``__init__``).

What is REAL vs STUBBED in this container (no image/video codec libs):

- ``ByteHistogram`` — real, fully vectorized featurizer.
- ``DecodeImageHeaders`` — REAL container-header decode: format +
  pixel dimensions parsed straight from PNG/GIF/JPEG/BMP bytes (no
  codec library required; oracle-checked by the driver entry).
- ``DecodeImage`` — REAL full-pixel decode for the formats stdlib
  compression covers: 24-bit BMP (numpy) and 8-bit non-interlaced PNG
  (zlib inflate + all five scanline unfilters, round-trip pytested).
  GIF/JPEG pixel data needs entropy decoders this container lacks —
  those payloads fail open as bad rows (their HEADER decode is real).
- ``decode_wav_samples`` / ``DecodeAudioSamples`` — REAL PCM sample
  decode (8/16/24-bit WAV → int32 frame arrays; RMS/peak features).
- ``SampleAviFrames`` — REAL AVI idx1 demux (frame offsets/sizes/
  keyframes); decoding frame BYTES to pixels still needs a video
  codec — the one remaining stubbed step, clearly marked.

Batch-size note: for multi-MB payloads, call with a small
``batch_size`` (16-64) so batch × concurrency stays inside the worker
heap; blocks of large binaries should also raise
``DataContext.target_max_block_size`` so readers don't split rows.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(per-row lengths, flat value bytes) of a Binary/LargeBinary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=dtype)[arr.offset: arr.offset + len(arr) + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]: offs[-1]]
    return np.diff(offs).astype(np.int64), buf


class ByteHistogram:
    """REAL baseline featurizer: 16-bin byte histogram per payload.

    Fully vectorized: one ``bincount`` over (row, high-nibble) composite
    keys across the whole batch's value buffer — no per-row loop.
    """

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, buf = _binary_parts(batch[self.col])
        row = np.repeat(np.arange(len(lens)), lens)
        key = row * FEATURE_DIM + (buf >> 4)
        hist = np.bincount(key, minlength=len(lens) * FEATURE_DIM).reshape(-1, FEATURE_DIM)
        feats = pa.FixedSizeListArray.from_arrays(
            pa.array(hist.astype(np.float32).reshape(-1)), FEATURE_DIM
        )
        out = batch.drop_columns([self.col])
        out = out.append_column("n_bytes", pa.array(lens))
        return out.append_column("features", feats)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: JPEG frame markers carrying dimensions (SOF0-15 minus DHT/DAC/RSTn)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def image_meta(p: bytes) -> tuple[str, int, int]:
    """(format, width, height) parsed from container header bytes.

    Pure-python header parse — PNG IHDR, GIF logical screen descriptor,
    JPEG SOFn marker scan, BMP info header. Unknown/corrupt payloads
    return ("unknown", 0, 0) — a deterministic per-row failure, never an
    exception (the bad-row rule of the ingest stages).
    """
    try:
        if p[:8] == _PNG_MAGIC and len(p) >= 24 and p[12:16] == b"IHDR":
            w, h = struct.unpack(">II", p[16:24])
            return "png", w, h
        if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            return "gif", w, h
        if p[:2] == b"BM" and len(p) >= 26:
            w, h = struct.unpack("<ii", p[18:26])
            return "bmp", w, abs(h)
        if p[:2] == b"\xff\xd8":
            i = 2
            while i + 9 <= len(p) and p[i] == 0xFF:
                marker = p[i + 1]
                if marker == 0xFF:          # fill byte
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", p[i + 2:i + 4])[0]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", p[i + 5:i + 9])
                    return "jpeg", w, h
                i += 2 + seglen
    except struct.error:
        pass
    return "unknown", 0, 0


class DecodeImageHeaders:
    """REAL image metadata stage: payload bytes → (format, width,
    height, decode_ok) columns, actor-pool ``map_batches`` contract.

    The byte-level header parse is per-row by nature (variable-length
    marker scans), but each row touches only the first O(100) bytes of
    its payload — at 100 TB the cost is dominated by reading the binary
    column, which parquet column pruning already limits to this stage.
    """

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [image_meta(p or b"") for p in batch[self.col].to_pylist()]
        out = batch.drop_columns([self.col])
        out = out.append_column("format", pa.array([m[0] for m in metas], pa.string()))
        out = out.append_column("width", pa.array([m[1] for m in metas], pa.int32()))
        out = out.append_column("height", pa.array([m[2] for m in metas], pa.int32()))
        return out.append_column(
            "decode_ok", pa.array([m[0] != "unknown" for m in metas]))


def audio_meta(p: bytes) -> tuple[str, int, int, int, float]:
    """(format, channels, sample_rate, bits, duration_s) from container
    header bytes. REAL for RIFF/WAVE (fmt + data chunk walk); unknown/
    corrupt payloads return ("unknown", 0, 0, 0, 0.0) — deterministic
    bad row, never an exception.
    """
    try:
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i = 12
            channels = rate = bits = data_len = 0
            while i + 8 <= len(p):
                tag = p[i:i + 4]
                size = struct.unpack("<I", p[i + 4:i + 8])[0]
                body = p[i + 8:i + 8 + size]
                if tag == b"fmt " and len(body) >= 16:
                    _fmt, channels, rate = struct.unpack("<HHI", body[:8])
                    bits = struct.unpack("<H", body[14:16])[0]
                elif tag == b"data":
                    data_len = size
                i += 8 + size + (size & 1)          # chunks are word-aligned
            if channels and rate and bits:
                dur = data_len / (rate * channels * (bits // 8 or 1))
                return "wav", channels, rate, bits, round(dur, 6)
    except struct.error:
        pass
    return "unknown", 0, 0, 0, 0.0


class DecodeAudioHeaders:
    """REAL audio metadata stage: payload bytes → (format, channels,
    sample_rate, bits, duration_s, decode_ok) columns; actor-pool
    ``map_batches`` contract, same shape as ``DecodeImageHeaders``.
    Sample decode (PCM frames → arrays) would slot in per actor; only
    the header walk is needed for corpus statistics / filtering."""

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [audio_meta(p or b"") for p in batch[self.col].to_pylist()]
        out = batch.drop_columns([self.col])
        out = out.append_column("format", pa.array([m[0] for m in metas], pa.string()))
        out = out.append_column("channels", pa.array([m[1] for m in metas], pa.int32()))
        out = out.append_column("sample_rate", pa.array([m[2] for m in metas], pa.int32()))
        out = out.append_column("bits", pa.array([m[3] for m in metas], pa.int32()))
        out = out.append_column("duration_s", pa.array([m[4] for m in metas], pa.float64()))
        return out.append_column(
            "decode_ok", pa.array([m[0] != "unknown" for m in metas]))


def decode_wav_samples(p: bytes) -> tuple[np.ndarray, int] | None:
    """REAL PCM WAV sample decode (pure numpy): RIFF chunk walk →
    ``(frames, channels)`` int32 sample array + sample rate. Supports
    8-bit (unsigned, centered to signed), 16-bit and 24-bit (3-byte LE
    sign-extended) PCM; None for non-WAV / compressed formats."""
    try:
        if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        i, fmt, data = 12, None, None
        while i + 8 <= len(p):
            tag = p[i:i + 4]
            size = struct.unpack("<I", p[i + 4:i + 8])[0]
            body = p[i + 8:i + 8 + size]
            if tag == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif tag == b"data":
                data = body
            i += 8 + size + (size & 1)
        if fmt is None or data is None or fmt[0] != 1:     # PCM only
            return None
        _a, channels, rate, _br, _ba, bits = fmt
        if bits == 8:
            s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            s = np.frombuffer(data, dtype="<i2").astype(np.int32)
        elif bits == 24:
            b3 = np.frombuffer(data, dtype=np.uint8)
            b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int32)
            s = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            s -= (s & 0x800000) << 1                        # sign extend
        else:
            return None
        n = len(s) - len(s) % channels
        return s[:n].reshape(-1, channels), int(rate)
    except Exception:
        return None


class DecodeAudioSamples:
    """REAL PCM sample decode stage: payload → (n_frames, channels,
    rms, peak, decode_ok) — the feature-extraction step a training
    pipeline runs after the header filter (actor-pool contract)."""

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch[self.col].to_pylist():
            dec = decode_wav_samples(p or b"")
            if dec is None:
                rows.append((0, 0, 0.0, 0, False))
            else:
                s, _rate = dec
                x = s.astype(np.float64)
                rows.append((s.shape[0], s.shape[1],
                             round(float(np.sqrt(np.mean(x * x))), 6) if s.size else 0.0,
                             int(np.abs(s).max()) if s.size else 0, True))
        out = batch.drop_columns([self.col])
        out = out.append_column("n_frames", pa.array([r[0] for r in rows], pa.int64()))
        out = out.append_column("channels", pa.array([r[1] for r in rows], pa.int32()))
        out = out.append_column("rms", pa.array([r[2] for r in rows], pa.float64()))
        out = out.append_column("peak", pa.array([r[3] for r in rows], pa.int64()))
        return out.append_column("decode_ok", pa.array([r[4] for r in rows]))


class AudioSpectral:
    """REAL spectral featurizer over decoded PCM: per payload, the
    dominant frequency (argmax |rFFT| over the first channel, DC
    excluded) and the spectral centroid in Hz. Correctness is pinned
    by PHYSICS, not by replaying the implementation: a pure sine
    fixture must yield its own frequency as the dominant bin
    (test_multimodal). Fail-open contract as the other decoders."""

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms, cents, oks, bins, rates = [], [], [], [], []
        for p in batch[self.col].to_pylist():
            dec = decode_wav_samples(p or b"")
            if dec is None or dec[0].size == 0 or dec[0].shape[0] < 4:
                doms.append(0.0), cents.append(0.0), oks.append(False)
                bins.append(-1), rates.append(0)
                continue
            s, rate = dec
            x = s[:, 0].astype(np.float64)
            x -= x.mean()                       # drop DC before the FFT
            mag = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
            mag[0] = 0.0
            power = mag * mag        # power-weighted centroid: rect-window
            total = power.sum()      # leakage tails barely move it
            peak = int(np.argmax(mag))
            doms.append(float(freqs[peak]))
            cents.append(float((freqs * power).sum() / total) if total > 0 else 0.0)
            oks.append(True)
            bins.append(peak)
            rates.append(int(rate))
        out = batch.drop_columns([self.col])
        out = out.append_column("dominant_hz", pa.array(doms, pa.float64()))
        out = out.append_column("dominant_bin", pa.array(bins, pa.int64()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int64()))
        out = out.append_column("centroid_hz", pa.array(cents, pa.float64()))
        return out.append_column("decode_ok", pa.array(oks, pa.bool_()))


def decode_bmp_pixels(p: bytes) -> np.ndarray | None:
    """REAL 24-bit uncompressed BMP pixel decode (pure numpy): header →
    padded-row ``frombuffer`` reshape → BGR→RGB, bottom-up flip.
    Returns (h, w, 3) uint8, or None for non-BMP / unsupported
    variants (other bit depths, RLE compression)."""
    try:
        if p[:2] != b"BM":
            return None
        data_off = struct.unpack("<I", p[10:14])[0]
        w, h_signed = struct.unpack("<ii", p[18:26])
        bpp, comp = struct.unpack("<H", p[28:30])[0], struct.unpack("<I", p[30:34])[0]
        if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
            return None
        h = abs(h_signed)
        row_bytes = (w * 3 + 3) & ~3
        raw = np.frombuffer(p, dtype=np.uint8,
                            count=row_bytes * h, offset=data_off)
        rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]                      # BGR → RGB
        return rgb[::-1] if h_signed > 0 else rgb   # bottom-up → top-down
    except (ValueError, struct.error):
        return None


def decode_png_pixels(p: bytes) -> np.ndarray | None:
    """REAL PNG pixel decode for the common case — 8-bit depth,
    grayscale/RGB/RGBA, non-interlaced — using only stdlib zlib +
    numpy. All five scanline filters are reversed: None/Up fully
    vectorized, Sub via mod-256 cumsum over the pixel stride,
    Average/Paeth with a per-row x-loop (their left-neighbor dependency
    is inherently sequential without compiled code). Returns
    (h, w, channels) uint8, or None for non-PNG / unsupported variants
    (16-bit, palette, interlaced)."""
    try:
        if p[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        import zlib

        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(p):
            ln = struct.unpack(">I", p[pos:pos + 4])[0]
            tag = p[pos + 4:pos + 8]
            data = p[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data)
                if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
                    return None
                ch = {0: 1, 2: 3, 6: 4}[ctype]
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            return None
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
        stride = w * ch
        raw = raw.reshape(h, 1 + stride)
        filters, scan = raw[:, 0], raw[:, 1:]
        out = np.zeros((h, stride), dtype=np.uint8)
        for y in range(h):
            f, row = int(filters[y]), scan[y]
            up = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            if f == 0:
                out[y] = row
            elif f == 1:                     # Sub: mod-256 prefix sum per lane
                lanes = row.reshape(w, ch).astype(np.uint64)
                out[y] = (np.cumsum(lanes, axis=0) % 256).astype(
                    np.uint8).reshape(stride)
            elif f == 2:                     # Up
                out[y] = row + up
            elif f == 3:                     # Average (left dep → x-loop)
                o = out[y]
                for x in range(stride):
                    left = o[x - ch] if x >= ch else 0
                    o[x] = (int(row[x]) + ((int(left) + int(up[x])) >> 1)) & 0xFF
            elif f == 4:                     # Paeth (left dep → x-loop)
                o = out[y]
                for x in range(stride):
                    a = int(o[x - ch]) if x >= ch else 0
                    b = int(up[x])
                    c = int(out[y - 1][x - ch]) if (x >= ch and y) else 0
                    pp = a + b - c
                    pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                    o[x] = (int(row[x]) + pred) & 0xFF
            else:
                return None
        return out.reshape(h, w, ch)
    except Exception:                         # corrupt stream → fail-open
        return None


class DecodeImage:
    """Full pixel decode — REAL for the formats whose compression the
    standard library covers (24-bit BMP; 8-bit non-interlaced PNG via
    zlib + scanline unfiltering), fail-open metadata rows for the rest
    (GIF/JPEG entropy coding needs a codec library this container lacks
    — their header decode is REAL in ``DecodeImageHeaders``).

    Output per row: (width, height, decode_ok, mean_px, reason).
    ``fake=True`` keeps the deterministic fake mode for plumbing tests.
    """

    def __init__(self, col: str = "payload", fake: bool = False):
        self.col = col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.col].to_pylist()
        if self.fake:
            w = np.array([(len(p or b"") * 2654435761) % 1920 + 16 for p in payloads], dtype=np.int32)
            h = np.array([(len(p or b"") * 40503) % 1080 + 16 for p in payloads], dtype=np.int32)
            out = batch.drop_columns([self.col])
            out = out.append_column("width", pa.array(w))
            out = out.append_column("height", pa.array(h))
            return out.append_column(
                "decode_ok", pa.array(np.ones(batch.num_rows, dtype=bool)))
        ws, hs, oks, means, reasons = [], [], [], [], []
        for p in payloads:
            px = decode_png_pixels(p or b"")
            if px is None:
                px = decode_bmp_pixels(p or b"")
            if px is not None:
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                oks.append(True)
                means.append(round(float(px.mean()), 6))
                reasons.append("")
            else:
                ws.append(0)
                hs.append(0)
                oks.append(False)
                means.append(0.0)
                reasons.append("no stdlib decoder for this format")
        out = batch.drop_columns([self.col])
        out = out.append_column("width", pa.array(ws, pa.int32()))
        out = out.append_column("height", pa.array(hs, pa.int32()))
        out = out.append_column("decode_ok", pa.array(oks, pa.bool_()))
        out = out.append_column("mean_px", pa.array(means, pa.float64()))
        return out.append_column("reason", pa.array(reasons, pa.string()))


class ResizeImages:
    """REAL thumbnail stage: decode (stdlib BMP/PNG pixel decoders) →
    nearest-neighbor resize to (tw, th) via one integer-grid gather
    (``row = y·h // th``, ``col = x·w // tw`` — the floor-sampling
    rule the fixture truth replicates independently). Output per row:
    source dims, decode_ok, and the thumbnail's exact mean pixel value
    (summed as int64 before one float division, so the truth's integer
    arithmetic reproduces it bit-for-bit). Undecodable formats fail
    open, same contract as ``DecodeImage``."""

    def __init__(self, col: str = "payload", tw: int = 8, th: int = 8):
        self.col = col
        self.tw, self.th = tw, th

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, oks, means = [], [], [], []
        for p in batch[self.col].to_pylist():
            px = decode_png_pixels(p or b"")
            if px is None:
                px = decode_bmp_pixels(p or b"")
            if px is None:
                ws.append(0), hs.append(0), oks.append(False), means.append(0.0)
                continue
            h, w = px.shape[:2]
            rows = (np.arange(self.th, dtype=np.int64) * h) // self.th
            cols = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
            thumb = px[rows][:, cols]
            ws.append(w)
            hs.append(h)
            oks.append(True)
            means.append(int(thumb.sum(dtype=np.int64))
                         / (self.tw * self.th * px.shape[2] * 1.0))
        out = batch.drop_columns([self.col])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("decode_ok", pa.array(oks, pa.bool_()))
        return out.append_column("thumb_mean", pa.array(means, pa.float64()))


def avi_frame_index(p: bytes) -> list[tuple[int, int, bool]]:
    """REAL AVI container demux (no codec lib): the idx1 frame index →
    [(absolute byte offset of frame chunk data, size, is_keyframe)].

    Walks top-level RIFF chunks to locate the ``movi`` LIST and the
    ``idx1`` index, then decodes 16-byte index entries (ckid, flags,
    offset, size), keeping video stream chunks (ckid ``??dc``/``??db``).
    Handles both idx1 offset conventions (relative to the ``movi``
    fourcc vs absolute). Corrupt/non-AVI payloads → empty list, never
    an exception. Decoding the frame BYTES into pixels needs a codec —
    that part stays out of scope; the offsets/sizes returned here are
    what a GPU decode stage would seek to.
    """
    out: list[tuple[int, int, bool]] = []
    try:
        if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
            return out
        i = 12
        movi_pos = None
        idx_span = None
        while i + 8 <= len(p):
            tag = p[i:i + 4]
            size = struct.unpack("<I", p[i + 4:i + 8])[0]
            if tag == b"LIST" and p[i + 8:i + 12] == b"movi":
                movi_pos = i + 8               # position of the 'movi' fourcc
            elif tag == b"idx1":
                idx_span = (i + 8, size)
            i += 8 + size + (size & 1)
        if idx_span is None:
            return out
        base, size = idx_span
        entries = []
        for j in range(base, base + size - 15, 16):
            ckid = p[j:j + 4]
            flags, off, sz = struct.unpack("<III", p[j + 4:j + 16])
            if ckid[2:4] not in (b"dc", b"db"):
                continue                        # not a video chunk
            entries.append((off, sz, bool(flags & 0x10)))
        if not entries:
            return out
        # offset convention is per FILE, decided from the first entry
        # (the ffmpeg rule): a first offset pointing inside the movi
        # list's header region means offsets are relative to the 'movi'
        # fourcc; otherwise they are absolute file offsets
        relative = movi_pos is not None and entries[0][0] < movi_pos
        for off, sz, kf in entries:
            abs_off = movi_pos + off if relative else off
            # abs_off points at the chunk header; data starts 8 bytes in
            out.append((abs_off + 8, sz, kf))
    except struct.error:
        return out
    return out


class SampleAviFrames:
    """REAL video frame sampler over AVI payloads: one output row per
    sampled frame (parent id, frame_no, byte_offset, frame_bytes,
    keyframe) — the flat_map-shaped stage a GPU decode pool consumes.
    ``every`` = keep every k-th video frame. Non-AVI payloads produce
    no rows (they belong in the dead-letter channel upstream).
    """

    def __init__(self, col: str = "payload", id_col: str = "video_id",
                 every: int = 2):
        self.col = col
        self.id_col = id_col
        self.every = max(1, every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs, sizes, keys = [], [], [], [], []
        for vid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.col].to_pylist()):
            for fno, (off, sz, kf) in enumerate(avi_frame_index(p or b"")):
                if fno % self.every:
                    continue
                ids.append(vid)
                frames.append(fno)
                offs.append(off)
                sizes.append(sz)
                keys.append(kf)
        return pa.table({
            self.id_col: pa.array(ids, batch[self.id_col].type),
            "frame_no": pa.array(frames, pa.int32()),
            "byte_offset": pa.array(offs, pa.int64()),
            "frame_bytes": pa.array(sizes, pa.int64()),
            "keyframe": pa.array(keys),
        })


class FrameSample:
    """STUB video frame sampler: every payload → n_frames offsets.
    A REAL container-level demuxer exists for AVI: ``SampleAviFrames``
    (idx1 frame index → per-frame offsets/sizes/keyframes).

    Real impl would demux with pyav once per actor; the deterministic
    stub emits evenly spaced byte offsets so the flat_map-shaped output
    layout (one row per frame, parent id carried) is testable.
    """

    def __init__(self, col: str = "payload", n_frames: int = 4):
        self.col = col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, _buf = _binary_parts(batch[self.col])
        n = batch.num_rows
        ids = batch["url" if "url" in batch.column_names else batch.column_names[0]]
        parent = np.repeat(np.arange(n), self.n_frames)
        frame = np.tile(np.arange(self.n_frames), n)
        offset = (lens[parent] * frame) // self.n_frames
        return pa.table({
            "parent": ids.take(pa.array(parent)),
            "frame": pa.array(frame.astype(np.int32)),
            "byte_offset": pa.array(offset.astype(np.int64)),
        })
