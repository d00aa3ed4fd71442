"""Deterministic synthetic image payloads (real container formats).

Builders emit byte-level-valid PNG / GIF / BMP files and marker-valid
JPEG streams without any codec library, so the REAL header-decode stage
(``pipelines.multimodal.DecodeImageHeaders``) has genuine inputs whose
dimensions are known independently of the parser — the driver entry's
oracle pins (format, width, height) from the build parameters here.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def make_png(w: int, h: int) -> bytes:
    """Fully valid 8-bit RGB PNG (solid deterministic pixels)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes([(w * 7) % 256, (h * 13) % 256, 40]) * w
    idat = zlib.compress(row * h)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def gradient_pixel(x: int, y: int) -> tuple[int, int, int]:
    """The gradient-fixture pixel SPEC — shared by the builder and the
    hand-derived thumbnail truth (so the truth is independent of the
    decoder/resizer implementation)."""
    return ((x * 3) % 256, (y * 5) % 256, (x + y) % 256)


def make_png_gradient(w: int, h: int) -> bytes:
    """Fully valid 8-bit RGB PNG whose pixels follow ``gradient_pixel``
    — patterned content so a resize test can't pass vacuously."""
    rows = bytearray()
    for y in range(h):
        rows += b"\x00"
        for x in range(w):
            rows += bytes(gradient_pixel(x, y))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(rows))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


#: gradient-image cases for the resize/thumbnail stage
GRADIENT_CASES: list[tuple[int, int, int]] = [
    (0, 33, 21), (1, 64, 64), (2, 7, 5), (3, 128, 40), (4, 8, 8),
]


def write_gradient_fixture(cache_root: str) -> str:
    """→ parquet path with (img_id, payload) gradient PNGs, cached."""
    key = hashlib.sha256(repr(GRADIENT_CASES).encode()).hexdigest()[:12]
    d = os.path.join(cache_root, f"gradients-{key}")
    path = os.path.join(d, "images.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "img_id": pa.array([c[0] for c in GRADIENT_CASES], pa.int64()),
            "payload": pa.array([make_png_gradient(c[1], c[2])
                                 for c in GRADIENT_CASES], pa.binary()),
        }), tmp)
        os.replace(tmp, path)
    return path


def expected_thumbnails(tw: int, th: int) -> list[tuple[int, int, int, float]]:
    """Hand-derived (img_id, width, height, thumb_mean) truth for
    nearest-neighbor resize to (tw, th): sample ``gradient_pixel`` at
    the floor(i·src/dst) grid and average — no decoder, no resizer."""
    rows = []
    for img_id, w, h in GRADIENT_CASES:
        xs = [x * w // tw for x in range(tw)]
        ys = [y * h // th for y in range(th)]
        total = sum(sum(gradient_pixel(x, y)) for y in ys for x in xs)
        rows.append((img_id, w, h, total / (tw * th * 3.0)))
    return rows


def make_gif(w: int, h: int) -> bytes:
    """GIF89a with logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(w: int, h: int) -> bytes:
    """24-bit BMP with BITMAPINFOHEADER (no pixel data needed for meta)."""
    row_bytes = (w * 3 + 3) & ~3
    size = 54 + row_bytes * h
    header = (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            row_bytes * h, 2835, 2835, 0, 0))
    return header + b"\x00" * (row_bytes * h)


def make_jpeg(w: int, h: int) -> bytes:
    """Marker-valid JPEG: SOI + JFIF APP0 + COM + SOF0 + EOI.

    A real decoder would want DQT/DHT/SOS too; header parsers (incl.
    PIL's lazy open) read dimensions from SOF0, which is byte-exact
    here. The COM segment before SOF0 exercises the marker scan.
    """
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com_payload = b"synthetic"
    com = b"\xff\xfe" + struct.pack(">H", 2 + len(com_payload)) + com_payload
    sof = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", h, w)
           + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + com + sof + b"\xff\xd9"


#: the fixture: (img_id, builder, format, width, height) + junk rows
IMAGE_CASES: list[tuple[int, str, int, int]] = [
    (0, "png", 640, 480),
    (1, "png", 16, 4000),
    (2, "gif", 320, 200),
    (3, "gif", 1, 1),
    (4, "jpeg", 1920, 1080),
    (5, "jpeg", 333, 77),
    (6, "bmp", 800, 600),
    (7, "unknown", 0, 0),          # junk bytes -> deterministic bad row
]

_BUILDERS = {"png": make_png, "gif": make_gif, "jpeg": make_jpeg, "bmp": make_bmp}


def build_payload(fmt: str, w: int, h: int) -> bytes:
    if fmt == "unknown":
        return b"\x00\x01not-an-image-payload" * 3
    return _BUILDERS[fmt](w, h)


def write_image_fixture(cache_root: str) -> str:
    """→ parquet path with (img_id: int64, payload: binary), cached."""
    key = hashlib.sha256(repr(IMAGE_CASES).encode()).hexdigest()[:12]
    d = os.path.join(cache_root, f"images-{key}")
    path = os.path.join(d, "images.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "img_id": pa.array([c[0] for c in IMAGE_CASES], pa.int64()),
            "payload": pa.array([build_payload(c[1], c[2], c[3])
                                 for c in IMAGE_CASES], pa.binary()),
        }), tmp)
        os.replace(tmp, path)
    return path


def make_wav(channels: int, rate: int, bits: int, n_frames: int) -> bytes:
    """Byte-valid PCM WAV with deterministic sample data."""
    data_len = n_frames * channels * (bits // 8)
    data = bytes((i * 31) % 256 for i in range(data_len))
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * (bits // 8), channels * (bits // 8), bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_len) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


#: (audio_id, channels, sample_rate, bits, n_frames) — duration derives
AUDIO_CASES: list[tuple[int, int, int, int, int]] = [
    (0, 1, 8000, 8, 4000),       # 0.5 s mono 8-bit
    (1, 2, 44100, 16, 44100),    # 1.0 s stereo CD
    (2, 1, 16000, 16, 24000),    # 1.5 s speech mono
    (3, 6, 48000, 24, 4800),     # 0.1 s surround 24-bit
]


#: sine-tone cases for the spectral featurizer: (audio_id, freq_hz)
SINE_CASES: list[tuple[int, int]] = [(0, 440), (1, 1000), (2, 3200), (3, 125)]
SINE_RATE, SINE_FRAMES = 16_000, 4096


def make_sine_wav(freq: int, rate: int = SINE_RATE,
                  n_frames: int = SINE_FRAMES) -> bytes:
    """16-bit mono WAV of a pure sine — ground truth by construction
    for spectral features (dominant bin == the tone's frequency)."""
    import math

    data = bytearray()
    for i in range(n_frames):
        v = int(20000 * math.sin(2 * math.pi * freq * i / rate))
        data += struct.pack("<h", v)
    byte_rate = rate * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + bytes(data))


def write_sine_fixture(cache_root: str) -> str:
    """→ parquet path with (audio_id, payload) sine WAVs, cached."""
    key = hashlib.sha256(repr((SINE_CASES, SINE_RATE, SINE_FRAMES))
                         .encode()).hexdigest()[:12]
    d = os.path.join(cache_root, f"sines-{key}")
    path = os.path.join(d, "audio.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "audio_id": pa.array([c[0] for c in SINE_CASES], pa.int64()),
            "payload": pa.array([make_sine_wav(c[1]) for c in SINE_CASES],
                                pa.binary()),
        }), tmp)
        os.replace(tmp, path)
    return path


def expected_audio_spectral() -> list[tuple[int, int, int, bool]]:
    """SPEC-derived truth for the sine fixture's spectral features,
    independent of the FFT implementation: a pure sine at ``f`` Hz over
    ``n`` rect-windowed samples peaks at the NEAREST rFFT bin
    round(f·n/rate) (leakage is symmetric around the true frequency;
    no fixture tone sits exactly between bins), and that bin's
    frequency is the exact rational bin·rate/n — emitted as integer
    micro-Hz, round(1e6·bin·rate/n), which is exact for these fixture
    parameters (16000·10^6/4096 divides evenly).

    → rows (audio_id, dominant_bin, dominant_microhz, decode_ok).
    """
    out = []
    for aid, f in SINE_CASES:
        b = round(f * SINE_FRAMES / SINE_RATE)
        assert abs(f * SINE_FRAMES / SINE_RATE - b) != 0.5, "tone between bins"
        micro = round(1_000_000 * b * SINE_RATE / SINE_FRAMES)
        out.append((aid, b, micro, True))
    return out


def write_audio_fixture(cache_root: str) -> str:
    """→ parquet path (audio_id: int64, payload: binary): WAV cases plus
    one junk payload (audio_id = 99)."""
    key = hashlib.sha256(repr(AUDIO_CASES).encode()).hexdigest()[:12]
    d = os.path.join(cache_root, f"audio-{key}")
    path = os.path.join(d, "audio.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        ids = [c[0] for c in AUDIO_CASES] + [99]
        payloads = [make_wav(c[1], c[2], c[3], c[4]) for c in AUDIO_CASES] \
            + [b"RIFFnot-really-a-wave-file"]
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }), tmp)
        os.replace(tmp, path)
    return path


def make_avi(frame_sizes: list[int], keyframe_every: int = 3) -> tuple[bytes, list[tuple[int, int, bool]]]:
    """Byte-valid minimal AVI (hdrl + movi + idx1) with junk frame data.

    Returns (payload, expected [(data_offset, size, keyframe)]) — the
    expected offsets come from the LAYOUT ARITHMETIC here, independent
    of the parser's chunk walk.
    """
    avih = b"avih" + struct.pack("<I", 56) + b"\x00" * 56
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi_body = b"movi"
    rel_offsets = []                      # offset of each chunk from 'movi'
    for i, sz in enumerate(frame_sizes):
        rel_offsets.append(len(movi_body))
        data = bytes(((i * 37 + k) % 256) for k in range(sz))
        movi_body += b"00dc" + struct.pack("<I", sz) + data + (b"\x00" if sz & 1 else b"")
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx_body = b""
    for i, (off, sz) in enumerate(zip(rel_offsets, frame_sizes)):
        flags = 0x10 if i % keyframe_every == 0 else 0
        idx_body += b"00dc" + struct.pack("<III", flags, off, sz)
    idx1 = b"idx1" + struct.pack("<I", len(idx_body)) + idx_body
    body = b"AVI " + hdrl + movi + idx1
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    movi_pos = len(b"RIFF") + 4 + len(b"AVI ") + len(hdrl) + 8  # 'movi' fourcc
    expected = [(movi_pos + off + 8, sz, i % keyframe_every == 0)
                for i, (off, sz) in enumerate(zip(rel_offsets, frame_sizes))]
    return payload, expected


#: (video_id, frame sizes) — the video fixture
VIDEO_CASES: list[tuple[int, list[int]]] = [
    (0, [100, 40, 41, 200, 7]),
    (1, [12, 12, 12, 12]),
    (2, [999]),
]


def write_video_fixture(cache_root: str) -> tuple[str, dict[int, list[tuple[int, int, bool]]]]:
    """→ (parquet path with (video_id, payload), expected frame index per
    video). A junk payload rides as video_id 99 (expects no frames)."""
    key = hashlib.sha256(repr(VIDEO_CASES).encode()).hexdigest()[:12]
    d = os.path.join(cache_root, f"video-{key}")
    path = os.path.join(d, "video.parquet")
    expected = {}
    payloads = []
    for vid, sizes in VIDEO_CASES:
        p, exp = make_avi(sizes)
        payloads.append(p)
        expected[vid] = exp
    expected[99] = []
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "video_id": pa.array([v for v, _ in VIDEO_CASES] + [99], pa.int64()),
            "payload": pa.array(payloads + [b"RIFFnope"], pa.binary()),
        }), tmp)
        os.replace(tmp, path)
    return path, expected


def expected_image_pixels() -> list[tuple[int, int, int, bool, float]]:
    """Hand-derived (img_id, width, height, decode_ok, mean_px) truth
    for the REAL pixel decoders, computed from the BUILDER parameters
    (PNG solid color = ((w*7)%256, (h*13)%256, 40) → mean is their
    average; BMP pixels are all zero; GIF/JPEG have no stdlib-decodable
    pixel data) — independent of the decoder implementation."""
    rows = []
    for img_id, fmt, w, h in IMAGE_CASES:
        if fmt == "png":
            mean = round((((w * 7) % 256) + ((h * 13) % 256) + 40) / 3.0, 6)
            rows.append((img_id, w, h, True, mean))
        elif fmt == "bmp":
            rows.append((img_id, w, h, True, 0.0))
        else:                         # gif/jpeg/unknown → fail-open row
            rows.append((img_id, 0, 0, False, 0.0))
    return rows


def expected_audio_samples() -> list[tuple[int, int, int, float, int, bool]]:
    """Hand-derived (audio_id, n_frames, channels, rms, peak, decode_ok)
    truth for PCM sample decode, computed from the data-byte SPEC
    (``(i*31) % 256``) and the PCM encoding rules per bit depth."""
    import numpy as np

    rows = []
    for audio_id, channels, _rate, bits, n_frames in AUDIO_CASES:
        data_len = n_frames * channels * (bits // 8)
        raw = np.array([(i * 31) % 256 for i in range(data_len)], dtype=np.uint8)
        if bits == 8:
            s = raw.astype(np.int32) - 128
        elif bits == 16:
            s = raw.view("<i2").astype(np.int32)
        else:                          # 24-bit little-endian, sign-extended
            b3 = raw.reshape(-1, 3).astype(np.int32)
            s = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            s -= (s & 0x800000) << 1
        x = s.astype(np.float64)
        rows.append((audio_id, n_frames, channels,
                     round(float(np.sqrt(np.mean(x * x))), 6),
                     int(np.abs(s).max()), True))
    rows.append((99, 0, 0, 0.0, 0, False))       # the junk payload
    return rows
