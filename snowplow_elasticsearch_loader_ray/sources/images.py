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
