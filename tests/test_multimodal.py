"""Multimodal plumbing: binary columns through actor-pool stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from snowplow_elasticsearch_loader_ray.pipelines.multimodal import (
    FEATURE_DIM, ByteHistogram, DecodeImage, FrameSample,
)


def _ds():
    return ray.data.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(10)],
        "payload": [bytes(range(i, i + 40)) * (i + 1) for i in range(10)],
    }))


def test_byte_histogram_features():
    out = ray.data.from_arrow(
        pa.table({"url": ["a"], "payload": [b"\x00\x10\x20\xff\xff"]})
    ).map_batches(ByteHistogram(), batch_format="pyarrow").take_all()
    f = out[0]["features"]
    assert len(f) == FEATURE_DIM
    assert f[0] == 1 and f[1] == 1 and f[2] == 1 and f[15] == 2
    assert out[0]["n_bytes"] == 5


def test_byte_histogram_batched_actor_pool():
    out = _ds().map_batches(ByteHistogram, batch_format="pyarrow",
                            batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 10
    assert all(len(v) == FEATURE_DIM for v in out["features"])
    # histogram sums equal payload length
    np.testing.assert_array_equal(
        np.array([sum(v) for v in out["features"]]), out["n_bytes"].to_numpy())


def test_decode_image_real_fail_open_on_non_images():
    """The real decoder never raises: undecodable payloads become
    fail-open rows (decode_ok=False, reason set) — the bad-row
    contract, not a task failure."""
    out = _ds().map_batches(DecodeImage(), batch_format="pyarrow").to_pandas()
    assert (~out["decode_ok"]).all()
    assert (out["reason"] != "").all()


def test_decode_image_fake_deterministic():
    out1 = _ds().map_batches(DecodeImage(fake=True), batch_format="pyarrow").to_pandas()
    out2 = _ds().map_batches(DecodeImage(fake=True), batch_format="pyarrow").to_pandas()
    assert (out1["width"] == out2["width"]).all()
    assert out1["decode_ok"].all()
    assert (out1["width"] >= 16).all() and (out1["height"] >= 16).all()


def test_frame_sample_layout():
    out = _ds().map_batches(FrameSample(n_frames=4), batch_format="pyarrow").to_pandas()
    assert len(out) == 40
    assert set(out["frame"]) == {0, 1, 2, 3}
    g = out[out["parent"] == "u3"].sort_values("frame")
    assert (g["byte_offset"].to_numpy() == sorted(g["byte_offset"])).all()


def test_image_header_decode_real():
    """REAL header parse: dimensions recovered from actual PNG/GIF/JPEG/
    BMP bytes built independently of the parser."""
    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import (
        DecodeImageHeaders, image_meta)
    from snowplow_elasticsearch_loader_ray.sources.images import (
        IMAGE_CASES, build_payload)

    for _i, fmt, w, h in IMAGE_CASES:
        got = image_meta(build_payload(fmt, w, h))
        assert got == (fmt, w, h), (fmt, w, h, got)
    # truncated payloads must classify as unknown, never raise
    png = build_payload("png", 100, 50)
    for cut in (0, 1, 7, 15, 23):
        assert image_meta(png[:cut])[0] == "unknown"
    # actor-pool stage end-to-end
    tbl = pa.table({
        "img_id": list(range(len(IMAGE_CASES))),
        "payload": [build_payload(f, w, h) for _i, f, w, h in IMAGE_CASES],
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(DecodeImageHeaders, batch_format="pyarrow",
                        batch_size=3, concurrency=2)
           .to_pandas().sort_values("img_id"))
    assert list(out["format"]) == [c[1] for c in IMAGE_CASES]
    assert list(out["width"]) == [c[2] for c in IMAGE_CASES]
    assert list(out["height"]) == [c[3] for c in IMAGE_CASES]
    assert out["decode_ok"].sum() == len(IMAGE_CASES) - 1


def test_audio_header_decode_real():
    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import (
        DecodeAudioHeaders, audio_meta)
    from snowplow_elasticsearch_loader_ray.sources.images import (
        AUDIO_CASES, make_wav)

    for _i, ch, sr, bits, nf in AUDIO_CASES:
        fmt, c, r, b, d = audio_meta(make_wav(ch, sr, bits, nf))
        assert (fmt, c, r, b) == ("wav", ch, sr, bits)
        assert abs(d - nf / sr) < 1e-9
    assert audio_meta(b"RIFFjunk")[0] == "unknown"
    assert audio_meta(b"")[0] == "unknown"
    wav = make_wav(2, 44100, 16, 100)
    assert audio_meta(wav[:20])[0] == "unknown"       # truncated: no fmt
    out = (ray.data.from_arrow(pa.table({
        "audio_id": [0, 1],
        "payload": [make_wav(1, 8000, 8, 800), b"nope"],
    })).map_batches(DecodeAudioHeaders, batch_format="pyarrow", concurrency=2)
       .to_pandas().sort_values("audio_id"))
    assert list(out["format"]) == ["wav", "unknown"]
    assert list(out["decode_ok"]) == [True, False]


def test_avi_frame_index_real():
    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import (
        SampleAviFrames, avi_frame_index)
    from snowplow_elasticsearch_loader_ray.sources.images import make_avi

    payload, expected = make_avi([50, 60, 70, 80, 90])
    got = avi_frame_index(payload)
    assert got == expected
    # frame data at the reported offsets is the chunk data we wrote
    off0, sz0, _ = got[0]
    assert payload[off0:off0 + 4] == bytes((0 * 37 + k) % 256 for k in range(4))
    assert avi_frame_index(b"RIFFjunk") == []
    assert avi_frame_index(payload[:30]) == []
    out = (ray.data.from_arrow(pa.table({
        "video_id": [7], "payload": [payload],
    })).map_batches(SampleAviFrames, fn_constructor_kwargs={"every": 2},
                    batch_format="pyarrow", concurrency=1).to_pandas())
    assert list(out["frame_no"]) == [0, 2, 4]
    assert list(out["byte_offset"]) == [expected[0][0], expected[2][0], expected[4][0]]
    assert list(out["keyframe"]) == [True, False, False] or list(out["keyframe"]) == [expected[0][2], expected[2][2], expected[4][2]]


def test_png_pixel_decode_all_filters_roundtrip():
    """Encode a random image with every scanline filter type (0-4) and
    decode it back exactly — the unfilter paths are all exercised."""
    import struct
    import zlib

    import numpy as np

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import decode_png_pixels

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    rows = []
    for y in range(h):
        f = [0, 1, 2, 3, 4][y % 5]
        cur = flat[y]
        up = flat[y - 1] if y else np.zeros(stride, np.int64)
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - up) % 256
        elif f == 3:
            enc = (cur - ((left + up) // 2)) % 256
        else:
            enc = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = up[x]
                c = flat[y - 1][x - ch] if (x >= ch and y) else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                enc[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b""))
    dec = decode_png_pixels(png)
    assert dec is not None and (dec == img).all()


def test_wav_sample_decode_bit_depths():
    import numpy as np

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import decode_wav_samples
    from snowplow_elasticsearch_loader_ray.sources.images import AUDIO_CASES, make_wav

    for _id, channels, rate, bits, n_frames in AUDIO_CASES:
        s, r = decode_wav_samples(make_wav(channels, rate, bits, n_frames))
        assert r == rate and s.shape == (n_frames, channels)
        lo, hi = {8: (-128, 127), 16: (-(1 << 15), (1 << 15) - 1),
                  24: (-(1 << 23), (1 << 23) - 1)}[bits]
        assert s.min() >= lo and s.max() <= hi
    assert decode_wav_samples(b"RIFFnot-really-a-wave-file") is None


def test_resize_images_identity_and_failopen():
    import numpy as np
    import pyarrow as pa

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import (
        ResizeImages, decode_png_pixels)
    from snowplow_elasticsearch_loader_ray.sources.images import make_png_gradient

    p = make_png_gradient(8, 8)
    t = pa.table({"img_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([p, b"not an image"], pa.binary())})
    out = ResizeImages(tw=8, th=8)(t).to_pandas().set_index("img_id")
    # 8x8 -> 8x8 nearest-neighbor is the identity: mean == source mean
    px = decode_png_pixels(p)
    want = int(px.sum(dtype=np.int64)) / (8 * 8 * 3 * 1.0)
    assert out.loc[1, "thumb_mean"] == want and bool(out.loc[1, "decode_ok"])
    assert not bool(out.loc[2, "decode_ok"]) and out.loc[2, "thumb_mean"] == 0.0


def test_resize_downsample_picks_floor_grid():
    import pyarrow as pa

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import ResizeImages
    from snowplow_elasticsearch_loader_ray.sources.images import (
        gradient_pixel, make_png_gradient)

    w, h, tw, th = 10, 6, 4, 3
    t = pa.table({"img_id": pa.array([0], pa.int64()),
                  "payload": pa.array([make_png_gradient(w, h)], pa.binary())})
    out = ResizeImages(tw=tw, th=th)(t).to_pandas()
    total = sum(sum(gradient_pixel(x * w // tw, y * h // th))
                for y in range(th) for x in range(tw))
    assert out["thumb_mean"][0] == total / (tw * th * 3.0)


def test_audio_spectral_sine_physics():
    """A pure sine's dominant FFT bin must be its own frequency —
    implementation-independent ground truth."""
    import pyarrow as pa

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import AudioSpectral
    from snowplow_elasticsearch_loader_ray.sources.images import (
        SINE_CASES, SINE_FRAMES, SINE_RATE, make_sine_wav)

    t = pa.table({
        "audio_id": pa.array([c[0] for c in SINE_CASES], pa.int64()),
        "payload": pa.array([make_sine_wav(c[1]) for c in SINE_CASES]
                            + [], pa.binary()),
    })
    out = AudioSpectral()(t).to_pandas().set_index("audio_id")
    bin_hz = SINE_RATE / SINE_FRAMES
    for aid, freq in SINE_CASES:
        assert bool(out.loc[aid, "decode_ok"])
        assert abs(out.loc[aid, "dominant_hz"] - freq) <= bin_hz, (aid, freq)
        # a pure tone's centroid sits near the tone (spectral leakage
        # pulls it slightly; within 15% is far tighter than noise)
        assert abs(out.loc[aid, "centroid_hz"] - freq) <= 0.15 * freq + bin_hz


def test_audio_spectral_failopen():
    import pyarrow as pa

    from snowplow_elasticsearch_loader_ray.pipelines.multimodal import AudioSpectral

    t = pa.table({"audio_id": pa.array([9], pa.int64()),
                  "payload": pa.array([b"junk"], pa.binary())})
    out = AudioSpectral()(t).to_pandas()
    assert not bool(out["decode_ok"][0]) and out["dominant_hz"][0] == 0.0
