"""Extraction byte-identity + dead-letter accounting.

The engine analogue of the reference's golden transform tests
(TransformEnrichedEventSpec.scala:41-95) and the three-category bad-row
accounting IT (EnrichedSpec.scala:54-79).
"""

import numpy as np
import pyarrow as pa

from snowplow_elasticsearch_loader_ray.config import IndexConfig
from snowplow_elasticsearch_loader_ray.sources import synth
from snowplow_elasticsearch_loader_ray.stages.extract import (
    E_EXTRACT, E_SCHEMA, E_SIZE, GOOD, ExtractTransform,
)

CFG = IndexConfig(max_record_bytes=100_000)


def test_byte_identity_every_row():
    tbl = synth.generate_part(0, 1000)
    out = ExtractTransform(CFG)(tbl)
    status = np.array(out["status"].to_pylist())
    good = status == GOOD
    got = np.array(out["text"].to_pylist(), dtype=object)[good]
    want = np.array(tbl["text"].to_pylist(), dtype=object)[good]
    assert (got == want).all(), "extract(html) must be byte-identical to text"


def test_bad_row_accounting_exact():
    n = 1000
    tbl = synth.generate_part(0, n)
    out = ExtractTransform(CFG)(tbl)
    from collections import Counter

    counts = Counter(out["status"].to_pylist())
    expected = synth.expected_bad_counts(n)
    assert counts[GOOD] == expected["good"]
    assert counts[E_EXTRACT] == expected["extract_error"]
    assert counts[E_SIZE] == expected["size_violation"]
    assert counts[E_SCHEMA] == expected["schema_violation"]


def test_bad_rows_carry_payload_and_error():
    tbl = synth.generate_part(0, 300)
    out = ExtractTransform(CFG)(tbl)
    for r in out.to_pylist():
        if r["status"] == GOOD:
            assert r["error"] is None and r["payload_b64"] is None
            assert r["text"] is not None
        else:
            assert r["error"]
            assert r["payload_b64"] is not None
            import base64

            base64.b64decode(r["payload_b64"])  # valid b64, truncated payload


def test_doc_id_stable_from_url():
    tbl = synth.generate_part(5, 8)
    out = ExtractTransform(CFG)(tbl)
    for r in out.to_pylist():
        assert r["doc_id"] == synth.hash_url64(r["url"])


def test_escaping_roundtrip():
    text = "a < b & c > d &amp; literal &lt;x&gt;"
    url = pa.array(["https://e.example/x"])
    html = synth.render_html(url, pa.array([text]))
    batch = pa.table({
        "url": url,
        "warc_ts": pa.array([synth.ANCHOR_US], type=pa.timestamp("us", tz="UTC")),
        "html": html.cast(pa.binary()),
        "lang": pa.array(["en"]),
    })
    out = ExtractTransform(CFG)(batch)
    assert out["status"][0].as_py() == GOOD
    assert out["text"][0].as_py() == text
