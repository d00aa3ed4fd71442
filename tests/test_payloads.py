"""End-to-end payload ingest (Json / Bad purposes over NDJSON files)."""

import gzip
import json
import os

import pyarrow.parquet as pq
import pytest

from snowplow_elasticsearch_loader_ray.pipelines.payloads import ingest_payloads


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    p = d / "events.jsonl"
    lines = []
    for i in range(50):
        lines.append(json.dumps({"event": i, "ok": True}))
    lines.append("this is not json")
    lines.append('{"truncated": ')
    p.write_text("\n".join(lines))
    return str(p)


def test_json_purpose_counts_and_records(ray_session, jsonl_file, tmp_path):
    out = str(tmp_path / "out")
    counters = ingest_payloads(jsonl_file, out, purpose="json")
    assert counters["good"] == 50
    assert counters["parse_error"] == 2
    good = pq.read_table(os.path.join(out, "records", "status=good"))
    # passthrough preserves source strings verbatim
    recs = sorted(good["record"].to_pylist())
    assert json.loads(recs[0])["ok"] is True
    # resume: second call returns committed counters without recompute
    assert ingest_payloads(jsonl_file, out, purpose="json") == counters


def test_bad_purpose_applies_fixups(ray_session, tmp_path):
    p = tmp_path / "bad.jsonl"
    sdj = {
        "schema": "iglu:com.snowplowanalytics.snowplow.badrows/loader_parsing_error/jsonschema/2-0-0",
        "data": {"failure": "boom", "payload": "raw"},
    }
    p.write_text("\n".join([json.dumps(sdj), '{"plain": 1}']))
    out = str(tmp_path / "out")
    counters = ingest_payloads(str(p), out, purpose="bad")
    assert counters["good"] == 2
    recs = pq.read_table(os.path.join(out, "records", "status=good"))["record"].to_pylist()
    fixed = next(json.loads(r) for r in recs if "schema" in r)
    assert fixed["data"] == {"failure_str": "boom", "payload_str": "raw"}


def test_compressed_parquet_payloads_roundtrip(ray_session, tmp_path):
    import pyarrow as pa

    payloads = [
        gzip.compress(json.dumps({"n": i}).encode()) for i in range(20)
    ] + [b'{"plain": true}', b"\x1f\x8b corrupt-gzip-frame"]
    p = tmp_path / "payloads.parquet"
    pq.write_table(pa.table({"payload": pa.array(payloads, pa.binary())}), str(p))
    out = str(tmp_path / "out")
    counters = ingest_payloads(str(p), out, purpose="json", decompress=True)
    assert counters["good"] == 21
    assert counters["decompress_error"] == 1
    recs = pq.read_table(os.path.join(out, "records", "status=good"))["record"].to_pylist()
    assert '{"n": 7}' in recs
