"""Unit tests for the purpose transforms, decompression and retry taxonomy.

Mirrors the reference specs case-for-case:
- ``BadRowTransformerSpec.scala:23-42`` (17 cases — the 12 fix-ups +
  pass-throughs),
- ``ProcessingSpec.scala:277-350`` (compression round-trips + corrupt),
- ``ElasticsearchSinkSpec.scala:27-38`` (permanent vs transient retry).
"""

import gzip
import json

import pyarrow as pa
import pytest

from snowplow_elasticsearch_loader_ray.stages import transforms as T


def sdj(data) -> str:
    return json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow.badrows/loader_parsing_error/jsonschema/2-0-0",
        "data": data,
    })


def fixed(data):
    out, err = T.handle_iglu_json(sdj(data))
    assert err is None
    return out["data"]


# --------------------------------------------------------------------------
# P4: the 12 fix-ups (BadRowTransformerSpec case order)
# --------------------------------------------------------------------------

def test_pass_through_non_self_describing_json():
    out, err = T.handle_iglu_json('{"foo":"bar"}')
    assert err is None and out == {"foo": "bar"}


def test_pass_through_non_badrows_schema():
    row = {"schema": "iglu:com.example/event/jsonschema/1-0-0",
           "data": {"failure": "oops"}}
    out, err = T.handle_iglu_json(json.dumps(row))
    assert err is None and out == row          # vendor gate: untouched


def test_rename_string_failure_to_failure_str():
    assert fixed({"failure": "some error"}) == {"failure_str": "some error"}


def test_rename_array_failure_to_failure_list():
    assert fixed({"failure": ["e1", "e2"]}) == {"failure_list": ["e1", "e2"]}


def test_leave_object_failure_unchanged():
    data = {"failure": {"timestamp": "t", "actual": 1}}
    assert fixed(json.loads(json.dumps(data))) == data


def test_serialize_non_string_parameters():
    out = fixed({"payload": {"raw": {"parameters": {"key": "value"}}}})
    assert out["payload"]["raw"]["parameters"] == '{"key":"value"}'


def test_rename_string_payload_to_payload_str():
    assert fixed({"payload": "raw payload string"}) == {"payload_str": "raw payload string"}


def test_rename_array_payload_to_payload_list():
    assert fixed({"payload": [1, 2]}) == {"payload_list": [1, 2]}


def test_rename_error_fields_inside_failure_object():
    out = fixed({"failure": {"error": "e", "errors": "es", "message": "m"}})
    assert out["failure"] == {"error_str": "e", "errors_str": "es", "message_str": "m"}


def test_failure_messages_fixups():
    out = fixed({"failure": {"messages": [
        {"error": "e", "expectedMapping": {"a": 1}, "json": [1], "message": {"error": "inner"}},
    ]}})
    m = out["failure"]["messages"][0]
    assert m["error_str"] == "e"
    assert m["expectedMapping"] == '{"a":1}'
    assert m["json"] == "[1]"
    assert m["message"] == {"error_str": "inner"}


def test_fix_order_failure_list_then_item_fixups():
    """Fix 1 renames array failure → failure_list, fixes 11-12 then hit
    the items (BadRowTransformerSpec.scala:229-251)."""
    out = fixed({"failure": [{"error": "e1", "value": {"v": 2}}]})
    assert out["failure_list"] == [{"error_str": "e1", "value": '{"v":2}'}]


def test_transform_badrow_invalid_json_is_error():
    rec, err = T.transform_badrow(b"\xff\xfe not json")
    assert rec is None and "cannot parse row" in err


# --------------------------------------------------------------------------
# P3: transformJson passthrough
# --------------------------------------------------------------------------

def test_transform_json_passthrough_preserves_source_bytes():
    src = b'{ "a" :  1 }'                      # odd spacing preserved verbatim
    rec, err = T.transform_json(src)
    assert err is None and rec == '{ "a" :  1 }'


def test_transform_json_failure_channel():
    rec, err = T.transform_json(b"not json")
    assert rec is None and err.startswith("Can't parse JSON")


def test_purpose_transform_batch_split():
    batch = pa.table({"payload": pa.array(
        [b'{"ok":1}', b"nope", None], type=pa.binary())})
    out = T.PurposeTransform("json")(batch)
    assert out["status"].to_pylist() == ["good", "parse_error", "parse_error"]
    assert out["record"].to_pylist()[0] == '{"ok":1}'
    assert out["payload_b64"].to_pylist()[0] is None
    assert out["payload_b64"].to_pylist()[1] is not None  # base64 original rides along


def test_purpose_transform_unknown_purpose():
    with pytest.raises(ValueError):
        T.PurposeTransform("enriched-nope")


# --------------------------------------------------------------------------
# S2: decompression
# --------------------------------------------------------------------------

def test_detect_codec_magic_bytes():
    assert T.detect_codec(gzip.compress(b"x")) == "gzip"
    assert T.detect_codec(b"\x28\xb5\x2f\xfd rest") == "zstd"
    assert T.detect_codec(b"plain") == "none"


def test_gzip_roundtrip_and_corrupt():
    data, err = T.decompress_one(gzip.compress(b"hello world"))
    assert err is None and data == b"hello world"
    corrupt = gzip.compress(b"hello world")[:-4] + b"\x00\x00\x00\x00"
    data, err = T.decompress_one(corrupt)
    assert data is None and "corrupt gzip" in err


def test_decompress_size_cap():
    big = gzip.compress(b"a" * 1000)
    data, err = T.decompress_one(big, max_bytes=100)
    assert data is None and "cap" in err


def test_decompress_batch_stage():
    batch = pa.table({"payload": pa.array(
        [gzip.compress(b"ok"), b"plain", b"\x1f\x8b broken"], type=pa.binary())})
    out = T.DecompressPayloads()(batch)
    assert out["status"].to_pylist() == ["good", "good", "decompress_error"]
    assert out["payload"].to_pylist()[:2] == [b"ok", b"plain"]


# --------------------------------------------------------------------------
# W2/W3: retry taxonomy
# --------------------------------------------------------------------------

def test_retry_transient_then_success():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert T.with_retries(flaky, sleep=lambda _s: None) == "ok"
    assert len(calls) == 3


def test_retry_permanent_fails_immediately():
    calls = []

    def bad():
        calls.append(1)
        raise ValueError("deterministic")

    with pytest.raises(T.PermanentError):
        T.with_retries(bad, sleep=lambda _s: None)
    assert len(calls) == 1


def test_retry_budget_exhausted_reraises_last():
    def always():
        raise OSError("still down")

    with pytest.raises(OSError):
        T.with_retries(always, attempts=3, sleep=lambda _s: None)


def test_zstd_real_roundtrip_via_pyarrow_codec():
    """S2 zstd path is REAL without the zstandard module: pyarrow's
    bundled codec + RFC 8878 content-size header parse
    (ProcessingSpec.scala:277-350 round-trip analogue)."""
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.stages import transforms as T

    payload = b'{"zstd": "roundtrip", "n": 42}'
    comp = pa.Codec("zstd").compress(payload).to_pybytes()
    assert T.detect_codec(comp) == "zstd"
    out, err = T.decompress_one(comp, max_bytes=1_000_000)
    assert err is None and out == payload
    # over-cap declared size -> deterministic bad row, no decompression
    big = pa.Codec("zstd").compress(b"x" * 500_000).to_pybytes()
    out, err = T.decompress_one(big, max_bytes=100)
    assert out is None and "cap" in err
    # corrupt frame body -> bad row, never a raise
    out, err = T.decompress_one(comp[:8] + b"\x00\x00\x00\x00", max_bytes=1_000)
    assert out is None and err is not None


def test_zstd_content_size_header_parse():
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.stages.transforms import (
        _zstd_content_size)

    for n in (0, 1, 255, 256, 300, 70_000, 1 << 20):
        comp = pa.Codec("zstd").compress(b"a" * n).to_pybytes()
        assert _zstd_content_size(comp) == n, n
    assert _zstd_content_size(b"\x28\xb5\x2f\xfd") is None   # truncated


def test_apply_ingest_pipeline_processors():
    import pyarrow as pa
    import pytest as _pytest

    from snowplow_elasticsearch_loader_ray.stages.transforms import (
        apply_ingest_pipeline)

    b = pa.table({
        "source": pa.array(["SrcA", "srcb"]),
        "text": pa.array(["  hello aeiou world  ", "xyz"]),
    })
    out = apply_ingest_pipeline(b, [
        {"lowercase": {"field": "source"}},
        {"gsub": {"field": "text", "pattern": "[aeiou]+",
                  "replacement": "_"}},
        {"set": {"field": "tag", "value": "v1"}},
        {"trim": {"field": "text"}},
    ])
    assert out["source"].to_pylist() == ["srca", "srcb"]
    # gsub runs BEFORE trim (list order): vowel runs collapse, then
    # the edges trim
    assert out["text"].to_pylist() == ["h_ll_ _ w_rld", "xyz"]
    assert out["tag"].to_pylist() == ["v1", "v1"]
    # set overwrites an existing column
    out2 = apply_ingest_pipeline(out, [{"set": {"field": "tag",
                                                "value": "v2"}}])
    assert out2["tag"].to_pylist() == ["v2", "v2"]
    # unknown processor / absent field refuse loudly
    with _pytest.raises(ValueError):
        apply_ingest_pipeline(b, [{"nope": {"field": "text"}}])
    with _pytest.raises(ValueError):
        apply_ingest_pipeline(b, [{"trim": {"field": "missing"}}])
