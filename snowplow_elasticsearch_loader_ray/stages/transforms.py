"""Purpose-dispatched per-record transforms + decompression + retry taxonomy.

The reference selects one of three transforms by the configured
``Purpose`` (``Config.scala:90-95``, dispatch ``Processing.scala:92-96``):

- ``Enriched`` → ``transformEnrichedEvent`` — in this engine the
  HTML→text extraction (``stages/extract.py``);
- ``Json`` → ``transformJson`` (``Processing.scala:118-132``) — parse
  the payload as JSON, pass it through verbatim on success, bad-row on
  failure (P3);
- ``Bad`` → ``transformBadRow`` (``Processing.scala:134-150``) +
  ``BadRowTransformer.handleIgluJson`` (``BadRowTransformer.scala:28-72``)
  — the 12 order-sensitive schema-conflict fix-ups (P4).

Also here:

- ``decompress_payloads`` — the source decompression step
  (``Processing.scala:42-49``, S2): zstd/gzip auto-detected by magic
  bytes, per-payload size cap, corrupt payloads → bad rows (never task
  failures). zstd decompression is REAL in every environment: the
  ``zstandard`` module when importable, else pyarrow's bundled zstd
  codec driven by the frame's declared content size (RFC 8878 header
  parse); only content-size-less streaming frames fall back to a
  deterministic bad row on the pyarrow path.
- ``with_retries`` — the bounded retry loop with the
  permanent-vs-transient error split (``ElasticsearchSink.scala:81-104,
  145-198``, W2/W3): deterministic per-row failures become bad rows,
  transient ones are retried with a fixed delay, attempts bounded.

All transforms are row-independent and run under ``map_batches``; the
JSON fix-ups are driver-visible pure functions so the unit tests mirror
``BadRowTransformerSpec.scala`` case-for-case.
"""

from __future__ import annotations

import base64
import gzip
import json
import time
import zlib
from typing import Any, Callable

import pyarrow as pa

try:  # pragma: no cover - not present in this container
    import zstandard as _zstd
except ImportError:
    _zstd = None


def _zstd_content_size(p: bytes) -> int | None:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1).

    Returns None when the frame omits it (streaming frames with
    fcs_flag=0 and no Single_Segment flag) or the header is truncated.
    Needed because pyarrow's zstd codec (the fallback decompressor when
    the ``zstandard`` module is absent) requires the exact output size.
    """
    if len(p) < 6:
        return None
    fhd = p[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_size = (0, 1, 2, 4)[fhd & 0x3]
    off = 5 + (0 if single_segment else 1) + did_size
    try:
        if fcs_flag == 0:
            return p[off] if single_segment else None
        if fcs_flag == 1:
            return int.from_bytes(p[off:off + 2], "little") + 256
        if fcs_flag == 2:
            return int.from_bytes(p[off:off + 4], "little")
        return int.from_bytes(p[off:off + 8], "little")
    except IndexError:
        return None


def _zstd_decompress(p: bytes, max_bytes: int) -> tuple[bytes | None, str | None]:
    """Real zstd decompression with the size cap; never raises.

    Prefers the ``zstandard`` module; falls back to pyarrow's bundled
    zstd codec (always present — Ray Data depends on pyarrow), which
    needs the frame's declared content size. Content-size-less
    streaming frames are a deterministic bad row on the fallback path.
    """
    if _zstd is not None:  # pragma: no cover - module absent here
        try:
            return _zstd.ZstdDecompressor().decompress(
                p, max_output_size=max_bytes), None
        except Exception as e:  # noqa: BLE001
            return None, f"corrupt zstd payload: {e}"
    size = _zstd_content_size(p)
    if size is None:
        return None, "zstd frame without declared content size"
    if size > max_bytes:
        return None, f"decompressed payload exceeds {max_bytes} B cap"
    try:
        import pyarrow as _pa

        out = _pa.Codec("zstd").decompress(p, size)
        return out.to_pybytes(), None
    except Exception as e:  # noqa: BLE001 - poisoned rows must not fail tasks
        return None, f"corrupt zstd payload: {e}"

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

BADROWS_VENDOR = "com.snowplowanalytics.snowplow.badrows"


# --------------------------------------------------------------------------
# S2: decompression (magic-byte auto-detect)
# --------------------------------------------------------------------------

def detect_codec(payload: bytes) -> str:
    """'gzip' | 'zstd' | 'none' by magic bytes (Processing.scala:42-49)."""
    if payload[:2] == GZIP_MAGIC:
        return "gzip"
    if payload[:4] == ZSTD_MAGIC:
        return "zstd"
    return "none"


def decompress_one(payload: bytes, max_bytes: int = 10_000_000) -> tuple[bytes | None, str | None]:
    """→ (decompressed bytes, error string|None). Never raises.

    Mirrors the reference's per-payload decompression with
    ``maxBytesSinglePayload`` (reference.conf:39-42): output larger than
    the cap is a deterministic failure (bad row), as are corrupt frames.
    """
    codec = detect_codec(payload)
    try:
        if codec == "gzip":
            # decompress with an explicit output cap: zlib streams let us
            # stop at max_bytes+1 instead of materializing a zip bomb
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            out = d.decompress(payload, max_bytes + 1)
            if len(out) > max_bytes or d.unconsumed_tail:
                return None, f"decompressed payload exceeds {max_bytes} B cap"
            out += d.flush()
            if len(out) > max_bytes:
                return None, f"decompressed payload exceeds {max_bytes} B cap"
            return out, None
        if codec == "zstd":
            return _zstd_decompress(payload, max_bytes)
        if len(payload) > max_bytes:
            return None, f"payload exceeds {max_bytes} B cap"
        return payload, None
    except (zlib.error, gzip.BadGzipFile, Exception) as e:  # noqa: BLE001 - poisoned rows must not fail tasks
        return None, f"corrupt {codec} payload: {e}"


class DecompressPayloads:
    """``map_batches`` stage: ``(payload: binary)`` → same rows plus
    ``status`` ('good' | 'decompress_error') and ``error`` columns, with
    ``payload`` replaced by the decompressed bytes on good rows; failed
    rows keep the ORIGINAL payload (the dead letter carries the source
    bytes, ``Processing.scala:206-207``)."""

    def __init__(self, max_bytes: int = 10_000_000, column: str = "payload"):
        self.max_bytes = max_bytes
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload: list[bytes | None] = []
        status: list[str] = []
        errors: list[str | None] = []
        for b in batch[self.column].to_pylist():
            data, err = decompress_one(b or b"", self.max_bytes)
            out_payload.append(data if err is None else b)
            status.append("good" if err is None else "decompress_error")
            errors.append(err)
        cols = {name: batch[name] for name in batch.column_names}
        cols[self.column] = pa.array(out_payload, type=pa.binary())
        cols["status"] = pa.array(status, type=pa.string())
        cols["error"] = pa.array(errors, type=pa.string())
        return pa.table(cols)


# --------------------------------------------------------------------------
# P3: transformJson — validate-and-pass-through
# --------------------------------------------------------------------------

def transform_json(payload: bytes) -> tuple[str | None, str | None]:
    """→ (record json string, error). Passthrough preserves the original
    bytes verbatim on success (Processing.scala:118-132: the *source
    string*, not a re-serialization, becomes the record)."""
    try:
        s = payload.decode("utf-8", errors="strict")
        json.loads(s)
        return s, None
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        return None, f"Can't parse JSON: {e}"


# --------------------------------------------------------------------------
# P4: transformBadRow — the 12 order-sensitive fix-ups
# --------------------------------------------------------------------------

def _json_compact(value: Any) -> str:
    """circe ``noSpaces`` equivalent: compact separators, non-ASCII kept."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def _rename_field(obj: Any, field: str) -> None:
    """string → ``field_str``, array → ``field_list``, else unchanged
    (BadRowTransformer.scala:61-66). In-place on dicts only."""
    if not isinstance(obj, dict) or field not in obj:
        return
    v = obj[field]
    if isinstance(v, str):
        obj[field + "_str"] = obj.pop(field)
    elif isinstance(v, list):
        obj[field + "_list"] = obj.pop(field)


def _serialize_field(obj: Any, field: str) -> None:
    """non-string value → compact-JSON string (BadRowTransformer.scala:68-72)."""
    if isinstance(obj, dict) and field in obj and not isinstance(obj[field], str):
        obj[field] = _json_compact(obj[field])


def _at(data: Any, *path: str) -> Any:
    """Walk dict fields; None if any hop is missing / not a dict."""
    cur = data
    for p in path:
        if not isinstance(cur, dict):
            return None
        cur = cur.get(p)
    return cur


def _each(value: Any):
    return value if isinstance(value, list) else ()


def badrow_fixups(data: Any) -> Any:
    """Apply the 12 fixes in order (BadRowTransformer.scala:30-43).

    Order-sensitive: fix 1 renames an array-valued ``failure`` to
    ``failure_list``, which fixes 11-12 then target
    (BadRowTransformerSpec.scala:229-251). Mutates and returns ``data``.
    """
    _rename_field(data, "failure")                               # 1
    _rename_field(data, "payload")                               # 2
    _serialize_field(_at(data, "payload", "raw"), "parameters")  # 3
    failure = _at(data, "failure")
    _rename_field(failure, "error")                              # 4
    _rename_field(failure, "errors")                             # 5
    _rename_field(failure, "message")                            # 6
    for m in _each(_at(data, "failure", "messages")):
        _rename_field(m, "error")                                # 7
        _serialize_field(m, "expectedMapping")                   # 8
        _serialize_field(m, "json")                              # 9
        _rename_field(_at(m, "message") if isinstance(m, dict) else None,
                      "error")                                   # 10
    for item in _each(_at(data, "failure_list")):
        _rename_field(item, "error")                             # 11
        _serialize_field(item, "value")                          # 12
    return data


def _sdj_vendor(schema: Any) -> str | None:
    """Vendor of an iglu schema URI 'iglu:vendor/name/format/version'."""
    if not isinstance(schema, str) or not schema.startswith("iglu:"):
        return None
    parts = schema[len("iglu:"):].split("/")
    return parts[0] if len(parts) == 4 else None


def handle_iglu_json(row: str) -> tuple[Any | None, str | None]:
    """→ (transformed json value, error). Only self-describing JSON whose
    schema vendor is the badrows vendor gets the fix-ups
    (BadRowTransformer.scala:46-57); anything else passes through."""
    try:
        parsed = json.loads(row)
    except json.JSONDecodeError as e:
        return None, f"BadRowTransformer cannot parse row as JSON: {e}"
    if (
        isinstance(parsed, dict)
        and _sdj_vendor(parsed.get("schema")) == BADROWS_VENDOR
        and "data" in parsed
    ):
        parsed["data"] = badrow_fixups(parsed["data"])
    return parsed, None


def transform_badrow(payload: bytes) -> tuple[str | None, str | None]:
    """→ (record json string, error) — Processing.scala:134-150."""
    try:
        s = payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError as e:
        return None, f"BadRowTransformer cannot parse row as JSON: {e}"
    value, err = handle_iglu_json(s)
    if err is not None:
        return None, err
    return _json_compact(value), None


# --------------------------------------------------------------------------
# P1: purpose dispatch as one map_batches stage
# --------------------------------------------------------------------------

PURPOSES: dict[str, Callable[[bytes], tuple[str | None, str | None]]] = {
    "json": transform_json,
    "bad": transform_badrow,
}

JSON_OUT_SCHEMA = pa.schema([
    ("status", pa.string()),
    ("record", pa.string()),
    ("error", pa.string()),
    ("payload_b64", pa.string()),
])


class PurposeTransform:
    """``map_batches`` stage for the non-extraction purposes: payload
    bytes → (status, record | error + base64 payload). The extraction
    purpose ('enriched' analogue) is ``stages/extract.ExtractTransform``;
    together they form the transform registry (SURVEY.md §2 P1)."""

    def __init__(self, purpose: str, column: str = "payload"):
        if purpose not in PURPOSES:
            raise ValueError(f"unknown purpose {purpose!r}; one of {sorted(PURPOSES)}")
        self.fn = PURPOSES[purpose]
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        records: list[str | None] = []
        status: list[str] = []
        errors: list[str | None] = []
        payloads: list[str | None] = []
        for b in batch[self.column].to_pylist():
            rec, err = self.fn(b or b"")
            records.append(rec)
            errors.append(err)
            status.append("good" if err is None else "parse_error")
            # base64 original payload rides with failures only
            # (Processing.scala:206-207)
            payloads.append(None if err is None
                            else base64.b64encode(b or b"").decode("ascii"))
        return pa.table({
            "status": pa.array(status, type=pa.string()),
            "record": pa.array(records, type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
            "payload_b64": pa.array(payloads, type=pa.string()),
        }, schema=JSON_OUT_SCHEMA)


# --------------------------------------------------------------------------
# W2/W3: permanent-vs-transient classification + bounded retry
# --------------------------------------------------------------------------

#: deterministic failure types never retried (ElasticsearchSink.scala:35-39)
PERMANENT_ERRORS: tuple[type[BaseException], ...] = (
    ValueError, TypeError, UnicodeDecodeError, json.JSONDecodeError,
)


class PermanentError(RuntimeError):
    """A failure classified permanent: surfaced, never retried."""


def with_retries(fn: Callable[[], Any], *, attempts: int = 5, delay_s: float = 1.0,
                 permanent: tuple[type[BaseException], ...] = PERMANENT_ERRORS,
                 sleep: Callable[[float], None] = time.sleep) -> Any:
    """Run ``fn`` with the reference's retry policy: 5 attempts × 1 s
    delay by default (reference.conf:31-36), permanent error types fail
    immediately (ElasticsearchSink.scala:145-198). The last transient
    error re-raises after the budget is spent."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except permanent as e:
            raise PermanentError(str(e)) from e
        except Exception as e:  # noqa: BLE001 - transient channel
            last = e
            if i < attempts - 1:
                sleep(delay_s)
    assert last is not None
    raise last


# --------------------------------------------------------------------------
# ES ingest-node processor chain (the `_ingest/pipeline` surface: the
# loader's documents pass through declarative processors before
# indexing; reference context: ES-side ingest pipelines that the
# loader's consumers attach to the target index)
# --------------------------------------------------------------------------

#: processors supported by the vectorized executor; anything else refuses
_INGEST_PROCESSORS = ("lowercase", "gsub", "set", "trim")


def apply_ingest_pipeline(batch: pa.Table, processors: list[dict]) -> pa.Table:
    """Run an ES-style ingest-pipeline processor list over one Arrow
    batch — each processor is one vectorized kernel call, applied in
    list order (the ES contract). Supported: ``lowercase`` (field),
    ``gsub`` (field, pattern, replacement — RE2, global), ``set``
    (field, value — constant column, overwrite), ``trim`` (field,
    ASCII whitespace both ends). Unknown processors or fields raise
    ``ValueError`` (fail the batch loudly, the pipeline's
    on_failure-absent default)."""
    import pyarrow.compute as pc

    for proc in processors:
        if len(proc) != 1:
            raise ValueError(f"malformed processor {proc!r}")
        kind, spec = next(iter(proc.items()))
        if kind not in _INGEST_PROCESSORS:
            raise ValueError(f"unsupported ingest processor {kind!r}")
        if kind == "set":
            col = pa.array([spec["value"]] * batch.num_rows)
            if spec["field"] in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(spec["field"]),
                    spec["field"], col)
            else:
                batch = batch.append_column(spec["field"], col)
            continue
        field = spec["field"]
        if field not in batch.column_names:
            raise ValueError(f"ingest processor field {field!r} absent")
        col = batch[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if kind == "lowercase":
            col = pc.utf8_lower(col)
        elif kind == "gsub":
            col = pc.replace_substring_regex(
                col, spec["pattern"], replacement=spec["replacement"])
        elif kind == "trim":
            col = pc.utf8_trim(col, " \t\n\r")
        batch = batch.set_column(batch.column_names.index(field),
                                 field, col)
    return batch
