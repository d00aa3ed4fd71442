"""Deterministic payload fixtures for the purpose/decompress entries.

The driver's correctness gate needs oracle-checkable inputs for the
reference's non-extraction purposes (``transformJson``,
``Processing.scala:118-132``; ``transformBadRow`` + the 12 fix-ups,
``BadRowTransformer.scala:28-72``) and the magic-byte decompression
stage (``Processing.scala:42-49``). These fixtures are content-defined
here (not derived from testdata), so the paired oracle SQL can embed
the SAME inputs as ``VALUES`` and recompute / pin the expected outputs
independently of the engine.

``BAD_CASES`` expected outputs are hand-derived from the reference
fix-up spec (mirroring ``BadRowTransformerSpec.scala``), NOT produced
by running the engine — the pytest in ``tests/test_payloads.py``
asserts the engine reproduces them, and the driver's oracle re-checks
the same strings at sf0.01.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

#: transformJson fixture: utf-8 payload lines (NDJSON, one per line).
#: Valid rows pass through VERBATIM (spacing preserved); invalid rows
#: become parse_error + base64 payload. (Non-utf8 payloads are covered
#: in pytest only — they cannot ride in a SQL string literal.)
JSON_LINES: list[str] = [
    '{"event":"page_view","n":1}',
    '{ "s" : "v" }',                       # spacing must survive verbatim
    '{"nested":{"a":[1,2,3]},"s":"héllo"}',
    '123',                                  # bare JSON scalar is valid
    'not json at all',
    '{"broken": [1,2',
]

_BADROWS = "iglu:com.snowplowanalytics.snowplow.badrows"

#: transformBadRow fixture: (input line, expected status, expected record).
#: Expected records hand-derived from BadRowTransformer.scala:28-72
#: (rename moves the key to the END of the object; serialize keeps
#: position; circe-noSpaces = compact separators, non-ASCII kept).
BAD_CASES: list[tuple[str, str, str | None]] = [
    # non-SDJ JSON: passthrough value, re-serialized compact
    ('{"b": 1, "a": 2}', "good", '{"b":1,"a":2}'),
    # badrows vendor, string failure + string payload -> _str renames
    ('{"schema":"%s/loader_parsing_error/jsonschema/2-0-0",'
     '"data":{"failure":"boom","payload":"p1"}}' % _BADROWS,
     "good",
     '{"schema":"%s/loader_parsing_error/jsonschema/2-0-0",'
     '"data":{"failure_str":"boom","payload_str":"p1"}}' % _BADROWS),
    # failure object: error array -> error_list; messages fix-ups 7-10
    ('{"schema":"%s/x/jsonschema/1-0-0",'
     '"data":{"failure":{"error":["e1","e2"],"messages":[{"error":"x","json":{"k":1}}]},"other":3}}'
     % _BADROWS,
     "good",
     '{"schema":"%s/x/jsonschema/1-0-0",'
     '"data":{"failure":{"messages":[{"json":"{\\"k\\":1}","error_str":"x"}],'
     '"error_list":["e1","e2"]},"other":3}}' % _BADROWS),
    # failure ARRAY -> failure_list first (fix 1), then fixes 11-12 on its
    # items; payload.raw.parameters serialized (fix 3)
    ('{"schema":"%s/x/jsonschema/1-0-0",'
     '"data":{"failure":[{"error":"e","value":{"v":2}}],'
     '"payload":{"raw":{"parameters":{"p":1}}}}}' % _BADROWS,
     "good",
     '{"schema":"%s/x/jsonschema/1-0-0",'
     '"data":{"payload":{"raw":{"parameters":"{\\"p\\":1}"}},'
     '"failure_list":[{"value":"{\\"v\\":2}","error_str":"e"}]}}' % _BADROWS),
    # other vendor: untouched (compact re-serialization, utf-8 kept)
    ('{"schema":"iglu:com.acme/thing/jsonschema/1-0-0","data":{"failure":"keep é"}}',
     "good",
     '{"schema":"iglu:com.acme/thing/jsonschema/1-0-0","data":{"failure":"keep é"}}'),
    # invalid JSON -> parse_error (record null, payload base64'd)
    ('{oops', "parse_error", None),
]

#: decompress fixture: (payload bytes builder, expected status, expected
#: record). Built lazily so compression runs once at fixture write time.
def _decompress_rows() -> list[tuple[bytes, str, str | None]]:
    import pyarrow as pa

    big = '{"pad":"' + "a" * 2_000_000 + '"}'
    zc = pa.Codec("zstd")
    return [
        (gzip.compress('{"ok":1}'.encode()), "good", '{"ok":1}'),
        ('{"plain":true}'.encode(), "good", '{"plain":true}'),
        (b"\x1f\x8b\x00\x00garbage-not-gzip", "decompress_error", None),
        (gzip.compress(big.encode()), "decompress_error", None),   # > cap
        # REAL zstd round-trip (pyarrow codec writes the content size)
        (zc.compress('{"zstd":true}'.encode()).to_pybytes(), "good",
         '{"zstd":true}'),
        (zc.compress(big.encode()).to_pybytes(), "decompress_error", None),
        (b"\x28\xb5\x2f\xfdcorrupt-zstd-frame", "decompress_error", None),
    ]


def _fixture_dir(root: str, name: str, content_key: bytes) -> str:
    h = hashlib.sha256(content_key).hexdigest()[:12]
    return os.path.join(root, f"payloads-{name}-{h}")


def write_json_fixture(cache_root: str) -> str:
    """→ path of the NDJSON file with JSON_LINES (cached by content)."""
    d = _fixture_dir(cache_root, "json", "\n".join(JSON_LINES).encode())
    path = os.path.join(d, "payloads.ndjson")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(JSON_LINES) + "\n")
        os.replace(tmp, path)
    return path


def write_bad_fixture(cache_root: str) -> str:
    lines = [c[0] for c in BAD_CASES]
    d = _fixture_dir(cache_root, "bad", "\n".join(lines).encode())
    path = os.path.join(d, "payloads.ndjson")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return path


def write_decompress_fixture(cache_root: str) -> str:
    """→ path of a parquet file with a ``payload: binary`` column."""
    rows = _decompress_rows()
    key = b"|".join(r[0][:64] for r in rows)
    d = _fixture_dir(cache_root, "decompress", key)
    path = os.path.join(d, "payloads.parquet")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(
            pa.table({"payload": pa.array([r[0] for r in rows], pa.binary())}),
            tmp)
        os.replace(tmp, path)
    return path


def expected_decompress() -> list[tuple[str, str | None]]:
    return [(status, rec) for _p, status, rec in _decompress_rows()]


# --------------------------------------------------------------------------
# streaming micro-batch fixture (A1 `stream_batches` driver entry)
# --------------------------------------------------------------------------
# Arrival-scripted payload stream for `sources.stream.stream_ingest`
# under (maxBytes=200 B, maxDelay=1.0 s) — the reference's
# `BatchUp.withTimeout(env.batching.maxBytes, env.batching.maxDelay)`
# semantics (Processing.scala:80, combiner :274-298). The plan exercises
# every flush path: size trip (batch includes the tripping item), age
# trip on a later arrival, a single item larger than the budget, and
# the end-of-stream close flush. One payload is invalid JSON so the
# per-batch purpose transform (status counting) is exercised too.

STREAM_MAX_BYTES = 200
STREAM_MAX_DELAY_S = 1.0

# (size_bytes, arrival_time_s, valid_json)
STREAM_PLAN = [
    (80, 0.0, True),    # opens batch 0
    (80, 0.3, False),   # invalid JSON → parse_error record
    (80, 0.6, True),    # 240 B >= 200 → size flush [p0 p1 p2]
    (50, 2.0, True),    # opens batch 1
    (50, 3.5, True),    # poll: age 1.5 s >= 1.0 → delay flush [p3]; opens batch 2
    (300, 3.6, True),   # 350 B >= 200 → size flush [p4 p5]
    (250, 5.0, True),   # alone over budget → size flush [p6]
    (60, 5.2, True),    # opens batch 4 → close flush at end of stream
]

# hand-derived per-batch truth for the plan above:
# (batch, rows, n_bytes, flush_reason, n_good)
STREAM_EXPECTED = [
    (0, 3, 240, "size", 2),
    (1, 1, 50, "delay", 1),
    (2, 2, 350, "size", 2),
    (3, 1, 250, "size", 1),
    (4, 1, 60, "close", 1),
]


def _stream_payload(i: int, size: int, valid: bool) -> bytes:
    if valid:
        head = '{"id": %d, "pad": "' % i
        pad = size - len(head) - 2
        assert pad >= 0, "fixture size too small for the JSON envelope"
        return (head + "x" * pad + '"}').encode()
    head = "notjson %d " % i
    return (head + "x" * (size - len(head))).encode()


def stream_payloads() -> list[tuple[bytes, float]]:
    """→ [(payload_bytes, arrival_time_s)] for the scripted plan."""
    return [(_stream_payload(i, size, valid), t)
            for i, (size, t, valid) in enumerate(STREAM_PLAN)]
