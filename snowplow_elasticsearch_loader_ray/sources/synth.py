"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1-§3).

Schema matches BASELINE.json ``input_hint`` exactly:
``(url: string, warc_ts: timestamp[us, UTC], html: binary, text: string,
lang: string)``. The ``html`` column is rendered FROM the generated
``text`` with a fixed template, so the engine's extractor and this
generator are inverse by construction — the per-url byte-identity
invariant (the engine analogue of the reference's TSV→JSON golden
tests, ``TransformEnrichedEventSpec.scala:41-95``) is testable on every
row.

Everything is seeded (seed=42) and derived per-row from hash(url), so
any row is stable across scales and partition counts. Generation is
vectorized: splitmix64 numpy mixing for randomness, Zipf sampling via
searchsorted over a cumulative table, Arrow ``take`` + ``binary_join``
for string assembly — no per-token Python loop.

Bad-row injection (FIXTURES.md §2), exact counts derivable from the
modular rules:
- ``i % 101 == 7``   → malformed: html is invalid UTF-8 garbage
- ``i % 5003 == 17`` → oversized: text larger than ``max_record_bytes``
- ``i % 307 == 29``  → schema violation: lang empty
- ``i % 401 == 31``  → schema violation: warc_ts null
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
ANCHOR_US = 1_773_137_730_000_000  # 2026-03-10T10:15:30Z in epoch micros
TS_STEP_S = 137

MALFORMED_MOD, MALFORMED_REM = 101, 7
OVERSIZED_MOD, OVERSIZED_REM = 5003, 17
BADLANG_MOD, BADLANG_REM = 307, 29
BADTS_MOD, BADTS_REM = 401, 31

PUNCT = np.array(["", ",", ".", "!", "?", ";", ":", "&"])
NON_ASCII = np.array(["üöä", "café", "naïve", "møller", "日本語", "señor"])
MALFORMED_HTML = b"\x80\x81\xfe\xff not-a-page \xc3\x28"

_SYLLABLES = [
    "ba", "co", "di", "fu", "ga", "he", "ji", "ko", "lu", "ma",
    "ne", "po", "qua", "ri", "so", "tu", "ve", "wo", "xi", "ze",
    "ran", "sel", "tor", "min", "par", "lok", "vex", "dun", "fir", "gal",
    "hem", "jin", "kor", "lat", "mos", "nil", "orb", "pel", "rud", "syn",
]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _uniform(x: np.ndarray) -> np.ndarray:
    return _mix64(x).astype(np.float64) / float(2**64)


def build_vocab() -> list[str]:
    """10k deterministic pseudo-words (lowercase ascii, tokenizer-atomic)."""
    words = []
    n_syll = len(_SYLLABLES)
    for i in range(VOCAB_SIZE):
        a, rem = divmod(i, n_syll * n_syll)
        b_, c = divmod(rem, n_syll)
        w = _SYLLABLES[a % n_syll] + _SYLLABLES[b_] + _SYLLABLES[c]
        words.append(w)
    return words


_CUMP = None


def _zipf_cum() -> np.ndarray:
    global _CUMP
    if _CUMP is None:
        p = 1.0 / np.arange(1, VOCAB_SIZE + 1, dtype=np.float64) ** ZIPF_S
        _CUMP = np.cumsum(p / p.sum())
    return _CUMP


def hash_url64(url: str) -> int:
    """Stable positive-int64 doc_id from url (blake2b-63).

    Plays the reference's ``event_id`` → ES ``_id`` keyed-upsert role
    (``ElasticsearchSink.scala:92``): re-ingesting the same url yields
    the same doc_id. At true 1e12-doc scale a 128-bit id (two int64
    columns) would be used to keep collision odds negligible.
    """
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF


HTML_PRE_TITLE = "<html><head><title>"
HTML_POST_TITLE = (
    "</title>\n<style>body { margin: 0; font-family: serif; }</style>\n"
    "<script>var tracked = true; load();</script>\n</head>\n<body>\n"
    '<nav><a href="/">home</a> | <a href="/about">about</a></nav>\n'
    '<div class="main"><div class="article"><p>'
)
HTML_POST_TEXT = (
    "</p></div></div>\n<footer>&copy; example corp</footer>\n</body></html>"
)


def render_html(urls: pa.Array, texts: pa.Array) -> pa.Array:
    """Fixed-template page render; inverse of stages.extract.extract_batch."""
    esc = pc.replace_substring(texts, pattern="&", replacement="&amp;")
    esc = pc.replace_substring(esc, pattern="<", replacement="&lt;")
    esc = pc.replace_substring(esc, pattern=">", replacement="&gt;")
    return pc.binary_join_element_wise(
        pa.scalar(HTML_PRE_TITLE), urls, pa.scalar(HTML_POST_TITLE),
        esc, pa.scalar(HTML_POST_TEXT), pa.scalar(""),
    )


def generate_part(lo: int, hi: int, max_record_bytes: int = 100_000) -> pa.Table:
    """Rows [lo, hi) of the corpus — pure function of the row index."""
    n = hi - lo
    i = np.arange(lo, hi, dtype=np.uint64)
    vocab = build_vocab()
    vocab_pa = pa.array(vocab, type=pa.string())
    cum = _zipf_cum()

    # language (seeded choice: ~90% en)
    lu = _uniform(i ^ np.uint64(0xA5A5A5A5))
    langs = np.full(n, "en", dtype="U2")
    langs[lu > 0.90] = "de"
    langs[lu > 0.94] = "fr"
    langs[lu > 0.97] = "da"

    urls = [f"https://site{int(k) % 97}.example/{langs[j]}/page/{int(k)}"
            for j, k in enumerate(i)]
    seeds = np.array([hash_url64(u) for u in urls], dtype=np.uint64)

    # doc length ~ lognormal(mean ≈ 300 tokens), from two per-row uniforms
    u1 = _uniform(seeds ^ np.uint64(0x1111))
    u2 = _uniform(seeds ^ np.uint64(0x2222))
    z = np.sqrt(-2.0 * np.log(np.clip(u1, 1e-12, 1.0))) * np.cos(2 * np.pi * u2)
    sigma, mu = 0.5, np.log(300.0) - 0.125
    dl = np.clip(np.exp(mu + sigma * z), 5, 1200).astype(np.int64)
    oversized = (i % OVERSIZED_MOD) == OVERSIZED_REM
    dl[oversized] = max_record_bytes // 5 + 101

    # flat token stream: rank via inverse-CDF Zipf on splitmix(seed, pos)
    total = int(dl.sum())
    doc_idx = np.repeat(np.arange(n), dl)
    starts = np.concatenate(([0], np.cumsum(dl)[:-1]))
    pos = np.arange(total, dtype=np.uint64) - starts[doc_idx].astype(np.uint64)
    rnd = _mix64(seeds[doc_idx] ^ (pos * np.uint64(0x9E3779B97F4A7C15)))
    u = rnd.astype(np.float64) / float(2**64)
    ranks = np.searchsorted(cum, u, side="right").clip(0, VOCAB_SIZE - 1)
    tokens = vocab_pa.take(pa.array(ranks, type=pa.int64()))

    # decorations: 8% punctuation suffix, 2% non-ascii word substitution
    dec = (_mix64(rnd ^ np.uint64(0x3333)) % np.uint64(100)).astype(np.int64)
    punct_idx = np.zeros(total, dtype=np.int64)
    m_punct = dec >= 90
    punct_idx[m_punct] = (dec[m_punct] - 90) % (len(PUNCT) - 1) + 1
    punct_pa = pa.array(PUNCT[punct_idx])
    tokens = pc.binary_join_element_wise(tokens, punct_pa, pa.scalar(""))
    m_na = dec == 89
    if m_na.any():
        na_full = pa.array(NON_ASCII[(rnd % np.uint64(len(NON_ASCII))).astype(np.int64)])
        tokens = pc.if_else(pa.array(m_na), na_full, tokens)

    offsets = np.concatenate(([0], np.cumsum(dl))).astype(np.int64)
    if isinstance(tokens, pa.ChunkedArray):   # kernels chunk large batches
        tokens = tokens.combine_chunks()
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), tokens)
    texts = pc.binary_join(lists, pa.scalar(" "))
    texts = pc.cast(texts, pa.string())

    urls_pa = pa.array(urls, type=pa.string())
    html = pc.cast(render_html(urls_pa, texts), pa.binary())
    malformed = (i % MALFORMED_MOD) == MALFORMED_REM
    if malformed.any():
        html = pc.if_else(pa.array(malformed), pa.scalar(MALFORMED_HTML, type=pa.binary()), html)

    ts_us = (ANCHOR_US + i.astype(np.int64) * (TS_STEP_S * 1_000_000))
    ts_valid = (i % BADTS_MOD) != BADTS_REM
    ts = pa.array(np.where(ts_valid, ts_us, 0), type=pa.timestamp("us", tz="UTC"),
                  mask=~ts_valid)
    lang_bad = (i % BADLANG_MOD) == BADLANG_REM
    langs_out = langs.astype(object)
    langs_out[lang_bad] = ""

    return pa.table(
        {
            "url": urls_pa,
            "warc_ts": ts,
            "html": html,
            "text": texts,
            "lang": pa.array(langs_out, type=pa.string()),
        }
    )


def generate_pages(out_dir: str, n_rows: int, n_parts: int,
                   max_record_bytes: int = 100_000, overwrite: bool = False) -> list[str]:
    """Write the corpus as ``out_dir/part-<k>.parquet``; returns file paths.

    Idempotent: if all part files already exist the corpus is reused —
    generation is deterministic so the bytes are equivalent.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"part-{k:04d}.parquet") for k in range(n_parts)]
    if not overwrite and all(os.path.exists(p) for p in paths):
        return paths
    bounds = np.linspace(0, n_rows, n_parts + 1).astype(int)
    todo = [(k, p) for k, p in enumerate(paths)]

    def _write_one(k: int, path: str) -> None:
        tbl = generate_part(int(bounds[k]), int(bounds[k + 1]), max_record_bytes)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, path)

    # each part is a pure function of its row range, so generation
    # parallelizes as Ray tasks when a session is live (bench path);
    # bytes are identical either way
    import ray

    if ray.is_initialized() and len(todo) > 1:
        gen = ray.remote(num_cpus=1)(_write_one)
        ray.get([gen.remote(k, p) for k, p in todo])
    else:
        for k, p in todo:
            _write_one(k, p)
    return paths


def expected_bad_counts(n_rows: int) -> dict[str, int]:
    """Exact dead-letter accounting (the EnrichedSpec.scala:54-79 analogue)."""
    i = np.arange(n_rows, dtype=np.int64)
    malformed = (i % MALFORMED_MOD) == MALFORMED_REM
    oversized = (i % OVERSIZED_MOD) == OVERSIZED_REM
    schema = ((i % BADLANG_MOD) == BADLANG_REM) | ((i % BADTS_MOD) == BADTS_REM)
    # precedence mirrors the extract stage: malformed > oversized > schema
    oversized &= ~malformed
    schema &= ~malformed & ~oversized
    return {
        "extract_error": int(malformed.sum()),
        "size_violation": int(oversized.sum()),
        "schema_violation": int(schema.sum()),
        "good": int(n_rows - malformed.sum() - oversized.sum() - schema.sum()),
    }


def generate_queries(seed: int = SEED) -> list[tuple[int, str, int]]:
    """Fixed 50-query set (FIXTURES.md §3): (qid, query, k=10)."""
    vocab = build_vocab()
    rng = np.random.default_rng(seed)
    qs: list[tuple[int, str, int]] = []
    qid = 0
    for r in range(10):                      # head single-term
        qs.append((qid, vocab[r], 10)); qid += 1
    for r in rng.choice(np.arange(2000, 6000), 10, replace=False):  # tail single-term
        qs.append((qid, vocab[int(r)], 10)); qid += 1
    for _ in range(20):                      # two-term
        a, b = rng.choice(500, 2, replace=False)
        qs.append((qid, f"{vocab[int(a)]} {vocab[int(b)]}", 10)); qid += 1
    for _ in range(10):                      # 3-5 term
        m = int(rng.integers(3, 6))
        ws = rng.choice(1500, m, replace=False)
        qs.append((qid, " ".join(vocab[int(w)] for w in ws), 10)); qid += 1
    return qs
