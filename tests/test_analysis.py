"""Text-analysis ops vs DuckDB oracles over the driver's documents table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from snowplow_elasticsearch_loader_ray.pipelines import analysis as A

SF = "/root/testdata/sf0.001"
TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_quality_stats_vs_duckdb(docs):
    got = A.quality_stats(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    stop_sql = ", ".join(f"'{s}'" for s in A.STOPWORDS)
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_types,
               len(list_filter(toks, x -> x IN ({stop_sql}))) AS n_stopwords,
               CASE WHEN len(toks)=0 THEN 0.0
                    ELSE len(list_filter(toks, x -> x IN ({stop_sql}))) / len(toks)
               END AS stopword_ratio
        FROM (SELECT doc_id, {TOK} AS toks FROM '{SF}/documents.parquet')
        ORDER BY doc_id
    """).df()
    con.close()
    np.testing.assert_array_equal(got["n_tokens"], want["n_tokens"])
    np.testing.assert_array_equal(got["n_types"], want["n_types"])
    np.testing.assert_array_equal(got["n_stopwords"], want["n_stopwords"])
    np.testing.assert_array_equal(got["stopword_ratio"], want["stopword_ratio"])


def test_quality_max_tf(docs):
    got = A.quality_stats(docs).to_pandas().set_index("doc_id")
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))[:50]:
        c = Counter(re.findall(r"[a-z0-9]+", text.lower()))
        assert got.loc[doc_id, "max_tf"] == (max(c.values()) if c else 0)


def test_lang_id_deterministic(docs):
    out1 = A.lang_id(docs).to_pandas().sort_values("doc_id")
    out2 = A.lang_id(docs).to_pandas().sort_values("doc_id")
    assert (out1["pred_lang"].values == out2["pred_lang"].values).all()
    assert set(out1["pred_lang"]) <= set(A.LANG_PROFILES) | {"und"}


def test_lang_id_profiles():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the cat and the dog is on it for sure",
            "der hund und die katze ist nicht da",
            "le chat et la souris est dans une maison",
            "xyzzy qwerty",
        ],
    }))
    out = A.lang_id(ds).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist() == ["en", "de", "fr", "und"]


def test_fingerprint_order_sensitive(docs):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma", "gamma beta alpha", "alpha beta gamma"],
    }))
    out = A.fingerprints(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "fingerprint"] == out.loc[3, "fingerprint"]
    assert out.loc[1, "fingerprint"] != out.loc[2, "fingerprint"]
    # stable across runs
    out2 = A.fingerprints(ds).to_pandas().set_index("doc_id")
    assert out.loc[2, "fingerprint"] == out2.loc[2, "fingerprint"]


def test_hll_error_bounds_and_merge():
    import numpy as np

    from snowplow_elasticsearch_loader_ray.pipelines.analysis import (
        hll_block_registers, hll_estimate,
    )

    for n in (100, 5_000, 200_000, 1_000_000):
        est = hll_estimate(hll_block_registers(np.arange(n, dtype=np.int64)))
        assert abs(est - n) / n < 0.03, (n, est)
    # the HLL merge (elementwise max) equals the sketch of the union
    a = hll_block_registers(np.arange(0, 60_000, dtype=np.int64))
    b = hll_block_registers(np.arange(30_000, 100_000, dtype=np.int64))
    u = hll_block_registers(np.arange(0, 100_000, dtype=np.int64))
    assert (np.maximum(a, b) == u).all()


def test_hll_dataset_matches_exact(ray_session):
    import numpy as np
    import ray

    from snowplow_elasticsearch_loader_ray.pipelines.analysis import hll_cardinality

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40_000, size=120_000)      # ~37k distinct
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})) \
        .map_batches(lambda b: b, batch_format="pyarrow", batch_size=10_000)
    est = hll_cardinality(ds, "v")
    exact = len(np.unique(vals))
    assert abs(est - exact) / exact < 0.03, (est, exact)


def test_repetition_stats_planted():
    from snowplow_elasticsearch_loader_ray.pipelines.analysis import RepetitionStats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "spam ham spam ham spam ham spam ham spam ham",  # one dominant bigram
            "one two three four five six seven eight nine ten",  # clean
            "x y z x y z x y z",                              # repeated trigram
            "a b",                                            # <3 tokens: dropped
        ]),
    })
    out = RepetitionStats()(t).to_pandas().set_index("doc_id")
    assert 4 not in out.index
    # doc 1: 9 bigrams, "spam ham" occurs 5 times -> flagged via top-bigram
    assert out.loc[1, "n_bigrams"] == 9 and out.loc[1, "top_bigram_n"] == 5
    assert bool(out.loc[1, "flagged"])
    # doc 2: all bigrams distinct, no dup trigrams -> clean
    assert out.loc[2, "top_bigram_n"] == 1 and out.loc[2, "dup_trigram_n"] == 0
    assert not bool(out.loc[2, "flagged"])
    # doc 3: 7 trigrams, 3 distinct -> 4 duplicates -> flagged
    assert out.loc[3, "n_trigrams"] == 7 and out.loc[3, "dup_trigram_n"] == 4
    assert bool(out.loc[3, "flagged"])


def test_misra_gries_guarantees(ray_session):
    import ray
    from snowplow_elasticsearch_loader_ray.pipelines.analysis import heavy_hitters

    docs = pa.table({"text": pa.array(
        ["alpha beta " * 30 + "tail%d tail%d " % (i, i + 1) for i in range(50)])})
    ds = ray.data.from_arrow(docs).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=7)
    k = 8
    got, bound = heavy_hitters(ds, k=k, top=10)
    est = dict(zip(got["term"].to_pylist(), got["est"].to_pylist()))
    # exact truth
    toks = " ".join(docs["text"].to_pylist()).split()
    import collections
    true = collections.Counter(toks)
    n = len(toks)
    assert bound == n // (k + 1)
    for term, e in est.items():
        assert e <= true[term]                       # never overestimates
        assert true[term] - e <= bound               # bounded underestimate
    # every true heavy hitter (> bound) is present
    for term, c in true.items():
        if c > bound:
            assert term in est, term


def test_heavy_hitters_on_driver_docs(ray_session):
    import ray
    from snowplow_elasticsearch_loader_ray.pipelines.analysis import heavy_hitters

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["text"])
    got, bound = heavy_hitters(ds, k=64, top=15)
    assert got.num_rows == 15 and bound >= 0


def test_string_stats_entropy_counts_codepoints(ray_session, tmp_path):
    """string_stats must histogram Unicode CODE POINTS, not UTF-8
    bytes: on a non-ASCII corpus the two diverge (a 2-byte char would
    split into two byte classes). Parity vs the same DuckDB oracle the
    driver runs, on an accented/CJK corpus."""
    import pyarrow.parquet as pq

    from snowplow_elasticsearch_loader_ray.driver_queries import (
        STRING_STATS_SQL, string_stats_text)

    texts = ["héllo wörld", "日本語のテキスト", "plain ascii", "émoji 🎉 mix",
             "ßtraße", ""]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))
    got = string_stats_text(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(STRING_STATS_SQL).df()
    con.close()
    for c in want.columns:
        assert got[c].iloc[0] == want[c].iloc[0], c


def test_dsir_scores_favor_target_language(ray_session):
    """DSIR importance weights must rank target-language (en) docs above
    the other languages on average — the resampling direction."""
    import duckdb
    from snowplow_elasticsearch_loader_ray.driver_queries import dsir_scores

    sf = "/root/testdata/sf0.001"
    out = dsir_scores(sf).to_pandas()
    lang = duckdb.sql(
        f"select doc_id, lang from read_parquet('{sf}/documents.parquet')").df()
    j = out.merge(lang, on="doc_id")
    j = j[j["n_tokens"] > 0]
    avg = j["dsir_micro"] / j["n_tokens"]
    en = avg[j["lang"] == "en"].mean()
    rest = avg[j["lang"] != "en"].mean()
    assert en > rest


def test_winnowing_guarantee_and_locality(ray_session):
    """The MOSS guarantee: two docs sharing >= WIN_K + WIN_W - 1
    consecutive tokens share at least one selected fingerprint; and
    selection is local (a doc's fingerprints don't change when other
    docs change)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from snowplow_elasticsearch_loader_ray.pipelines import analysis as A

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(50)]
    shared = [vocab[i] for i in rng.integers(0, 50, A.WIN_K + A.WIN_W - 1)]

    def doc(words):
        return " ".join(words)

    d0 = doc([vocab[i] for i in rng.integers(0, 50, 30)] + shared
             + [vocab[i] for i in rng.integers(0, 50, 30)])
    d1 = doc([vocab[i] for i in rng.integers(0, 50, 25)] + shared
             + [vocab[i] for i in rng.integers(0, 50, 20)])
    d2 = doc([vocab[i] for i in rng.integers(0, 50, 40)])
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([d0, d1, d2])})
    out = A.winnow_fingerprints(ray.data.from_arrow(t)).to_pandas()
    fps = {d: set(out[out.doc_id == d].fp) for d in (0, 1, 2)}
    assert fps[0] & fps[1], "shared window must share a fingerprint"
    # locality: re-running doc 0 alone yields the same selections
    solo = A.winnow_fingerprints(
        ray.data.from_arrow(t.slice(0, 1))).to_pandas()
    assert set(solo.fp) == fps[0]
    # short doc (< w grams) still yields exactly one fingerprint
    tiny = pa.table({"doc_id": pa.array([9], pa.int64()),
                     "text": pa.array(["alpha beta gamma delta"])})
    one = A.winnow_fingerprints(ray.data.from_arrow(tiny)).to_pandas()
    assert len(one) == 1


def test_bpe_trainer_reference_and_first_merge(ray_session):
    """learn_bpe_merges vs a brute per-string reference on a synthetic
    corpus; and the first learned merge must equal the oracle-backed
    first-iteration top pair."""
    import numpy as np
    import pyarrow as pa
    import ray

    from snowplow_elasticsearch_loader_ray.pipelines import analysis as A

    texts = ["banana bandana ana", "banana banana nab",
             "dana nabs a banana", "an anagram and a banana"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    wc = A.bpe_word_counts(ray.data.from_arrow(t).repartition(3))
    merges = A.learn_bpe_merges(wc, 6)

    # brute reference: dict-of-words trainer, same tie rules
    words = {}
    for s in texts:
        for tok in s.split():
            words[tok] = words.get(tok, 0) + 1
    segs = {w: list(w) for w in words}
    ref = []
    for _ in range(6):
        stats = {}
        for w, n in words.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + n
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        ref.append((l, r, c))
        for w in segs:
            s, out, j = segs[w], [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            segs[w] = out
    assert merges == ref
    # multi-char merged symbols appear after enough rounds
    assert any(len(l) + len(r) > 2 for l, r, _ in merges)

    # first merge == oracle-backed first-iteration top pair (sf0.001)
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        bpe_merges as entry_merges, bpe_pair_counts)

    top = bpe_pair_counts("/root/testdata/sf0.001").to_pandas().iloc[0]
    first = entry_merges("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert (first["left"], first["right"], first["n"]) == \
        (top["left"], top["right"], top["n"])


def test_bigram_lm_matches_brute_force(ray_session):
    """Stupid-backoff bigram scores vs a per-doc pure-Python replay:
    seen pairs (count >= min_count) use c(w1 w2)/cf(w1); the rest back
    off to 0.4 * cf(w2)/N — every contribution an integer micro-nat."""
    import math
    import re
    from collections import Counter

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "the cat sat again",
        "",
    ]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    out = (A.bigram_lm_scores(ray.data.from_arrow(docs), min_count=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    cf = Counter(w for ts in toks for w in ts)
    nt = sum(cf.values())
    bi = Counter((a, b) for ts in toks for a, b in zip(ts, ts[1:]))
    bi = {k: v for k, v in bi.items() if v >= 2}
    for i, ts in enumerate(toks):
        want_n = max(len(ts) - 1, 0)
        want_lp = 0
        for a, b in zip(ts, ts[1:]):
            if (a, b) in bi:
                want_lp += math.floor(1e6 * math.log(bi[(a, b)] / cf[a]))
            else:
                want_lp += math.floor(1e6 * math.log((0.4 * cf[b]) / nt))
        assert out.loc[i, "n_bigrams"] == want_n, i
        assert out.loc[i, "lp_micro"] == want_lp, i
    # the planted repeats ("the cat" x3, "cat sat" x2, "sat on" x2,
    # "on the"/"on a" x1) make both branches load-bearing
    assert ("the", "cat") in bi and ("on", "the") not in bi


def test_bpe_apply_merges_greedy_rule(ray_session):
    """Fixed-merge BPE application: greedy left-to-right
    non-overlapping per rank, cascading across ranks — and the
    chained-replace oracle representation agrees on the overlap case."""
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        BPE_FIXED_MERGES)
    from snowplow_elasticsearch_loader_ray.pipelines.analysis import (
        BpeEncodeLengths, bpe_apply_merges)

    assert bpe_apply_merges("data", BPE_FIXED_MERGES) == ["data"]
    assert bpe_apply_merges("stream", BPE_FIXED_MERGES) == ["stream"]
    assert bpe_apply_merges("table", BPE_FIXED_MERGES) == ["table"]
    assert bpe_apply_merges("start", BPE_FIXED_MERGES) == \
        ["st", "a", "r", "t"]
    assert bpe_apply_merges("database", BPE_FIXED_MERGES) == \
        ["data", "b", "a", "s", "e"]
    # non-overlapping left-to-right: 'aaaa' under (a,a) -> aa, aa;
    # 'aaa' -> aa, a (the merged token does NOT re-pair in-pass)
    assert bpe_apply_merges("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert bpe_apply_merges("aaa", [("a", "a")]) == ["aa", "a"]
    # and python str.replace over the |-marked form replays it exactly
    for w in ("aaaa", "aaa", "aa", "a"):
        s = "".join(f"|{c}|" for c in w).replace("|a||a|", "|aa|")
        assert s.count("|") // 2 == len(bpe_apply_merges(w, [("a", "a")]))

    enc = BpeEncodeLengths(BPE_FIXED_MERGES)
    out = enc(pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                        "text": pa.array(["data stream table",
                                          "start database x"])}))
    assert out["n_bpe"].to_pylist() == [3, 4 + 5 + 1]
    assert len(enc._cache) == 6            # one encode per distinct word


def test_gopher_rules_edge_docs_match_oracle(ray_session, tmp_path):
    """Empty text, whitespace-only text, symbol-heavy and stopword-rich
    docs through GopherRules vs the SQL oracle (the fixture corpus has
    no empty docs, so the zero-word branches only bite here)."""
    import duckdb
    import pyarrow.parquet as pq_

    import ray as _ray
    from snowplow_elasticsearch_loader_ray.driver_queries import _gopher_sql
    from snowplow_elasticsearch_loader_ray.pipelines import analysis as A

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "",
            "   \t\n  ",
            "the be to of and that have with " + "word " * 60,
            "### ... #... " + "x " * 50,
            "a b c " * 30,
            "  leading and trailing   spaces the be   ",
        ]),
    })
    p = tmp_path / "docs.parquet"
    pq_.write_table(docs, p)
    got = (A.gopher_rules(_ray.data.read_parquet(str(p)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{p}')")
    want = con.execute(_gopher_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)[got.columns]
    for c in got.columns:
        want[c] = want[c].astype(got[c].dtype)
    assert got.equals(want)
    # sanity on the designed cases: stopword-rich long doc passes all
    assert bool(got.loc[2, "pass_all"])
    # symbol-heavy doc fails the symbol rule only via that flag
    assert not bool(got.loc[3, "ok_symbol_ratio"])
    # empty docs: zero words fail the count rule, pass vacuous ratios
    assert not got.loc[0, "ok_word_count"] and got.loc[0, "ok_alpha_frac"]


def test_flesch_score_hand_computed(tmp_path):
    import math

    import pyarrow.parquet as pq_
    import ray as _ray

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["a", "a", "b", "b"]),
        "text": pa.array([
            "The cat sat. It ran!",      # 5 words, 2 sentences
            "xyz 42 7",                  # vowel-less words -> 1 syl each
            "beautiful queueing aeiou",  # multi-vowel-group words
            "!!! ...",                   # zero words -> dropped
        ]),
    })
    p = tmp_path / "docs.parquet"
    pq_.write_table(docs, p)
    per_doc = pa.concat_tables(list(
        _ray.data.read_parquet(str(p))
            .map_batches(A.FleschScore(), batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None))) \
        .sort_by("doc_id").to_pandas()
    assert per_doc["doc_id"].tolist() == [0, 1, 2]  # doc 3 dropped
    # doc 0: the(1) cat(1) sat(1) it(1) ran(1) = 5 syl, W=5, S=2
    assert per_doc.loc[0, ["n_words", "n_sentences", "n_syllables"]] \
        .tolist() == [5, 2, 5]
    assert per_doc.loc[0, "fre_micro"] == math.floor(
        1e6 * (206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)))
    # doc 1: three vowel-less words -> one syllable each, S floors to 1
    assert per_doc.loc[1, ["n_words", "n_sentences", "n_syllables"]] \
        .tolist() == [3, 1, 3]
    # doc 2: beau-ti-ful(3) + queuei-ng? 'ueuei'(1) + 'aeiou'(1) groups:
    # beautiful=[eau,i,u]=3, queueing=[ueuei]=1... 'queueing' lower:
    # q-ueuei-ng -> 1 group; aeiou -> 1 group; total 5
    assert per_doc.loc[2, "n_syllables"] == 5


def test_blocklist_flag_token_boundaries(tmp_path):
    import pyarrow.parquet as pq_
    import ray as _ray

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "source": pa.array(["s"] * 5),
        "text": pa.array([
            "a spark of genius",    # flagged (token match)
            "sparky the dog",       # NOT flagged (substring only)
            "dup",                  # flagged (whole text is the token)
            "DUP at the start",     # flagged (case-folded)
            "dedup and superdup",   # NOT flagged (suffix substrings)
        ]),
    })
    p = tmp_path / "docs.parquet"
    pq_.write_table(docs, p)
    out = A.blocklist_flags(
        _ray.data.read_parquet(str(p)), ["dup", "spark"]).to_pandas()
    assert out["n_docs"].tolist() == [5]
    assert out["n_flagged"].tolist() == [3]
    # an empty blocklist must refuse, not flag every separator-bearing doc
    with pytest.raises(ValueError, match="at least one term"):
        A.BlocklistFlag([])
