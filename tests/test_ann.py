"""ANN / embedding similarity vs DuckDB + exhaustive numpy oracles."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from snowplow_elasticsearch_loader_ray.pipelines import ann as ANN

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_np():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def test_ann_topk_vs_exhaustive(emb_ds, emb_np):
    ids, mat = emb_np
    queries = mat[:5]
    got = ANN.ann_topk(emb_ds, queries, k=10).to_pandas()
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = np.round(m @ q.T, ANN.SIM_ROUND)
    for qi in range(5):
        s = sims[:, qi]
        order = np.lexsort((ids, -s))[:10]
        sub = got[got["query_id"] == qi].sort_values("rank")
        np.testing.assert_array_equal(sub["vec_id"].to_numpy(), ids[order])
        np.testing.assert_array_equal(sub["sim"].to_numpy(), s[order])


def test_ann_topk_vs_duckdb(emb_ds):
    got = ANN.ann_topk(emb_ds, _first_vecs(3), k=5).to_pandas()
    con = duckdb.connect()
    want = con.sql(f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe
          FROM '{SF}/embeddings.parquet' WHERE vec_id < 3
        ),
        sims AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 9) AS sim
          FROM '{SF}/embeddings.parquet' e, q
        ),
        ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
          FROM sims
        )
        SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """).df()
    con.close()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["vec_id"], want["vec_id"])
    np.testing.assert_allclose(got["sim"], want["sim"], rtol=0, atol=1e-9)


def _first_vecs(n):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.array(t["embedding"].to_pylist()[:n], dtype=np.float64)


def test_lsh_recall_against_bruteforce(emb_ds, emb_np):
    _ids, mat = emb_np
    queries = mat[:10]
    exact = ANN.ann_topk(emb_ds, queries, k=5).to_pandas()
    approx = ANN.lsh_ann_topk(emb_ds, queries, k=5, n_planes=4).to_pandas()
    # rank-1 self hit must survive LSH (query is its own bucket)
    for qi in range(10):
        e1 = exact[(exact["query_id"] == qi) & (exact["rank"] == 1)]["vec_id"].iloc[0]
        a = approx[approx["query_id"] == qi]
        assert len(a) > 0
        assert a[a["rank"] == 1]["vec_id"].iloc[0] == e1
    # overall recall of bucketed search is reported, not asserted high
    hits = 0
    for qi in range(10):
        es = set(exact[exact["query_id"] == qi]["vec_id"])
        as_ = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(es & as_)
    assert hits >= 10  # at least the self-hits


def test_embedding_dup_pairs_vs_exhaustive(emb_ds, emb_np):
    ids, mat = emb_np
    thr = 0.8
    got = ANN.embedding_dup_pairs(emb_ds, threshold=thr)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    ai, bi = np.nonzero(np.triu(sims >= thr, k=1))
    want = sorted(zip(ids[ai].tolist(), ids[bi].tolist()))
    got_pairs = sorted(zip(got["vec_id_a"].to_pylist(), got["vec_id_b"].to_pylist()))
    assert got_pairs == want


def test_ivf_recall_vs_brute(emb_ds, emb_np):
    """IVF with generous nprobe reaches high top-10 recall vs brute force."""
    from snowplow_elasticsearch_loader_ray.pipelines.ann import ann_topk, ivf_ann_topk

    _ids, mat = emb_np
    qmat = mat[:5]
    exact = ann_topk(emb_ds, qmat, k=10).to_pandas()
    approx = ivf_ann_topk(emb_ds, qmat, k=10, n_cells=8, nprobe=4).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.6, recalls

    # determinism: same centroids -> identical results across runs
    again = ivf_ann_topk(emb_ds, qmat, k=10, n_cells=8, nprobe=4).to_pandas()
    assert approx.equals(again)


def test_embedding_dup_pairs_multiblock_matches_bruteforce(emb_np):
    """The block-pair plan (several object-store blocks, one task per
    block pair) must equal brute force — incl. a planted duplicate."""
    ids, mat = emb_np
    mat = mat.copy()
    mat[7] = mat[3] * 2.0                       # planted exact dup (cos=1)
    import pyarrow as pa
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(r) for r in mat])})
    ds = ray.data.from_arrow(tbl)
    thr = 0.8
    got = ANN.embedding_dup_pairs(ds, threshold=thr, block_rows=16)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    ai, bi = np.nonzero(np.triu(sims >= thr, k=1))
    want = sorted(zip(ids[ai].tolist(), ids[bi].tolist()))
    got_pairs = sorted(zip(got["vec_id_a"].to_pylist(), got["vec_id_b"].to_pylist()))
    assert got_pairs == want
    assert (min(ids[3], ids[7]), max(ids[3], ids[7])) in got_pairs


def test_embedding_dup_pairs_lsh_subset_and_planted(emb_np):
    """LSH variant: subset of exact pairs; planted exact dups always
    collide (identical signatures) so they must be found."""
    ids, mat = emb_np
    mat = mat.copy()
    mat[5] = mat[1] * 3.0
    mat[9] = mat[2] * 0.5
    import pyarrow as pa
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(r) for r in mat])})
    ds = ray.data.from_arrow(tbl)
    thr = 0.8
    exact = ANN.embedding_dup_pairs(ds, threshold=thr)
    approx = ANN.embedding_dup_pairs_lsh(ds, threshold=thr)
    e = set(zip(exact["vec_id_a"].to_pylist(), exact["vec_id_b"].to_pylist()))
    a = set(zip(approx["vec_id_a"].to_pylist(), approx["vec_id_b"].to_pylist()))
    assert a <= e
    for x, y in [(1, 5), (2, 9)]:
        pair = (min(ids[x], ids[y]), max(ids[x], ids[y]))
        assert pair in a


def test_semdedup_greedy_rule_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    n, d = 80, 16
    mat = rng.normal(size=(n, d))
    mat[7] = mat[3] * 2.0 + rng.normal(scale=1e-3, size=d)   # near-dup of 3
    mat[20] = mat[7] * 0.5                                    # chain: 3~7~20
    mat[50] = -mat[4]                                         # anti-correlated: kept
    import pyarrow as pa
    ids = np.arange(100, 100 + n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(r) for r in mat])}))
    thr = 0.9
    got = ANN.semdedup_survivors(ds, threshold=thr)["vec_id"].to_pylist()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = norm @ norm.T
    want = [int(ids[i]) for i in range(n)
            if not any(cos[i, j] >= thr for j in range(i))]
    assert got == want
    assert int(ids[7]) not in got and int(ids[20]) not in got
    assert int(ids[50]) in got


def test_semdedup_lsh_eliminates_subset_of_exact(ray_session):
    import pyarrow as pa
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(60, 16))
    mat[11] = mat[2] * 1.5
    ids = np.arange(60, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(r) for r in mat])}))
    exact = set(ANN.semdedup_survivors(ds, threshold=0.9)["vec_id"].to_pylist())
    lsh = set(ANN.semdedup_survivors(ds, threshold=0.9, exact=False)["vec_id"].to_pylist())
    assert exact <= lsh   # LSH can only miss pairs -> eliminates fewer


def test_hybrid_linear_fuses_both_legs(ray_session):
    """Score fusion must differ from BOTH pure legs for at least one
    query (otherwise one leg dominates and the op is a no-op)."""
    from snowplow_elasticsearch_loader_ray.driver_queries import (
        ann_topk, bm25_topk, hybrid_linear_topk, N_ANN_QUERIES)

    sf = "/root/testdata/sf0.001"
    hy = hybrid_linear_topk(sf).to_pandas()
    lex = bm25_topk(sf).to_pandas()
    vec = ann_topk(sf).to_pandas().rename(
        columns={"query_id": "qid", "vec_id": "doc_id"})

    def ranking(df):
        return {qid: tuple(g.sort_values("rank")["doc_id"])
                for qid, g in df.groupby("qid") if qid < N_ANN_QUERIES}

    h, l, v = ranking(hy), ranking(lex), ranking(vec)
    assert any(h[q] != l.get(q) for q in h)
    assert any(h[q] != v.get(q) for q in h)


def test_ann_radius_matches_exhaustive(emb_ds, emb_np):
    ids, mat = emb_np
    queries = mat[:4]
    got = ANN.ann_radius(emb_ds, queries, 0.35).to_pandas()
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = np.round(m @ q.T, ANN.SIM_ROUND)
    want = {(qi, int(ids[r])) for r, qi in zip(*np.nonzero(sims >= 0.35))}
    assert set(zip(got["query_id"], got["vec_id"])) == want
    # every self-pair (sim 1.0) must be present
    assert all((qi, int(ids[qi])) in want for qi in range(4))
    # sims are the rounded float64 cosines
    for _, row in got.iterrows():
        r = np.nonzero(ids == row["vec_id"])[0][0]
        assert row["sim"] == sims[r, int(row["query_id"])]


def test_hard_negatives_excludes_positives(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    import pyarrow.compute as pc
    t = t.take(pc.sort_indices(t["vec_id"]))
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    labels = t["label"].to_numpy(zero_copy_only=False)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n_anchor = 5
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    got = ANN.hard_negatives_topk(
        ds, mat[:n_anchor], ids[:n_anchor], labels[:n_anchor], k=8
    ).to_pandas()
    lab = dict(zip(ids.tolist(), labels.tolist()))
    for _, row in got.iterrows():
        anchor = int(row["query_id"])
        assert int(row["vec_id"]) != int(ids[anchor])
        assert lab[int(row["vec_id"])] != labels[anchor]
    # exhaustive check for anchor 0: top-8 among different-label vectors
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    s = np.round(m @ m[0], ANN.SIM_ROUND)
    mask = (labels != labels[0]) & (ids != ids[0])
    cand_ids, cand_s = ids[mask], s[mask]
    order = np.lexsort((cand_ids, -cand_s))[:8]
    sub = got[got["query_id"] == 0].sort_values("rank")
    np.testing.assert_array_equal(sub["vec_id"].to_numpy(), cand_ids[order])
