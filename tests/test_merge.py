"""Index-merge tests: merged-halves ≡ single build, and upsert-by-doc_id
(the W5 idempotency contract, ``ElasticsearchSink.scala:92``)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from snowplow_elasticsearch_loader_ray.config import IndexConfig
from snowplow_elasticsearch_loader_ray.pipelines import build as B
from snowplow_elasticsearch_loader_ray.pipelines.merge import merge_indexes
from snowplow_elasticsearch_loader_ray.pipelines.query import IndexReader, QueryEngine

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
CFG = IndexConfig(num_term_shards=8)


@pytest.fixture(scope="module")
def split_docs(tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    t = pq.read_table(SF_DOCS, columns=["doc_id", "text"])
    even = t.filter(pa.compute.equal(pa.compute.bit_wise_and(t["doc_id"], 1), 0))
    odd = t.filter(pa.compute.equal(pa.compute.bit_wise_and(t["doc_id"], 1), 1))
    pq.write_table(even, str(root / "even.parquet"))
    pq.write_table(odd, str(root / "odd.parquet"))
    return root, t


def test_merged_halves_equal_single_build(ray_session, split_docs):
    root, _t = split_docs
    B.build_index(SF_DOCS, str(root / "idx_full"), CFG)
    B.build_index(str(root / "even.parquet"), str(root / "idx_even"), CFG)
    B.build_index(str(root / "odd.parquet"), str(root / "idx_odd"), CFG)
    stats = merge_indexes([str(root / "idx_even"), str(root / "idx_odd")],
                          str(root / "idx_merged"), CFG)

    full = IndexReader(str(root / "idx_full"))
    merged = IndexReader(str(root / "idx_merged"))
    assert stats["n_docs"] == full.n_docs
    assert stats["avgdl"] == full.avgdl
    assert merged.term_stats_table().equals(full.term_stats_table())
    # doc ordinal order differs (merged = input order, full = corpus
    # order) — compare lengths as a doc_id-keyed mapping
    def _dl_map(r):
        t = r.doc_lengths_table()
        return dict(zip(t["doc_id"].to_pylist(), t["doclen"].to_pylist()))
    assert _dl_map(merged) == _dl_map(full)

    qf = QueryEngine(str(root / "idx_full"))
    qm = QueryEngine(str(root / "idx_merged"))
    for q in ["the data", "customer order line value", "join"]:
        df_, sf_ = qf.topk(q, 10)
        dm, sm = qm.topk(q, 10)
        assert (df_ == dm).all() and (sf_ == sm).all()


def test_merge_upserts_newer_document(ray_session, split_docs, tmp_path):
    root, t = split_docs
    B.build_index(SF_DOCS, str(root / "idx_full"), CFG)  # cached if built
    # delta: one re-crawled doc with new text
    target = t["doc_id"][0].as_py()
    delta = pa.table({
        "doc_id": pa.array([target], pa.int64()),
        "text": pa.array(["zzznewtoken zzznewtoken fresh content"], pa.string()),
    })
    pq.write_table(delta, str(tmp_path / "delta.parquet"))
    B.build_index(str(tmp_path / "delta.parquet"), str(tmp_path / "idx_delta"), CFG)

    merge_indexes([str(root / "idx_full"), str(tmp_path / "idx_delta")],
                  str(tmp_path / "idx_up"), CFG)
    up = IndexReader(str(tmp_path / "idx_up"))
    full = IndexReader(str(root / "idx_full"))

    # same corpus size (upsert, not append)
    assert up.n_docs == full.n_docs
    # the doc's length reflects the NEW text (4 tokens)
    assert up.doclen_of(np.array([target]))[0] == 4.0
    # new term points at the doc with its delta tf (postings decode to
    # ordinals; map back via the merged docmap)
    pl = up.postings("zzznewtoken")
    ords, tfs = pl.decode_all()
    assert up.dl_doc_ids[ords].tolist() == [target] and tfs.tolist() == [2]
    # stale terms from the OLD text no longer hit the doc (delete-list
    # semantics, not just last-wins): check every old-only term
    import re
    old_text = t["text"][0].as_py()
    new_terms = {"zzznewtoken", "fresh", "content"}
    for tok in set(re.findall(r"[a-z0-9]+", old_text.lower())) - new_terms:
        pl_old = up.postings(tok)
        if pl_old is not None:
            assert target not in up.dl_doc_ids[pl_old.decode_all()[0]]
    # resume: re-merge returns committed stats instantly
    again = merge_indexes([str(root / "idx_full"), str(tmp_path / "idx_delta")],
                          str(tmp_path / "idx_up"), CFG)
    assert again["n_docs"] == up.n_docs


def test_three_generation_merge(ray_session, split_docs, tmp_path):
    """base + delta1 + delta2 (re-touching the same doc): newest wins."""
    root, t = split_docs
    B.build_index(SF_DOCS, str(root / "idx_full"), CFG)
    target = t["doc_id"][0].as_py()

    def delta(path, text):
        pq.write_table(pa.table({
            "doc_id": pa.array([target], pa.int64()),
            "text": pa.array([text], pa.string()),
        }), str(path))

    delta(tmp_path / "d1.parquet", "gen one words")
    delta(tmp_path / "d2.parquet", "gen two final words")
    B.build_index(str(tmp_path / "d1.parquet"), str(tmp_path / "i1"), CFG)
    B.build_index(str(tmp_path / "d2.parquet"), str(tmp_path / "i2"), CFG)
    merge_indexes([str(root / "idx_full"), str(tmp_path / "i1"),
                   str(tmp_path / "i2")], str(tmp_path / "merged"), CFG)
    up = IndexReader(str(tmp_path / "merged"))
    assert up.doclen_of(np.array([target]))[0] == 4.0       # gen-2 text
    docs = up.dl_doc_ids[up.postings("final").decode_all()[0]]
    assert target in docs
    one = up.postings("one")
    assert one is None or target not in up.dl_doc_ids[one.decode_all()[0]]


def test_committed_merge_refuses_different_plan(ray_session, split_docs, tmp_path):
    """Re-invoking merge_indexes on a fully COMMITTED out_dir with a
    different input set must refuse, not return the stale cached
    stats (the refusal previously only covered partial merges)."""
    import pytest as _pytest

    root, _t = split_docs
    idx_a, idx_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    B.build_index(str(root / "even.parquet"), idx_a, CFG)
    B.build_index(str(root / "odd.parquet"), idx_b, CFG)
    out = str(tmp_path / "merged")
    stats = merge_indexes([idx_a, idx_b], out, CFG)
    # same plan on the committed dir -> cached stats, no error
    assert merge_indexes([idx_a, idx_b], out, CFG) == stats
    # different plan (inputs changed) -> refuse loudly
    with _pytest.raises(ValueError, match="COMMITTED merge of a different"):
        merge_indexes([idx_b], out, CFG)
    # different plan via delete sets -> refuse too
    import numpy as _np
    with _pytest.raises(ValueError, match="COMMITTED merge of a different"):
        merge_indexes([idx_a, idx_b], out, CFG,
                      deleted_per_input=[_np.array([1]), _np.array([], _np.int64)])


def test_reshard_split_and_shrink_bit_identical(ray_session, tmp_path):
    """ES _split/_shrink analogue: reshard 8 -> 16 and 8 -> 4; term
    stats and query results must be BIT-identical (posting buffers are
    copied verbatim, only their shard bucketing changes)."""
    from snowplow_elasticsearch_loader_ray.pipelines.merge import (
        reshard_index)

    src = str(tmp_path / "idx8")
    B.build_index(SF_DOCS, src, CFG)
    r0 = IndexReader(src)
    queries = ["data stream", "merge sort", "the", "slow query data"]
    base = {q: QueryEngine(src).topk(q, 10) for q in queries}

    for n_new, name in ((16, "idx16"), (4, "idx4")):
        out = str(tmp_path / name)
        st = reshard_index(src, out, n_new)
        assert st["num_term_shards"] == n_new
        assert st["n_docs"] == B.index_stats(src)["n_docs"]
        assert not os.path.isdir(os.path.join(out, "reshard"))
        r = IndexReader(out)
        assert r.term_stats_table().equals(r0.term_stats_table())
        eng = QueryEngine(out)
        for q in queries:
            d, s = eng.topk(q, 10)
            d0, s0 = base[q]
            assert np.array_equal(d, d0) and np.array_equal(s, s0)
        # per-shard postings byte totals conserved (pure re-bucketing)
        assert (B.index_metrics(out)["postings"]
                == B.index_metrics(src)["postings"])
        assert B.index_metrics(out)["terms"] == B.index_metrics(src)["terms"]

    # committed out_dir + different plan -> refuse
    with pytest.raises(ValueError, match="different plan"):
        reshard_index(src, str(tmp_path / "idx16"), 12)
    # same plan -> cached stats, instant
    again = reshard_index(src, str(tmp_path / "idx16"), 16)
    assert again["num_term_shards"] == 16


def test_reshard_plan_recorded_before_first_write(ray_session, tmp_path):
    """Crash window between the docmap copy and the first scatter
    commit: the plan manifest is committed BEFORE any file lands, so a
    re-invocation with a DIFFERENT input refuses instead of mixing the
    old input's docmap with the new input's postings."""
    from snowplow_elasticsearch_loader_ray.pipelines.merge import (
        reshard_index)
    from snowplow_elasticsearch_loader_ray.state import manifest as mf

    src_a = str(tmp_path / "a")
    src_b = str(tmp_path / "b")
    B.build_index(SF_DOCS, src_a, CFG)
    B.build_index("/root/testdata/sf0.001/documents.parquet", src_b,
                  CFG)
    out = str(tmp_path / "out")
    reshard_index(src_a, out, 16)
    # model the crash: keep the plan manifest + docmap, drop everything
    # committed after them
    man = os.path.join(out, "manifests")
    for f in list(os.listdir(man)):
        if not f.startswith("reshard-plan"):
            os.remove(os.path.join(man, f))
    import shutil
    shutil.rmtree(os.path.join(out, "segments"))
    with pytest.raises(ValueError, match="different plan"):
        reshard_index(src_b, out, 16)
    with pytest.raises(ValueError, match="different plan"):
        reshard_index(src_a, out, 8)       # same input, new shard count
    assert mf.load(man, "reshard-plan")["plan"]  # plan survived intact
    st = reshard_index(src_a, out, 16)     # the RIGHT plan still resumes
    assert st["num_term_shards"] == 16


def test_reshard_resumes_missing_gather_part(ray_session, tmp_path):
    """Delete one output-shard manifest + segment: re-invoking rebuilds
    ONLY that shard from the scatter parts' manifests... the reshard/
    exchange is gone after commit, so the resume path is a fresh
    scatter of the missing work — rerun must still converge to an
    identical index."""
    from snowplow_elasticsearch_loader_ray.pipelines.merge import (
        reshard_index)

    src = str(tmp_path / "src")
    B.build_index(SF_DOCS, src, CFG)
    out = str(tmp_path / "out")
    reshard_index(src, out, 16)
    t_before = IndexReader(out).term_stats_table()
    # simulate a crash before the index commit: drop the index manifest
    # and one gather part (its segment too). The exchange was GC'd at
    # commit, so the surviving scatter manifests point at deleted files
    # — the rerun must detect that and re-scatter by itself (a gather
    # over an absent committed part is a hard error, never an empty
    # shard)
    os.remove(os.path.join(out, "manifests", "index.json"))
    os.remove(os.path.join(out, "manifests", "segment-shard-0003.json"))
    os.remove(os.path.join(out, "segments", "shard-0003.parquet"))
    st = reshard_index(src, out, 16)
    assert st["num_term_shards"] == 16
    assert IndexReader(out).term_stats_table().equals(t_before)
