"""The `ray job submit` CLI surface: each subcommand runs the same
pipelines the library exposes and prints one JSON document."""

import json

import pytest

from snowplow_elasticsearch_loader_ray.__main__ import main
from snowplow_elasticsearch_loader_ray.sources import synth


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    synth.generate_pages(str(d / "pages"), n_rows=600, n_parts=4)
    return d


def _run(capsys, argv):
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_ingest_build_query(corpus, capsys):
    counters = _run(capsys, ["ingest", "--input", str(corpus / "pages"),
                             "--out", str(corpus / "ingest")])
    assert counters["good"] > 0

    stats = _run(capsys, ["build",
                          "--docs", str(corpus / "ingest" / "docs" / "status=good"),
                          "--out", str(corpus / "index"), "--shards", "8"])
    assert stats["n_docs"] == counters["good"]

    hits = _run(capsys, ["query", "--index", str(corpus / "index"),
                         "--query", synth.generate_queries()[1][1], "-k", "5"])
    assert len(hits["hits"]) <= 5
    assert all(h["rank"] == i + 1 for i, h in enumerate(hits["hits"]))


def test_cli_stream(corpus, capsys, monkeypatch):
    import io

    payloads = "\n".join(['{"a": %d}' % i for i in range(10)] + ["notjson"])
    monkeypatch.setattr("sys.stdin", io.StringIO(payloads + "\n"))
    out = _run(capsys, ["stream", "--out", str(corpus / "stream"),
                        "--max-bytes", "64", "--max-delay-s", "60"])
    assert out["good"] == 10
    assert out["parse_error"] == 1
    assert out["batches"] >= 2


def test_cli_live_lifecycle(corpus, capsys, monkeypatch):
    """stream → live refresh → search → delete-by-query → compact →
    status, all through the job-submit surface."""
    import io

    docs = [(1, "ray data streams blocks"), (2, "arrow batches stream fast"),
            (3, "the quick brown fox"), (4, "data pipelines shuffle blocks")]
    nd = "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in docs)
    monkeypatch.setattr("sys.stdin", io.StringIO(nd + "\n"))
    _run(capsys, ["stream", "--out", str(corpus / "live-s1"),
                  "--max-bytes", "200", "--max-delay-s", "1e9"])

    root = str(corpus / "live-idx")
    r = _run(capsys, ["live", "refresh", "--root", root,
                      "--stream", str(corpus / "live-s1"), "--shards", "4"])
    assert r["refreshed"] and r["n_docs"] == 4

    hits = _run(capsys, ["live", "search", "--root", root,
                         "--query", "data blocks", "-k", "3", "--shards", "4"])
    assert {h["doc_id"] for h in hits["hits"]} == {1, 4}

    d = _run(capsys, ["live", "delete-by-query", "--root", root,
                      "--query", "fox", "--shards", "4"])
    assert d["n_ids"] == 1

    sh = _run(capsys, ["live", "search", "--root", root, "--query",
                       "quick brown", "-k", "5", "--sharded", "--shards", "4"])
    assert all(h["doc_id"] != 3 for h in sh["hits"])

    _run(capsys, ["live", "compact", "--root", root, "--force",
                  "--shards", "4"])
    st = _run(capsys, ["live", "status", "--root", root, "--shards", "4"])
    assert st["live_docs"] == 3 and len(st["generations"]) == 1


def test_cluster_cli_kmeans_and_pq(ray_session, tmp_path):
    """cluster subcommand: kmeans assignments parquet + per-subspace PQ
    codes (hive-partitioned by sub=)."""
    import glob

    import pyarrow.parquet as pq

    from snowplow_elasticsearch_loader_ray import __main__ as CLI

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    km_out = str(tmp_path / "km")
    assert CLI.main(["cluster", "kmeans", "--embeddings", emb,
                     "--out", km_out, "--k", "4", "--iters", "2"]) == 0
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(f"{km_out}/*.parquet"))
    assert n == pq.read_metadata(emb).num_rows
    pq_out = str(tmp_path / "pq")
    assert CLI.main(["cluster", "pq", "--embeddings", emb,
                     "--out", pq_out, "--k", "8", "--iters", "2",
                     "--m", "4"]) == 0
    subs = sorted({g.split("/")[-2]
                   for g in glob.glob(f"{pq_out}/*/*.parquet")})
    assert subs == [f"sub={i}" for i in range(4)]


def test_cli_reshard(corpus, capsys):
    """reshard subcommand: same corpus stats under the new shard count,
    and identical query results from the resharded index."""
    q = synth.generate_queries()[1][1]
    base = _run(capsys, ["query", "--index", str(corpus / "index"),
                         "--query", q, "-k", "5"])
    stats = _run(capsys, ["reshard", "--index", str(corpus / "index"),
                          "--out", str(corpus / "index12"),
                          "--shards", "12"])
    assert stats["num_term_shards"] == 12
    hits = _run(capsys, ["query", "--index", str(corpus / "index12"),
                         "--query", q, "-k", "5"])
    assert hits["hits"] == base["hits"]


def test_cli_mfield_build_and_search(ray_session, tmp_path, capsys):
    from snowplow_elasticsearch_loader_ray.pipelines.multifield import (
        MultiFieldEngine,
    )

    root = str(tmp_path / "mf")
    stats = _run(capsys, ["mfield", "build", "--root", root,
                          "--docs", "/root/testdata/sf0.001/documents.parquet",
                          "--fields", "title:text:8", "body",
                          "--shards", "4"])
    assert stats["title"]["avgdl"] <= 8.0
    assert stats["body"]["n_docs"] == stats["title"]["n_docs"]
    hits = _run(capsys, ["mfield", "search", "--root", root,
                         "--fields", "title^2", "body",
                         "--query", "data stream", "-k", "5"])
    eng = MultiFieldEngine(root, ["title", "body"])
    d, s = eng.multi_match("data stream", ["title^2", "body"], k=5)
    assert [h["doc_id"] for h in hits["hits"]] == d.tolist()
    cf = _run(capsys, ["mfield", "search", "--root", root,
                       "--fields", "title^2", "body", "--query",
                       "data stream", "--type", "combined_fields", "-k", "5"])
    d2, _s2 = eng.combined_fields("data stream", ["title^2", "body"], k=5)
    assert [h["doc_id"] for h in cf["hits"]] == d2.tolist()
