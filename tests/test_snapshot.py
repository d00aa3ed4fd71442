"""Snapshot/restore: hash-verified copies of a committed index."""

import os

import pytest

from snowplow_elasticsearch_loader_ray.config import IndexConfig
from snowplow_elasticsearch_loader_ray.pipelines import build as B
from snowplow_elasticsearch_loader_ray.pipelines.query import QueryEngine
from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
    restore_index, snapshot_index, verify_index,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
CFG = IndexConfig(num_term_shards=4)


def test_snapshot_restore_roundtrip(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    B.build_index(DOCS, idx, CFG)
    assert verify_index(idx)["segments_verified"] == 4

    snap = str(tmp_path / "snap")
    s = snapshot_index(idx, snap)
    assert s["segments"] == 4 and s["bytes"] > 0

    restored = str(tmp_path / "restored")
    r = restore_index(snap, restored)
    assert r["segments"] == 4

    d1, s1 = QueryEngine(idx).topk("the data", 10)
    d2, s2 = QueryEngine(restored).topk("the data", 10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()


def test_snapshot_refuses_uncommitted_and_detects_corruption(ray_session, tmp_path):
    idx = str(tmp_path / "idx2")
    B.build_index(DOCS, idx, CFG)

    with pytest.raises(ValueError, match="not committed"):
        snapshot_index(str(tmp_path / "nothing"), str(tmp_path / "s0"))

    snap = str(tmp_path / "snap2")
    snapshot_index(idx, snap)
    # tamper with a snapshot segment: restore must fail loudly
    seg = os.path.join(snap, "segments", "shard-0000.parquet")
    with open(seg, "r+b") as f:
        f.seek(100)
        f.write(b"\xff\xff\xff\xff")
    with pytest.raises(ValueError, match="hash mismatch"):
        restore_index(snap, str(tmp_path / "restored2"))

    # restoring over a committed index refuses
    snap3 = str(tmp_path / "snap3")
    snapshot_index(idx, snap3)
    with pytest.raises(ValueError, match="over a committed index"):
        restore_index(snap3, idx)


# --------------------------------------------------------------------------
# incremental repository (content-addressed blobs shared across snapshots)
# --------------------------------------------------------------------------

def test_incremental_snapshot_reuses_blobs(ray_session, tmp_path):
    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        gc_repository, delete_snapshot, restore_incremental,
        snapshot_incremental,
    )

    idx = str(tmp_path / "idx")
    B.build_index(DOCS, idx, CFG)
    repo = str(tmp_path / "repo")

    a = snapshot_incremental(idx, repo, "snap-a")
    assert a["bytes_copied"] > 0 and a["bytes_reused"] == 0
    # unchanged index: second snapshot ships zero bytes
    b = snapshot_incremental(idx, repo, "snap-b")
    assert b["bytes_copied"] == 0 and b["bytes_reused"] == a["bytes_copied"]
    with pytest.raises(ValueError, match="already exists"):
        snapshot_incremental(idx, repo, "snap-a")

    restored = str(tmp_path / "restored")
    r = restore_incremental(repo, "snap-b", restored)
    assert r["segments"] == 4
    d1, s1 = QueryEngine(idx).topk("the data", 10)
    d2, s2 = QueryEngine(restored).topk("the data", 10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    with pytest.raises(ValueError, match="non-empty"):
        restore_incremental(repo, "snap-a", restored)

    # delete one snapshot: blobs stay (snap-b still references them);
    # delete both: gc reclaims everything
    delete_snapshot(repo, "snap-a")
    assert gc_repository(repo, grace_s=0)["blobs_removed"] == 0
    delete_snapshot(repo, "snap-b")
    # default grace window protects fresh (possibly in-flight) blobs
    g = gc_repository(repo)
    assert g["blobs_removed"] == 0 and g["blobs_kept"] > 0
    g = gc_repository(repo, grace_s=0)
    assert g["blobs_removed"] > 0 and g["blobs_kept"] == 0


def test_live_incremental_ships_only_the_delta(ray_session, tmp_path):
    """Snapshotting a live chain after one more refresh reuses every
    blob of the earlier generations — only the new delta (plus the
    small chain manifests) is copied."""
    import json

    from snowplow_elasticsearch_loader_ray.pipelines.live import LiveIndex
    from snowplow_elasticsearch_loader_ray.pipelines.query import IndexReader
    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        restore_incremental, snapshot_live_incremental,
    )
    from snowplow_elasticsearch_loader_ray.sources.stream import stream_ingest

    def _stream(name, docs):
        out = str(tmp_path / name)
        stream_ingest(
            iter(json.dumps({"doc_id": i, "text": t}).encode()
                 for i, t in docs),
            out, purpose="json", cfg=CFG)
        return out

    live = LiveIndex(str(tmp_path / "live"), CFG)
    live.refresh(_stream("s1", [(1, "ray data streams blocks"),
                                (2, "arrow tables all the way down")]))
    repo = str(tmp_path / "repo")
    a = snapshot_live_incremental(str(tmp_path / "live"), repo, "day-1")
    assert a["bytes_copied"] > 0

    live.refresh(_stream("s2", [(3, "a fresh delta generation")]))
    b = snapshot_live_incremental(str(tmp_path / "live"), repo, "day-2")
    # gen-00000 blobs are all reused; only gen-00001 + manifests ship
    gen0_b = {e["blob"] for e in b["files"]
              if e["path"].startswith("gen-00000/")}
    gen0_a = {e["blob"] for e in a["files"]
              if e["path"].startswith("gen-00000/")}
    assert gen0_b == gen0_a
    assert 0 < b["bytes_copied"] < b["bytes_reused"] + b["bytes_copied"]
    assert b["bytes_reused"] >= sum(e["bytes"] for e in b["files"]
                                    if e["path"].startswith("gen-00000/"))

    # restore the chain and serve it: same results as the source chain
    restored = str(tmp_path / "restored_live")
    r = restore_incremental(repo, "day-2", restored)
    assert r["kind"] == "live" and r["segments"] > 0
    s_src = LiveIndex(str(tmp_path / "live"), CFG).searcher()
    s_res = LiveIndex(restored, CFG).searcher()
    d1, sc1 = s_src.topk("data delta generation", 5)
    d2, sc2 = s_res.topk("data delta generation", 5)
    assert d1.tolist() == d2.tolist() and sc1.tolist() == sc2.tolist()


def test_incremental_restore_detects_tampered_blob(ray_session, tmp_path):
    import glob as _glob

    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        restore_incremental, snapshot_incremental,
    )

    idx = str(tmp_path / "idx")
    B.build_index(DOCS, idx, CFG)
    repo = str(tmp_path / "repo")
    snapshot_incremental(idx, repo, "snap")
    # corrupt the largest blob (a segment file, not a tiny manifest)
    blobs = sorted(_glob.glob(os.path.join(repo, "blobs", "*")),
                   key=os.path.getsize)
    with open(blobs[-1], "r+b") as f:
        f.seek(50)
        f.write(b"\xde\xad\xbe\xef")
    with pytest.raises(ValueError, match="hash mismatch"):
        restore_incremental(repo, "snap", str(tmp_path / "restored"))


def test_restored_live_chain_keeps_stored_source(ray_session, tmp_path):
    """_delta_docs (the stored source update_by_query reads) must
    survive snapshot/restore — a restore that lost it would silently
    drop updates."""
    import json

    from snowplow_elasticsearch_loader_ray.pipelines.live import LiveIndex
    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        restore_incremental, snapshot_live_incremental,
    )
    from snowplow_elasticsearch_loader_ray.sources.stream import stream_ingest

    out = str(tmp_path / "s1")
    stream_ingest(
        iter(json.dumps({"doc_id": i, "text": t}).encode()
             for i, t in [(1, "ray data blocks"), (2, "arrow blocks")]),
        out, purpose="json", cfg=CFG)
    live = LiveIndex(str(tmp_path / "live"), CFG)
    live.refresh(out)
    repo = str(tmp_path / "repo")
    snapshot_live_incremental(str(tmp_path / "live"), repo, "s")
    restored = str(tmp_path / "restored")
    restore_incremental(repo, "s", restored)
    r = LiveIndex(restored, CFG).update_by_query(
        "blocks", lambda t: t + " zznew")
    assert r["n_docs"] == 2
    s = LiveIndex(restored, CFG).searcher()
    assert sorted(s.topk("zznew", 10)[0].tolist()) == [1, 2]


def test_slm_retention_keeps_newest(ray_session, tmp_path):
    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        restore_incremental, slm_retain, snapshot_incremental,
    )

    idx = str(tmp_path / "idx")
    B.build_index(DOCS, idx, CFG)
    repo = str(tmp_path / "repo")
    for name in ("snap-001", "snap-002", "snap-003"):
        snapshot_incremental(idx, repo, name)

    out = slm_retain(repo, keep_last=2, grace_s=0)
    assert out["deleted"] == ["snap-001"]
    assert out["kept"] == ["snap-002", "snap-003"]
    # content addressing: the kept snapshots still reference every blob
    assert out["blobs_removed"] == 0
    # the newest snapshot still restore-verifies after retention
    restored = str(tmp_path / "restored")
    r = restore_incremental(repo, "snap-003", restored)
    assert r["segments"] > 0
    d1, s1 = QueryEngine(idx).topk("the data", 10)
    d2, s2 = QueryEngine(restored).topk("the data", 10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    # deleted snapshot is gone
    with pytest.raises(ValueError, match="no snapshot"):
        restore_incremental(repo, "snap-001", str(tmp_path / "nope"))
    # retaining 1 of the remaining 2 keeps only snap-003
    out2 = slm_retain(repo, keep_last=1, grace_s=0)
    assert out2["deleted"] == ["snap-002"] and out2["kept"] == ["snap-003"]
    with pytest.raises(ValueError):
        slm_retain(repo, keep_last=0)


def test_snapshot_refuses_nonempty_target(ray_session, tmp_path):
    """A snap_dir holding a previous snapshot (possibly of a DIFFERENT
    index) refuses — _copy_tree would leave its extra shards in place
    and they'd restore alongside the new index's."""
    idx = str(tmp_path / "idxA")
    B.build_index(DOCS, idx, CFG)
    snap = str(tmp_path / "snapA")
    snapshot_index(idx, snap)
    with pytest.raises(ValueError, match="non-empty target"):
        snapshot_index(idx, snap)


def test_blob_mtime_is_upload_time_not_source_time(ray_session, tmp_path):
    """gc_repository's in-flight grace window keys on blob mtime, so
    _store_blobs must stamp UPLOAD time — a blob copied from a day-old
    segment must not be GC-eligible the moment it lands."""
    import time

    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        gc_repository, snapshot_incremental)

    idx = str(tmp_path / "idxB")
    B.build_index(DOCS, idx, CFG)
    # age the source files well past any grace window
    old = time.time() - 7 * 24 * 3600
    for root, _dirs, files in os.walk(idx):
        for f in files:
            os.utime(os.path.join(root, f), (old, old))
    repo = str(tmp_path / "repoB")
    snapshot_incremental(idx, repo, "s1")
    blobs = [os.path.join(repo, "blobs", b)
             for b in os.listdir(os.path.join(repo, "blobs"))]
    assert blobs and all(
        time.time() - os.path.getmtime(b) < 3600 for b in blobs)
    # and the grace window therefore protects them even when no
    # manifest references them yet
    from snowplow_elasticsearch_loader_ray.pipelines.snapshot import (
        delete_snapshot)
    delete_snapshot(repo, "s1")
    assert gc_repository(repo)["blobs_removed"] == 0          # grace holds
    assert gc_repository(repo, grace_s=0)["blobs_removed"] == len(blobs)
