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
