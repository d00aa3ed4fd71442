"""Checkpoint-ordering trace (the ProcessingSpec exact-action-trace
analogue, ``ProcessingSpec.scala:70-79`` / SURVEY.md C1): manifests must
commit strictly AFTER their outputs are visible, and stage manifests in
pipeline order — runs → segments → stats/metrics/index last."""

import json
import os

from snowplow_elasticsearch_loader_ray.config import IndexConfig
from snowplow_elasticsearch_loader_ray.pipelines import build as B

CFG = IndexConfig(max_record_bytes=100_000, num_term_shards=4, batch_size=200)


def test_manifest_commit_order_and_output_visibility(ray_session, tiny_pages,
                                                     tmp_path):
    pages_dir, _ = tiny_pages
    B.ingest_pages(pages_dir, str(tmp_path / "ingest"), CFG)
    idx = str(tmp_path / "index")
    B.build_index(B.good_docs_dir(str(tmp_path / "ingest")), idx, CFG)

    man_dir = os.path.join(idx, "manifests")
    mtimes = {}
    for fn in os.listdir(man_dir):
        mtimes[fn[:-len(".json")]] = os.path.getmtime(os.path.join(man_dir, fn))

    runs = [v for k, v in mtimes.items() if k.startswith("runs-part-")]
    segs = [v for k, v in mtimes.items() if k.startswith("segment-shard-")]
    assert runs and segs
    # stage ordering: every run part before every segment commit; the
    # index-complete marker is last (checkpoint-after-everything, C1)
    assert max(runs) <= min(segs) + 1e-6
    assert mtimes["index"] >= max(segs) - 1e-6
    assert mtimes["stats"] <= mtimes["index"] + 1e-6

    # every manifest's declared outputs exist on disk (commit-after-visible)
    for name, m in ((n, json.load(open(os.path.join(man_dir, n + ".json"))))
                    for n in mtimes):
        for rel in m.get("outputs", []):
            assert os.path.exists(os.path.join(idx, rel)), (name, rel)
