"""field_caps footer-combine: nulls and multi-file merging (regression
for the first-file null double-count)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from snowplow_elasticsearch_loader_ray.driver_queries import (
    FIELD_CAPS_SQL, field_caps)


def test_multi_file_nulls_match_sql(ray_session, tmp_path):
    d = tmp_path / "documents.parquet"
    os.makedirs(d)
    a = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "lang": pa.array(["en", None, "de"]),
                  "n_chars": pa.array([5, None, 7], pa.int64()),
                  "source": pa.array(["s1", "s0", None]),
                  "text": pa.array(["aa bb", "cc", None])})
    b = pa.table({"doc_id": pa.array([3, 4], pa.int64()),
                  "lang": pa.array([None, "zh"]),
                  "n_chars": pa.array([2, 9], pa.int64()),
                  "source": pa.array(["s2", "s2"]),
                  "text": pa.array(["dd", "ee ff gg"])})
    pq.write_table(a, d / "part-0.parquet")
    pq.write_table(b, d / "part-1.parquet")

    got = field_caps(str(tmp_path)).to_pandas() \
        .sort_values("field").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    want = con.sql(FIELD_CAPS_SQL).df() \
        .sort_values("field").reset_index(drop=True)[got.columns] \
        .astype(got.dtypes.to_dict())
    assert got.equals(want), (got, want)
    # the regression: lang has 2 nulls total (1 per... file a has 1,
    # file b has 1) — not doubled
    assert int(got.set_index("field").loc["lang", "n_nulls"]) == 2
