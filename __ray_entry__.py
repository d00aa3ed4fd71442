"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initializes or shuts down Ray.

- ``entry()``: flagship pipeline on sf0.001 — build the full inverted
  index from ``documents.parquet`` (SPIMI runs → shard shuffle →
  compressed segments, manifest-committed) and serve the fixed BM25
  query set; returns the ranked results table.
- ``queries()`` / ``oracle_sql()``: one entry per operator from
  SURVEY.md §2 + the training-data extensions; see
  ``snowplow_elasticsearch_loader_ray/driver_queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from snowplow_elasticsearch_loader_ray import driver_queries as DQ


def entry() -> Any:
    """Flagship: index build + BM25 top-k over /root/testdata/sf0.001."""
    return DQ.bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return DQ.registry()[0]


def oracle_sql() -> dict[str, str]:
    return DQ.registry()[1]
