"""Ray-Data-native fulltext indexing + BM25 query engine.

Plays the document-indexing role of the Snowplow→Elasticsearch loader
(reference: /root/reference, surveyed in SURVEY.md) re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches build a compressed inverted index (SPIMI runs →
materialized shard-clustered exchange → delta/FOR-encoded posting
segments with block-max metadata) and serve BM25 top-k via
term-at-a-time numpy scoring or block-max WAND.

Package layout
--------------
- ``tokenizer``   Arrow-kernel tokenization (the P2-analogue hot path)
- ``codec``       posting-list block codec (delta + frame-of-reference)
- ``bm25``        the one shared BM25 formula (engine + oracle use it)
- ``sources/``    parquet readers + the deterministic corpus generator
- ``stages/``     map_batches stages: extract, postings, segment encode
- ``state/``      per-partition manifests (exactly-once commit), metrics
- ``pipelines/``  build_index, query engine, dedup, ANN, text analysis
"""

__version__ = "0.1.0"

from .config import DedupConfig, IndexConfig  # noqa: E402,F401
from .pipelines.build import (  # noqa: E402,F401
    build_index, index_metrics, index_stats, ingest_pages,
)
from .pipelines.merge import merge_indexes  # noqa: E402,F401
from .pipelines.query import IndexReader, QueryEngine  # noqa: E402,F401

__all__ = [
    "IndexConfig", "DedupConfig", "build_index", "ingest_pages",
    "index_stats", "index_metrics", "merge_indexes", "IndexReader",
    "QueryEngine",
]
