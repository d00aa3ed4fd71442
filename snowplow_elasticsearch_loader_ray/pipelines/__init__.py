"""Pipelines: ingest, index build, BM25 query, dedup, ANN, text analysis."""
