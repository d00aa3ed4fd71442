"""Checkpoint state: per-partition manifests + metrics rollup."""
