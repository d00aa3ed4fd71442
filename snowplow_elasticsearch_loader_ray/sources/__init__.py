"""Sources: parquet corpus readers + the deterministic synthetic corpus."""
