"""map_batches stages: extraction, posting construction, segment encoding."""
