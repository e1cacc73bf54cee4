"""Round-based frontier scheduler: the heart of the engine."""
