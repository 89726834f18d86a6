"""Runtime: checkpoint conversion/loading, serving batcher."""
