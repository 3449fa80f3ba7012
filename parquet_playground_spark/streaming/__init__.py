"""Structured Streaming queries (availableNow batch-replay)."""
