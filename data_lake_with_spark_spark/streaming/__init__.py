"""Structured Streaming jobs (SURVEY §2.8 / E8): file-replay of the
events table through windowed/stateful streaming plans, with batch
window equivalents (plans/windows_batch.py) as the oracle-checkable
mirror."""
