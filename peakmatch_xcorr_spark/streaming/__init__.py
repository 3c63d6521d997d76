"""Structured Streaming variants of the rollup path.

The reference is strictly batch (SURVEY.md §2.10) and the engine's
continuous aggregates are primarily the batch incremental cascade
(operators/refresh.py); this package provides the streaming ingest
shape for live transcript feeds: watermarked tumbling-window rollups
and a stateful per-conversation accumulator.
"""
