"""Structured Streaming surfaces: incremental ingest + windowed aggregates."""
