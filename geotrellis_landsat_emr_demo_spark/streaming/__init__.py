"""Structured Streaming surface: incremental ingest + windowed stats."""
