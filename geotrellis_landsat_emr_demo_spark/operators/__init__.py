"""Distributed operators: ingest (chunk/merge/pyramid), spatial joins, attrs."""
