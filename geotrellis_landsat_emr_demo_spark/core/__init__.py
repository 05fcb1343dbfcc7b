"""Pure-numpy core — importable without a SparkSession.

Everything here is deterministic, vectorized, and side-effect free; the
Spark layer wraps these in Arrow/pandas UDF batches (never per-row Python).
"""
