"""Embedding similarity search over an ``array<float>`` column.

- :func:`cosine_topk`   brute-force exact top-k: JVM-side dot products via
  ``F.zip_with`` + ``F.aggregate`` (whole-stage codegen, no Python) with a
  broadcast query side and a window top-k. The correctness baseline.
- :func:`lsh_topk`      signed-random-projection LSH: deterministic
  hyperplanes (seed 1337), bucket equi-join, exact re-rank inside buckets,
  multiprobe over hamming-1 neighbors. The 100-TB scale path: candidate
  count ~ N / 2^bits per probe instead of N.
- :func:`pairwise_near_dups` embedding-cosine near-duplicate pairs within
  a blocking key (label), for dedup pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force ANN baseline: broadcast queries x all vectors,
    cosine, row_number <= k. Returns (query_id, neighbor_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    # small parquet inputs arrive as 1 partition; spread the probe side so
    # the N*Q cosine work parallelizes instead of running in one task
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).repartition(par)
    j = q.crossJoin(base)
    if exclude_self:
        j = j.filter(F.col("query_id") != F.col("neighbor_id"))
    j = with_cosine(j, "qvec", "nvec")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _planes(dim: int, bits: int, table: int = 0, seed: int = 1337) -> np.ndarray:
    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((bits, dim))


def _table_buckets(df, vec_col, bits, tables, dim):
    """One (table, bucket) row per hash table per vector, via posexplode.

    Buckets for ALL tables come from one Arrow-batched numpy matmul
    (n x dim) @ (dim x tables*bits) — one UDF call per batch instead of
    tables*bits unrolled column expressions (which bloat codegen)."""
    all_planes = np.vstack([_planes(dim, bits, t) for t in range(tables)])
    pows = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        E = np.asarray(vecs.tolist(), dtype="f8")  # (n, dim)
        signs = (E @ all_planes.T) >= 0  # (n, tables*bits)
        signs = signs.reshape(len(E), tables, bits)
        vals = (signs * pows[None, None, :]).sum(axis=2)  # (n, tables)
        return pd.Series(vals.astype("i8").tolist())

    return df.select(
        "*", F.posexplode(buckets_udf(F.col(vec_col))).alias("tbl", "bucket")
    ).drop(vec_col)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table signed-random-projection LSH + exact
    re-rank of the bucket-local candidates.

    ``tables`` independent hash tables (union of candidates) trade compute
    for recall; ``multiprobe`` additionally probes hamming-1 buckets of
    each table.  At 100-TB scale the base side is hashed once per table
    (one explode + one shuffle on (tbl, bucket)); queries broadcast;
    candidate count ~ tables * N / 2^bits per query instead of N."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    base_keyed = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).repartition(par)
    base = _table_buckets(
        base_keyed.withColumn("v", F.col("nvec")), "v", bits, tables, dim
    )
    q_keyed = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    q = _table_buckets(q_keyed.withColumn("v", F.col("qvec")), "v", bits, tables, dim)
    if multiprobe:
        probes = F.array(
            [F.col("bucket")]
            + [
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(bits)
            ]
        )
        q = q.withColumn("bucket", F.explode(probes))
    q = F.broadcast(q)
    j = q.join(base, ["tbl", "bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # cosine per candidate occurrence, then dedupe on the 3 scalar columns
    # (cheaper than shuffling vector payloads through a distinct)
    j = with_cosine(j, "qvec", "nvec")
    cand = (
        j.groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _ivf_centroids(n_centroids: int, dim: int, seed: int = 4242) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids.  Random unit
    vectors are a legitimate (data-independent) IVF quantizer; being
    seeded constants they can be embedded verbatim in an oracle SQL."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _ivf_cells(df, vec_col, cents: np.ndarray, nprobe: int, out: str = "cell"):
    """posexplode the top-``nprobe`` centroid cells per vector (by dot
    product with the unit centroids == cosine order), via one Arrow-batched
    matmul per batch."""
    C = cents

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells_udf(vecs: pd.Series) -> pd.Series:
        E = np.asarray(vecs.tolist(), dtype="f8")  # (n, dim)
        dots = E @ C.T  # (n, n_centroids)
        # ties broken toward the lower centroid id (stable argsort on -dot)
        order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(order.astype("i4").tolist())

    return df.select(
        "*", F.explode(cells_udf(F.col(vec_col))).alias(out)
    ).drop(vec_col)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists (each vector -> its nearest centroid),
    probe the query's ``nprobe`` nearest lists, exact cosine re-rank.

    The 100-TB shape: the corpus is hashed once into lists (one narrow
    shuffle on cell), candidates per query ~ nprobe * N / n_centroids
    instead of N; queries broadcast.  Returns (query_id, neighbor_id,
    cosine, rank)."""
    cents = _ivf_centroids(n_centroids, dim)
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    base_keyed = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).repartition(par)
    base = _ivf_cells(
        base_keyed.withColumn("v", F.col("nvec")), "v", cents, nprobe=1
    )
    q_keyed = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    q = F.broadcast(
        _ivf_cells(q_keyed.withColumn("v", F.col("qvec")), "v", cents, nprobe)
    )
    j = q.join(base, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    j = with_cosine(j, "qvec", "nvec")
    cand = j.groupBy("query_id", "neighbor_id").agg(F.first("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale: SRP-LSH
    bucket candidates (union over ``tables`` hash tables), exact cosine
    verify >= threshold.

    This is the 100-TB shape for near-dup detection — candidates come from
    bucket equi-joins (expected bucket size N / 2^bits), never an all-pairs
    self-join.  Recall is probabilistic: a pair at angle θ collides in one
    table with prob (1 - θ/π)^bits; at near-dup thresholds (>= 0.9, θ <=
    26°) eight 4-bit tables miss < 1%.  :func:`pairwise_near_dups` stays
    the exact (blocked) baseline.  Returns (id_a, id_b, cosine)."""
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    b = _table_buckets(
        base.repartition(par).withColumn("v", F.col("vec")), "v", bits, tables, dim
    )
    # candidate dedup on ids ONLY — carrying the vector payloads through
    # the tables x collisions candidate set would shuffle each vector up
    # to `tables` times; instead join the (narrow) distinct pairs back to
    # the vectors once per side
    x = b.select(F.col("id").alias("id_a"), "tbl", "bucket")
    y = b.select(F.col("id").alias("id_b"), "tbl", "bucket")
    cand = (
        x.join(y, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    j = with_cosine(cand.join(va, "id_a").join(vb, "id_b"), "vec_a", "vec_b")
    return j.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def pairwise_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking column —
    exact within each block, O(n^2 / block): correct when block cardinality
    scales with the corpus; use :func:`lsh_near_dup_pairs` when it doesn't."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    x = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    ).repartition(par, "block")
    y = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    j = x.join(y, "block").filter(F.col("id_a") < F.col("id_b"))
    j = with_cosine(j, "vec_a", "vec_b")
    return j.filter(F.col("cosine") >= threshold).select(
        "block", "id_a", "id_b", "cosine"
    )
