#!/usr/bin/env python
"""Interleaved A/B harness for round-8 marginal optimizations.

The box carries external tenant load (observed load-avg ~7 while idle),
so single-sample walls drift 3-8x; decisions here follow the repo's own
protocol (BENCH/BASELINE.md §r05): INTERLEAVED reps (A, B, A, B, ...)
with per-rep walls and the median per variant.

Usage: python tools/ab_r08.py <case> [reps] [sf_dir]
Cases are defined in CASES below as (label_a, fn_a, label_b, fn_b).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _drop_caches(spark):
    import gc

    gc.collect()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    spark.catalog.clearCache()


def q_window_tumbling_nospread(spark, sf_dir):
    import __spark_entry__ as entry

    ev = entry._t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 3
            ).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_envelope_nospread(spark, sf_dir):
    import __spark_entry__ as entry

    ev = entry._t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        ((F.col("user_id") % 360) - 180 + 0.5).alias("lng"),
        ((F.col("event_id") % 160) - 80 + 0.5).alias("lat"),
    )
    aoi = F.broadcast(
        spark.createDataFrame(
            entry._AOIS, "aoi_id string, x0 double, y0 double, x1 double, y1 double"
        )
    )
    j = pts.join(
        aoi,
        (F.col("lng") >= F.col("x0"))
        & (F.col("lng") <= F.col("x1"))
        & (F.col("lat") >= F.col("y0"))
        & (F.col("lat") <= F.col("y1")),
        "inner",
    )
    return j.groupBy("aoi_id").agg(
        F.count("*").alias("n_points"), F.countDistinct("user_id").alias("n_users")
    )


def q_merge_first_wins_window(spark, sf_dir):
    import __spark_entry__ as entry

    l = entry._t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    winners = l.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return winners.groupBy("l_returnflag").agg(
        F.count("*").alias("n_winners"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_cell_assign_nospread(spark, sf_dir):
    import math

    import __spark_entry__ as entry

    span = 2 * entry.ORIGIN / (1 << 6)
    cells = (
        entry._mercator(entry._points(spark, sf_dir))
        .withColumn("cx", F.floor((F.col("mx") + entry.ORIGIN) / span).cast("long"))
        .withColumn("cy", F.floor((entry.ORIGIN - F.col("my")) / span).cast("long"))
    )
    return (
        cells.groupBy("cx", "cy")
        .agg(F.count("*").alias("n_points"), F.countDistinct("user_id").alias("n_users"))
        .withColumn("cell_id", F.col("cy") * 64 + F.col("cx"))
        .select("cell_id", "cx", "cy", "n_points", "n_users")
    )


def _nospread_docs_variant(build):
    """Wrap an entry-style query builder so the documents scan is NOT
    spread (temporarily neutralizes entry._spread)."""

    def f(spark, sf_dir):
        import __spark_entry__ as entry

        orig = entry._spread
        entry._spread = lambda df: df
        try:
            return build(spark, sf_dir)
        finally:
            entry._spread = orig

    return f


def q_pii_nospread(spark, sf_dir):
    import __spark_entry__ as entry

    return _nospread_docs_variant(entry.q_pii_scrub)(spark, sf_dir)


def q_quality_nospread(spark, sf_dir):
    import __spark_entry__ as entry

    return _nospread_docs_variant(entry.q_quality_score)(spark, sf_dir)


def q_minhash_bands_nospread(spark, sf_dir):
    import __spark_entry__ as entry

    return _nospread_docs_variant(entry.q_dedup_minhash_bands)(spark, sf_dir)


def _entry(name):
    def f(spark, sf_dir):
        import __spark_entry__ as entry

        return entry.queries()[name](spark, sf_dir)

    return f


CASES = {
    "window_tumbling": ("spread", _entry("window_tumbling_counts"), "nospread", q_window_tumbling_nospread),
    "envelope": ("spread", _entry("envelope_pip_join"), "nospread", q_envelope_nospread),
    "merge_first_wins": ("minby", _entry("merge_first_wins"), "window", q_merge_first_wins_window),
    "cell_assign": ("spread", _entry("cell_assign_agg"), "nospread", q_cell_assign_nospread),
    "pii": ("spread", _entry("pii_scrub"), "nospread", q_pii_nospread),
    "quality": ("spread", _entry("quality_score"), "nospread", q_quality_nospread),
    "minhash_bands": ("spread", _entry("dedup_minhash_bands"), "nospread", q_minhash_bands_nospread),
    "paragraph": (
        "spread",
        _entry("paragraph_dedup"),
        "nospread",
        lambda spark, sf_dir: _nospread_docs_variant(
            __import__("__spark_entry__").q_paragraph_dedup
        )(spark, sf_dir),
    ),
    "dedup_exact": (
        "spread",
        _entry("dedup_exact"),
        "nospread",
        lambda spark, sf_dir: _nospread_docs_variant(
            __import__("__spark_entry__").q_dedup_exact
        )(spark, sf_dir),
    ),
    "knn": (
        "spread",
        _entry("knn_points"),
        "nospread",
        lambda spark, sf_dir: _nospread_docs_variant(
            __import__("__spark_entry__").q_knn_points
        )(spark, sf_dir),
    ),
}


def main():
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf1.0"
    la, fa, lb, fb = CASES[case]

    from geotrellis_landsat_emr_demo_spark.session import build_session

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    def _noop(it):
        for b in it:
            yield b

    spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(_noop, "id long").count()

    walls = {la: [], lb: []}
    for rep in range(reps):
        for label, fn in ((la, fa), (lb, fb)):
            spark.sparkContext.setJobDescription(f"{case}:{label} rep{rep}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[label].append(round(time.time() - t0, 3))
            _drop_caches(spark)
    for label in (la, lb):
        print(
            f"{case} {label}: median={statistics.median(walls[label]):.3f} "
            f"reps={walls[label]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
