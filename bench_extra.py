#!/usr/bin/env python
"""Round-8 optimization measurement harness (bench.py is FROZEN — this
file carries the extra instrumentation the optimization round needs).

Times any subset of the headline queries with bench.py's exact
methodology (noop sink; 1 cold rep + best-of-2 warm; caches dropped
between reps; job descriptions set per guide §1.5) and can dump
`.explain("formatted")` per query to a directory (plans/r08/...).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      [--queries a,b,c] [--reps 3] [--explain-dir plans/r08 --suffix before] \
      [--json-out /tmp/out.json] [--skip-warmup]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, materialize  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def drop_caches(spark):
    import gc

    gc.collect()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    spark.catalog.clearCache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    from geotrellis_landsat_emr_demo_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry.queries()
    names = HEADLINE if args.queries == "all" else args.queries.split(",")

    if not args.skip_warmup:
        def _noop(it):
            for b in it:
                yield b

        spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(_noop, "id long").count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        drop_caches(spark)

    if args.reps <= 0:
        spark.stop()
        return

    timings, cold, samples = {}, {}, {}
    for name in names:
        reps = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            materialize(qs[name](spark, args.sf_dir))
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            drop_caches(spark)
        cold[name] = reps[0]
        timings[name] = min(reps[1:]) if len(reps) > 1 else reps[0]
        samples[name] = reps
        print(f"  {name}: warm={timings[name]} reps={reps}", flush=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "queries_samples": samples,
        "sf_dir": args.sf_dir,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"value": total, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
