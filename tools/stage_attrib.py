#!/usr/bin/env python
"""Per-Spark-stage attribution of one warm pinned ingest via the event
log: stage wall, task-time sum, GC time, shuffle read/write bytes,
python-worker (executorRunTime vs executorCpuTime) split.  The
instrument the noop-prefix profilers couldn't be: it measures the REAL
plan, not a reconstruction."""
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import _pin  # noqa: E402


def main():
    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    scenes = int(os.environ.get("SCALE_SCENES", "384"))
    px = int(os.environ.get("SCALE_PX", "768"))
    kw = json.loads(os.environ.get("PROBE_KW", "{}"))
    evdir = os.path.join(REPO, ".bench_data", "eventlog")
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from geotrellis_landsat_emr_demo_spark.session import build_session

    _pin(cpus)
    spark = build_session(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    def run(tag):
        root = os.path.join(REPO, ".bench_data", f"attrib-{tag}")
        shutil.rmtree(root, ignore_errors=True)
        cat = Catalog(root)
        cat.append_pandas(
            fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images"
        )
        t0 = time.time()
        ingest.ingest_images(spark, cat, "bench", max_zoom=13, min_zoom=13, **kw)
        wall = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return wall

    w_cold = run("warm")
    t_mark = time.time()
    w_warm = run("meas")
    _pin(None)
    spark.stop()

    # parse the event log: stages completing after t_mark = the warm run
    stages = []
    logs = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        + glob.glob(os.path.join(evdir, "*"))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in logs:
        with open(path) as f:
            task_agg = {}
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    a = task_agg.setdefault(
                        sid,
                        dict(run=0, cpu=0, gc=0, des=0, ser=0, sr=0, sw=0,
                             spill=0, n=0),
                    )
                    a["run"] += m.get("Executor Run Time", 0)
                    a["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
                    a["gc"] += m.get("JVM GC Time", 0)
                    a["des"] += m.get("Executor Deserialize Time", 0)
                    a["ser"] += m.get("Result Serialization Time", 0)
                    sr = m.get("Shuffle Read Metrics") or {}
                    a["sr"] += sr.get("Local Bytes Read", 0) + sr.get(
                        "Remote Bytes Read", 0
                    )
                    sw = (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    a["sw"] += sw
                    a["spill"] += m.get("Disk Bytes Spilled", 0)
                    a["n"] += 1
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time", 0) / 1000.0
                    com = si.get("Completion Time", 0) / 1000.0
                    if com < t_mark:
                        continue
                    sid = si["Stage ID"]
                    a = task_agg.get(sid, {})
                    stages.append(
                        dict(
                            stage=sid,
                            name=si.get("Stage Name", "?")[:60],
                            wall=round(com - sub, 1),
                            tasks=a.get("n", 0),
                            task_run_s=round(a.get("run", 0) / 1000.0, 1),
                            task_cpu_s=round(a.get("cpu", 0) / 1000.0, 1),
                            gc_s=round(a.get("gc", 0) / 1000.0, 1),
                            shuf_r_mb=round(a.get("sr", 0) / 1e6, 1),
                            shuf_w_mb=round(a.get("sw", 0) / 1e6, 1),
                            spill_mb=round(a.get("spill", 0) / 1e6, 1),
                        )
                    )
    stages.sort(key=lambda s: -s["wall"])
    print(json.dumps(dict(cpus=cpus, cold=round(w_cold, 1),
                          warm=round(w_warm, 1), kw=kw), indent=None))
    for s in stages[:10]:
        print(json.dumps(s))


if __name__ == "__main__":
    main()
