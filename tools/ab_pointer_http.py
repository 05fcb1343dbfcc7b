#!/usr/bin/env python
"""Interleaved A/B: inline payloads vs pointer-over-HTTP ingest at one
pinned level (VERDICT r6 task 6 — measure the object-store fetch
architecture through HttpRangeReader, don't assert it).

Serves the bench catalog's images parquet from a local range-capable
HTTP server (the object-store test double), then alternates

  A) payload_source="inline"  — bytes ride the Spark plan (JVM scan)
  B) payload_files=[http URLs] — slim metadata through Spark; every
     chunk task fetches its scenes' bytes with ranged GETs (footer +
     image_id-stat-pruned row groups), the S3 deployment shape
     (reference: LandsatInput.scala:23-27 fetches scenes from S3 inside
     the task).

One JVM, shared warmup, AB_REPS alternating reps, medians printed.
Localhost HTTP is generous to B (no real NIC/egress); the number still
prices the protocol overhead (request count, read amplification) that
the 100 TB deployment pays, and the server log reports bytes moved.
"""
import json
import os
import shutil
import statistics
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import _pin, build  # noqa: E402


class _Handler:
    @staticmethod
    def make(directory, counters, lock):
        import http.server

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_HEAD(self):
                fp = os.path.join(directory, self.path.lstrip("/"))
                if not os.path.isfile(fp):
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(os.path.getsize(fp)))
                self.end_headers()

            def do_GET(self):
                fp = os.path.join(directory, self.path.lstrip("/"))
                if not os.path.isfile(fp):
                    self.send_error(404)
                    return
                data = open(fp, "rb").read()
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    a, b = rng[6:].split("-")
                    a = int(a)
                    b = min(int(b) if b else len(data) - 1, len(data) - 1)
                    body = data[a : b + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range", f"bytes {a}-{b}/{len(data)}"
                    )
                else:
                    body = data
                    self.send_response(200)
                with lock:
                    counters["requests"] += 1
                    counters["bytes"] += len(body)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return H


def main():
    import http.server

    from geotrellis_landsat_emr_demo_spark import fixtures
    from geotrellis_landsat_emr_demo_spark.catalog import Catalog
    from geotrellis_landsat_emr_demo_spark.operators import ingest

    cpus = int(os.environ.get("PROBE_CPUS", "32"))
    scenes = int(os.environ.get("SCALE_SCENES", "384"))
    px = int(os.environ.get("SCALE_PX", "768"))
    reps = int(os.environ.get("AB_REPS", "3"))
    _pin(cpus)
    spark = build(cpus)

    # one source catalog, reused read-only by every rep (ingests write
    # layer tiles into per-rep scratch catalogs)
    src_root = os.path.join(REPO, ".bench_data", "abptr-src")
    shutil.rmtree(src_root, ignore_errors=True)
    src_cat = Catalog(src_root)
    src_cat.append_pandas(
        fixtures.images_pdf("t-bench", n_scenes=scenes, px=px), "images"
    )
    images_dir = src_cat.table_dir("images")
    counters = {"requests": 0, "bytes": 0}
    lock = threading.Lock()
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _Handler.make(images_dir, counters, lock)
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    urls = [
        f"{base}/{os.path.basename(p)}" for p, _ in src_cat.file_entries("images")
    ]
    images_df = src_cat.read_spark(spark, "images")

    def one(tag, kw):
        root = os.path.join(REPO, ".bench_data", f"abptr-{tag}")
        shutil.rmtree(root, ignore_errors=True)
        cat = Catalog(root)
        t0 = time.time()
        ingest.ingest_images(
            spark, cat, "bench", images_df=images_df,
            max_zoom=13, min_zoom=10, **kw,
        )
        wall = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return wall

    configs = [
        ("inline", dict(payload_source="inline")),
        ("pointer-http", dict(payload_files=urls)),
    ]
    one("warm", configs[0][1])  # shared warmup
    walls = {t: [] for t, _ in configs}
    net = {t: [] for t, _ in configs}
    for _ in range(reps):
        for tag, kw in configs:
            with lock:
                counters["requests"] = counters["bytes"] = 0
            walls[tag].append(one(tag, kw))
            with lock:
                net[tag].append(dict(counters))
            print(f"# {tag}: {walls[tag][-1]:.1f}s http={net[tag][-1]}", flush=True)
    httpd.shutdown()
    result = {
        tag: dict(
            walls=[round(w, 1) for w in walls[tag]],
            median=round(statistics.median(walls[tag]), 1),
            http=net[tag][-1],
        )
        for tag, _ in configs
    }
    result["config"] = dict(cpus=cpus, scenes=scenes, px=px, reps=reps)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
