"""Time EVERY registered suite query end-to-end (noop sink) at one SF.

Round-14 sweep harness: the bench covers the nine headline queries; this
tool extends the measurement to the full registry so non-headline
operators get the same guide-§1 treatment (measure first). Per query it
reports construction time (python DataFrame building, no job) and
execution wall (noop write of the already-built frame), sorted slowest
first. One warm query up front pays JVM/codegen startup.

Usage:
    python tools/time_suite.py [--sf DIR] [--reps N] [names ...]

Output: one JSON line per query on stdout:
    {"name": ..., "construct_sec": ..., "exec_sec": ..., "total_sec": ...}
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erpl_web_spark.operators import release_tracked
from erpl_web_spark.session import get_spark
from erpl_web_spark.suite import all_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("erpl-web-spark-time-suite")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args.names or sorted(qs)

    # Warm the JVM + codegen on a cheap query so the first measured
    # entry does not absorb session startup.
    qs["q01_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    release_tracked()

    rows = []
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"time_suite:{name}")
        best_c = best_e = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            c, e = t1 - t0, t2 - t1
            best_c = c if best_c is None or c < best_c else best_c
            best_e = e if best_e is None or e < best_e else best_e
        release_tracked()
        # Long sweeps accumulate localCheckpoint RDD blocks and broadcast
        # pieces that the ContextCleaner only reclaims once the JVM GCs
        # the corresponding objects — which needs the py4j-side Python
        # references dropped first. Without this, a 240-entry sweep in
        # one JVM eventually fails a broadcast build with driver OOM
        # (observed at entry 89). Python gc + a periodic JVM System.gc()
        # keeps the storage footprint bounded; neither affects timings
        # (both run after the measured window).
        del df
        gc.collect()
        if len(rows) % 20 == 19:
            spark.sparkContext._jvm.System.gc()
        row = {
            "name": name,
            "construct_sec": round(best_c, 3),
            "exec_sec": round(best_e, 3),
            "total_sec": round(best_c + best_e, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -r["total_sec"])
    print(
        json.dumps(
            {
                "summary": "slowest_first",
                "total_sec": round(sum(r["total_sec"] for r in rows), 1),
                "top20": [
                    (r["name"], r["total_sec"], r["construct_sec"]) for r in rows[:20]
                ],
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
