"""Per-JOB cost breakdown for one suite entry (guide §1, multi-action
operators).

``profile_headline.py`` splits a LAZY entry into plan vs noop-sink
execution — but the index-build / iterative-graph entries run REAL jobs
inside ``fn()`` (manifest commits, eager checkpoints, counts), so their
cost hides in "construction". This tool runs one entry end-to-end
(fn + noop sink) and prints every Spark job the driver ran, in order,
with its duration, stage/task counts, summed task time, and the action
call site — the direct answer to "which of the operator's actions is
the expensive one".

Usage: python tools/profile_jobs.py [--sf DIR] [--warm] name [name...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true",
                    help="run the entry once unprofiled first (JIT/codegen)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from erpl_web_spark.operators import release_tracked
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def run(name):
        df = qs[name].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        release_tracked()

    # JVM/codegen warmup on something cheap so job 0 isn't startup.
    run("q01_pricing_summary")

    for name in args.names:
        if args.warm:
            run(name)
        jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        run(name)
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in _api(base, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        total = 0.0
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            dur = None
            try:
                import calendar
                fmt = "%Y-%m-%dT%H:%M:%S.%f"

                def _ts(s):
                    s = s.replace("GMT", "")
                    return calendar.timegm(
                        time.strptime(s.split(".")[0], "%Y-%m-%dT%H:%M:%S")
                    ) + float("0." + s.split(".")[1]) if "." in s else float(
                        calendar.timegm(time.strptime(s, "%Y-%m-%dT%H:%M:%S"))
                    )

                dur = _ts(comp) - _ts(sub)
            except Exception:
                pass
            d = f"{dur:6.2f}s" if dur is not None else "   ?  "
            total += dur or 0.0
            desc = (j.get("description") or j.get("name") or "")[:100]
            print(
                f"  job {j['jobId']:>4} {d} stages={len(j.get('stageIds', [])):>2} "
                f"tasks={j.get('numTasks', 0):>4} {desc}"
            )
        print(f"  sum of job durations: {total:.2f}s "
              f"(gap to wall = driver/planning time between jobs)")


if __name__ == "__main__":
    main()
