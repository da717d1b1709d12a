"""Per-query cost breakdown for the headline bench set (guide §1).

For each query (default: headline set, or names given on argv):

- builds the DataFrame and times the PLANNING side alone (python query
  construction + analysis + optimization + physical planning, forced via
  queryExecution().executedPlan() without running a job),
- times the full noop-sink execution (the bench's timed action),
- pulls the stage metrics for exactly the stages of that run from the
  local UI REST API: task count, sum of executorRunTime, shuffle
  read/write bytes, input bytes — so wall time can be attributed to
  scheduling overhead (wall >> task_time/cores) vs real compute.

Methodology matches bench.py (warmup + min of N reps); the breakdown is
for analysis only and never feeds the bench JSON.

Usage: python tools/profile_headline.py [--sf DIR] [--reps N] [names...]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from erpl_web_spark.operators import release_tracked
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("profile-headline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args.names or [n for n, q in sorted(qs.items()) if q.headline]
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warmup (JVM + codegen JIT), as in bench.py.
    for name in names:
        noop(qs[name].fn(spark, args.sf))
        release_tracked()

    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # planning-only time: build + force physical planning, no job.
        t0 = time.perf_counter()
        df = qs[name].fn(spark, args.sf)
        df._jdf.queryExecution().executedPlan()
        plan_sec = time.perf_counter() - t0

        stages_before = {s["stageId"] for s in _api(base, f"applications/{app_id}/stages")}
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            noop(qs[name].fn(spark, args.sf))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        stages = [
            s
            for s in _api(base, f"applications/{app_id}/stages")
            if s["stageId"] not in stages_before and s["status"] == "COMPLETE"
        ]
        release_tracked()
        n_jobs = len({s.get("jobIds", [None])[0] for s in stages})
        rows.append(
            {
                "query": name,
                "plan_sec": round(plan_sec, 3),
                "best_wall_sec": round(best, 3),
                "reps": args.reps,
                "stages": len(stages),
                "tasks": sum(s["numCompleteTasks"] for s in stages),
                "task_time_sec": round(
                    sum(s["executorRunTime"] for s in stages) / 1000.0, 2
                ),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
                ),
                "input_mb": round(sum(s["inputBytes"] for s in stages) / 1e6, 2),
                "jobs~": n_jobs,
            }
        )
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
