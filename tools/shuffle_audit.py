"""Per-query shuffle-volume audit.

Runs suite queries and reports actual shuffle read/write bytes and
input bytes per query, measured from Spark's status REST API (stage
metrics diffed around each query). This turns PLANS.md's "one shuffle
on the join key" claims into byte counts — the number that predicts
100 TB behavior: a query whose shuffle volume is a small fraction of
its input scales; one that shuffles its input does not.

    python tools/shuffle_audit.py [--sf /root/testdata/sf0.1] [names...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _stages(ui: str, app_id: str, status: str) -> list:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status={status}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _stage_totals(ui: str, app_id: str) -> dict:
    # wait for the status store to quiesce (async stage completion events)
    for _ in range(20):
        if not _stages(ui, app_id, "active"):
            break
        time.sleep(0.25)
    time.sleep(0.75)
    tot = {"shuffle_read": 0, "shuffle_write": 0, "input": 0}
    for s in _stages(ui, app_id, "complete"):
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["input"] += s.get("inputBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = all_queries()
    names = args.names or [n for n, q in sorted(qs.items()) if q.headline]

    # warm the session (JVM/codegen/shuffle machinery) without touching
    # any suite query, so the first row isn't charged warmup costs
    spark.range(1_000_000).groupBy("id").count().count()

    print(f"{'query':<28}{'input_mb':>10}{'shuf_w_mb':>11}{'shuf_r_mb':>11}  wall_s")
    for name in names:
        before = _stage_totals(ui, app_id)
        t0 = time.monotonic()
        # collect(), not count(): count() lets Catalyst prune the whole
        # computation (payload columns, even entire joins), so metrics
        # would reflect a query nobody runs. collect matches the driver.
        n = len(qs[name].fn(spark, args.sf).collect())
        wall = time.monotonic() - t0
        after = _stage_totals(ui, app_id)
        inp = (after["input"] - before["input"]) / 1e6
        sw = (after["shuffle_write"] - before["shuffle_write"]) / 1e6
        sr = (after["shuffle_read"] - before["shuffle_read"]) / 1e6
        print(f"{name:<28}{inp:>10.1f}{sw:>11.2f}{sr:>11.2f}  {wall:<7.2f} rows={n}")


if __name__ == "__main__":
    main()
