"""Bucketed co-located join A/B: shuffle elimination via bucketBy.

The third leg of the scale toolkit next to tools/skew_bench.py (skew)
and PLANS.md (pushdown/broadcast audit): big fact-fact joins shuffle
BOTH sides on the key every query. Writing the tables bucketed on the
join key (same bucket count both sides) pre-partitions them once at
write time; every subsequent join plans as a SortMergeJoin with NO
Exchange on either side — at 100 TB that converts the dominant
recurring shuffle into a one-time write cost.

Usage:
    python tools/bucket_bench.py [--sf /root/testdata/sf0.1] [--buckets 16]

Prints one JSON line:
    {"plain_sec": ..., "bucketed_sec": ...,
     "plain_exchanges": 2, "bucketed_exchanges": 0}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Under AQE the string may append an "== Initial Plan ==" section,
    # which would double-count — keep only the current/final plan.
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange hashpartitioning")


def join_query(spark, orders, lineitem):
    from pyspark.sql import functions as F

    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n"),
        )
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from erpl_web_spark.session import get_spark

    spark = get_spark("bucket-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Force the sort-merge path: broadcast would hide the join shuffle
    # entirely at this toy scale, but two 100-TB fact tables can't
    # broadcast — SMJ-with/without-Exchange is the comparison that
    # transfers to the real cluster.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{args.sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{args.sf}/lineitem.parquet")

    # One-time bucketed write (the cost a real pipeline pays once).
    for name, df, key in (
        ("bb_orders", orders, "o_orderkey"),
        ("bb_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .bucketBy(args.buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    plain = join_query(spark, orders, lineitem)
    bucketed = join_query(spark, spark.table("bb_orders"), spark.table("bb_lineitem"))

    force(plain)  # warm
    t0 = time.perf_counter()
    force(plain)
    plain_sec = time.perf_counter() - t0

    force(bucketed)  # warm
    t0 = time.perf_counter()
    force(bucketed)
    bucketed_sec = time.perf_counter() - t0

    out = {
        "plain_sec": round(plain_sec, 3),
        "bucketed_sec": round(bucketed_sec, 3),
        "plain_exchanges": count_exchanges(plain),
        "bucketed_exchanges": count_exchanges(bucketed),
        "buckets": args.buckets,
        "sf": args.sf,
    }
    for name in ("bb_orders", "bb_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
