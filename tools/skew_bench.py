#!/usr/bin/env python
"""Engineered-skew join A/B: plain shuffle join vs salted_join vs AQE.

Generates a fact table where one heavy-hitter key owns ``--hot-frac`` of
all rows (the worst case for a shuffled equi-join: one reducer gets the
whole hot key while the rest idle), joins it to a uniform dim table, and
times three physical strategies:

  plain   sort-merge join, AQE off      — the single-reducer straggler
  salted  operators.relational.salted_join, AQE off
  aqe     plain join, AQE skew-split on — Spark's runtime answer

Broadcast is disabled throughout so the join genuinely shuffles (at
100 TB the dim side of a skewed join often exceeds the broadcast
threshold too). Row counts are asserted identical across strategies.

Emits one JSON line:
  {"rows": N, "hot_frac": f, "salt": k,
   "sec": {"plain": s, "salted": s, "aqe": s}}

Usage: python tools/skew_bench.py [--rows 2000000] [--hot-frac 0.5]
                                  [--salt 16] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from erpl_web_spark.operators.relational import salted_join

N_DIM = 10_000


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-bench")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def make_tables(spark: SparkSession, rows: int, hot_frac: float):
    """Fact: ``hot_frac`` of rows on key 0, the rest uniform over N_DIM
    keys. A payload column gives the salt hash entropy and the join
    output some width."""
    fact = spark.range(rows).select(
        F.when(F.col("id") % 1_000_000 < int(hot_frac * 1_000_000), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
    )
    # materialize so generation cost stays out of the timed joins
    fact = fact.localCheckpoint()
    dim = dim.localCheckpoint()
    return fact, dim


def timed_count(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = make_tables(spark, args.rows, args.hot_frac)

    def agg(joined):
        # aggregate AFTER the join so join-output size, not collect,
        # dominates; count() alone would let Spark prune the join
        return joined.groupBy("k").agg(F.count("*").alias("n"), F.max("attr").alias("m"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sec_plain, n_plain = timed_count(agg(fact.join(dim, "k")))
    sec_salted, n_salted = timed_count(agg(salted_join(fact, dim, "k", salt=args.salt)))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    sec_aqe, n_aqe = timed_count(agg(fact.join(dim, "k")))

    assert n_plain == n_salted == n_aqe, (n_plain, n_salted, n_aqe)
    print(
        json.dumps(
            {
                "rows": args.rows,
                "hot_frac": args.hot_frac,
                "salt": args.salt,
                "groups": n_plain,
                "sec": {
                    "plain": round(sec_plain, 3),
                    "salted": round(sec_salted, 3),
                    "aqe": round(sec_aqe, 3),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
