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

Zipf mode (``--zipf``) instead measures the TEXT-OPERATOR join-back
shape: the token-keyed count join inside
``text.with_unigram_freq_score`` / ``with_bigram_coverage`` /
``with_bigram_logprob``, where the Zipfian head ("the" ≈ 7% of all
English token occurrences) is the natural heavy hitter. It generates a
(doc_id, tok) occurrence table with Zipf(s≈1)-distributed tokens via
inverse-CDF (rank = V^u, so the head token carries ln2/lnV of the
mass — ~7% at V=30k, matching English), optionally boosted to a
pathological boilerplate head with ``--zipf-head``, then times the
count-aggregate + join-back + per-doc roll-up under plain / salted /
AQE strategies, reports the head token's mass share, the exact
reducer-assignment imbalance (max/mean rows per reducer under
Murmur3 ``pmod(hash(tok), P)`` — the same partitioning the shuffle
uses), and whether AQE's skew-join split actually activated
(``skew=true`` in the final adaptive plan).

Usage: python tools/skew_bench.py --zipf [--rows 5000000]
         [--vocab 30000] [--zipf-head 0.0] [--salt 16] [--cpus 8]
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


def make_zipf_occurrences(spark: SparkSession, rows: int, vocab: int, head: float):
    """(doc_id, tok) occurrence table, tokens Zipf(s≈1)-distributed via
    inverse-CDF: u ~ U(0,1) deterministic from xxhash64(id), rank =
    floor(vocab^u) — P(rank=1) = ln2/ln(vocab) (~7% at V=30k, the
    empirical share of "the" in English). ``head > 0`` additionally
    pins that fraction of ALL occurrences on the head token — the
    pathological boilerplate-token case. ~100 tokens per doc."""
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double") / 1_000_000.0)
    rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("long")
    if head > 0:
        boost = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) < int(head * 1_000_000)
        rank = F.when(boost, F.lit(1)).otherwise(rank)
    toks = spark.range(rows).select(
        (F.col("id") % F.lit(max(1, rows // 100))).alias("doc_id"),
        F.concat(F.lit("t"), rank.cast("string")).alias("tok"),
    )
    return toks.localCheckpoint()


def zipf_mode(args) -> None:
    """Measure the text join-backs' token-keyed count join under
    Zipfian token skew: plain vs salted vs AQE, plus the exact
    reducer imbalance and whether AQE's skew split engaged."""
    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    toks = make_zipf_occurrences(spark, args.rows, args.vocab, args.zipf_head)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # corpus stats: head-token mass + rows-per-reducer imbalance under
    # the SAME Murmur3 pmod(hash, P) assignment the shuffle uses
    head_n, distinct_toks = toks.agg(
        F.sum(F.when(F.col("tok") == "t1", 1).otherwise(0)),
        F.countDistinct("tok"),
    ).first()
    red = (
        toks.groupBy(F.pmod(F.hash("tok"), F.lit(parts)).alias("r"))
        .count()
        .agg(F.max("count"), F.avg("count"))
        .first()
    )
    straggler_ratio = float(red[0]) / float(red[1])

    counts = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("tok_n"))
    counts = counts.localCheckpoint()  # isolate the join-back in the timings

    def per_doc(joined):
        # the with_unigram_freq_score shape: join-back then doc roll-up
        return joined.groupBy("doc_id").agg(
            F.count("*").alias("n_toks"), F.sum("tok_n").alias("sum_freq")
        )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sec_plain, n_plain = timed_count(per_doc(toks.join(counts, "tok")))
    sec_salted, n_salted = timed_count(per_doc(salted_join(toks, counts, "tok", salt=args.salt)))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    aqe_df = per_doc(toks.join(counts, "tok"))
    sec_aqe, n_aqe = timed_count(aqe_df)
    aqe_skew_split = "skew=true" in aqe_df._jdf.queryExecution().executedPlan().toString()

    assert n_plain == n_salted == n_aqe, (n_plain, n_salted, n_aqe)
    print(
        json.dumps(
            {
                "mode": "zipf",
                "rows": args.rows,
                "vocab": args.vocab,
                "zipf_head": args.zipf_head,
                "distinct_toks": int(distinct_toks),
                "head_share": round(head_n / args.rows, 4),
                "shuffle_partitions": parts,
                "straggler_ratio": round(straggler_ratio, 2),
                "salt": args.salt,
                "docs": n_plain,
                "aqe_skew_split": aqe_skew_split,
                "sec": {
                    "plain": round(sec_plain, 3),
                    "salted": round(sec_salted, 3),
                    "aqe": round(sec_aqe, 3),
                },
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--zipf", action="store_true",
                    help="measure the text join-backs under Zipfian token skew")
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--zipf-head", type=float, default=0.0,
                    help="extra mass pinned on the head token (boilerplate case)")
    args = ap.parse_args()

    if args.zipf:
        zipf_mode(args)
        return

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
