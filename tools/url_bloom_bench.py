"""Measure the anti-join input reduction from the URL-index Bloom
pre-filter (VERDICT r10 Next #4 — SCALING.md r11).

Builds a url_index over B batches of synthetic URLs with a planted
duplicate rate, Bloom pre-filter ON, then replays the LAST batch's
probe outside the operator and reports how many of its elected digests
were routed AROUND the LEFT ANTI join (definitely new: some Bloom bit
unset) vs INTO it (possible members: true duplicates + false
positives). At crawl scale the anti-join's batch-side input is the
`into` column — dup_rate + FP_rate of the batch instead of 100%.

Usage:
    python tools/url_bloom_bench.py [--batches 4] [--rows 20000]
                                    [--dup-rate 0.1] [--m-bits 1048576]
"""

from __future__ import annotations

import argparse
import sys
import tempfile

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--dup-rate", type=float, default=0.1)
    ap.add_argument("--m-bits", type=int, default=1 << 20)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import bloom_probe
    from erpl_web_spark.operators.url_index import (
        _committed_bloom,
        _elect_first,
        url_index_apply,
    )
    from erpl_web_spark.operators.text import canonicalize_url_expr
    from erpl_web_spark.session import get_spark

    spark = get_spark("url-bloom-bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_dup = int(args.rows * args.dup_rate)

    def batch(b: int):
        # unique URLs carry the batch id; duplicates point at batch-0
        # URLs (guaranteed already claimed for b > 0)
        return spark.range(args.rows).select(
            (F.lit(b * args.rows) + F.col("id")).alias("doc_id"),
            F.when(
                (F.col("id") < n_dup) & (F.lit(b) > 0),
                F.concat(F.lit("http://s.com/b0/"), F.col("id").cast("string")),
            )
            .otherwise(
                F.concat(
                    F.lit(f"http://s.com/b{b}/"), F.col("id").cast("string")
                )
            )
            .alias("url"),
        )

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/urlidx"
        for b in range(args.batches - 1):
            url_index_apply(batch(b), b, path, bloom_m_bits=args.m_bits, bloom_k=args.k)
        last = args.batches - 1
        df = batch(last)
        canon = df.withColumn(
            "canonical_url", canonicalize_url_expr("url")
        ).withColumn("digest", F.md5(F.col("canonical_url").cast("binary")))
        own = _elect_first(canon.where(F.col("digest").isNotNull()), "doc_id")
        bloom = _committed_bloom(spark, path, last, args.m_bits, args.k)
        assert bloom is not None, "coverage check failed - bug"
        probed = bloom_probe(
            own.select("digest"), bloom, k=args.k, m_bits=args.m_bits,
            token_col="digest",
        ).persist()
        n = probed.count()
        into = probed.where(F.col("present")).count()
        claims = (last) * (args.rows - n_dup) + n_dup  # batch 0 has no dups
        fp = (into - n_dup) / max(1, n - n_dup)
        print(
            f"batches={args.batches} rows/batch={args.rows} "
            f"dup_rate={args.dup_rate} m_bits={args.m_bits} k={args.k}"
        )
        print(
            f"claim set ~{claims} digests; last batch: {n} elected digests, "
            f"{into} into the anti-join ({into / n:.1%}), "
            f"{n - into} routed around it; "
            f"FP rate among genuinely-new: {fp:.4%}"
        )
        probed.unpersist()


if __name__ == "__main__":
    main()
