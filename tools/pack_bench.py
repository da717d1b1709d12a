"""Next-fit packer measurements for SCALING.md.

Two questions a 100 TB deployment asks of pack_documents_nextfit:

1. --shards: does the shard count behave as the parallelism knob the
   docstring claims? Wall time at sf0.1 for n_shards in {1, 8, 64}:
   1 shard = the serial worst case (one applyInPandas group on one
   core), 64 = more groups than cores. The packing loop itself is
   O(n) python-over-numpy per shard, so wall should fall until groups
   saturate cores and flatten at Spark overhead.

2. --util: what does next-fit's one-pass greed cost in bin space?
   Utilization = total tokens / (bins * budget), reported per budget.
   Next-fit never looks back, so short docs following a near-full bin
   open a new one; the classic bound is >= 50% of optimal, real
   corpora sit far higher. A LOW utilization at the production-like
   budget would argue for first-fit-decreasing within shard (a sort
   plus the same scan) — measure before optimizing.

Usage:
    python tools/pack_bench.py [--sf DIR] [--shards] [--util]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--shards", action="store_true")
    ap.add_argument("--util", action="store_true")
    args = ap.parse_args()
    if not (args.shards or args.util):
        args.shards = args.util = True

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import pack_documents_nextfit
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("pack-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, args.sf, "documents").persist()
    n = docs.count()
    print(f"# corpus: {n} docs at {args.sf}")

    if args.shards:
        print("\n# shard-count sweep (budget=64, wall sec, warm)")
        print("| n_shards | wall_s |")
        print("|---|---|")
        for n_shards in (1, 8, 64):
            out = pack_documents_nextfit(docs, budget=64, n_shards=n_shards)
            out.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            pack_documents_nextfit(docs, budget=64, n_shards=n_shards).write.format(
                "noop"
            ).mode("overwrite").save()
            print(f"| {n_shards} | {time.perf_counter() - t0:.2f} |")

    if args.util:
        print("\n# bin utilization (n_shards=8): tokens / (bins * budget)")
        print("| budget | bins | total_tokens | oversized_docs | utilization |")
        print("|---|---|---|---|---|")
        for budget in (64, 256, 2048):
            out = pack_documents_nextfit(docs, budget=budget, n_shards=8)
            agg = (
                out.groupBy("shard", "bin_id")
                .agg(F.max("bin_fill_after").alias("fill"))
                .agg(
                    F.count("*").alias("bins"),
                    F.sum("fill").alias("tokens"),
                    F.sum((F.col("fill") > budget).cast("int")).alias("oversized"),
                )
                .collect()[0]
            )
            util = agg["tokens"] / (agg["bins"] * budget)
            print(
                f"| {budget} | {agg['bins']} | {agg['tokens']} | "
                f"{agg['oversized']} | {util:.3f} |"
            )

    docs.unpersist()


if __name__ == "__main__":
    main()
