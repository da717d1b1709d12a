"""One-decade-up scaling check for the near-dup pipeline: synthesize an
sf1-scale documents table (10x sf0.1 rows) and measure
dedup_minhash_lsh / dedup_cluster_minhash wall time vs sf0.1.

Synthesis preserves the workload's dup structure without inventing new
data: each of 10 replicas of the sf0.1 documents gets (a) a doc_id
offset and (b) a replica-specific salt token prefixed to every 3rd
word. Within a replica both members of a planted near-dup pair receive
identical salting, so the in-replica near-dup structure survives;
across replicas at most ~1/4 of word-3-gram shingles are salt-free and
shared, putting cross-replica Jaccard ~0.14 — far below the 0.5
threshold — so replicas do NOT become near-dups of each other and pair
volume scales linearly (10x), not quadratically (100x).

Writes the synthesized table under .scratch/sf1/ (gitignored). Usage:

    python tools/sf1_slope.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
QUERIES = ["dedup_minhash_lsh", "dedup_cluster_minhash"]


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    replicas = []
    for r in range(10):
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda x, i: F.when(
                    i % 3 == 0, F.concat(F.lit(f"zq{r}q "), x)
                ).otherwise(x),
            ),
            " ",
        )
        replicas.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000).cast("long"))
            .withColumn("text", salted)
            .withColumn("n_chars", F.length("text").cast(docs.schema["n_chars"].dataType)
                        if "n_chars" in docs.columns else F.length("text"))
        )
    union = replicas[0]
    for rep in replicas[1:]:
        union = union.unionByName(rep)
    union.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")


def main() -> None:
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("sf1-slope")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    if not os.path.exists(f"{OUT}/documents.parquet/_SUCCESS"):
        t0 = time.monotonic()
        synthesize(spark)
        print(f"synthesized sf1 documents in {time.monotonic() - t0:.1f}s")
    n01 = spark.read.parquet(f"{SF01}/documents.parquet").count()
    n1 = spark.read.parquet(f"{OUT}/documents.parquet").count()
    print(f"rows: sf0.1={n01}  sf1={n1}  ({n1 / n01:.0f}x)")

    print(f"{'query':<24}{'sf0.1 (s)':>12}{'sf1 (s)':>12}{'slope':>8}{'pairs sf0.1':>14}{'pairs sf1':>12}")
    for name in QUERIES:
        qs[name].fn(spark, SF01).count()  # warm
        t0 = time.monotonic()
        c01 = qs[name].fn(spark, SF01).count()
        t01 = time.monotonic() - t0
        t0 = time.monotonic()
        c1 = qs[name].fn(spark, OUT).count()
        t1 = time.monotonic() - t0
        print(f"{name:<24}{t01:>12.2f}{t1:>12.2f}{t1 / t01:>8.1f}{c01:>14}{c1:>12}")
    print("10x rows; a slope near (or below) 10 pins linear behavior one "
          "decade above the driver's largest SF.")


if __name__ == "__main__":
    main()
