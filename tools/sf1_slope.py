"""One-decade-up scaling check: synthesize an sf1-scale copy of every
driver table (10x sf0.1 rows) and measure the FULL headline set plus the
clustering composition against sf0.1.

Synthesis preserves each workload's structure without inventing data:

- ``documents``: 10 replicas, each with a replica-specific salt token
  prefixed to every 3rd word. Within a replica both members of a planted
  near-dup pair receive identical salting, so in-replica near-dup
  structure survives; across replicas at most ~1/4 of word-3-gram
  shingles are salt-free, putting cross-replica Jaccard ~0.14 — far
  below the 0.5 threshold — so pair volume scales linearly (10x), not
  quadratically (100x).
- ``customer/orders/lineitem/part/supplier``: 10 replicas with all
  primary AND foreign keys offset by the same per-replica constant, so
  join cardinalities scale exactly 10x (no cross-replica fan-out);
  ``nation``/``region`` stay as-is (dimensions).
- ``events``: user_id/event_id offset — 10x users, per-user event
  density unchanged (the as-of join and window workloads see the same
  per-key shape, 10x more keys).
- ``embeddings``: vec_id offset; replica r's vectors are circularly
  shifted by r dimensions — a shared permutation preserves all
  within-replica dot products (each replica mirrors replica 0's
  similarity structure) while cross-replica cosines look like
  independent random vectors, so pair volumes must scale linearly if
  the operators are honest. Verbatim copies would create 10 true
  near-dups per vector and exact centroid ties. The cosine probe set
  stays the replica-0 vec_id < 100 rows while the corpus scales 10x.

Writes under .scratch/sf1/ (gitignored). Usage:

    python tools/sf1_slope.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

# sf1 broadcasts (customer at 10x) need a real driver heap — the default
# 1g is a shell default, not a deployment setting. Must be set before
# the JVM launches.
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell")

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
OFF = 10_000_000
EXTRA = ["dedup_cluster_minhash"]

# key columns to offset per table (PKs and FKs with the same constant)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["nation", "region"]


def _salted_documents(spark, r: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda x, i: F.when(i % 3 == 0, F.concat(F.lit(f"zq{r}q "), x)).otherwise(x),
        ),
        " ",
    )
    out = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * OFF).cast("long")).withColumn(
        "text", salted
    )
    if "n_chars" in docs.columns:
        out = out.withColumn("n_chars", F.length("text").cast(docs.schema["n_chars"].dataType))
    return out


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    for table, keys in KEYED.items():
        src = spark.read.parquet(f"{SF01}/{table}.parquet")
        reps = []
        for r in range(10):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, (F.col(k) + F.lit(r * OFF)).cast(src.schema[k].dataType))
            if table == "embeddings" and r > 0:
                # Rotate each replica's vectors by r dimensions (circular
                # shift). A shared permutation preserves every dot
                # product WITHIN a replica (replica r's similarity
                # structure mirrors replica 0 exactly), while
                # cross-replica cosines become those of independent
                # random vectors — the embedding analogue of the
                # documents' salt tokens. Verbatim copies would instead
                # create 10 true near-duplicates of every vector (and
                # exact centroid ties funneling all replicas into
                # replica-0's cells), fabricating quadratic pair growth
                # the operators under test don't have on real data.
                c = F.col("embedding")
                shift = r % 32
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(c, shift + 1, F.size(c) - shift),
                        F.slice(c, 1, shift),
                    ),
                )
            reps.append(rep)
        union = reps[0]
        for rep in reps[1:]:
            union = union.unionByName(rep)
        union.repartition(32).write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
        print(f"  {table}: x10")
    union = _salted_documents(spark, 0)
    for r in range(1, 10):
        union = union.unionByName(_salted_documents(spark, r))
    union.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    print("  documents: x10 (salted)")
    for table in COPY_AS_IS:
        spark.read.parquet(f"{SF01}/{table}.parquet").write.mode("overwrite").parquet(
            f"{OUT}/{table}.parquet"
        )
        print(f"  {table}: copied")


def main() -> None:
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("sf1-slope")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1:] or (
        [n for n, q in sorted(qs.items()) if q.headline] + EXTRA
    )

    if not os.path.exists(f"{OUT}/lineitem.parquet/_SUCCESS"):
        t0 = time.monotonic()
        synthesize(spark)
        print(f"synthesized sf1 tables in {time.monotonic() - t0:.1f}s")

    print(f"{'query':<26}{'sf0.1 (s)':>11}{'sf1 (s)':>10}{'slope':>7}{'rows 0.1':>11}{'rows sf1':>11}")
    for name in names:
        qs[name].fn(spark, SF01).count()  # warm
        t0 = time.monotonic()
        c01 = qs[name].fn(spark, SF01).count()
        t01 = time.monotonic() - t0
        qs[name].fn(spark, OUT).count()  # warm sf1 plan
        t0 = time.monotonic()
        c1 = qs[name].fn(spark, OUT).count()
        t1 = time.monotonic() - t0
        print(f"{name:<26}{t01:>11.2f}{t1:>10.2f}{t1 / t01:>7.1f}{c01:>11}{c1:>11}")
    print("10x rows; a slope near (or below) 10 pins linear behavior one "
          "decade above the driver's largest SF.")


if __name__ == "__main__":
    main()
