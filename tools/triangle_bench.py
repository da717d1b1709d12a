"""Does degree orientation actually tame the celebrity node? (round 13)

graph.triangle_counts claims the node-iterator's wedge volume is
bounded by ORIENTED out-degrees (O(sqrt(E)) per node) rather than raw
degrees. This tool measures it on the adversarial shape: a star hub
with F followers plus a small triangle-bearing community. The naive
canonical-order join generates C(F, 2) wedges at the hub (~50M at
F=10^4); the oriented join generates ~none there (every star edge
orients INTO the hub, whose followers have degree 1 < hub degree), so
wall-clock stays flat as the hub grows while naive blows up
quadratically.

Usage: python tools/triangle_bench.py [--followers 2000 8000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--followers", type=int, nargs="+", default=[2000, 8000])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.graph import triangle_counts
    from erpl_web_spark.session import get_spark

    spark = get_spark("triangle-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def star_plus_community(followers: int):
        hub = spark.range(followers).select(
            F.lit(0).alias("src"), (F.col("id") + 1000000).alias("dst")
        )
        # 200-node community: each node linked to the next 3 -> triangles
        comm = spark.range(200).select(F.col("id").alias("a")).selectExpr(
            "a as src", "explode(array(a+1, a+2, a+3)) as dst"
        )
        return hub.unionByName(comm)

    def naive_counts(edges):
        # canonical-order 3-way join: wedges at the LOWEST id, which is
        # the hub for every follower pair — the formulation the
        # orientation exists to avoid
        u, v = F.col("src").cast("long"), F.col("dst").cast("long")
        ce = (
            edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .persist()
        )
        a = ce.select(F.col("u").alias("x"), F.col("v").alias("y"))
        b = ce.select(F.col("u").alias("x"), F.col("v").alias("z"))
        wedges = a.join(b, "x").where(F.col("y") < F.col("z"))
        closing = ce.select(F.col("u").alias("y"), F.col("v").alias("z"))
        tri = wedges.join(closing, ["y", "z"])
        n = (
            tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
            .groupBy("id")
            .count()
            .count()
        )
        ce.unpersist()
        return n

    print(f"{'followers':>10} {'oriented_s':>11} {'naive_s':>9} {'nodes_in_tris':>14}")
    for f in args.followers:
        edges = star_plus_community(f).persist()
        edges.count()
        t0 = time.monotonic()
        n_o = triangle_counts(edges).count()
        t_o = time.monotonic() - t0
        t0 = time.monotonic()
        n_n = naive_counts(edges)
        t_n = time.monotonic() - t0
        assert n_o == n_n, (n_o, n_n)
        edges.unpersist()
        print(f"{f:>10} {t_o:>11.2f} {t_n:>9.2f} {n_o:>14}")


if __name__ == "__main__":
    main()
