"""Does the Z-order layout actually prune? (round 13)

operators/layout.py claims the point of Morton keys: files written
range-partitioned on the interleaved key have min/max footprints small
in EVERY keyed dimension, so parquet stats prune 2-D box predicates
that a single-column sort can only prune along its own column. This
tool measures it: write the same (x, y) point set three ways — x-sorted,
y-sorted, z-ordered — into N files each, then for a set of box
predicates count the files whose parquet footer min/max intersect the
box (exactly the candidate set row-group/file skipping reads).

Usage: python tools/zorder_prune_bench.py [--rows 200000] [--files 64]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, ".")

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "zorder"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.layout import zorder_key_expr
    from erpl_web_spark.session import get_spark

    spark = get_spark("zorder-prune-bench")
    spark.sparkContext.setLogLevel("ERROR")

    pts = spark.range(args.rows).select(
        F.abs(F.xxhash64("id") % 1024).alias("x"),
        F.abs(F.xxhash64("id", F.lit(1)) % 1024).alias("y"),
    )
    layouts = {
        "x_sorted": pts.repartitionByRange(args.files, "x"),
        "y_sorted": pts.repartitionByRange(args.files, "y"),
        "zorder": pts.repartitionByRange(
            args.files, zorder_key_expr(["x", "y"], bits=10)
        ),
    }
    shutil.rmtree(OUT, ignore_errors=True)
    stats: dict[str, list[tuple[int, int, int, int]]] = {}
    for name, df in layouts.items():
        path = f"{OUT}/{name}"
        df.write.mode("overwrite").parquet(path)
        boxes = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            xs, ys = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "x":
                        xs += [col.statistics.min, col.statistics.max]
                    elif col.path_in_schema == "y":
                        ys += [col.statistics.min, col.statistics.max]
            boxes.append((min(xs), max(xs), min(ys), max(ys)))
        stats[name] = boxes

    # three predicate families, range side 64 (1/16 of the domain):
    # x-only, y-only, and the 2-D box — a single-column sort wins its
    # own dimension and reads EVERYTHING for the other; z-order pays a
    # modest factor on each single dimension to prune ALL of them.
    starts = (64, 320, 512, 704, 896)
    fams = {
        "x range": [(s, s + 63, 0, 1023) for s in starts],
        "y range": [(0, 1023, s, s + 63) for s in starts],
        "2-D box": [(s, s + 63, t, t + 63) for s in starts for t in (128, 640)],
    }
    print(f"# {args.rows} rows, {args.files} files per layout; avg files "
          f"whose parquet min/max intersect the predicate (lower = better)")
    print(f"{'layout':<10}" + "".join(f"{f:>12}" for f in fams))
    for name, boxes in stats.items():
        cells = []
        for queries in fams.values():
            hits = []
            for qx0, qx1, qy0, qy1 in queries:
                hit = sum(
                    1
                    for (bx0, bx1, by0, by1) in boxes
                    if not (bx1 < qx0 or bx0 > qx1 or by1 < qy0 or by0 > qy1)
                )
                hits.append(hit)
            cells.append(sum(hits) / len(hits))
        print(f"{name:<10}" + "".join(f"{c:>12.1f}" for c in cells))
    print(f"(of {args.files} files per layout)")


if __name__ == "__main__":
    main()
