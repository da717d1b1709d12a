"""Scaling-slope measurement: wall time of every headline query (the
bench.py set) plus the clustering composition, across the three driver
scale factors (100x row-count spread).

Near-linear slopes (time ratio ~ row ratio, modulo fixed overhead) are
the empirical check on SCALING.md's design claims — a super-linear
operator would bend upward long before 100 TB. Usage:

    python tools/scale_slope.py [names...]     # default: headline set
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
EXTRA = ["dedup_cluster_minhash"]  # pairs -> connected components


def default_names() -> list[str]:
    from erpl_web_spark.suite import all_queries

    heads = [n for n, q in sorted(all_queries().items()) if q.headline]
    return heads + EXTRA


def main() -> None:
    names = sys.argv[1:] or default_names()

    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("scale-slope")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warm JVM/codegen once
    qs["text_stats"].fn(spark, SFS[0]).collect()

    print(f"{'query':<24}" + "".join(f"{sf.split('/')[-1]:>10}" for sf in SFS)
          + f"{'t(0.1)/t(0.01)':>16}")
    for name in names:
        times = []
        for sf in SFS:
            t0 = time.monotonic()
            qs[name].fn(spark, sf).collect()
            times.append(time.monotonic() - t0)
        slope = times[2] / times[1] if times[1] > 0 else float("nan")
        print(f"{name:<24}" + "".join(f"{t:>10.2f}" for t in times)
              + f"{slope:>16.1f}")
    print("rows scale 10x per step; a slope near (or below) 10 at the "
          "top step means the operator is linear once fixed overhead "
          "amortizes.")


if __name__ == "__main__":
    main()
