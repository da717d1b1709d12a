"""Scaling-slope measurement: wall time of representative operators
across the three driver scale factors (100x row-count spread).

Near-linear slopes (time ratio ~ row ratio, modulo fixed overhead) are
the empirical check on SCALING.md's design claims — a super-linear
operator would bend upward long before 100 TB. Usage:

    python tools/scale_slope.py [names...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
DEFAULT = [
    "dedup_minhash_lsh",      # shingle + band + verify pipeline
    "dedup_cluster_minhash",  # + connected components
    "q01_pricing_summary",    # scan + decimal agg
    "asof_join_events",       # union + window
    "text_stats",             # map-only
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT

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
