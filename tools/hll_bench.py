"""HLL accuracy across cardinality decades vs the theoretical band.

text.hll_distinct's md5-portable registers claim the standard
HyperLogLog error (1.04/sqrt(m) standard error in the raw regime,
linear counting below 2.5m). This tool measures relative error at
three cardinality decades for two precisions and prints the measured
error next to the band — the decade-up pattern (Bloom r12, zorder r13)
applied to the cardinality sketch.

Usage: python tools/hll_bench.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import hll_distinct
    from erpl_web_spark.session import get_spark

    spark = get_spark("hll-bench")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'n_distinct':>10} {'p':>3} {'m':>5} {'est':>12} {'rel_err':>8} "
          f"{'1.04/sqrt(m)':>13} {'branch':>7}")
    for n in (10_000, 100_000, 1_000_000):
        for p in (8, 12):
            m = 1 << p
            df = spark.range(n).select(
                F.lit(0).alias("g"),
                F.concat(F.lit(f"d{p}:"), F.col("id")).alias("v"),
            )
            row = hll_distinct(df, ["g"], "v", p=p).collect()[0]
            est = row["hll_est"]
            # branch label from the RAW estimate the operator actually
            # branches on (the final est can cross 2.5m after the
            # linear-counting formula is applied)
            v0 = row["n_zero_regs"]
            import math

            e_lin = m * math.log(m / v0) if v0 > 0 else None
            branch = (
                "linear"
                if v0 > 0 and (e_lin is not None and abs(est - e_lin) < 1e-6)
                else "raw"
            )
            print(f"{n:>10} {p:>3} {m:>5} {est:>12.1f} "
                  f"{abs(est - n) / n:>8.4f} {1.04 / m ** 0.5:>13.4f} {branch:>7}")


if __name__ == "__main__":
    main()
