"""Profiling for dedup_minhash_lsh at a given SF: one cold full run (as
the bench warmup sees it) and two warm reps (rebuilt DataFrames, cache
reuse — what the bench times), plus a cold per-stage decomposition."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erpl_web_spark.session import get_spark
from erpl_web_spark.suite import load
from erpl_web_spark.operators.dedup import minhash_lsh_pairs


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag):
        docs = load(spark, sf_dir, "documents", spread=True)
        t0 = time.perf_counter()
        out = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5)
        force(out)
        print(f"{tag}: {time.perf_counter()-t0:.2f}s")

    run("cold full")
    run("warm full 1")
    run("warm full 2")


if __name__ == "__main__":
    main()
