"""ANN quality/latency characterization at sf0.1.

Compares, for the same 100-probe set over the embeddings corpus:
  - exact brute-force cosine top-k (the recall=1.0 reference),
  - IVF (nprobe cells, full-precision scoring),
  - IVF + int8 shortlist + full-precision re-rank (the memory-lean
    two-stage path).

Reports recall@k vs exact and wall-clock per variant. Usage:

    python tools/ann_bench.py [--sf /root/testdata/sf0.1] [--k 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--shortlist", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.similarity import (
        ann_top_k_ivf,
        ann_top_k_ivf_rerank,
        cosine_top_k,
    )
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("ann-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, args.sf, "embeddings", spread=True)
    probes = emb.where(F.col("vec_id") < 100)
    emb.count()  # warm the scan

    def run(name, df):
        t0 = time.monotonic()
        pairs = {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}
        dt = time.monotonic() - t0
        return name, pairs, dt

    variants = [
        run("exact", cosine_top_k(emb, probes, k=args.k)),
        run("ivf", ann_top_k_ivf(emb, probes, k=args.k, nprobe=args.nprobe)),
        run(
            "ivf_int8_rerank",
            ann_top_k_ivf_rerank(
                emb, probes, k=args.k, nprobe=args.nprobe, shortlist=args.shortlist
            ),
        ),
    ]
    exact_pairs = variants[0][1]
    print(f"{'variant':<18}{'recall@'+str(args.k):<12}{'wall_s':<8}pairs")
    for name, pairs, dt in variants:
        rec = len(pairs & exact_pairs) / len(exact_pairs)
        print(f"{name:<18}{rec:<12.3f}{dt:<8.2f}{len(pairs)}")


if __name__ == "__main__":
    main()
