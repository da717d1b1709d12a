"""Does ivf_suggest_cells actually pick a good n_cells? (round 13)

SCALING.md r12 measured the failure mode (a quantizer finer than the
data's neighbor radius splits true neighborhoods; trained KMeans LOSES
recall when n_cells >> true cluster count) and VERDICT r12 Next #5
asked for the rule as a runnable helper. This tool closes the loop:
on a planted 20-cluster Gaussian corpus it computes the helper's
suggestion, then measures recall@k of the TRAINED IVF search at
n_cells in {suggestion/4, suggestion, 4x suggestion} — the suggestion
should sit at (or tie) the recall peak at the same nprobe, and the
over-partitioned point should reproduce the r12 recall loss.

Usage: python tools/cells_suggest_sweep.py [--n-clusters 20]
       [--per-cluster 50] [--dim 16] [--k 10]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clusters", type=int, default=20)
    ap.add_argument("--per-cluster", type=int, default=50)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.similarity import (
        ann_top_k_ivf,
        cosine_top_k,
        ivf_suggest_cells,
        ivf_train_centroids,
    )
    from erpl_web_spark.session import get_spark

    spark = get_spark("cells-suggest-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    C, M, D = args.n_clusters, args.per_cluster, args.dim
    centers = rng.normal(size=(C, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for c in range(C):
        for j in range(M):
            v = centers[c] + rng.normal(scale=0.05, size=D)
            pts.append((c * M + j, [float(x) for x in v]))
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>").persist()
    n = emb.count()

    suggested = ivf_suggest_cells(emb, k=args.k)
    print(f"# corpus: {C} true clusters x {M}, dim {D}; suggested_cells={suggested}")

    probes = emb.where(F.col("vec_id") % 10 == 0)
    exact = cosine_top_k(emb, probes, k=args.k).select(
        "probe_id", "neighbor_id"
    ).persist()
    n_exact = exact.count()

    print("n_cells    nprobe  recall@k  scan_frac")
    for n_cells in sorted({max(suggested // 4, 2), suggested, 4 * suggested}):
        cents = ivf_train_centroids(emb, n_cells=n_cells, seed=42).persist()
        cents.count()
        for nprobe in (1, 2):
            ann = ann_top_k_ivf(
                emb, probes, k=args.k, nprobe=nprobe, centroids=cents
            ).select("probe_id", "neighbor_id")
            hits = exact.join(ann, ["probe_id", "neighbor_id"], "left_semi").count()
            tag = " <- suggested" if n_cells == suggested and nprobe == 1 else ""
            print(
                f"{n_cells:7d}  {nprobe:6d}  {hits / n_exact:.3f}     "
                f"{min(nprobe / n_cells, 1.0):.3f}{tag}"
            )
        cents.unpersist()
    exact.unpersist()
    emb.unpersist()


if __name__ == "__main__":
    main()
