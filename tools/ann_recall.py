"""IVF ANN recall/cost sweep against exact brute-force ground truth.

`similarity_recall_at_k` pins ONE operating point (nprobe=2) as an
oracle-checked value; this tool draws the whole recall-vs-cost curve so
the nprobe default is a measured choice, not a guess: for each nprobe
it runs `ann_top_k_ivf` on the same probes, joins against the exact
`cosine_top_k` neighbor set, and reports recall@k next to the fraction
of the corpus actually scored (the cost proxy — candidate rows scored
per probe / corpus size; brute force = 1.0).

Relation to tools/ann_bench.py: that tool compares VARIANTS (exact /
IVF / IVF+int8-rerank) at one operating point for latency+recall; this
one sweeps nprobe for the recall-vs-scan-fraction CURVE.

Usage: python tools/ann_recall.py [--sf /root/testdata/sf0.01]
                                  [--k 5] [--stride 50]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

NPROBES = [1, 2, 4, 8]


def clustered_vectors(spark, n: int, dim: int = 32, n_clusters: int = 20):
    """Synthesize label-STRUCTURED vectors (the testdata embeddings are
    measured near-random — IVF's worst case): cluster c's center is a
    deterministic ±1 sign pattern of md5(c, d); each vector is its
    cluster center plus small deterministic per-coordinate noise, so
    within-cluster cosine is high and cross-cluster ~0 — the favorable
    case the worst-case sweep can't show. Pure expressions, any size."""
    ids = spark.range(n).withColumnRenamed("id", "vec_id")
    c = (F.col("vec_id") % n_clusters).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def h(*parts):
        return F.conv(
            F.substring(F.md5(F.concat_ws(":", *parts).cast("binary")), 1, 8),
            16, 10,
        ).cast("bigint")

    vec = F.transform(
        dims,
        lambda d: (
            F.when(h(c.cast("string"), d.cast("string")) % 2 == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            + (h(F.col("vec_id").cast("string"), d.cast("string")) % 41
               - F.lit(20)).cast("double") / F.lit(50.0)
        ).cast("float"),
    )
    return ids.select("vec_id", vec.alias("embedding"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--stride", type=int, default=50)
    ap.add_argument("--clustered", type=int, default=0, metavar="N",
                    help="ignore --sf; sweep over N synthesized "
                         "cluster-structured vectors instead")
    ap.add_argument("--natural", type=int, default=0, metavar="N_DOCS",
                    help="ignore --sf; sweep over hashed bag-of-words"
                         " embeddings of an N-doc natural-vocabulary"
                         " corpus (tools/corpus_gen.py) — topical"
                         " correlation, not planted centers: the"
                         " realistic middle ground between --clustered"
                         " and the structureless testdata vectors")
    ap.add_argument("--trained", action="store_true",
                    help="also sweep ivf_train_centroids (pyspark.ml"
                         " KMeans, same cell count as the modulo"
                         " quantizer) so the 'trained cells -> higher"
                         " recall at the same nprobe' claim is a"
                         " measured number, not a docstring")
    args = ap.parse_args()

    from erpl_web_spark.operators.similarity import (
        ann_top_k_ivf,
        cosine_top_k,
        ivf_assign,
        ivf_centroids,
        ivf_train_centroids,
    )
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    if args.clustered:
        emb = clustered_vectors(spark, args.clustered).persist()
    elif args.natural:
        from tools.corpus_gen import bow_embeddings, natural_documents

        # materialize the generated corpus BEFORE the 32-dim BoW
        # aggregation: each dim references the token array, and without
        # the barrier projection collapse re-inlines the whole per-token
        # generation expression into every reference (see lsh_recall)
        nat = natural_documents(spark, args.natural).persist()
        nat.count()
        emb = bow_embeddings(nat).select("vec_id", "embedding").persist()
        emb.count()
        nat.unpersist()
    else:
        emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
    n_corpus = emb.count()
    probes = emb.where(F.col("vec_id") % 37 == 0)
    n_probes = probes.count()

    exact = (
        cosine_top_k(emb, probes, k=args.k)
        .select("probe_id", "neighbor_id")
        .persist()
    )
    n_exact = exact.count()
    print(
        f"# corpus={n_corpus} probes={n_probes} k={args.k} "
        f"stride={args.stride} exact-neighbor rows={n_exact}"
    )

    # cell population histogram once (cost accounting)
    cents = ivf_centroids(emb, "vec_id", "embedding", args.stride)
    sizes = {
        r["cell"]: r["n"]
        for r in ivf_assign(emb, cents, "vec_id", "embedding")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    avg_cell = sum(sizes.values()) / max(len(sizes), 1)
    print(f"# cells={len(sizes)} avg_cell={avg_cell:.1f}")

    quantizers = [("modulo", None, sizes)]
    if args.trained:
        tc = ivf_train_centroids(
            emb, n_cells=max(len(sizes), 2), vec_col="embedding"
        ).persist()
        tc.count()
        tsizes = {
            r["cell"]: r["n"]
            for r in ivf_assign(emb, tc, "vec_id", "embedding")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        tmax = max(tsizes.values()) if tsizes else 0
        mmax = max(sizes.values()) if sizes else 0
        print(f"# trained cells={len(tsizes)} avg_cell="
              f"{sum(tsizes.values()) / max(len(tsizes), 1):.1f} "
              f"max_cell trained={tmax} vs modulo={mmax}")
        quantizers.append(("trained", tc, tsizes))

    print("quantizer  nprobe  recall@k  scored_frac (scored/corpus per probe)")
    for qname, cents_df, qsizes in quantizers:
        qavg = sum(qsizes.values()) / max(len(qsizes), 1)
        for nprobe in NPROBES:
            ann = ann_top_k_ivf(
                emb, probes, k=args.k, stride=args.stride, nprobe=nprobe,
                centroids=cents_df,
            ).select("probe_id", "neighbor_id", F.lit(1).alias("hit"))
            hits = (
                exact.join(ann, ["probe_id", "neighbor_id"], "left")
                .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("h"))
                .collect()[0]["h"]
            )
            scored_frac = min(nprobe * qavg / n_corpus, 1.0)
            print(f"{qname:>9}  {nprobe:6d}  {hits / n_exact:.3f}     "
                  f"{scored_frac:.3f}")
        if cents_df is not None:
            cents_df.unpersist()
    exact.unpersist()


if __name__ == "__main__":
    main()
