"""Measure simhash pair density vs corpus entropy (SCALING.md r10).

The round-10 SCALING note claims the simhash-md5 twin's sf1 blowup is
a corpus property: radius-7 neighbors are dense on the 40-word-vocab
synthetic corpus and rare at natural entropy. This tool MEASURES that
claim instead of asserting it: verified pair counts at hamming <= 7
(48-bit md5 simhash) on

- the synthetic documents table at increasing SFs (the density slope
  the sf1 run hit), and
- natural-vocabulary corpora (tools/corpus_gen) at matched sizes,
  plus twin recall: fraction of planted token-drop twins (the
  dedup_simhash_md5 fixture) landing within the radius — the signal
  the radius is FOR, on text where it is not drowned.

Usage:
    python tools/simhash_density.py [--synthetic-sfs sf0.001,sf0.01,sf0.1]
                                    [--natural 550,5500] [--radius 7]
                                    [--max-bucket N]

``--max-bucket`` re-measures with the band-bucket cap ON
(dedup.simhash_near_dup_pairs max_bucket — VERDICT r10 What's-wrong
#1): the table gains dropped-bucket and dropped-row columns, showing
the within-bucket quadratic blowup bounded while twin recall holds.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic-sfs", default="sf0.001,sf0.01,sf0.1")
    ap.add_argument("--natural", default="550,5500")
    ap.add_argument("--radius", type=int, default=7)
    ap.add_argument("--max-bucket", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.dedup import simhash_near_dup_pairs
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load
    from erpl_web_spark.suite.pipeline import _token_drop_twin_corpus

    spark = get_spark("simhash-density")
    spark.sparkContext.setLogLevel("ERROR")
    H = args.radius

    def density(corpus, label, n_docs):
        corpus = corpus.persist()
        corpus.count()
        sink: list = []
        pairs = simhash_near_dup_pairs(
            corpus, "doc_id", "text", max_hamming=H, hash_mode="md5",
            max_bucket=args.max_bucket,
            dropped_sink=sink if args.max_bucket else None,
        ).persist()
        n_pairs = pairs.count()
        # twin recall: planted twin of doc d is doc d + max+1
        base_max = (n_docs - 1)
        twins_found = pairs.where(
            F.col("id_b") == F.col("id_a") + base_max + 1
        ).where(F.col("id_a") % 10 == 0).count()
        n_twins = (n_docs + 9) // 10
        cap_cols = ""
        if args.max_bucket:
            drop = sink[0].persist()
            n_buckets = drop.count()
            n_rows = (
                drop.agg(F.sum("n_members").cast("bigint").alias("s")).collect()[0]["s"]
                or 0
            )
            drop.unpersist()
            cap_cols = f" {n_buckets} | {n_rows} |"
        print(
            f"| {label} | {n_docs} | {n_pairs} | {n_pairs / max(n_docs,1):.1f} | "
            f"{twins_found}/{n_twins} |" + cap_cols
        )
        pairs.unpersist()
        corpus.unpersist()
        from erpl_web_spark.operators import release_tracked

        release_tracked()

    print(f"# verified simhash-md5 pairs at hamming <= {H} (twin corpus:")
    print("# base + token-drop twin for every 10th doc, the")
    print("# dedup_simhash_md5 fixture). pairs/doc is the density slope;")
    print("# twin recall is what the radius is FOR.")
    if args.max_bucket:
        print(f"# band-bucket cap ON: max_bucket={args.max_bucket}")
        print("| corpus | n_docs | pairs | pairs/doc | twin recall | dropped buckets | dropped rows |")
        print("|---|---|---|---|---|---|---|")
    else:
        print("| corpus | n_docs | pairs | pairs/doc | twin recall |")
        print("|---|---|---|---|---|")

    for sf in [s for s in args.synthetic_sfs.split(",") if s]:
        docs = load(spark, f"/root/testdata/{sf}", "documents")
        n = docs.count()
        density(_token_drop_twin_corpus(docs), f"synthetic {sf}", n)

    from tools.corpus_gen import natural_documents

    for n_s in [s for s in args.natural.split(",") if s]:
        n = int(n_s)
        nat = natural_documents(spark, n).select("doc_id", "text").persist()
        nat.count()  # persist BEFORE multi-reference consumers (gotcha r9)
        density(_token_drop_twin_corpus(nat), f"natural {n}", n)
        nat.unpersist()


if __name__ == "__main__":
    main()
