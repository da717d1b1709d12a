"""Measure MinHash-LSH recall against EXACT all-pairs ground truth.

``allpairs_jaccard_join`` (prefix-filtering, exact by construction) is
the ground truth; ``minhash_lsh_pairs`` is the probabilistic scale
path whose verified output is a SUBSET of the truth (its exact-Jaccard
verify kills false positives, so the only error mode is a candidate
pair never colliding in any band). This tool makes that error rate a
measured number instead of an s-curve assertion: it plants mutated
twins spanning a Jaccard spectrum, runs both operators at the same
threshold, and reports recall per true-Jaccard bucket for each banding
setting, next to the theoretical collision probability
``1 - (1 - s^r)^b``.

The raw corpus has no near-dup pairs above 0.5 (unique word-salad
texts), so every even-id document gets a twin with every ``stride``-th
token dropped, stride cycling 9/13/19/29/43/71 by doc_id — the
resulting shingle-set Jaccards spread over ~[0.45, 0.95].

Relation to tools/recall_bench.py (round 5): that harness measures
banding recall against PLANTED pairs only (ground truth = the pairs it
injected); this one uses the exact all-pairs prefix join (round 8) as
COMPLETE ground truth, so organically-similar pairs the plant never
created count against recall too — the stronger check, kept alongside
the planted harness which runs without the all-pairs cost.

Usage: python tools/lsh_recall.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

STRIDES = [9, 13, 19, 29, 43, 71]
SETTINGS = [(64, 16), (64, 32)]  # (num_hashes, bands) -> rows/band 4 and 2
THRESHOLD = 0.5


def build_corpus(spark, sf_dir, natural: int = 0):
    from erpl_web_spark.suite import load

    if natural:
        # natural-vocabulary mode (VERDICT r8 Next #1): same twin plant,
        # Zipf/Heaps corpus instead of the ~40-word testdata vocabulary.
        # MUST be persisted+materialized: the generated text is a pure
        # projection expression, and without a materialization barrier
        # Catalyst's projection collapse inlines the whole per-token
        # generation tree into every downstream shingle reference —
        # interpreted re-evaluation per shingle index (measured: a
        # 4000-doc all-pairs that takes seconds on materialized rows
        # burned 16+ min of 32-core CPU on the inlined form).
        from tools.corpus_gen import natural_documents

        docs = natural_documents(spark, natural).select("doc_id", "text").persist()
        docs.count()
    else:
        docs = load(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    base = docs.agg((F.max("doc_id") + F.lit(1)).alias("_b"))
    # twins exist only for EVEN doc_ids: index by (doc_id/2) mod 6 so
    # all six strides are reachable (doc_id % 6 of an even id only hits
    # 0/2/4 — the original cycle silently dropped strides 13/29/71)
    stride = F.element_at(
        F.array(*[F.lit(s) for s in STRIDES]),
        ((F.col("doc_id") / 2).cast("bigint") % len(STRIDES) + 1).cast("int"),
    )
    twins = (
        docs.where(F.col("doc_id") % 2 == 0)
        .crossJoin(F.broadcast(base))
        .select(
            (F.col("doc_id") + F.col("_b")).alias("doc_id"),
            F.array_join(
                F.filter(
                    F.split(F.col("text"), r"\s+"),
                    lambda t, i: (i % stride) != (F.col("doc_id") % stride),
                ),
                " ",
            ).alias("text"),
        )
    )
    return docs.unionByName(twins), base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--natural", type=int, default=0, metavar="N_DOCS",
                    help="generate an N-doc natural-vocabulary corpus"
                    " (tools/corpus_gen.py) instead of reading --sf")
    args = ap.parse_args()

    from erpl_web_spark.operators._cache import release_tracked
    from erpl_web_spark.operators.dedup import (
        allpairs_jaccard_join,
        minhash_lsh_pairs,
    )
    from erpl_web_spark.session import get_spark

    spark = get_spark("lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")
    corpus, _ = build_corpus(spark, args.sf, natural=args.natural)

    truth = (
        allpairs_jaccard_join(corpus, "doc_id", "text", threshold=THRESHOLD)
        .withColumn("bucket", F.floor(F.col("jaccard") * 10) / 10)
        .persist()
    )
    n_truth = truth.count()
    print(f"# ground truth: {n_truth} pairs with jaccard >= {THRESHOLD}")
    release_tracked()

    for num_hashes, bands in SETTINGS:
        r = num_hashes // bands
        found = minhash_lsh_pairs(
            corpus, "doc_id", "text",
            num_hashes=num_hashes, bands=bands, threshold=THRESHOLD,
        ).select("id_a", "id_b", F.lit(1).alias("hit"))
        per = (
            truth.join(found, ["id_a", "id_b"], "left")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_found"),
            )
            .orderBy("bucket")
            .collect()
        )
        total_found = sum(x["n_found"] for x in per)
        print(f"\n## num_hashes={num_hashes} bands={bands} (r={r})")
        print("bucket  n_true  n_found  recall  theory(1-(1-s^r)^b at bucket mid)")
        for x in per:
            s = x["bucket"] + 0.05
            theory = 1 - (1 - s**r) ** bands
            rec = x["n_found"] / x["n_true"] if x["n_true"] else float("nan")
            print(
                f"{x['bucket']:.1f}     {x['n_true']:6d}  {x['n_found']:6d}"
                f"  {rec:.3f}   {theory:.3f}"
            )
        print(f"overall recall: {total_found}/{n_truth} = {total_found / n_truth:.3f}")
        release_tracked()

    truth.unpersist()


if __name__ == "__main__":
    main()
