"""Recall characterization for the LSH near-dup families.

Rows-only suite checks prove the LSH plumbing produces pairs; this tool
measures what the banding parameters DO to recall, turning the
"banding parameters control recall" docstring into numbers:

1. Plant near-duplicates: for every 5th document, a copy (doc_id +
   10_000_000) with a deterministic fraction of words dropped —
   ``pmod(xxhash64(tok, doc_id), 100) < drop_pct`` with drop_pct cycling
   {0,2,4,7,10}% by doc_id — giving planted pairs spread across the
   Jaccard range. Everything is Spark expressions; no driver-side text
   munging, so the same harness runs at any SF.
2. Ground truth: exact 3-gram shingle-hash Jaccard per planted pair
   (the same math dedup_ngram_jaccard oracle-checks).
3. MinHash recall: for each (bands b x rows r) split of 64 hashes, the
   fraction of true pairs with Jaccard >= threshold whose bands collide
   (candidate recall — the verify stage then keeps exactly the true
   ones, so candidate recall IS output recall). Compare to the theory
   curve 1-(1-s^r)^b.
4. SimHash: fraction of planted pairs at Hamming <= 3 that the 4x16-bit
   pigeonhole banding finds — guaranteed 1.0 (any 4-split of a <=3-bit
   difference leaves one band intact); measured to prove it.

Usage: python tools/recall_bench.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from erpl_web_spark.operators.dedup import (
    hashed_shingles,
    minhash_lsh_pairs,
    simhash_documents,
    simhash_near_dup_pairs,
)
from erpl_web_spark.operators.text import tokens_expr
from erpl_web_spark.session import get_spark
from erpl_web_spark.suite import load

PLANT_OFFSET = 10_000_000
THRESHOLD = 0.5
BUCKETS = [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)]


def planted_corpus(docs):
    """Original docs + perturbed copies of every 5th doc. The drop rate
    cycles {0,2,4,7,10}% across planted docs (doc_id%25 in {0,5,..,20}),
    spreading exact shingle Jaccard over ~[0.55, 1.0]."""
    drop_pct = F.element_at(
        F.array(*[F.lit(x) for x in (0, 2, 4, 7, 10)]),
        ((F.col("doc_id") % 25) / 5).cast("int") + 1,
    )
    perturbed = F.concat_ws(
        " ",
        F.filter(
            tokens_expr("text"),
            lambda t: F.pmod(F.xxhash64(t, F.col("doc_id")), F.lit(100)) >= drop_pct,
        ),
    )
    copies = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), perturbed.alias("text")
    )
    return docs.select("doc_id", "text").union(copies)


def truth_pairs(corpus):
    """(orig_id, jaccard) for every planted pair, exact shingle-hash math."""
    hs = hashed_shingles(corpus, "doc_id", "text", 3)
    a = hs.where(F.col("doc_id") < PLANT_OFFSET).select(
        F.col("doc_id").alias("orig_id"), F.col("hs").alias("hs_a")
    )
    b = hs.where(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - PLANT_OFFSET).alias("orig_id"), F.col("hs").alias("hs_b")
    )
    return a.join(b, "orig_id").select(
        "orig_id",
        (
            F.size(F.array_intersect("hs_a", "hs_b"))
            / F.size(F.array_union("hs_a", "hs_b"))
        ).alias("jaccard"),
    )


def bucketize(rows):
    out = {}
    for lo, hi in BUCKETS:
        out[(lo, hi)] = {r["orig_id"] for r in rows if lo <= r["jaccard"] < hi}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("recall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents", spread=True)
    corpus = planted_corpus(docs).persist()
    truth = truth_pairs(corpus).where(F.col("jaccard") >= THRESHOLD).collect()
    by_bucket = bucketize(truth)
    print(f"planted true pairs (jaccard >= {THRESHOLD}): {len(truth)}")
    for (lo, hi), ids in by_bucket.items():
        print(f"  bucket [{lo:.1f},{min(hi,1.0):.1f}): {len(ids)}")

    print("\nMinHash banding recall on planted pairs (64 hashes, threshold 0.5):")
    header = "  b x r   " + "".join(f"  [{lo:.1f},{min(hi,1.0):.1f})" for lo, hi in BUCKETS)
    print(header + "   theory@0.55  overall")
    results = []
    for bands in (8, 16, 32):
        r = 64 // bands
        found_rows = (
            minhash_lsh_pairs(
                corpus, "doc_id", "text", num_hashes=64, bands=bands, threshold=THRESHOLD
            )
            .where(F.col("id_b") - F.col("id_a") == PLANT_OFFSET)
            .select(F.col("id_a").alias("orig_id"))
            .collect()
        )
        found = {row["orig_id"] for row in found_rows}
        cells = []
        for lo, hi in BUCKETS:
            ids = by_bucket[(lo, hi)]
            cells.append(
                f"{(len(ids & found) / len(ids)):10.2f}" if ids else f"{'-':>10}"
            )
        s = 0.55
        theory = 1 - (1 - s**r) ** bands
        overall = len({t["orig_id"] for t in truth} & found) / max(len(truth), 1)
        line = f"  {bands:2d} x {r}  " + "".join(cells) + f"   {theory:10.2f} {overall:8.2f}"
        print(line)
        results.append((bands, r, overall))
        spark.catalog.clearCache()
        corpus.persist()

    print("\nSimHash 4x16 pigeonhole recall at Hamming <= 3 (guaranteed 1.0):")
    sims = simhash_documents(corpus, "doc_id", "text")
    a = sims.where(F.col("doc_id") < PLANT_OFFSET).select(
        F.col("doc_id").alias("orig_id"), F.col("simhash").alias("sa")
    )
    b = sims.where(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - PLANT_OFFSET).alias("orig_id"), F.col("simhash").alias("sb")
    )
    close = (
        a.join(b, "orig_id")
        .select("orig_id", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"))
        .where(F.col("h") <= 3)
        .collect()
    )
    found_rows = (
        simhash_near_dup_pairs(corpus, "doc_id", "text", max_hamming=3)
        .where(F.col("id_b") - F.col("id_a") == PLANT_OFFSET)
        .select(F.col("id_a").alias("orig_id"))
        .collect()
    )
    found = {row["orig_id"] for row in found_rows}
    n_close = len(close)
    n_hit = len({r["orig_id"] for r in close} & found)
    print(f"  true Hamming<=3 planted pairs: {n_close}; banding found: {n_hit}; "
          f"recall {n_hit / max(n_close, 1):.3f}")


if __name__ == "__main__":
    main()
