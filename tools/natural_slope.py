"""One-decade-up cost slopes on a NATURAL-vocabulary corpus.

Round 8 measured three boundaries on the driver testdata and attributed
all three to its ~40-word vocabulary (SCALING.md): the exact all-pairs
prefix join's 23x slope, the winnow gate's saturation (122 s to modify
nothing), and IVF's recall floor. This tool re-measures the first two
on text-like entropy (tools/corpus_gen.py: Zipf over ~50k vocab, Heaps
growth) so "corpus property, not defect" becomes a demonstrated curve
instead of an attribution:

- `allpairs_jaccard_join` at N and 10N docs — on natural text the
  rarest-shingle prefix keys stay rare as the corpus grows (Heaps), so
  candidate volume should scale near-linearly, unlike the fixed-vocab
  23x.
- `minhash_lsh_pairs` at the same two scales — the production tier's
  slope next to the exact tier's.
- `winnow_overlap_pairs` (the scrub gate) at the same two scales, with
  the pair count — on natural text fingerprint df tracks true
  duplication, so the gate returns planted-duplication pairs instead
  of saturating toward n^2/2.

The corpus plants duplication the operators must FIND (dup_every=37:
every 37th doc opens with one of 5 fixed 25-token quotes), so the
timed runs do real work and the pair counts have a ground truth shape
to sanity-check (quote groups of ~N/37/5 docs each).

Usage: python tools/natural_slope.py [--n 2000] [--threshold 0.5]
(times both scales; wall times include one corpus materialization per
operator, warm JVM).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000, help="small scale; big = 10x")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from erpl_web_spark.operators._cache import release_tracked
    from erpl_web_spark.operators.dedup import (
        allpairs_jaccard_join,
        minhash_lsh_pairs,
    )
    from erpl_web_spark.operators.text import winnow_overlap_pairs
    from erpl_web_spark.session import get_spark
    from tools.corpus_gen import natural_documents

    spark = get_spark("natural-slope")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[tuple[str, int], tuple[float, int]] = {}
    for scale in (args.n, args.n * 10):
        base = natural_documents(spark, scale, dup_every=37).select(
            "doc_id", "text"
        )
        # plant NEAR-DUP twins the operators must FIND (a timing over a
        # corpus where the answer is empty is vacuous — the round-8
        # audit lesson): every 10th doc gets a twin with every 9th
        # token dropped (word-shingle Jaccard ~0.7, above threshold)
        twins = base.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + scale).alias("doc_id"),
            F.array_join(
                F.filter(
                    F.split(F.col("text"), r"\s+"), lambda t, i: i % 9 != 0
                ),
                " ",
            ).alias("text"),
        )
        corpus = base.unionByName(twins).persist()
        corpus.count()  # corpus generation paid OUTSIDE the operator timers

        for name, run in (
            ("allpairs", lambda: allpairs_jaccard_join(
                corpus, "doc_id", "text", threshold=args.threshold)),
            ("minhash", lambda: minhash_lsh_pairs(
                corpus, "doc_id", "text", threshold=args.threshold)),
            # the scrub gate at BOTH caps: the repo default (1000) and
            # the round-9 low-entropy knob value — on natural text the
            # interesting question is whether common-PHRASE fingerprints
            # below the default cap still blow up the pair set at scale
            ("winnow_gate_df1000", lambda: winnow_overlap_pairs(corpus)),
            ("winnow_gate_df20", lambda: winnow_overlap_pairs(corpus, max_df=20)),
        ):
            t0 = time.monotonic()
            n_pairs = run().count()
            dt = time.monotonic() - t0
            results[(name, scale)] = (dt, n_pairs)
            print(f"{name:12s} n_docs={scale:>7} pairs={n_pairs:>8} {dt:8.1f}s")
            release_tracked()
        corpus.unpersist()

    print("\n# slopes (10x docs):")
    for name in ("allpairs", "minhash", "winnow_gate_df1000", "winnow_gate_df20"):
        small, big = results[(name, args.n)], results[(name, args.n * 10)]
        print(
            f"{name:12s} {small[0]:.1f}s -> {big[0]:.1f}s = slope "
            f"{big[0] / max(small[0], 1e-9):.1f}x  (pairs {small[1]} -> {big[1]})"
        )


if __name__ == "__main__":
    main()
