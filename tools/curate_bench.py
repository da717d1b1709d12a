"""All-stages curate() end-to-end: the kitchen-sink accounting run.

Every composed suite entry enables a stage SUBSET, which let the
multiplicative-plan-growth bug (SCALING.md round 8) hide for four
rounds: only a run with EVERY stage on trips pathologies that grow
with stage count. This tool is that run — the full battery (normalize,
exact, near-dup, line dedup, span scrub, quality, boilerplate cap,
unigram floor, bigram floor, leak-safe split) over the real corpus at
a scale factor, printing the per-stage accounting report and wall
time. Needs a real driver heap (the winnow scrub + minhash caches and
the stage snapshots share one local-mode JVM):

    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \\
        python tools/curate_bench.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--scrub-max-df", type=int, default=None,
        help="winnow-gate fingerprint df cap (CurationConfig.scrub_max_df;"
        " default keeps the config default of 1000 — lower it on"
        " low-entropy corpora, see SCALING.md round 9)",
    )
    args = ap.parse_args()

    from erpl_web_spark.operators import release_tracked
    from erpl_web_spark.pipeline import CurationConfig, curate
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load

    spark = get_spark("curate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, args.sf, "documents", spread=True)
    kw = {}
    if args.scrub_max_df is not None:
        kw["scrub_max_df"] = args.scrub_max_df
    cfg = CurationConfig(
        normalize=True, exact_dedup=True, near_dedup=True, line_dedup=True,
        scrub_spans=True, quality_gate=True,
        max_boilerplate_ratio=0.5, min_unigram_freq=0.0005,
        min_bigram_logprob=-16.0,
        split_weights={"train": 0.9, "val": 0.05, "test": 0.05},
        **kw,
    )
    t0 = time.monotonic()
    times: list[tuple[str, float]] = []
    kept, report = curate(docs, cfg, stage_times=times)
    rows = report.collect()
    wall = time.monotonic() - t0
    for r in rows:
        print(f"{r['stage']:28s} {r['n']}")
    print("\n# per-stage wall (s):")
    for name, secs in times:
        print(f"{name:28s} {secs:7.1f}")
    print(f"WALL {wall:.1f}s sf_dir={args.sf} scrub_max_df={cfg.scrub_max_df}")
    kept.unpersist()
    release_tracked()


if __name__ == "__main__":
    main()
