"""DSIR bucket-count sensitivity: how robust are the importance
log-weights (curation.dsir_logweights) to feature-hash collisions?

DSIR's whole premise is that a HASHED n-gram model is a good enough
proxy for the true n-gram model (Xie et al. 2023 §3 validates this for
their 10k-bucket setup). The knob that trades memory for collision
noise here is ``buckets``; this tool measures what the knob actually
does on the suite's corpora: per-doc log-weights at several bucket
counts, Spearman rank correlation of each against the largest (least
-collided) run, and the doc overlap of the top-25% selection — the
number a resampling pipeline actually consumes. High rank correlation
at small bucket counts = collisions average out (the paper's claim,
reproduced on this engine); the cutoff where it degrades is the
documented boundary for sizing the broadcast at 100 TB.

Usage:
    python tools/dsir_buckets.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def spearman(xs: list[float], ys: list[float]) -> float:
    def ranks(v: list[float]) -> list[float]:
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r

    rx, ry = ranks(xs), ranks(ys)
    n = len(xs)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    return num / den if den else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--buckets", type=int, nargs="*",
                    default=[64, 256, 1024, 4096, 16384])
    args = ap.parse_args()

    from erpl_web_spark.operators.curation import dsir_logweights
    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import load
    from erpl_web_spark.suite.natural import natural_docs

    spark = get_spark("dsir-buckets")
    spark.sparkContext.setLogLevel("ERROR")
    raw = load(spark, args.sf, "documents", spread=True)
    target = natural_docs(spark, args.sf)

    runs: dict[int, dict[int, float]] = {}
    for b in args.buckets:
        t0 = time.monotonic()
        rows = dsir_logweights(raw, target, "doc_id", "text", buckets=b).collect()
        dt = time.monotonic() - t0
        runs[b] = {r["doc_id"]: r["log_w"] for r in rows}
        print(f"buckets={b:>6}: {len(rows)} docs scored in {dt:.1f}s")

    ref_b = max(args.buckets)
    ids = sorted(runs[ref_b])
    ref = [runs[ref_b][i] for i in ids]
    k = len(ids) // 4
    top_ref = set(sorted(ids, key=lambda i: -runs[ref_b][i])[:k])
    print(f"\nreference = buckets={ref_b}; top-25% selection k={k}")
    print(f"{'buckets':>8}{'spearman':>10}{'top25-overlap':>15}")
    for b in args.buckets:
        xs = [runs[b][i] for i in ids]
        rho = spearman(xs, ref)
        top_b = set(sorted(ids, key=lambda i: -runs[b][i])[:k])
        ov = len(top_b & top_ref) / k if k else float("nan")
        print(f"{b:>8}{rho:>10.4f}{ov:>15.3f}")


if __name__ == "__main__":
    main()
