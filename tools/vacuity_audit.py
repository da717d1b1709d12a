#!/usr/bin/env python
"""Vacuity audit: find suite-query output columns the test data never
exercises.

The round-8 `regex_funcs` lesson: a query can stay value-hash green for
rounds while one of its columns is CONSTANT on the test corpus (every
``n_numbers`` was 0 because no document contained a digit), hiding a
crash-on-real-data bug behind a vacuously-passing check. This tool runs
every ``queries()`` entry at a scale factor and reports columns with at
most one distinct value (plus empty results), so vacuous coverage is a
reviewed, deliberate state instead of an accident.

A constant column is not automatically a bug — pivots with one-sided
fills, boolean gates on clean corpora, and planted-duplicate preambles
legitimately produce constants — but each one should be LOOKED AT once.

Usage: python tools/vacuity_audit.py [--sf /root/testdata/sf0.01] [names...]
Emits one JSON line per query: {"query", "rows", "constant_cols": {col:
value}} — only for queries that have at least one constant column.

``--check`` turns the audit into a GATE: every flagged (query, column)
must appear in ``REVIEWED`` below (the triage captured in COVERAGE.md's
round-8 section), every query must return rows, and errors fail. A new
entry whose output is constant on the test corpus then fails the gate
until someone either plants a non-vacuous case or records the review
here with a reason — vacuous coverage stays a deliberate state.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

# Reviewed-deliberate constants at the audit SF (sf0.01). "*" = every
# column (single-row aggregates). Keyed by query name; values map column
# -> one-line reason. Keep in sync with COVERAGE.md round-8 triage.
REVIEWED: dict[str, dict[str, str]] = {
    "quality_drift_histogram": {
        "curr_batch": "one (prev, curr) pair by design — the multi-pair "
        "path is hashed by quality_drift_report's varied curr_batch",
        "mode": "hist_tolerances emits abs-only; rel lives in "
        "quality_drift_report's hash",
        "max_delta": "single planted tolerance; the pass/fail VARIATION "
        "is in delta_r and passed, both non-constant",
    },
    "quality_drift_quantiles": {
        "curr_batch": "one (prev, curr) pair by design — the "
        "multi-pair path is hashed by quality_drift_report",
        "mode": "quantile_tolerances emits rel-only; abs lives in the "
        "histogram entry's hash",
        "max_delta": "single planted tolerance; the pass/fail "
        "VARIATION is in delta_r and passed, both non-constant",
    },
    "q06_revenue_delta": {"*": "single-row TPC-H aggregate"},
    "q14_promo_revenue": {"*": "single-row TPC-H aggregate"},
    "q15_top_supplier": {"*": "single-row top-1 result"},
    "q17_small_quantity": {"*": "single-row TPC-H aggregate"},
    "q19_discounted_revenue": {"*": "single-row TPC-H aggregate"},
    "agg_approx_distinct": {"approx_ok": "assertion column SHOULD be constant-true"},
    "agg_stats_exact": {
        "n_parts": "whole-table profile total",
        "first_ship": "whole-table min",
        "last_ship": "whole-table max",
    },
    "array_funcs": {"dim": "embedding dimension is fixed at 64 by the corpus"},
    "cohort_retention": {"cohort_week": "test events span one cohort week"},
    "dedup_cluster_summary": {"n_members": "planted pairs are size-2 by construction"},
    "dedup_source_overlap": {
        "n_pairs": "planted one overlap pair per source pair",
        "n_docs_a": "ditto",
    },
    "diag_profile_orders": {
        "n_rows": "whole-table count, same for every profiled column",
        "n_nulls": "orders has no NULLs; the NULL path is covered by null_safe_funcs",
    },
    "layout_range_bounds": {
        "ideal_rows": "N div n_buckets — the same reference line for "
        "every bucket by definition; the VARIATION is in n_rows and "
        "balance_permille, both non-constant and pytest-pinned exact",
    },
    "embedding_covariance": {"n": "whole-table count"},
    "funnel_stages": {
        "reached_click": "funnel keeps only complete sessions at this SF",
        "reached_purchase": "ditto",
    },
    "match_resolve_parts": {"n_variants": "planted variant count is fixed"},
    "multimodal_dhash_pairs": {
        "hamming": "exact-band entry; nonzero hammings live in the _d7 entry"
    },
    "null_safe_funcs": {
        "brand_as_int": "the malformed-cast path — constant NULL is the point"
    },
    "pipeline_corpus_report": {
        "n_exact_dups": "raw corpus has none; the dup path lives in dedup_exact"
    },
    "sequence_funcs": {"second_elem": "fixed arithmetic sequence start/step"},
    "set_intersect_all": {
        "status": "single qualifying status at this SF; multiplicity still exercised",
        "yr": "ditto",
    },
    "string_funcs": {
        "name_prefix": "TPC-H name generator fixes the prefix",
        "name_len": "ditto",
    },
    "text_boilerplate_ngrams": {"n_docs": "planted boilerplate sits at min_docs floor"},
    "similarity_ivf_cell_profile": {
        "suggested_cells": "the profiled scalar BY DESIGN — one corpus-level "
        "suggestion carried on every per-point row so the hash pins it; the "
        "per-point dk_r/n_within columns carry the variation",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--check",
        action="store_true",
        help="fail (exit 1) on any constant column not in REVIEWED",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entrymod
    from erpl_web_spark.operators import release_tracked
    from erpl_web_spark.session import get_spark

    spark = get_spark("vacuity-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.names or sorted(qs)

    flagged = 0
    unreviewed: list[str] = []
    for name in names:
        release_tracked()
        try:
            df = qs[name](spark, args.sf)
            # one aggregation pass: row count + per-column distinct
            # (complex types via their JSON rendering). NULL counts as
            # its own state: countDistinct ignores NULLs, so a column
            # holding {NULL, 7} is genuinely two-state (a join-miss path
            # plus a hit path, both exercised) and must not be flagged;
            # coalesce guards the empty-result case (max over 0 rows is
            # NULL). The displayed value is the first NON-null (unique
            # when the column is flagged, hence deterministic; an
            # all-NULL column prints None).
            aggs = [F.count(F.lit(1)).alias("__n")]
            for f in df.schema.fields:
                c = (
                    F.to_json(F.col(f.name))
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))
                    else F.col(f.name)
                )
                aggs.append(
                    (
                        F.countDistinct(c)
                        + F.coalesce(F.max(F.isnull(c).cast("int")), F.lit(0))
                    ).alias(f"d_{f.name}")
                )
                aggs.append(F.first(c, ignorenulls=True).alias(f"v_{f.name}"))
            row = df.agg(*aggs).first()
        except Exception as e:  # noqa: BLE001 — audit must keep going
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            flagged += 1
            unreviewed.append(f"{name}: ERROR {str(e)[:120]}")
            continue
        const = {
            f.name: str(row[f"v_{f.name}"])[:80]
            for f in df.schema.fields
            if row[f"d_{f.name}"] <= 1
        }
        if row["__n"] == 0 or const:
            print(
                json.dumps(
                    {"query": name, "rows": row["__n"], "constant_cols": const}
                )
            )
            flagged += 1
            allowed = REVIEWED.get(name, {})
            if row["__n"] == 0:
                unreviewed.append(f"{name}: EMPTY result")
            elif "*" not in allowed:
                for col in const:
                    if col not in allowed:
                        unreviewed.append(f"{name}.{col} = {const[col]!r}")
    print(f"# {flagged}/{len(names)} queries flagged", file=sys.stderr)
    if args.check:
        if unreviewed:
            print(
                f"# CHECK FAILED — {len(unreviewed)} unreviewed constant "
                "column(s); plant a non-vacuous case or record the review "
                "in REVIEWED:",
                file=sys.stderr,
            )
            for u in unreviewed:
                print(f"#   {u}", file=sys.stderr)
            sys.exit(1)
        print("# CHECK OK — every constant column is reviewed", file=sys.stderr)


if __name__ == "__main__":
    main()
