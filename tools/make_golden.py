"""Regenerate the golden fixtures that pin the four rows-only suite
queries (no DuckDB oracle exists for seeded-xxhash64 banding, so their
contract is a checked-in expected output instead):

- exact row sets at sf0.001 and sf0.01 (floats rounded to 6 dp),
- row counts at sf0.1.

Run from the repo root after any DELIBERATE seed/banding change:

    python tools/make_golden.py

and commit the updated ``tests/fixtures/golden/*.json``. An accidental
change to seeds, banding, shingling, or tie-breaks fails
tests/test_golden_fixtures.py instead of sailing through as
"rows-only".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_ann_lsh",
    "dedup_cluster_minhash",
    "embedding_pca_project",
    "text_bpe_merges",
]
EXACT_SFS = ["0.001", "0.01"]
COUNT_SF = "0.1"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden",
)


def canonical_rows(df) -> list[list]:
    """Sorted, JSON-stable row list: columns sorted by name, floats
    rounded to 6 dp (the same tolerance the driver's value-hash uses)."""
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 6))
            else:
                row.append(v)
        rows.append(row)
    rows.sort(key=lambda x: json.dumps(x, default=str))
    return {"columns": cols, "rows": rows}


def build_fixture(spark, name: str, queries=None) -> dict:
    """The full fixture payload for one golden query on the CURRENT
    tree: exact canonical rows at every EXACT_SFS plus the COUNT_SF
    row count. Shared by ``main`` and the byte-for-byte regeneration
    guard in tests/test_golden_fixtures.py (a seed/banding edit that
    forgets to rerun this tool must fail a unit test, not sail through
    the driver's rows-only check)."""
    if queries is None:
        from erpl_web_spark.suite import all_queries

        queries = all_queries()
    from erpl_web_spark.operators import release_tracked

    fixture = {"query": name, "exact": {}, "counts": {}}
    for sf in EXACT_SFS:
        df = queries[name].fn(spark, f"/root/testdata/sf{sf}")
        fixture["exact"][sf] = canonical_rows(df)
        release_tracked()  # drop this evaluation's internal caches
    df = queries[name].fn(spark, f"/root/testdata/sf{COUNT_SF}")
    fixture["counts"][COUNT_SF] = df.count()
    release_tracked()
    return fixture


def serialize(fixture: dict) -> str:
    """The exact on-disk rendering — byte-comparable with the
    checked-in ``tests/fixtures/golden/*.json``."""
    return json.dumps(fixture, indent=1, default=str)


def main() -> None:
    from pyspark.sql import SparkSession

    from erpl_web_spark.suite import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("make_golden")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    queries = all_queries()
    names = sys.argv[1:] or GOLDEN_QUERIES
    unknown = [n for n in names if n not in GOLDEN_QUERIES]
    if unknown:
        raise SystemExit(f"not golden queries: {unknown}")
    for name in names:
        fixture = build_fixture(spark, name, queries)
        for sf in EXACT_SFS:
            print(f"{name} sf{sf}: {len(fixture['exact'][sf]['rows'])} rows")
        print(f"{name} sf{COUNT_SF}: count={fixture['counts'][COUNT_SF]}")
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            f.write(serialize(fixture))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
