"""Golden-fixture contracts for the four rows-only suite queries.

These queries have ``oracle=None`` by design — seeded-xxhash64 banding
is not expressible in DuckDB SQL — so their correctness contract is a
checked-in expected output: exact row sets at sf0.001/sf0.01 and row
counts at sf0.1, produced by ``tools/make_golden.py``. Any change to
seeds, banding, shingling, tie-breaks, or thresholds fails here instead
of silently passing a rows-only driver check. The underlying MATH is
separately value-hash oracle-checked via the exact companion entries
(dedup_ngram_jaccard, similarity_cosine_top3, dedup_cluster_components).
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
GOLDEN_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_ann_lsh",
    "dedup_cluster_minhash",
    "embedding_pca_project",
    "text_bpe_merges",
]


def _canonical_rows(df):
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        rows.append([round(v, 6) if isinstance(v, float) else v for v in r])
    rows.sort(key=lambda x: json.dumps(x, default=str))
    return {"columns": cols, "rows": rows}


def _fixture(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_golden_exact_rows(spark, name, sf):
    from erpl_web_spark.suite import all_queries

    want = _fixture(name)["exact"][sf]
    got = _canonical_rows(all_queries()[name].fn(spark, f"/root/testdata/sf{sf}"))
    assert got["columns"] == want["columns"]
    # normalize via JSON to align int/float and tuple/list representations
    assert json.loads(json.dumps(got["rows"], default=str)) == want["rows"]


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_sf01_count(spark, name):
    from erpl_web_spark.suite import all_queries

    want = _fixture(name)["counts"]["0.1"]
    assert all_queries()[name].fn(spark, "/root/testdata/sf0.1").count() == want
