"""Golden-fixture contracts for the six rows-only suite queries.

These queries have ``oracle=None`` by design — seeded-xxhash64 banding
is not expressible in DuckDB SQL — so their correctness contract is a
checked-in expected output: exact row sets at sf0.001/sf0.01 and row
counts at sf0.1, produced by ``tools/make_golden.py``. Any change to
seeds, banding, shingling, tie-breaks, or thresholds fails here instead
of silently passing a rows-only driver check. The underlying MATH is
separately value-hash oracle-checked via the exact companion entries
(dedup_ngram_jaccard, similarity_cosine_top3, dedup_cluster_components).

The comparison is BYTE-FOR-BYTE against what ``tools/make_golden.py``
would write on the current tree (regeneration guard): it pins not just
the row values but the tool's own canonicalization, so an edit to the
generator — or to a seed, forgetting ``python tools/make_golden.py`` —
fails loudly here. Granular asserts (columns, per-SF rows, count) run
first so a failure names the drifted part before the byte check.
"""

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools import make_golden  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
GOLDEN_QUERIES = make_golden.GOLDEN_QUERIES


def _checked_in(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return f.read()


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_fixture_regeneration_parity(spark, name):
    """make_golden.py output == the checked-in fixture, byte for byte."""
    want_bytes = _checked_in(name)
    want = json.loads(want_bytes)
    got = make_golden.build_fixture(spark, name)
    # granular first: name WHICH part drifted before the byte check
    for sf in make_golden.EXACT_SFS:
        assert got["exact"][sf]["columns"] == want["exact"][sf]["columns"], (
            f"{name} sf{sf}: column drift"
        )
        # normalize via JSON to align int/float and tuple/list renderings
        assert (
            json.loads(json.dumps(got["exact"][sf]["rows"], default=str))
            == want["exact"][sf]["rows"]
        ), f"{name} sf{sf}: row drift — seeds/banding changed without regen?"
    assert got["counts"] == want["counts"], f"{name}: sf0.1 count drift"
    assert make_golden.serialize(got) == want_bytes, (
        f"{name}: serialized fixture differs from checked-in bytes — run "
        "python tools/make_golden.py and commit if the change was deliberate"
    )
