"""The natural-corpus fixture (suite/natural.py) value-hashes across
engines only if (a) the construction is what both renderings think it
is and (b) the one transcendental step — ``floor(exp(u * ln VMAX))`` —
can never be flipped by a last-ulp ``exp`` difference between the JVM
and DuckDB's libm. (a) is pinned by a pure-Python third rendering;
(b) by exhaustively checking all 4096 lattice points' distance to the
nearest floor boundary."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from erpl_web_spark.suite.natural import (
    _LATTICE,
    _LOG_V,
    _SEED,
    _SYL,
    _VMAX,
    natural_text_expr,
)


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _word(r: int) -> str:
    if r <= 40:
        return _SYL[r - 1]
    if r <= 1640:
        j = r - 41
        return _SYL[j // 40] + _SYL[j % 40]
    j = r - 1641
    return _SYL[j // 1600] + _SYL[(j // 40) % 40] + _SYL[j % 40]


def _text(doc_id: int) -> str:
    n = 30 + _h48(f"{_SEED}:{doc_id}:len") % 61
    out = []
    for p in range(n):
        j = _h48(f"{_SEED}:{doc_id}:{p}") % _LATTICE
        r = min(max(math.floor(math.exp((j + 0.5) / _LATTICE * _LOG_V)), 1), _VMAX)
        out.append(_word(r))
    return " ".join(out)


def test_lattice_points_clear_floor_boundaries():
    """Every possible exp argument yields a value whose relative
    distance to the nearest integer is >= 1e-8 — seven orders of
    magnitude above a 2-ulp (~4.4e-16) cross-engine exp disagreement,
    so the floor (hence the token, hence the value hash) is engine
    -independent BY CONSTRUCTION, not by luck. If _VMAX/_LOG_V/_LATTICE
    ever change, this test is the gate that re-validates the choice."""
    assert _LOG_V == math.log(float(_VMAX))
    worst = 1.0
    for j in range(_LATTICE):
        x = math.exp((j + 0.5) / _LATTICE * _LOG_V)
        fl = math.floor(x)
        worst = min(worst, min(x - fl, fl + 1 - x) / x)
    assert worst >= 1e-8, f"lattice point within {worst} of a floor boundary"


def test_lattice_rank_one_immune_to_two_ulp():
    """Sharper form of the same guarantee: perturbing every exp output
    by +-2 ulp never changes any floor."""
    for j in range(_LATTICE):
        x = math.exp((j + 0.5) / _LATTICE * _LOG_V)
        lo = math.nextafter(math.nextafter(x, 0.0), 0.0)
        hi = math.nextafter(math.nextafter(x, math.inf), math.inf)
        assert math.floor(lo) == math.floor(hi) == math.floor(x)


def test_spark_matches_python_model(spark):
    """Third independent rendering (hashlib + math) of the first 30
    docs matches the Spark column expression verbatim."""
    rows = (
        spark.range(30)
        .select(F.col("id").alias("doc_id"), natural_text_expr(F.col("id")).alias("text"))
        .collect()
    )
    for r in rows:
        assert r["text"] == _text(r["doc_id"])


def test_natural_entropy_beats_testdata():
    """The corpus actually delivers what it exists for: vocabulary two
    decades past the ~40-word testdata tables (Python model, 200 docs)."""
    vocab = set()
    for d in range(200):
        vocab.update(_text(d).split(" "))
    assert len(vocab) > 800, f"vocab {len(vocab)} — natural mode degenerated"


def test_duckdb_matches_python_model():
    """Fourth rendering: the oracle-side SQL (DuckDB) agrees with the
    Python model on 20 docs, independently of the Spark session."""
    duckdb = pytest.importorskip("duckdb")
    from erpl_web_spark.suite.natural import sql_natural_cte

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT range AS doc_id FROM range(20)")
    rows = con.execute(
        f"WITH {sql_natural_cte()} SELECT doc_id, text FROM nat ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == 20
    for doc_id, text in rows:
        assert text == _text(doc_id)
