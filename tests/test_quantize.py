"""int8 embedding quantization: reconstruction bound and shortlist
fidelity of the dequantized cosine."""

import math
import random

import pytest

from pyspark.sql import functions as F

from erpl_web_spark.operators.similarity import (
    cosine_expr,
    dequantized_cosine_expr,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(40)
    ] + [(100, [0.0] * 32)]  # zero vector edge case
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_reconstruction_error_bounded(vecs):
    q = quantize_int8(vecs)
    rows = q.select(
        "vec_id",
        "scale",
        F.array_max(
            F.zip_with(
                "embedding", "q",
                lambda x, qq: F.abs(x.cast("double") - qq.cast("double") * F.col("scale")),
            )
        ).alias("err"),
        F.array_min("q").alias("qmin"),
        F.array_max("q").alias("qmax"),
    ).collect()
    for r in rows:
        assert -127 <= r["qmin"] and r["qmax"] <= 127
        # symmetric quantization: per-element error is at most scale/2
        assert r["err"] <= r["scale"] / 2 + 1e-12
    zero = [r for r in rows if r["vec_id"] == 100][0]
    assert zero["scale"] == 0.0 and zero["qmin"] == 0 and zero["qmax"] == 0


def test_dequantized_cosine_tracks_exact(vecs, spark):
    q = quantize_int8(vecs.where(F.col("vec_id") != 100))
    a = q.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("q").alias("qa"), F.col("scale").alias("sa"),
    )
    b = q.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("q").alias("qb"), F.col("scale").alias("sb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        cosine_expr(F.col("va"), F.col("vb")).alias("exact"),
        dequantized_cosine_expr(
            F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")
        ).alias("approx"),
    )
    worst = pairs.agg(F.max(F.abs(F.col("exact") - F.col("approx")))).collect()[0][0]
    # int8 on 32 dims: cosine error well under 0.02 — tight enough for a
    # shortlist that full-precision re-ranking then corrects.
    assert worst < 0.02, worst
