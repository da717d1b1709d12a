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


def test_ivf_int8_rerank_recall(spark):
    """Two-stage (int8 shortlist -> float re-rank) vs plain IVF on the
    driver embeddings: identical cell search, so any divergence comes
    from int8 rounding at the shortlist boundary — recall@3 should stay
    near 1."""
    from erpl_web_spark.operators.similarity import ann_top_k_ivf, ann_top_k_ivf_rerank
    from erpl_web_spark.suite import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.where(F.col("vec_id") < 50)
    exact = ann_top_k_ivf(emb, probes, k=3, stride=50, nprobe=2)
    two_stage = ann_top_k_ivf_rerank(emb, probes, k=3, stride=50, nprobe=2, shortlist=10)
    a = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    b = {(r["probe_id"], r["neighbor_id"]) for r in two_stage.collect()}
    assert len(a & b) / len(a) >= 0.95, (len(a & b), len(a))


def test_quantize_adversarial_values(spark):
    """Denormals, negatives-at-max, huge magnitudes, and mixed-sign
    vectors all quantize within clamp bounds and reconstruct within
    scale/2."""
    rows = [
        (1, [5e-324, -5e-324, 0.0, 1e-300]),          # denormal territory
        (2, [-3.4e38, 3.4e38, 1.0, -1.0]),            # float32 extremes
        (3, [-1.0, -0.5, -0.25, -0.125]),             # all negative
        (4, [1e-9, 2e-9, -1e-9, 3e-9]),               # tiny uniform
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantize_int8(df)
    for r in q.collect():
        scale = r["scale"]
        assert all(-127 <= v <= 127 for v in r["q"])
        for x, qq in zip(r["embedding"], r["q"]):
            assert abs(float(x) - qq * scale) <= scale / 2 + 1e-30


def test_embedding_covariance_matches_numpy(spark):
    """Exact integerized covariance == numpy population covariance of
    the floor-quantized values (bit-level: both are integer arithmetic
    with the same double tail)."""
    import numpy as np
    from erpl_web_spark.operators.similarity import embedding_covariance

    rng = np.random.default_rng(21)
    X = rng.normal(size=(300, 6)).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["cov"]
           for r in embedding_covariance(df, "embedding", dim=6).collect()}

    Q = np.floor(X.astype(np.float64) * 10_000).astype(np.int64)
    n = Q.shape[0]
    s = Q.sum(axis=0)
    for i in range(6):
        for j in range(i, 6):
            p = int((Q[:, i] * Q[:, j]).sum())
            want = float(n * p - int(s[i]) * int(s[j])) / float(n * n) / 1e8
            assert got[(i, j)] == want, (i, j)


def test_pca_project_properties(spark):
    """PCA contract: projected components are decorrelated with variance
    equal to the covariance eigenvalues (population), components ordered
    by decreasing variance, and the projection matches a direct numpy
    PCA of the same quantized covariance."""
    import numpy as np
    from erpl_web_spark.operators.similarity import pca_project

    rng = np.random.default_rng(33)
    # anisotropic data so eigenvalues are well separated
    A = rng.normal(size=(8, 8))
    X = (rng.normal(size=(400, 8)) @ (A * np.linspace(3, 0.3, 8))).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(5)
    out = pca_project(df, "vec_id", "embedding", dim=8, k=4)
    got = {
        r["vec_id"]: np.array([r[f"pc_{c}"] for c in range(4)], dtype=np.float64)
        for r in out.collect()
    }
    P = np.stack([got[i] for i in range(400)])

    # numpy reference from the same quantized covariance
    Q = np.floor(X.astype(np.float64) * 10_000).astype(np.int64)
    n = Q.shape[0]
    C = (Q.T @ Q / n - np.outer(Q.mean(0), Q.mean(0))) / 1e8
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(-evals)[:4]
    V = evecs[:, order]
    for c in range(4):
        piv = int(np.argmax(np.abs(V[:, c])))
        if V[piv, c] < 0:
            V[:, c] = -V[:, c]
    want = (X.astype(np.float64) - X.astype(np.float64).mean(0)) @ V
    assert np.max(np.abs(P - want)) < 1e-2  # quantization + 6dp rounding

    cov_p = np.cov(P.T, bias=True)
    offdiag = cov_p - np.diag(np.diag(cov_p))
    assert np.max(np.abs(offdiag)) < 1e-2 * np.max(np.diag(cov_p))
    variances = np.diag(cov_p)
    assert all(variances[i] >= variances[i + 1] - 1e-9 for i in range(3))
    assert np.allclose(variances, evals[order], rtol=1e-2)
