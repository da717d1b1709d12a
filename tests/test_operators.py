"""Operator-level correctness tests: as-of join vs brute force, expand
nesting, MinHash recall vs exact Jaccard, SimHash, cosine vs numpy,
multimodal decode, catalogs."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_asof_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, 8, "e")],
        "k int, t int, payload string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 1, 300.0), (4, 2, 400.0)],
        "k int, rt int, val double",
    )
    from erpl_web_spark.operators.relational import asof_join

    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    right_cols=["rt", "val"])
    got = {(r["k"], r["t"]): (r["rt"], r["val"]) for r in out.collect()}
    # brute force expectation: greatest rt <= t per key
    assert got[(1, 10)] == (10, 100.0)   # equal ts counts
    assert got[(1, 20)] == (18, 200.0)
    assert got[(1, 5)] == (None, None)   # nothing at or before 5
    assert got[(2, 15)] == (1, 300.0)
    assert got[(3, 8)] == (None, None)   # key with no right rows
    assert out.count() == left.count()   # left join semantics


def test_expand_entity_nested_sorted(spark):
    parents = spark.createDataFrame([(1, "p1"), (2, "p2"), (3, "p3")], "id int, name string")
    children = spark.createDataFrame(
        [(1, 30, "x"), (1, 10, "y"), (2, 20, "z")], "id int, ord int, tag string"
    )
    from erpl_web_spark.operators.relational import expand_entity

    out = expand_entity(parents, children, on="id", expand_name="Items",
                        order_col="ord").orderBy("id").collect()
    assert [i["ord"] for i in out[0]["Items"]] == [10, 30]  # sorted by order_col
    assert out[1]["Items"][0]["tag"] == "z"
    assert out[2]["Items"] is None  # parent with no children


def test_minhash_lsh_finds_near_duplicates(spark):
    # Construct documents with a known near-dup pair + unrelated docs.
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)  # tiny mutation -> high jaccard
    rows = [(1, base), (2, near)] + [
        (i, f"totally different content number {i} " + "words unique %d " % i * 20)
        for i in range(3, 10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    pairs = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=64, bands=16,
                              threshold=0.5).collect()
    assert any(p["id_a"] == 1 and p["id_b"] == 2 for p in pairs)
    # verification step bounds FPs: every reported pair really has j >= 0.5
    assert all(p["jaccard"] >= 0.5 for p in pairs)
    # exact blocked jaccard agrees
    df2 = df.withColumn("blk", F.lit(1))
    exact = ngram_jaccard_pairs(df2, "doc_id", "text", ["blk"], threshold=0.5).collect()
    exact_pairs = {(p["id_a"], p["id_b"]) for p in exact}
    assert (1, 2) in exact_pairs
    lsh_pairs = {(p["id_a"], p["id_b"]) for p in pairs}
    assert lsh_pairs <= exact_pairs  # no false positives vs exact


def test_band_bucket_cap_bounds_hot_buckets(spark):
    """max_bucket (the band-bucket cap, VERDICT r10 #1): a boilerplate
    cluster of identical documents floods every one of its band
    buckets; with the cap on, those buckets are dropped (and COUNTED
    via dropped_sink) while pairs in normal-sized buckets are
    untouched — for both banded families. An identical-document
    cluster agrees on ALL bands, so the cap removes exactly its pairs;
    a genuine two-document near-dup pair sits in size-2 buckets and
    survives any cap >= 2."""
    from erpl_web_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )

    from erpl_web_spark.operators.dedup import simhash_documents

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("delta", "deltas", 1)
    boiler = "terms of service apply contact us all rights reserved " * 6
    rows = [(1, base), (2, near)] + [(100 + i, boiler) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash_documents(df, "doc_id", "text").collect()
    }
    radius = bin(sims[1] ^ sims[2]).count("1")  # put (1,2) inside the radius

    for fam, run in [
        (
            "minhash",
            lambda cap, sink: minhash_lsh_pairs(
                df, "doc_id", "text", num_hashes=64, bands=16,
                threshold=0.5, max_bucket=cap, dropped_sink=sink,
            ),
        ),
        (
            "simhash",
            lambda cap, sink: simhash_near_dup_pairs(
                df, "doc_id", "text", max_hamming=radius,
                max_bucket=cap, dropped_sink=sink,
            ),
        ),
    ]:
        uncapped = {(p["id_a"], p["id_b"]) for p in run(None, None).collect()}
        boiler_pairs = {p for p in uncapped if p[0] >= 100}
        assert (1, 2) in uncapped and len(boiler_pairs) == 30 * 29 // 2, fam
        sink: list = []
        capped = {(p["id_a"], p["id_b"]) for p in run(10, sink).collect()}
        assert (1, 2) in capped, fam
        assert not any(a >= 100 for a, _ in capped), fam
        # dropped buckets are counted, not silently truncated; every
        # dropped bucket exceeds the cap and the boilerplate cluster's
        # buckets (>= 30 members) are among them
        dropped = sink[0].collect()
        assert dropped and all(r["n_members"] > 10 for r in dropped), fam
        assert any(r["n_members"] >= 30 for r in dropped), fam
        # a cap above every bucket size changes nothing
        assert {(p["id_a"], p["id_b"]) for p in run(1000, None).collect()} == uncapped, fam
    from erpl_web_spark.operators import release_tracked

    release_tracked()


def test_allpairs_prefix_join_is_exact(spark):
    """Prefix-filtered all-pairs Jaccard must equal the unblocked exact
    brute force — same pairs, same values — including pairs whose ONLY
    shared shingles are corpus-frequent (the case a naive 'join on rare
    tokens only' heuristic would lose, but the prefix theorem must not),
    and docs shorter than the shingle width (empty sets, no pairs)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    near = base.replace("delta", "lambda", 1)  # one mutation -> j >= 0.5
    rows = [(1, base), (2, near), (3, base.replace("alpha", "mu"))] + [
        (i, f"unrelated text block {i} " + f"filler{i} words{i} more{i} " * 8)
        for i in range(4, 12)
    ] + [(99, "too short")]  # < 3 tokens of 3-gram width -> empty shingles
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import (
        allpairs_jaccard_join,
        ngram_jaccard_pairs,
    )

    sink: list = []
    got = allpairs_jaccard_join(
        df, "doc_id", "text", shingle_k=3, threshold=0.5, cache_sink=sink
    ).collect()
    # brute force: ngram_jaccard_pairs with one global block
    exact = ngram_jaccard_pairs(
        df.withColumn("blk", F.lit(1)), "doc_id", "text", ["blk"], threshold=0.5
    ).collect()
    for f in sink:
        f.unpersist()
    got_m = {(p["id_a"], p["id_b"]): p["jaccard"] for p in got}
    exact_m = {(p["id_a"], p["id_b"]): p["jaccard"] for p in exact}
    assert got_m.keys() == exact_m.keys() and {(1, 2), (1, 3)} <= got_m.keys()
    for k, v in exact_m.items():
        assert abs(got_m[k] - v) < 1e-12
    assert all(a < b for a, b in got_m)
    assert not any(99 in k for k in got_m)
    # the sub-width doc must not crash the blocked pairwise operators
    # either (regression: empty shingle sets made the containment
    # denominator least(|a|,|b|) zero -> ANSI DIVIDE_BY_ZERO)
    from erpl_web_spark.operators.dedup import containment_pairs

    cont = containment_pairs(
        df.withColumn("blk", F.lit(1)), "doc_id", "text", ["blk"], threshold=0.8
    ).collect()
    assert not any(99 in (p["id_a"], p["id_b"]) for p in cont)


def test_simhash_hamming_near_dups(spark):
    base = "spark engine query optimizer shuffle partition broadcast join " * 8
    near = base.replace("shuffle", "shuffles", 1)
    rows = [(1, base), (2, near), (3, "completely unrelated words " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import simhash_documents, simhash_near_dup_pairs

    sims = {r["doc_id"]: r["simhash"] for r in simhash_documents(df, "doc_id", "text").collect()}
    ham12 = bin(sims[1] ^ sims[2]).count("1")
    ham13 = bin(sims[1] ^ sims[3]).count("1")
    assert ham12 < ham13  # near-dup closer than unrelated
    pairs = simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=ham12).collect()
    assert any(p["id_a"] == 1 and p["id_b"] == 2 for p in pairs)


def test_cosine_top_k_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from erpl_web_spark.operators.similarity import cosine_top_k

    probes = df.where(F.col("vec_id") < 3)
    got = cosine_top_k(df, probes, k=2)
    by_probe = {}
    for r in got.collect():
        by_probe.setdefault(r["probe_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    v64 = vecs.astype("float64")
    norms = np.linalg.norm(v64, axis=1)
    sims = (v64 @ v64.T) / np.outer(norms, norms)
    for p in range(3):
        order = [i for i in np.argsort(-sims[p]) if i != p][:2]
        ours = sorted(by_probe[p])
        assert [n for _, n, _ in ours] == order
        for (_, n, c) in ours:
            assert math.isclose(c, sims[p][n], rel_tol=1e-9)


def test_blas_top_k_matches_brute_force(spark):
    """cosine_top_k_blas must be BIT-IDENTICAL to cosine_top_k — the
    BLAS matmul only shortlists; the emitted cosine comes from the same
    JVM fold. Run over the real embeddings table, corpus spread across
    partitions so the per-partition combine actually merges."""
    from erpl_web_spark.operators.similarity import cosine_top_k, cosine_top_k_blas

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").repartition(7)
    probes = emb.where(F.col("vec_id") < 20)
    want = cosine_top_k(emb, probes, k=3).collect()
    got = cosine_top_k_blas(emb, probes, k=3).collect()
    key = lambda r: (r["probe_id"], r["rank"])  # noqa: E731
    w = {key(r): (r["neighbor_id"], r["cosine"]) for r in want}
    g = {key(r): (r["neighbor_id"], r["cosine"]) for r in got}
    assert g == w  # exact float equality: same fold, same values
    assert len(w) == 20 * 3
    # the big-corpus shuffle mode (skinny candidates + corpus re-join)
    # emits the same values
    got2 = cosine_top_k_blas(emb, probes, k=3, carry_vectors=False).collect()
    g2 = {key(r): (r["neighbor_id"], r["cosine"]) for r in got2}
    assert g2 == w


def test_blas_top_k_include_self_and_margin(spark):
    """include_self keeps the trivial self-match at rank 1; a minimal
    margin still reconstructs the exact top-k."""
    from erpl_web_spark.operators.similarity import cosine_top_k_blas

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(5)
    probes = df.where(F.col("vec_id") < 4)
    got = cosine_top_k_blas(df, probes, k=1, include_self=True, shortlist_margin=1)
    top1 = {r["probe_id"]: r["neighbor_id"] for r in got.collect() if r["rank"] == 1}
    assert top1 == {i: i for i in range(4)}  # self cosine == 1.0


def test_ann_lsh_recall_reasonable(spark):
    rng = np.random.default_rng(11)
    # clustered vectors so LSH buckets are meaningful
    centers = rng.normal(size=(4, 16)) * 5
    vecs = np.vstack([c + rng.normal(size=(10, 16)) * 0.3 for c in centers]).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from erpl_web_spark.operators.similarity import ann_top_k_lsh

    got = ann_top_k_lsh(df, k=1, num_planes=4)
    top1 = {r["probe_id"]: r["neighbor_id"] for r in got.collect() if r["rank"] == 1}
    # exact top-1 via numpy
    v64 = vecs.astype("float64")
    sims = (v64 @ v64.T) / np.outer(np.linalg.norm(v64, axis=1), np.linalg.norm(v64, axis=1))
    np.fill_diagonal(sims, -2)
    exact_top1 = {i: int(np.argmax(sims[i])) for i in range(len(vecs))}
    hits = sum(1 for i, n in top1.items() if exact_top1[i] == n)
    assert len(top1) >= 30          # most vectors got a bucket neighbor
    assert hits / len(top1) >= 0.8  # high recall within clusters


def test_multimodal_decode_stub(spark):
    from erpl_web_spark.operators.multimodal import (
        decode_media,
        documents_as_media,
        sample_frames,
    )
    import hashlib

    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], "doc_id long, text string")
    media = documents_as_media(df)
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out[1]["byte_len"] == 11
    assert out[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert len(out[1]["feature"]) == 8
    from erpl_web_spark.operators.multimodal import pillow_available

    if not pillow_available():
        with pytest.raises(NotImplementedError):
            decode_media(media, decode_stub=False)
    # frame sampling fans out per duration
    vid = media.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"), F.lit("fake").alias("format"),
            F.lit(1).alias("width"), F.lit(1).alias("height"),
            F.lit(3500).cast("long").alias("duration_ms"),
        ),
    )
    frames = sample_frames(vid, every_ms=1000)
    assert frames.where(F.col("media_id") == 1).count() == 3


def test_multimodal_real_pillow_kernel(spark):
    """Real decode kernel: runs wherever Pillow is importable (skips in
    this container), same DECODED_SCHEMA as the stub, real pixel-derived
    features, graceful hash-stub fallback for undecodable payloads."""
    from erpl_web_spark.operators.multimodal import (
        DECODED_SCHEMA,
        decode_media,
        pillow_available,
    )

    if not pillow_available():
        pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    rows = [(1, png, None), (2, b"not an image", None)]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>"
    )
    out = decode_media(media, decode_stub=False)
    assert out.schema == DECODED_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    # solid red -> uniform grayscale thumbnail, all 8 values equal
    feat = got[1]["feature"]
    assert len(feat) == 8 and len(set(round(v, 6) for v in feat)) == 1
    assert 0.0 <= feat[0] < 1.0
    # undecodable payload falls back to the deterministic hash stub
    assert len(got[2]["feature"]) == 8


def test_attach_catalogs(spark, fixture_server):
    from erpl_web_spark.core.http import HttpClient
    from erpl_web_spark.sources.graph import GraphClient
    from erpl_web_spark.sources.catalogs import (
        attach_excel_workbook,
        attach_sharepoint_lists,
    )

    g = GraphClient(fixture_server.base_url + "/graph", HttpClient())
    vs = attach_sharepoint_lists(spark, g, "s1", "sp")
    assert vs == ["sp_list1"]
    assert spark.sql("SELECT COUNT(*) n FROM sp_list1").collect()[0]["n"] >= 2
    ve = attach_excel_workbook(spark, g, "f1", "xl")
    assert ve == ["xl_T1"]
    assert spark.sql("SELECT SUM(Qty) s FROM xl_T1").collect()[0]["s"] == 3.0


def test_ivf_assign_nearest_centroid(spark):
    from erpl_web_spark.operators.similarity import ivf_assign, ivf_centroids

    # 2-D toy: vectors near (1,0) vs (0,1); centroids at ids 0 and 50.
    rows = [
        (0, [1.0, 0.0]), (50, [0.0, 1.0]),
        (7, [0.9, 0.1]), (8, [0.1, 0.9]), (9, [0.7, 0.69]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(df, stride=50)
    assert {r["cell"] for r in cents.collect()} == {0, 50}
    got = {r["vec_id"]: r["cell"] for r in ivf_assign(df, cents).collect()}
    assert got[7] == 0 and got[8] == 50
    assert got[0] == 0 and got[50] == 50   # centroids map to themselves
    assert got[9] == 0                      # tie-ish case resolves deterministically


def test_ann_ivf_matches_bruteforce_within_probed_cells(spark):
    from erpl_web_spark.operators.similarity import ann_top_k_ivf, cosine_top_k

    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.where(F.col("vec_id") < 5)
    # nprobe == number of cells -> IVF degenerates to exact search.
    approx = ann_top_k_ivf(df, probes, k=3, stride=40, nprobe=3)
    exact = cosine_top_k(df, probes, k=3)
    a = {(r["probe_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    e = {(r["probe_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    assert a == e


def test_embedding_near_dup_pairs(spark):
    from erpl_web_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (50, [0.5, 0.5, 0.0]),      # centroid (stride 50 -> cells {0, 50})
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, threshold=0.99, stride=50).collect()
    assert [(r["left_id"], r["right_id"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["cosine"] > 0.99


def test_salted_join_matches_plain_join(spark):
    from erpl_web_spark.operators.relational import salted_join

    # 10k rows all sharing ONE hot key + a long tail.
    left = spark.range(10_000).selectExpr(
        "CASE WHEN id < 9000 THEN 1 ELSE id END AS k", "id AS payload"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (9500, "cold"), (42, "unmatched-left")], "k long, tag string"
    )
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k", "inner", salt=8)
    assert salted.count() == plain.count() == 9001
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0
    # left join keeps unmatched rows exactly once
    lp = left.join(right, "k", "left")
    ls = salted_join(left, right, "k", "left", salt=8)
    assert ls.count() == lp.count() == 10_000
    assert ls.exceptAll(lp).count() == 0
    # salt spreads the hot key across partitions: distinct salts > 1
    from pyspark.sql import functions as F
    n_salts = (
        left.withColumn("s", F.pmod(F.xxhash64("payload"), F.lit(8)))
        .where("k = 1").select("s").distinct().count()
    )
    assert n_salts == 8


def test_salted_join_rejects_right_how(spark):
    from erpl_web_spark.operators.relational import salted_join
    import pytest as _pt
    left = spark.range(3).selectExpr("id AS k")
    with _pt.raises(ValueError):
        salted_join(left, left, "k", how="right")


def test_hash_split_deterministic_and_proportional(spark):
    from erpl_web_spark.operators.text import hash_split

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, "doc_id", w)
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # deterministic across runs and partitioning
    b = hash_split(df.repartition(13), "doc_id", w)
    assert a.join(b.withColumnRenamed("split", "s2"), "doc_id") \
            .where("split <> s2").count() == 0
    # adding rows never reassigns existing ones
    c = hash_split(spark.range(40_000).withColumnRenamed("id", "doc_id"), "doc_id", w)
    assert a.join(c.withColumnRenamed("split", "s2"), "doc_id") \
            .where("split <> s2").count() == 0
    # different seed -> different assignment (sanity that seed matters)
    d = hash_split(df, "doc_id", w, seed=7)
    assert a.join(d.withColumnRenamed("split", "s2"), "doc_id") \
            .where("split <> s2").count() > 0


def test_redact_pii(spark):
    from erpl_web_spark.operators.text import redact_pii

    rows = [
        (1, "mail me at jo.doe+x@example.co.uk or call +1 (555) 123-4567"),
        (2, "server 192.168.0.1 ssn 123-45-6789"),
        (3, "nothing sensitive here"),
        # ADVICE r13: a literal marker already in the input is NOT a
        # redaction hit (hits counted on pre-replacement text, not by
        # counting [KIND] markers in the output)
        (4, "docs mention the [EMAIL] placeholder and [IPV4] syntax"),
        (5, "[PHONE] already masked, plus real mail a@b.io"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r for r in redact_pii(df, "text").collect()}
    assert "[EMAIL]" in got[1]["redacted"] and "[PHONE]" in got[1]["redacted"]
    assert "jo.doe" not in got[1]["redacted"] and "555" not in got[1]["redacted"]
    assert got[1]["redacted_n_hits"] == 2
    assert "[IPV4]" in got[2]["redacted"] and "[SSN_LIKE]" in got[2]["redacted"]
    assert got[2]["redacted_n_hits"] == 2
    assert got[3]["redacted"] == rows[2][1] and got[3]["redacted_n_hits"] == 0
    assert got[4]["redacted"] == rows[3][1] and got[4]["redacted_n_hits"] == 0
    assert got[5]["redacted_n_hits"] == 1 and "a@b.io" not in got[5]["redacted"]


def test_repetition_stats(spark):
    from erpl_web_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here are different")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert got[1]["rep_top_word_ratio"] == 1.0       # degenerate repetition
    assert got[1]["rep_distinct_token_ratio"] == 0.25
    assert got[2]["rep_top_word_ratio"] == 0.2       # perfectly diverse
    assert got[2]["rep_distinct_token_ratio"] == 1.0


def test_lsh_bucket_plan_build_is_job_free(spark):
    """Building the bucket plan with dim= must not trigger a Spark job
    (the old code probed .first() at plan time), and must work on empty
    input."""
    from erpl_web_spark.operators.similarity import lsh_bucket_candidates

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup()
    buckets = lsh_bucket_candidates(df, dim=8)  # plan only — no action yet
    assert tracker.getJobIdsForGroup() == before
    assert buckets.count() == 6
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_bucket_candidates(empty, dim=8).count() == 0


def test_pack_documents_custom_text_col(spark):
    from erpl_web_spark.operators.text import pack_documents

    rows = [
        (1, "s1", "one two three"),          # 3 tokens
        (2, "s1", "four five"),              # 2 tokens
        (3, "s1", "six seven eight nine"),   # 4 tokens
        (4, "s2", "a b"),                    # separate group packs alone
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, body string")
    out = {
        r["doc_id"]: r
        for r in pack_documents(
            df, id_col="doc_id", group_col="src", budget=4, text_col="body"
        ).collect()
    }
    assert out[1]["pack_id"] == 0 and out[1]["pack_offset"] == 0
    assert out[2]["pack_id"] == 0 and out[2]["pack_offset"] == 3
    assert out[3]["pack_id"] == 1 and out[3]["pack_offset"] == 1  # cum 5 -> pack 1
    assert out[4]["pack_id"] == 0 and out[4]["pack_offset"] == 0


def test_linear_quality_score_math(spark):
    """Hand-checkable inference: a one-token doc's margin is exactly its
    bucket weight w/997 (integer-scaled, no float sum), p_keep is the
    sigmoid of that, keep mirrors p_keep >= 0.5, and an empty doc emits
    no row (no features, not a zero score)."""
    import hashlib
    import math

    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello hello world"), (3, "   ")],
        "doc_id long, text string",
    )
    from erpl_web_spark.operators.text import linear_quality_score

    out = {r["doc_id"]: r for r in linear_quality_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}  # whitespace-only doc 3 has no tokens

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    def w_int(b: int) -> int:
        return (b * 2654435761) % 997 - 498

    m1 = round(w_int(bucket("hello")) / 997.0, 12)
    assert out[1]["n_toks"] == 1 and abs(out[1]["margin"] - m1) < 1e-15
    p1 = round(1.0 / (1.0 + math.exp(-m1)), 9)
    assert abs(out[1]["p_keep"] - p1) < 1e-15
    assert out[1]["keep"] == (p1 >= 0.5)
    # two tokens, exact integer numerator
    m2 = round(
        (2 * w_int(bucket("hello")) + w_int(bucket("world"))) / (997.0 * 3), 12
    )
    assert out[2]["n_toks"] == 3 and abs(out[2]["margin"] - m2) < 1e-15


def test_normalize_text_matches_python_model(spark):
    """Randomized model comparison, batched into ONE Spark action: 200
    strings drawn from an alphabet mixing letters, curly quotes, dashes,
    NBSP, control bytes, tabs and space runs must normalize exactly as
    the pure-Python reference (translate -> control strip -> [ \\t]+
    collapse -> space-trim)."""
    import random
    import re

    from erpl_web_spark.operators.text import normalize_text

    trans = str.maketrans("\u2018\u2019\u201c\u201d\u2013\u2014\u00a0", "''\"\"-- ")
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    runs = re.compile("[ \t]+")

    def model(t: str) -> str:
        t = t.translate(trans)
        t = ctrl.sub("", t)
        t = runs.sub(" ", t)
        return t.strip(" ")

    alphabet = list("abc xy.") + ["\u2018", "\u2019", "\u201c", "\u201d", "\u2013", "\u2014", "\u00a0",
                                  "\x01", "\x07", "\t", "\n", "  ", " "]
    rng = random.Random(20260815)
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["norm_text"], r["changed"])
        for r in normalize_text(df).collect()
    }
    for i, t in rows:
        want = model(t)
        assert got[i] == (want, want != t), (i, repr(t), repr(want), got[i])


def test_countmin_sketch_guarantees(spark):
    """The CMS contract: estimates NEVER undercount; with a roomy width
    (no full-depth collisions on a tiny vocab) they are exact; the
    sketch has at most depth*width rows regardless of corpus size."""
    from erpl_web_spark.operators.text import (
        countmin_lookup,
        countmin_sketch,
        tokens_expr,
    )

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d d d d")], "doc_id long, text string"
    )
    exact = {"a": 4, "b": 3, "c": 1, "d": 4}
    toks = df.select(F.explode(tokens_expr("text")).alias("tok")).distinct()

    roomy = countmin_sketch(df, depth=4, width=4096)
    assert roomy.count() <= 4 * 4096
    est = {
        r["tok"]: r["est_n"]
        for r in countmin_lookup(roomy, toks, depth=4, width=4096).collect()
    }
    assert est == exact  # no collisions at this load factor

    # adversarially tiny: collisions certain, but never an undercount
    tiny = countmin_sketch(df, depth=2, width=2)
    assert tiny.count() <= 4
    est2 = {
        r["tok"]: r["est_n"]
        for r in countmin_lookup(tiny, toks, depth=2, width=2).collect()
    }
    assert all(est2[t] >= n for t, n in exact.items())
    total = sum(exact.values())
    assert all(v <= total for v in est2.values())


def test_line_index_apply_forward_only(spark, tmp_path):
    """The incremental line index: within-batch hot lines drop in their
    own batch; a line seen once in batch 0 and once in batch 1 survives
    batch 0's publish but drops from batch 1 (FORWARD-ONLY — batch 0 is
    not rewritten); counts accumulate across commits; a replayed batch
    rewrites identical content (idempotence)."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        read_clean_batches,
        read_line_counts,
    )

    path = str(tmp_path / "lineidx")
    b0 = spark.createDataFrame(
        [
            (1, "alpha body\nshared footer"),
            (2, "beta body\nshared footer"),
            (3, "gamma body\nlate bloomer"),
        ],
        "doc_id long, text string",
    )
    line_index_apply(b0, 0, path)
    clean0 = {
        r["doc_id"]: r for r in read_clean_batches(spark, path).collect()
    }
    # footer hot WITHIN batch 0 (2 docs) -> dropped; 'late bloomer' df=1 kept
    assert clean0[1]["clean_text"] == "alpha body"
    assert clean0[3]["clean_text"] == "gamma body\nlate bloomer"

    b1 = spark.createDataFrame(
        [
            (10, "delta body\nlate bloomer"),      # 2nd sighting -> hot now
            (11, "epsilon body\nshared footer"),   # already hot from batch 0
        ],
        "doc_id long, text string",
    )
    line_index_apply(b1, 1, path)
    all_clean = {
        r["doc_id"]: r for r in read_clean_batches(spark, path).collect()
    }
    # forward-only: batch 0's doc 3 still carries 'late bloomer'...
    assert all_clean[3]["clean_text"] == "gamma body\nlate bloomer"
    # ...but batch 1's doc 10 loses it (accumulated df = 2 > 1)
    assert all_clean[10]["clean_text"] == "delta body"
    assert all_clean[11]["clean_text"] == "epsilon body"
    counts = {
        r["digest"]: r["n_docs"]
        for r in read_line_counts(spark, path).collect()
    }
    assert sum(counts.values()) == 6 + 4  # 6 doc-line facts b0, 4 b1

    # replay batch 1: identical outputs, no double-counted facts
    line_index_apply(b1, 1, path)
    replay = {
        r["doc_id"]: r for r in read_clean_batches(spark, path).collect()
    }
    assert {k: v["clean_text"] for k, v in replay.items()} == {
        k: v["clean_text"] for k, v in all_clean.items()
    }
    counts2 = {
        r["digest"]: r["n_docs"]
        for r in read_line_counts(spark, path).collect()
    }
    assert counts2 == counts


def test_line_index_streaming_e2e(spark, tmp_path):
    """The line index behind a real checkpointed file stream: batch 1's
    copy of a line first seen in batch 0 is dropped against the stored
    counts, exactly as in the direct-call contract (forward-only)."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        read_clean_batches,
    )

    src = tmp_path / "lsrc"
    src.mkdir()
    idx = str(tmp_path / "lidx_s")
    ckpt = str(tmp_path / "lckpt")
    schema = "doc_id long, text string"

    def run_stream():
        (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(lambda df, bid: line_index_apply(df, bid, idx))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    spark.createDataFrame(
        [(1, "alpha body\nseen once line")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    clean = {r["doc_id"]: r["clean_text"]
             for r in read_clean_batches(spark, idx).collect()}
    assert clean[1] == "alpha body\nseen once line"

    spark.createDataFrame(
        [(10, "delta body\nseen once line")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()  # same checkpoint: only the new file forms batch 1
    clean = {r["doc_id"]: r["clean_text"]
             for r in read_clean_batches(spark, idx).collect()}
    assert clean[1] == "alpha body\nseen once line"  # forward-only
    assert clean[10] == "delta body"


def test_line_index_compact_preserves_counts(spark, tmp_path):
    """Compacting the count increments must be LOSSLESS for additive
    facts: identical (digest, n_docs) rows from different batches carry
    batch_src, so the merge's dropDuplicates cannot collapse them. The
    accumulated frequencies and the next batch's decisions are
    byte-identical after compaction."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        line_index_compact,
        read_clean_batches,
        read_line_counts,
    )

    path = str(tmp_path / "lineidx")
    # the same single-doc batch shape three times: each contributes the
    # IDENTICAL (digest('recurring line'), n_docs=1) fact
    for b, doc_id in ((0, 1), (1, 2), (2, 3)):
        df = spark.createDataFrame(
            [(doc_id, f"unique body {doc_id}\nrecurring line")],
            "doc_id long, text string",
        )
        line_index_apply(df, b, path)
    before = {
        r["digest"]: r["n_docs"]
        for r in read_line_counts(spark, path).collect()
    }
    assert 3 in before.values()  # the recurring line accumulated to 3
    merged = line_index_compact(spark, path, keep_latest=1)
    assert merged >= 2
    after = {
        r["digest"]: r["n_docs"]
        for r in read_line_counts(spark, path).collect()
    }
    assert after == before
    # next batch still sees the accumulated frequency (drops the line)
    b3 = spark.createDataFrame(
        [(9, "fresh body\nrecurring line")], "doc_id long, text string"
    )
    line_index_apply(b3, 3, path)
    clean = {
        r["doc_id"]: r["clean_text"]
        for r in read_clean_batches(spark, path).collect()
    }
    assert clean[9] == "fresh body"


def test_normalize_text_rules(spark):
    """Each normalization rule lands: typographic map, control strip
    (tab/newline survive), whitespace collapse, trim, changed flag, and
    the identity path leaves clean text byte-identical."""
    from erpl_web_spark.operators.text import normalize_text

    rows = [
        (1, "“quoted” — it’s here"),
        (2, "ctl\x01\x02byte\tkeep\nlines"),
        (3, "  spaced   out\t \ttext  "),
        (4, "already clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    # translate is 1:1 per codepoint: em-dash maps to a single '-'
    assert out[1]["norm_text"] == "\"quoted\" - it's here"
    assert out[2]["norm_text"] == "ctlbyte keep\nlines"
    assert out[3]["norm_text"] == "spaced out text"
    assert out[4]["norm_text"] == "already clean text"
    assert [out[i]["changed"] for i in (1, 2, 3, 4)] == [True, True, True, False]
    low = normalize_text(df, lowercase=True).where("doc_id = 4").collect()[0]
    assert low["norm_text"] == "already clean text"


def test_line_dedup_corpus_policies(spark):
    """Cross-doc hot lines drop from every doc (default) or keep their
    single globally-first occurrence (keep_first); within-doc repeats of
    a non-hot line survive; whitespace-only docs emit no row; a doc that
    loses every line keeps its row with empty clean_text."""
    from erpl_web_spark.operators.text import line_dedup_corpus

    df = spark.createDataFrame(
        [
            (1, "footer\nalpha one\nfooter"),   # hot line repeated in-doc
            (2, "beta two\nfooter"),
            (3, "gamma three\ngamma three"),     # in-doc repeat, not hot
            (4, "footer"),                       # loses everything
            (5, "   \n  "),                      # no non-empty lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup_corpus(df, max_docs=1).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 has no lines -> no row
    assert (out[1]["n_lines"], out[1]["n_lines_kept"]) == (3, 1)
    assert out[1]["clean_text"] == "alpha one"
    assert out[2]["clean_text"] == "beta two"
    # in-doc repeat of a line seen in ONE doc is kept (df counts docs)
    assert (out[3]["n_lines"], out[3]["n_lines_kept"]) == (2, 2)
    assert out[3]["clean_text"] == "gamma three\ngamma three"
    assert (out[4]["n_lines_kept"], out[4]["clean_text"]) == (0, "")

    first = {
        r["doc_id"]: r
        for r in line_dedup_corpus(df, max_docs=1, keep_first=True).collect()
    }
    # winner is min (doc_id, pos): doc 1 pos 0 keeps its ONE occurrence;
    # the in-doc repeat at pos 2 and docs 2/4's copies still drop
    assert first[1]["clean_text"] == "footer\nalpha one"
    assert first[1]["n_lines_kept"] == 2
    assert first[2]["clean_text"] == "beta two"
    assert first[4]["n_lines_kept"] == 0
    # max_docs=2 tolerates the 2-doc line; only the 3-doc footer... there
    # is none here, so nothing is hot and every doc keeps all its lines
    tol = {
        r["doc_id"]: r for r in line_dedup_corpus(df, max_docs=3).collect()
    }
    assert all(r["n_lines_kept"] == r["n_lines"] for r in tol.values())
    # salted membership join returns identical rows (both policies)
    assert {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup_corpus(df, max_docs=1, salt=4).collect()
    } == {k: v["clean_text"] for k, v in out.items()}
    assert {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup_corpus(df, max_docs=1, keep_first=True, salt=4).collect()
    } == {k: v["clean_text"] for k, v in first.items()}


def test_line_dedup_corpus_matches_python_model(spark):
    """Property check against a pure-Python reference model: random
    small corpora drawn from a tiny line alphabet (forcing cross-doc
    repeats, in-doc repeats, trim-to-empty lines) must agree with the
    Spark operator on every (n_lines, n_lines_kept, clean_text) row for
    both policies and both max_docs values. Runs a bounded number of
    drawn examples (Spark round-trip per example keeps this a seconds-
    scale test, not hypothesis' default volume)."""
    import random

    from erpl_web_spark.operators.text import line_dedup_corpus

    alphabet = ["alpha", "beta b", " gamma ", "", "  ", "delta d", "alpha"]

    def model(docs, max_docs, keep_first):
        from collections import defaultdict

        docs_per_line: dict = defaultdict(set)
        first: dict = {}
        for i, t in docs.items():
            for p, raw in enumerate(t.split("\n")):
                line = raw.strip(" ")
                if not line:
                    continue
                docs_per_line[line].add(i)
                if line not in first or (i, p) < first[line]:
                    first[line] = (i, p)
        out = {}
        for i, t in docs.items():
            lines = [
                (p, raw.strip(" "))
                for p, raw in enumerate(t.split("\n"))
                if raw.strip(" ")
            ]
            if not lines:
                continue
            kept = [
                line
                for p, line in lines
                if len(docs_per_line[line]) <= max_docs
                or (keep_first and first[line] == (i, p))
            ]
            out[i] = (len(lines), len(kept), "\n".join(kept))
        return out

    rng = random.Random(20260815)
    for _ in range(6):
        docs = {
            i: "\n".join(
                rng.choice(alphabet) for _ in range(rng.randrange(0, 6))
            )
            for i in range(rng.randrange(1, 7))
        }
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        for max_docs in (1, 2):
            for keep_first in (False, True):
                got = {
                    r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["clean_text"])
                    for r in line_dedup_corpus(
                        df, max_docs=max_docs, keep_first=keep_first
                    ).collect()
                }
                want = model(docs, max_docs, keep_first)
                assert got == want, (docs, max_docs, keep_first)


def test_quantile_filter_per_group_floor(spark):
    """Each group's cutoff is computed from ITS OWN distribution — a
    low-score group keeps its strongest rows instead of being emptied
    by a global cutoff; ties at the cutoff are all kept; the approx
    path returns a superset-compatible cutoff column."""
    rows = [("en", i, i * 10) for i in range(1, 11)] + [
        ("lo", 100 + i, i) for i in range(1, 5)  # scores 1..4, all << en
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, score long")
    from erpl_web_spark.operators.curation import quantile_filter

    kept = quantile_filter(df, "lang", "score", q=0.5, exact=True).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # en: median of 10..100 = 55 -> keep 60..100 (5 rows)
    assert by_lang["en"] == {6, 7, 8, 9, 10}
    # lo survives with its own floor: median of 1..4 = 2.5 -> keep 3,4
    assert by_lang["lo"] == {103, 104}
    # ties at the cutoff are kept: integral quantile index hits a value
    df2 = spark.createDataFrame(
        [("x", 1, 5), ("x", 2, 5), ("x", 3, 5), ("x", 4, 9), ("x", 5, 1)],
        "lang string, doc_id long, score long",
    )
    kept2 = quantile_filter(df2, "lang", "score", q=0.4, exact=True).collect()
    # 0.4-quantile of [1,5,5,5,9] (index 1.6 -> between 5 and 5) = 5
    assert {r["doc_id"] for r in kept2} == {1, 2, 3, 4}
    # approx path executes and agrees on this tiny frame
    kept3 = quantile_filter(df2, "lang", "score", q=0.4, exact=False).collect()
    assert {r["doc_id"] for r in kept3} == {1, 2, 3, 4}


def test_cap_per_group_and_stratified_sample(spark):
    from erpl_web_spark.operators.curation import cap_per_group, stratified_sample
    from pyspark.sql import functions as F

    rows = [(i, "g%d" % (i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, g string")
    capped = cap_per_group(df, "g", [F.col("id")], 3)
    got = sorted((r["g"], r["id"]) for r in capped.collect())
    assert got == [("g0", 0), ("g0", 2), ("g0", 4), ("g1", 1), ("g1", 3), ("g1", 5)]
    # WindowGroupLimit in the plan (bounded per-group heap before the sort)
    assert "WindowGroupLimit" in capped._jdf.queryExecution().executedPlan().toString()

    # deterministic + monotone nesting: 20% sample is a subset of 50%
    big = spark.createDataFrame([(i, "en") for i in range(2000)], "id long, s string")
    s20 = {r["id"] for r in stratified_sample(big, "s", {"en": 0.2}, "id").collect()}
    s50 = {r["id"] for r in stratified_sample(big, "s", {"en": 0.5}, "id").collect()}
    assert s20 <= s50
    assert 0.15 < len(s20) / 2000 < 0.25 and 0.45 < len(s50) / 2000 < 0.55
    # unknown stratum -> default_fraction
    assert stratified_sample(big, "s", {"xx": 1.0}, "id").count() == 0


def test_contamination_report(spark):
    from erpl_web_spark.operators.curation import contamination_report

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),   # fully contained
            (2, "a completely different sentence with novel words here"),
            (3, "prefix words then the quick brown fox appears again"),  # partial
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contamination_report(docs, bench).collect()}
    assert got[1]["contamination"] == 1.0
    assert got[2]["contamination"] == 0.0
    assert 0.0 < got[3]["contamination"] < 1.0
    assert got[3]["n_matched"] == 2  # 'the quick brown', 'quick brown fox'


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key (same bucket count) must plan
    as SortMergeJoin with NO Exchange on either input — the one-time
    write cost that deletes the recurring fact-fact shuffle at scale."""
    import sys

    sys.path.insert(0, ".")
    from tools.bucket_bench import count_exchanges, join_query

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df, key in (
            ("tb_orders", orders, "o_orderkey"),
            ("tb_lineitem", lineitem, "l_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            df.write.format("parquet").bucketBy(4, key).sortBy(key).mode(
                "overwrite"
            ).saveAsTable(name)
        plain = join_query(spark, orders, lineitem)
        bucketed = join_query(spark, spark.table("tb_orders"), spark.table("tb_lineitem"))
        assert plain.collect() == bucketed.collect() or (
            sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))
        )
        # plain: shuffle both join inputs + the aggregation;
        # bucketed: only the aggregation exchange survives.
        assert count_exchanges(plain) == 3
        assert count_exchanges(bucketed) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        for name in ("tb_orders", "tb_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_token_diversity(spark):
    from erpl_web_spark.operators.text import with_token_diversity

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_token_diversity(df).collect()}
    assert got[1]["simpson_diversity"] == 0.0       # all same token
    assert got[2]["simpson_diversity"] == 0.75      # 1 - 4/16
    assert got[3]["simpson_diversity"] == 0.5       # 1 - 8/16
    assert got[2]["n_distinct"] == 4 and got[2]["n_tokens"] == 4


def test_detect_media_format_by_magic_bytes(spark):
    """Format detection is a pure JVM expression over the binary payload
    (no Python per row) and trusts bytes over claimed metadata."""
    from erpl_web_spark.operators.multimodal import detect_media_format_expr

    rows = [
        (1, b"\xff\xd8\xff\xe0" + b"x" * 8),
        (2, b"\x89PNG\r\n\x1a\n" + b"x" * 8),
        (3, b"\x00\x00\x00 ftypisom" + b"x" * 8),
        (4, b"OggS" + b"x" * 8),
        (5, b"just some text bytes"),
        (6, b"ID3\x04" + b"x" * 8),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["fmt"]
        for r in df.select("media_id", detect_media_format_expr("payload").alias("fmt")).collect()
    }
    assert got == {1: "jpeg", 2: "png", 3: "mp4", 4: "ogg", 5: "unknown", 6: "mp3"}


def test_ivf_trained_centroids_improve_on_modulo(spark):
    """KMeans-trained cells must plug into ivf_assign unchanged and
    cluster the data better than the modulo quantizer: with clearly
    clustered vectors, same-cluster vectors land in the same trained
    cell."""
    import numpy as np

    from erpl_web_spark.operators.similarity import ivf_assign, ivf_train_centroids

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 10
    vecs = np.vstack([c + rng.normal(size=(12, 8)) * 0.1 for c in centers])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = ivf_train_centroids(df, n_cells=4, max_iter=20)
    assert cents.count() == 4
    assigned = ivf_assign(df, cents)
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    # every true cluster maps to exactly one trained cell
    for g in range(4):
        cells = {cell_of[i] for i in range(g * 12, (g + 1) * 12)}
        assert len(cells) == 1, f"cluster {g} split across cells {cells}"
    # and distinct clusters use distinct cells
    assert len({cell_of[g * 12] for g in range(4)}) == 4


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A partition-column predicate must appear as PartitionFilters on
    the scan (directory-level pruning — the 100-TB read-a-year-not-
    everything lever)."""
    import sys

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from tools.prune_bench import parquet_files, partition_filters

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    out = str(tmp_path / "li_parted")
    li.withColumn("ship_year", F.year("l_shipdate")).write.partitionBy(
        "ship_year"
    ).parquet(out)
    parted = spark.read.parquet(out)
    q = parted.where(F.col("ship_year") == 1996).agg(F.count("*").alias("n"))
    q.write.format("noop").mode("overwrite").save()
    assert "1996" in partition_filters(q)
    assert parquet_files(out, "ship_year=1996") < parquet_files(out)
    want = li.where(F.year("l_shipdate") == 1996).count()
    assert q.collect()[0]["n"] == want


def test_asof_join_tolerance(spark):
    """tolerance bounds match staleness (pandas merge_asof semantics):
    a right row older than left_ts - tolerance yields NULL."""
    import datetime as dt

    from erpl_web_spark.operators.relational import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30)), (2, t(10))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(9), 90.0), (2, t(0), 20.0)], "k int, rts timestamp, px double"
    )
    no_tol = {(r["k"], r["lts"].minute): r["px"]
              for r in asof_join(left, right, "k", "lts", "rts").collect()}
    assert no_tol == {(1, 10): 90.0, (1, 30): 90.0, (2, 10): 20.0}
    with_tol = {(r["k"], r["lts"].minute): r["px"]
                for r in asof_join(left, right, "k", "lts", "rts",
                                   tolerance="5 MINUTES").collect()}
    # (1,30) is 21min stale, (2,10) is 10min stale -> NULL; (1,10) is 1min
    assert with_tol == {(1, 10): 90.0, (1, 30): None, (2, 10): None}


def test_grams_expr_short_text_is_empty(spark):
    """Texts shorter than k tokens produce ZERO shingles — sequence(1,0)
    counts down in Spark and used to emit bogus slice offsets."""
    from erpl_web_spark.operators.dedup import grams_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d e f")], "id long, text string"
    )
    rows = {r["id"]: r["g"] for r in df.select("id", grams_expr("text", 5).alias("g")).collect()}
    assert rows[1] == []
    assert rows[2] == ["a b c d e", "b c d e f"]


def test_boilerplate_detection(spark):
    from erpl_web_spark.operators.text import boilerplate_ngrams, with_boilerplate_ratio

    tpl = "all rights reserved contact us today"
    docs = [
        (i, f"unique words number {i} follow here {tpl}") for i in range(4)
    ] + [(10, "completely organic text with no repeats at all whatsoever")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    grams = {r["gram"] for r in boilerplate_ngrams(df, "doc_id", "text", k=5, min_docs=3).collect()}
    assert "all rights reserved contact us" in grams
    assert all("unique" not in g for g in grams)
    ratios = {
        r["doc_id"]: r["boiler_ratio"]
        for r in with_boilerplate_ratio(df, "doc_id", "text", k=5, min_docs=3).collect()
    }
    assert ratios[10] == 0.0
    assert all(ratios[i] > 0.2 for i in range(4))


@pytest.mark.parametrize("seed", [3, 17, 51])
def test_cdc_merge_fold_property(spark, seed):
    """apply(apply(base, b1), b2) == apply(base, b1 ++ b2) == dict model,
    for random change streams with global sequence numbers — the
    invariant that makes per-micro-batch application safe."""
    import random as _r

    from erpl_web_spark.operators.cdc import apply_cdc_changes

    rng = _r.Random(seed)
    base_rows = [(k, f"v{k}", float(k)) for k in range(20)]
    changes = []
    for seq in range(60):
        k = rng.randrange(30)  # some keys not in base (pure inserts)
        op = "D" if rng.random() < 0.25 else "U"
        changes.append((k, f"new{seq}", float(seq), op, seq))
    cut = rng.randrange(1, 59)
    schema_b = "k long, name string, val double"
    schema_c = "k long, name string, val double, op string, seq long"
    base = spark.createDataFrame(base_rows, schema_b)
    b1 = spark.createDataFrame(changes[:cut], schema_c)
    b2 = spark.createDataFrame(changes[cut:], schema_c)
    ball = spark.createDataFrame(changes, schema_c)

    two_step = apply_cdc_changes(
        apply_cdc_changes(base, b1, ["k"], "op", ["seq"]), b2, ["k"], "op", ["seq"]
    )
    one_step = apply_cdc_changes(base, ball, ["k"], "op", ["seq"])

    state = {k: (k, n, v) for k, n, v in base_rows}
    for k, n, v, op, _seq in changes:  # already in seq order
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (k, n, v)
    want = set(state.values())
    assert {tuple(r) for r in two_step.collect()} == want
    assert {tuple(r) for r in one_step.collect()} == want


def test_cdc_snapshot_merge_replay_idempotent(spark, tmp_path):
    """Exactly-once re-run safety for the foreachBatch snapshot sink:
    replaying a batch whose parquet write already committed (crash after
    the write, before the checkpoint commit) must re-derive the SAME
    snapshot from the previous version — not read-and-overwrite its own
    output (which Spark refuses) or double-apply the changes."""
    from erpl_web_spark.operators.cdc import (
        merge_to_parquet_snapshots,
        read_latest_snapshot,
    )

    snap = str(tmp_path / "snap")
    schema = "k long, val double, op string, seq long"
    b0 = spark.createDataFrame(
        [(1, 1.0, "I", 0), (2, 2.0, "I", 1), (3, 3.0, "I", 2)], schema
    )
    b1 = spark.createDataFrame(
        [(2, 20.0, "U", 3), (3, 0.0, "D", 4), (4, 4.0, "I", 5)], schema
    )
    merge_to_parquet_snapshots(b0, 0, snap, ["k"], "op", ["seq"])
    merge_to_parquet_snapshots(b1, 1, snap, ["k"], "op", ["seq"])
    want = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert want == {(1, 1.0), (2, 20.0), (4, 4.0)}

    # replay batch 1: v=1 exists and is complete, yet the merge must
    # base itself on v=0 and produce an identical v=1
    merge_to_parquet_snapshots(b1, 1, snap, ["k"], "op", ["seq"])
    got = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert got == want
    # and the base-selection guard itself: highest version below 1 is 0
    base = read_latest_snapshot(spark, snap, before=1)
    assert {r["k"] for r in base.collect()} == {1, 2, 3}

    # retention: batch 2 with retain_versions=1 prunes v=0, keeps v=1
    import os

    b2 = spark.createDataFrame([(5, 5.0, "I", 6)], schema)
    merge_to_parquet_snapshots(b2, 2, snap, ["k"], "op", ["seq"], retain_versions=1)
    dirs = sorted(d for d in os.listdir(snap) if d.startswith("v="))
    assert dirs == ["v=1", "v=2"]
    got2 = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert got2 == want | {(5, 5.0)}
    # replay of batch 2 still derives from v=1 after pruning
    merge_to_parquet_snapshots(b2, 2, snap, ["k"], "op", ["seq"], retain_versions=1)
    got3 = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert got3 == got2


def test_manifest_commit_protocol(spark, tmp_path):
    """core.manifests contract: versions exist only once their manifest
    commits; retraction removes the manifest first; replayed commits
    overwrite their own manifest."""
    from erpl_web_spark.core import manifests

    p = str(tmp_path / "state")
    assert manifests.committed_versions(spark, p, "v") == []
    manifests.commit_version(spark, p, "v", 0)
    manifests.commit_version(spark, p, "v", 2, {"rows": 10})
    assert manifests.committed_versions(spark, p, "v") == [0, 2]
    assert manifests.committed_versions(spark, p, "v", before=2) == [0]
    # replayed commit: same version again, no error, still one entry
    manifests.commit_version(spark, p, "v", 2, {"rows": 10})
    assert manifests.committed_versions(spark, p, "v") == [0, 2]
    # a different kind is a separate namespace
    assert manifests.committed_versions(spark, p, "batch") == []
    manifests.retract_version(spark, p, "v", 0, "v=0")
    assert manifests.committed_versions(spark, p, "v") == [2]


def test_torn_snapshot_write_invisible_to_readers(spark, tmp_path):
    """A snapshot data directory whose manifest never committed (torn
    write: crash between the parquet write and the manifest commit) must
    be invisible — readers keep returning the previous version."""
    from erpl_web_spark.operators.cdc import (
        merge_to_parquet_snapshots,
        read_latest_snapshot,
    )

    snap = str(tmp_path / "snap")
    schema = "k long, val double, op string, seq long"
    b0 = spark.createDataFrame([(1, 1.0, "I", 0), (2, 2.0, "I", 1)], schema)
    merge_to_parquet_snapshots(b0, 0, snap, ["k"], "op", ["seq"])

    # torn write: v=1 parquet fully present (even with _SUCCESS), but
    # the crash happened before the manifest commit
    torn = spark.createDataFrame([(9, 9.0, "I", 9)], schema)
    torn.write.mode("overwrite").parquet(f"{snap}/v=1")
    import os

    assert os.path.exists(f"{snap}/v=1/_SUCCESS")  # data looks complete
    got = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert got == {(1, 1.0), (2, 2.0)}  # still v=0

    # the sink replaying batch 1 commits over the torn directory and
    # only then does v=1 become visible
    b1 = spark.createDataFrame([(2, 20.0, "U", 3)], schema)
    merge_to_parquet_snapshots(b1, 1, snap, ["k"], "op", ["seq"])
    got2 = {(r["k"], r["val"]) for r in read_latest_snapshot(spark, snap).collect()}
    assert got2 == {(1, 1.0), (2, 20.0)}


def test_torn_dedup_index_delta_invisible(spark, tmp_path):
    """A dedup-index delta directory without its manifest is invisible
    to read_dedup_index — batch N's dedup decisions can never consult a
    half-written batch."""
    from erpl_web_spark.operators.dedup import dedup_index_apply, read_dedup_index

    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    dedup_index_apply(b0, 0, idx)
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == {1}

    # torn delta: parquet for batch=1 present, manifest missing
    read_dedup_index(spark, idx).write.mode("overwrite").parquet(f"{idx}/batch=1")
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == {1}
    kept = read_dedup_index(spark, idx)
    assert kept.count() == 1  # not doubled by the torn copy


def test_tile_grid_overlap_and_ragged_edges(spark):
    from erpl_web_spark.operators.multimodal import tile_grid
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [(1, bytearray(b"x"), ("image", "fake", 40, 35, None))],
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>",
    )
    tiles = tile_grid(media, tile_w=16, tile_h=16).collect()
    # 40px wide -> x offsets 0,16,32 (last ragged w=8); 35px -> y 0,16,32 (h=3)
    assert {(t["px_x"], t["px_w"]) for t in tiles} == {(0, 16), (16, 16), (32, 8)}
    assert {(t["px_y"], t["px_h"]) for t in tiles} == {(0, 16), (16, 16), (32, 3)}
    assert len(tiles) == 9
    # total tile area covers the image exactly (no gaps/overlap at stride=tile)
    assert sum(t["px_w"] * t["px_h"] for t in tiles) == 40 * 35
    # overlapping stride 8: windows 0,8,16,24 — the last one reaches the
    # right edge exactly (24 + 16 = 40), so no ragged extra window
    ov = tile_grid(media, tile_w=16, tile_h=16, stride=8).collect()
    assert {t["px_x"] for t in ov} == {0, 8, 16, 24}
    assert all(t["px_w"] == 16 for t in ov)


def test_write_training_shards_layout(spark, tmp_path):
    """Sharded export: same seed -> identical layout; shards hold
    disjoint contiguous key ranges, each internally sorted; row count
    preserved after the mixture explode."""
    import glob

    from erpl_web_spark.operators.curation import mixture_upsample, write_training_shards
    from erpl_web_spark.suite import load

    d = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text", "source")
    up = mixture_upsample(d, "source", {"src0": 2})
    n_in = up.count()
    out = str(tmp_path / "shards")
    write_training_shards(up, out, shards=4, id_col="doc_id", seed=9)
    got = spark.read.parquet(out)
    assert got.count() == n_in
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        keys = [r["shuffle_key"] for r in spark.read.parquet(f).collect()]
        assert keys == sorted(keys)  # internally ordered
        ranges.append((min(keys), max(keys)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint contiguous ranges


def test_incremental_agg_retraction(spark):
    """Retract-and-insert updates: -1/+1 signed changes adjust sums and
    counts; fully-retracted groups disappear."""
    from erpl_web_spark.operators.cdc import incremental_agg_update

    snap = spark.createDataFrame(
        [(1, 2, 30.0), (2, 1, 10.0)], "k long, n_rows long, total double"
    )
    changes = spark.createDataFrame(
        # k=1: retract a 10.0 row, insert a 25.0 row -> n=2, total=45
        # k=2: retract its only row -> group dropped
        # k=3: brand new group
        [(1, 10.0, -1), (1, 25.0, 1), (2, 10.0, -1), (3, 7.0, 1)],
        "k long, v double, sign int",
    )
    got = {
        r["k"]: (r["n_rows"], r["total"])
        for r in incremental_agg_update(
            snap, changes, ["k"], {"total": "v"}, sign_col="sign"
        ).collect()
    }
    assert got == {1: (2, 45.0), 3: (1, 7.0)}


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q02_scans_lineitem_once(spark):
    """q02's correlated MIN decorrelates to a window over ONE supply
    pipeline — a join-back against a second aggregate would scan the
    fact twice (Spark shares no common subplans). Guard the plan shape."""
    from erpl_web_spark.suite import all_queries

    df = all_queries()["q02_min_cost_supplier"].fn(spark, "/root/testdata/sf0.001")
    plan = _formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan


def test_boilerplate_ratio_avoids_gram_window(spark):
    """Doc-frequency tagging must be a join (AQE can split skewed join
    partitions), never a gram-partitioned Window (it cannot)."""
    from erpl_web_spark.suite import all_queries

    df = all_queries()["text_boilerplate_ratio"].fn(spark, "/root/testdata/sf0.001")
    plan = _formatted_plan(df)
    assert "Window" not in plan, plan


def test_asof_join_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 17), (1, 30), (2, 5)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 16, "b"), (1, 20, "c"), (2, 50, "z")], "k int, rt int, tag string"
    )
    from erpl_web_spark.operators.relational import asof_join

    def run(**kw):
        out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                        right_cols=["rt", "tag"], **kw)
        return {(r["k"], r["t"]): (r["rt"], r["tag"]) for r in out.collect()}

    fwd = run(direction="forward")
    assert fwd[(1, 10)] == (16, "b")   # smallest rt >= 10
    assert fwd[(1, 17)] == (20, "c")
    assert fwd[(1, 30)] == (None, None)  # nothing after 30
    assert fwd[(2, 5)] == (50, "z")

    near = run(direction="nearest")
    assert near[(1, 10)] == (8, "a")    # |10-8|=2 < |16-10|=6
    assert near[(1, 17)] == (16, "b")   # 1 < 3
    assert near[(1, 30)] == (20, "c")
    assert near[(2, 5)] == (50, "z")    # only forward exists

    # equidistant tie -> backward (pandas semantics): t=18 between 16 and 20
    tie = spark.createDataFrame([(1, 18)], "k int, t int")
    out = asof_join(tie, right, on="k", left_ts="t", right_ts="rt",
                    right_cols=["rt"], direction="nearest").collect()[0]
    assert out["rt"] == 16

    # tolerance bounds forward matches too (numeric ts -> numeric bound)
    fwd_tol = run(direction="forward", tolerance="3")
    assert fwd_tol[(1, 10)] == (None, None)   # nearest forward is 6 away
    assert fwd_tol[(1, 17)] == (20, "c")      # 3 away, inside bound


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, "7"])
def test_asof_join_matches_pandas_merge_asof(spark, direction, tolerance):
    """Randomized parity with pandas.merge_asof — the canonical as-of
    semantics — across all directions, with and without tolerance."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    left_pd = pd.DataFrame({
        "k": rng.integers(0, 4, 60),
        "t": rng.integers(0, 100, 60).astype("int64"),
    }).sort_values("t", kind="stable").reset_index(drop=True)
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "rt": rng.integers(0, 100, 40).astype("int64"),
        "val": rng.normal(size=40),
    }).sort_values("rt", kind="stable").reset_index(drop=True)
    # merge_asof needs unique right keys per (k, rt) for determinism
    right_pd = right_pd.drop_duplicates(["k", "rt"], keep="first")

    want = pd.merge_asof(
        left_pd, right_pd, left_on="t", right_on="rt", by="k",
        direction=direction,
        tolerance=None if tolerance is None else int(tolerance),
    )

    from erpl_web_spark.operators.relational import asof_join

    got = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        on="k", left_ts="t", right_ts="rt", right_cols=["rt", "val"],
        direction=direction, tolerance=tolerance,
    ).toPandas()

    gm = {(r.k, r.t): (r.rt, r.val) for r in got.itertuples()}
    for r in want.itertuples():
        g_rt, g_val = gm[(r.k, r.t)]
        if pd.isna(r.rt):
            assert pd.isna(g_rt), (r, g_rt)
        else:
            assert g_rt == r.rt and abs(g_val - r.val) < 1e-12, (r, g_rt, g_val)


def test_new_operator_edge_cases(spark):
    """Degenerate inputs: empty edge sets, empty change batches, and
    zero-repeat strata must degrade gracefully, not throw."""
    from erpl_web_spark.operators.cdc import apply_cdc_changes
    from erpl_web_spark.operators.curation import mixture_upsample
    from erpl_web_spark.operators.graph import connected_components

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty_edges, "src", "dst").count() == 0
    # self-loops only -> no components (loops are dropped)
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert connected_components(loops, "src", "dst").count() == 0

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    no_changes = spark.createDataFrame([], "k long, v string, op string, seq long")
    merged = apply_cdc_changes(base, no_changes, ["k"], "op", ["seq"])
    assert {tuple(r) for r in merged.collect()} == {(1, "a"), (2, "b")}

    d = spark.createDataFrame([(1, "x"), (2, "y")], "id long, source string")
    up = mixture_upsample(d, "source", {"x": 0, "y": 2})
    got = sorted((r["id"], r["copy_idx"]) for r in up.collect())
    assert got == [(2, 1), (2, 2)]  # x dropped entirely, y doubled


@pytest.mark.parametrize("seed", [5, 29])
def test_unigram_freq_matches_python_model(spark, seed):
    """with_unigram_freq_score == the dict-counter model, exactly: all
    integer columns bit-equal, the double an exact single division."""
    import random as _r

    from erpl_web_spark.operators.text import with_unigram_freq_score

    rng = _r.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    got = {r["doc_id"]: (r["n_toks"], r["sum_freq"], r["avg_unigram_freq"])
           for r in with_unigram_freq_score(df).collect()}

    counts: dict[str, int] = {}
    for _, text in docs:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    for i, text in docs:
        toks = text.split()
        sum_freq = sum(counts[t] for t in toks)
        want = (len(toks), sum_freq, float(sum_freq) / float(len(toks) * total))
        assert got[i] == want, i


def test_corr_matrix_matches_numpy(spark):
    rng = np.random.default_rng(5)
    a = rng.normal(size=200)
    b = 0.7 * a + rng.normal(size=200) * 0.3
    c = rng.normal(size=200)
    # two-decimal values (the operator integerizes at cents)
    rows = [(round(float(x), 2), round(float(y), 2), round(float(z), 2))
            for x, y, z in zip(a, b, c)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    from erpl_web_spark.operators.relational import corr_matrix

    got = {(r["col_a"], r["col_b"]): r["pearson_r"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    arr = np.array(rows)
    want = np.corrcoef(arr.T)
    assert abs(got[("x", "y")] - want[0, 1]) < 1e-9
    assert abs(got[("x", "z")] - want[0, 2]) < 1e-9
    assert abs(got[("y", "z")] - want[1, 2]) < 1e-9
    assert got[("x", "y")] > 0.8  # the planted correlation


def test_corr_matrix_underscore_names_no_alias_collision(spark):
    """Column names containing underscores must not collide in the
    generated moment aliases: cols ['a','b_b','a_b','b'] used to all
    map name-keyed __p_a_b_b and silently pick the wrong moment."""
    from erpl_web_spark.operators.relational import corr_matrix, profile_columns

    rng = np.random.default_rng(11)
    vals = rng.normal(size=(120, 4)).round(2)
    rows = [tuple(float(v) for v in r) for r in vals]
    cols = ["a", "b_b", "a_b", "b"]
    df = spark.createDataFrame(rows, "a double, b_b double, a_b double, b double")

    got = {(r["col_a"], r["col_b"]): r["pearson_r"]
           for r in corr_matrix(df, cols).collect()}
    want = np.corrcoef(np.array(rows).T)
    for i in range(4):
        for j in range(i + 1, 4):
            assert abs(got[(cols[i], cols[j])] - want[i, j]) < 1e-9, (cols[i], cols[j])

    # profile_columns on the same awkward names (plus a quoted one)
    prof = {r["column_name"]: (r["n_nulls"], r["n_distinct"])
            for r in profile_columns(df).collect()}
    assert set(prof) == set(cols)
    assert all(n == 0 for n, _ in prof.values())


def test_token_budget_sample_properties(spark):
    """Budget is respected exactly, selection is hash-deterministic, and
    a larger budget strictly extends (never reorders) the selection."""
    from erpl_web_spark.operators.curation import token_budget_sample

    rows = [(i, "s", 10) for i in range(20)] + [(100 + i, "t", 7) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_toks long")

    small = token_budget_sample(df, "source", "doc_id", "n_toks", {"s": 55, "t": 21})
    got = {r["source"]: sorted(x["doc_id"] for x in small.collect() if x["source"] == r["source"])
           for r in small.select("source").distinct().collect()}
    # budgets: 55 tokens of 10 each -> 5 docs; 21 of 7 each -> 3 docs
    assert len(got["s"]) == 5 and len(got["t"]) == 3

    big = token_budget_sample(df, "source", "doc_id", "n_toks", {"s": 105, "t": 70})
    big_ids = {r["doc_id"] for r in big.collect()}
    small_ids = {r["doc_id"] for r in small.collect()}
    assert small_ids <= big_ids          # monotone nesting
    assert len(big_ids) == 10 + 10       # both fully within budget

    # unbudgeted strata drop entirely
    only_s = token_budget_sample(df, "source", "doc_id", "n_toks", {"s": 55})
    assert {r["source"] for r in only_s.collect()} == {"s"}


def test_dedup_index_incremental(spark, tmp_path):
    """Incremental dedup index: within-batch dedup (exact + near +
    clusters), cross-batch dedup against every previously-kept doc,
    append-only keeper deltas, attributable decisions, and replay
    idempotence (a re-run batch rewrites identical content)."""
    from erpl_web_spark.operators.dedup import dedup_index_apply, read_dedup_index

    idx = str(tmp_path / "dedup_idx")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5

    b0 = spark.createDataFrame(
        [
            (1, base + "one"),
            (2, base + "one"),  # exact dup of 1 (in batch)
            (3, base.replace("lazy", "sleepy") + "one"),  # near dup of 1
            (4, "completely different organic content with many varied words here " * 4),
        ],
        "doc_id long, text string",
    )
    dedup_index_apply(b0, 0, idx)
    kept0 = {r["doc_id"] for r in read_dedup_index(spark, idx).collect()}
    assert kept0 == {1, 4}
    dec0 = {r["doc_id"]: (r["status"], r["dup_of"])
            for r in spark.read.parquet(f"{idx}/decisions/batch=0").collect()}
    assert dec0[1] == ("kept", None) and dec0[4] == ("kept", None)
    assert dec0[2] == ("dup_in_batch", 1) and dec0[3] == ("dup_in_batch", 1)

    b1 = spark.createDataFrame(
        [
            (10, base.replace("dog", "cat") + "one"),  # near dup of kept 1
            (11, "fresh second batch subject matter entirely its own topic " * 5),
        ],
        "doc_id long, text string",
    )
    dedup_index_apply(b1, 1, idx)
    kept1 = {r["doc_id"] for r in read_dedup_index(spark, idx).collect()}
    assert kept1 == {1, 4, 11}
    dec1 = {r["doc_id"]: (r["status"], r["dup_of"])
            for r in spark.read.parquet(f"{idx}/decisions/batch=1").collect()}
    assert dec1[10] == ("dup_of_index", 1) and dec1[11] == ("kept", None)

    # replay batch 1 (crash-after-write scenario): index and decisions
    # must come out identical — batch 1 reads only deltas < 1
    dedup_index_apply(b1, 1, idx)
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == kept1
    dec1b = {r["doc_id"]: (r["status"], r["dup_of"])
             for r in spark.read.parquet(f"{idx}/decisions/batch=1").collect()}
    assert dec1b == dec1

    # batch 2: near dup of a batch-1 keeper, plus a new doc
    b2 = spark.createDataFrame(
        [
            (20, "fresh second batch subject matter entirely its own idea " * 5),
            (21, "yet another brand new document with its own vocabulary stream " * 4),
        ],
        "doc_id long, text string",
    )
    dedup_index_apply(b2, 2, idx)
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == {1, 4, 11, 21}
    dec2 = {r["doc_id"]: (r["status"], r["dup_of"])
            for r in spark.read.parquet(f"{idx}/decisions/batch=2").collect()}
    assert dec2[20] == ("dup_of_index", 11) and dec2[21] == ("kept", None)


def test_dedup_index_streaming_e2e(spark, tmp_path):
    """The dedup index behind a real file stream: foreachBatch passes
    Spark's own batch ids, the checkpoint scopes each file to one batch,
    and cross-batch dups are dropped exactly as in the direct-call
    contract."""
    from erpl_web_spark.operators.dedup import dedup_index_apply, read_dedup_index

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: dedup_index_apply(df, bid, idx)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [(1, base + "one"), (2, base.replace("lazy", "sleepy") + "one")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == {1}

    spark.createDataFrame(
        [(10, base.replace("dog", "cat") + "one"),
         (11, "fresh second batch subject matter entirely its own topic " * 5)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()  # same checkpoint: only the new file forms batch 1
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == {1, 11}


def test_dedup_index_compaction(spark, tmp_path):
    """Compaction merges old deltas without changing the visible index,
    and later batches still dedup against compacted history."""
    from erpl_web_spark.operators.dedup import (
        dedup_index_apply,
        dedup_index_compact,
        read_dedup_index,
    )
    import os

    idx = str(tmp_path / "idx")
    mk = lambda i, t: spark.createDataFrame([(i, t)], "doc_id long, text string")  # noqa: E731
    texts = {
        1: "alpha document with its very own distinctive vocabulary stream " * 5,
        2: "beta subject matter covering an unrelated topic entirely here " * 5,
        3: "gamma third topic with yet another disjoint set of words used " * 5,
    }
    for b, (i, t) in enumerate(texts.items()):
        dedup_index_apply(mk(i, t), b, idx)
    before = {r["doc_id"] for r in read_dedup_index(spark, idx).collect()}
    assert before == {1, 2, 3}

    merged = dedup_index_compact(spark, idx, keep_latest=1)
    assert merged == 2
    # merged generation dir committed via manifest redirect; the
    # merged-away delta's dir is gone
    dirs = sorted(d for d in os.listdir(idx) if d.startswith("batch="))
    assert dirs == ["batch=0.c1", "batch=2"]
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == before

    # a near-dup of compacted history is still caught
    dedup_index_apply(mk(10, texts[1].replace("alpha", "alpha2")), 3, idx)
    dec = {r["doc_id"]: (r["status"], r["dup_of"])
           for r in spark.read.parquet(f"{idx}/decisions/batch=3").collect()}
    assert dec[10] == ("dup_of_index", 1)
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == before


def test_substring_dup_report_cross_doc_only(spark):
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    rows = [
        (1, span + " one unique tail here for doc one indeed"),
        (2, "doc two leading words then " + span),
        # internal repeat of its own 10-gram, but nothing cross-doc:
        (3, ("solo mono duo trio quad penta hexa hepta octo nona " * 2).strip()),
        (4, "too short"),  # < 10 tokens -> zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import substring_dup_report

    got = {r["doc_id"]: r for r in substring_dup_report(df, "doc_id", "text", k=10).collect()}
    assert len(got) == 4
    # shared span -> at least the one common 10-gram flagged in both docs
    for d in (1, 2):
        assert got[d]["n_dup_grams"] >= 1
        assert 0.0 < got[d]["dup_frac"] <= 1.0
        n_toks = len(rows[d - 1][1].split())
        assert got[d]["n_grams"] == n_toks - 9
    # within-doc repetition alone is NOT cross-doc duplication
    assert got[3]["n_grams"] == 11
    assert got[3]["n_dup_grams"] == 0
    # sub-k doc backfilled with zeros
    assert got[4]["n_grams"] == 0 and got[4]["dup_frac"] == 0.0


def test_containment_finds_doc_inside_doc(spark):
    short = "the quick brown fox jumps over the lazy dog today"
    long = short + " " + " ".join(f"filler{i} padding{i} extra{i}" for i in range(30))
    rows = [(1, short), (2, long), (3, "completely unrelated content " * 10)]
    df = spark.createDataFrame([(i, t, "en") for i, t in rows], "doc_id long, text string, lang string")
    from erpl_web_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    pairs = containment_pairs(df, "doc_id", "text", ["lang"], shingle_k=3, threshold=0.8).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["containment"] == 1.0  # every shingle of the short doc is in the long one
    assert pairs[0]["jaccard"] < 0.5  # symmetric Jaccard misses this pair
    jac = ngram_jaccard_pairs(df, "doc_id", "text", ["lang"], shingle_k=3, threshold=0.5)
    assert jac.count() == 0


def test_pairwise_contamination_attributes_the_leaked_item(spark):
    bench_q = "what is the capital of france paris is the capital"
    other_q = "name the largest planet jupiter is the largest planet"
    leaked = "intro words here " + bench_q + " " + " ".join(f"tail{i} pad{i}" for i in range(20))
    # scattered: borrows half its shingles from EACH bench item -> pooled
    # containment high, but no single item is mostly contained
    scattered = "what is the capital of france name the largest planet"
    clean = "completely unrelated training document about something else entirely " * 3
    bench = spark.createDataFrame(
        [(100, bench_q), (101, other_q)], "bench_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, leaked), (2, scattered), (3, clean)], "doc_id long, text string"
    )
    from erpl_web_spark.operators.curation import pairwise_contamination

    got = {
        (r["doc_id"], r["bench_id"]): r
    for r in pairwise_contamination(train, bench, threshold=0.9).collect()}
    assert set(got) == {(1, 100)}  # the embedded item, attributed; scattered doc absent
    assert got[(1, 100)]["containment_bench"] == 1.0
    assert got[(1, 100)]["jaccard"] < 0.5
    # at a mid threshold the scattered doc matches each item only partially
    mid = pairwise_contamination(train, bench, threshold=0.7)
    assert mid.where(F.col("doc_id") == 2).count() == 0


def test_substring_dup_report_matches_python_model(spark):
    import random
    from collections import defaultdict

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]  # tiny vocab -> real gram collisions
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
            for i in range(60)]
    k = 5
    gram_docs = defaultdict(set)
    per_doc = {}
    for i, t in docs:
        toks = [w for w in t.lower().split() if w]
        gs = [tuple(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        per_doc[i] = gs
        for g in gs:
            gram_docs[g].add(i)
    expected = {}
    for i, gs in per_doc.items():
        nd = sum(1 for g in gs if len(gram_docs[g]) >= 2)
        expected[i] = (len(gs), nd, nd / len(gs) if gs else 0.0)

    from erpl_web_spark.operators.dedup import substring_dup_report

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
           for r in substring_dup_report(df, "doc_id", "text", k=k).collect()}
    assert got == expected


def test_containment_pairs_match_python_model(spark):
    import itertools
    import random

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
            for i in range(40)]
    sets = {}
    for i, t in docs:
        toks = t.lower().split()
        sets[i] = {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}
    expected = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        c = inter / min(len(sets[a]), len(sets[b]))
        if c >= 0.6:
            expected[(a, b)] = (c, inter / len(sets[a] | sets[b]))

    from erpl_web_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame([(i, t, "x") for i, t in docs],
                               "doc_id long, text string, lang string")
    got = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
           for r in containment_pairs(df, "doc_id", "text", ["lang"],
                                      shingle_k=3, threshold=0.6).collect()}
    assert set(got) == set(expected)
    for p, (c, j) in expected.items():
        assert got[p][0] == pytest.approx(c) and got[p][1] == pytest.approx(j)


def test_pairwise_contamination_matches_python_model(spark):
    import random

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    train = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
             for i in range(30)]
    bench = [(100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
             for i in range(6)]

    def sh(t):
        toks = t.lower().split()
        return {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}

    expected = {}
    for i, t in train:
        for b, bt in bench:
            a, bb = sh(t), sh(bt)
            inter = len(a & bb)
            if bb and inter / len(bb) >= 0.4:
                expected[(i, b)] = (inter, inter / len(a | bb), inter / len(bb))

    from erpl_web_spark.operators.curation import pairwise_contamination

    tdf = spark.createDataFrame(train, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "bench_id long, text string")
    got = {(r["doc_id"], r["bench_id"]): (r["inter"], r["jaccard"], r["containment_bench"])
           for r in pairwise_contamination(tdf, bdf, threshold=0.4).collect()}
    assert set(got) == set(expected)
    for p, (inter, j, c) in expected.items():
        assert got[p][0] == inter
        assert got[p][1] == pytest.approx(j) and got[p][2] == pytest.approx(c)


def test_substring_dup_report_caches_instance_table(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} " + "shared words in every doc here now " * 3) for i in range(5)],
        "doc_id long, text string",
    )
    from erpl_web_spark.operators.dedup import substring_dup_report

    out = substring_dup_report(df, "doc_id", "text", k=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the three instance-table consumers must read the cache, not re-run
    # the tokenize->k-gram->hash pass from the source
    assert plan.count("InMemoryRelation") >= 3


def test_remove_duplicated_spans(spark):
    span = "one two three four five six seven eight nine ten"  # exactly k=10 tokens
    rows = [
        (1, "uniqa uniqb " + span + " uniqc uniqd"),
        (2, span + " other tail words here entirely different"),
        (3, "nothing shared with anybody else at all in this one"),
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import remove_duplicated_spans

    got = {r["doc_id"]: r for r in remove_duplicated_spans(df, "doc_id", "text", k=10).collect()}
    assert got[1]["clean_text"] == "uniqa uniqb uniqc uniqd"
    assert got[1]["n_removed"] == 10 and got[1]["n_tokens"] == 14
    assert got[2]["clean_text"] == "other tail words here entirely different"
    assert got[2]["n_removed"] == 10
    assert got[3]["n_removed"] == 0
    assert got[3]["clean_text"] == rows[2][1]
    assert got[4]["clean_text"] == "short doc" and got[4]["n_removed"] == 0


def test_remove_duplicated_spans_overlapping_union(spark):
    # doc 1 and doc 2 share two OVERLAPPING 5-gram spans; the union of
    # covered positions is removed once, not twice
    shared = "a b c d e f"  # 6 tokens -> 5-grams 'a..e' and 'b..f' both cross-doc
    rows = [(1, "x1 " + shared + " y1"), (2, shared + " z1 z2")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.operators.dedup import remove_duplicated_spans

    got = {r["doc_id"]: r for r in remove_duplicated_spans(df, "doc_id", "text", k=5).collect()}
    assert got[1]["clean_text"] == "x1 y1" and got[1]["n_removed"] == 6
    assert got[2]["clean_text"] == "z1 z2" and got[2]["n_removed"] == 6


# --------------------------------------------------------------------------
# Fuzzy entity matching (operators.matching)
# --------------------------------------------------------------------------

def test_fuzzy_match_pairs_blocked_levenshtein(spark):
    rows = [
        (1, "red widget"),
        (2, "rd widget"),      # 1 edit from 'red widget', same block
        (3, "blue widget"),    # 3 edits from 'red widget'
        (4, "red bolt"),       # different block: never compared
        (5, "red widget"),     # duplicate name: dictionary dedups it
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    from erpl_web_spark.operators.matching import fuzzy_match_pairs

    got = {
        (r["name_a"], r["name_b"]): r["distance"]
        for r in fuzzy_match_pairs(df, "name", max_distance=2).collect()
    }
    assert got == {("rd widget", "red widget"): 1}
    # widening the budget reaches 'blue widget' but never crosses blocks
    wide = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_match_pairs(df, "name", max_distance=4).collect()
    }
    assert ("blue widget", "red widget") in wide
    assert not any("bolt" in a or "bolt" in b for a, b in wide)


def test_resolve_entities_assigns_cluster_canonical(spark):
    rows = [
        (1, "acme corp"),
        (2, "acme corp"),
        (3, "acmee corp"),   # typo of acme corp
        (4, "zenith corp"),  # same block, far away (distance > 2)
        (5, "lone widget"),  # no match partner at all
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    from erpl_web_spark.operators.matching import resolve_entities

    got = {r["id"]: r["canonical_name"] for r in resolve_entities(df, "name").collect()}
    assert got[1] == got[2] == got[3] == "acme corp"
    assert got[4] == "zenith corp"
    assert got[5] == "lone widget"


# --------------------------------------------------------------------------
# Snapshot diff (operators.cdc.snapshot_diff)
# --------------------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    from erpl_web_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        "id long, t string, u string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (4, "d", "z")],
        "id long, t string, u string",
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["t", "u"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_literal_null_string(spark):
    # (NULL) and ('null') must hash differently: the sentinel escape
    from erpl_web_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, t string")
    new = spark.createDataFrame([(1, "null")], "id long, t string")
    got = snapshot_diff(old, new, "id", ["t"]).collect()
    assert [(r["id"], r["status"]) for r in got] == [(1, "changed")]


def test_snapshot_diff_null_id_not_phantom_churn(spark):
    """ADVICE r13: a NULL-id row present in both snapshots with equal
    content must be UNCHANGED (dropped), not a phantom added+removed
    pair — the digest join is null-safe on the id. With changed
    content it reports exactly one 'changed' row carrying the NULL
    id."""
    from erpl_web_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(None, "a"), (1, "b")], "id string, t string"
    )
    same = spark.createDataFrame(
        [(None, "a"), (1, "b")], "id string, t string"
    )
    assert snapshot_diff(old, same, "id", ["t"]).count() == 0
    new = spark.createDataFrame(
        [(None, "A"), (1, "b")], "id string, t string"
    )
    got = snapshot_diff(old, new, "id", ["t"]).collect()
    assert [(r["id"], r["status"]) for r in got] == [(None, "changed")]


def test_apply_cdc_changes_null_op_upserts(spark):
    """ADVICE r13 (medium): a NULL op must UPSERT (the docstring
    contract — 'anything else upserts'), not vanish through
    three-valued ~isin logic; same for scd2_intervals, where a NULL-op
    change must open an interval like any upsert."""
    from erpl_web_spark.operators.cdc import apply_cdc_changes, scd2_intervals

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, t string")
    changes = spark.createDataFrame(
        [(1, "A", None), (2, "b", "D"), (3, "c", None)],
        "k long, t string, op string",
    )
    merged = apply_cdc_changes(base, changes, ["k"], op_col="op")
    assert sorted((r["k"], r["t"]) for r in merged.collect()) == [
        (1, "A"),
        (3, "c"),
    ]
    hist = spark.createDataFrame(
        [(1, "a", 1, "I"), (1, "b", 2, None), (1, None, 3, "D")],
        "k long, t string, seq long, op string",
    )
    rows = scd2_intervals(hist, ["k"], ["seq"], op_col="op").collect()
    # the NULL-op change at seq=2 opens an interval, closed by the delete
    assert sorted((r["seq"], r["end_seq"], r["is_current"]) for r in rows) == [
        (1, 2, False),
        (2, 3, False),
    ]


def test_apply_cdc_changes_validate_rejects_duplicate_keys(spark):
    """ADVICE r13: validate=True enforces the seq_cols=None
    key-uniqueness contract loudly instead of silently emitting
    duplicate key rows; a key-unique batch passes, and NULL-keyed rows
    still count toward uniqueness (struct-distinct, not bare
    count_distinct)."""
    import pytest

    from erpl_web_spark.operators.cdc import apply_cdc_changes

    base = spark.createDataFrame([("1", "a")], "k string, t string")
    dup = spark.createDataFrame(
        [("1", "x"), ("1", "y"), (None, "z"), (None, "w")],
        "k string, t string",
    )
    with pytest.raises(ValueError, match="duplicate key"):
        apply_cdc_changes(base, dup, ["k"], validate=True)
    ok = spark.createDataFrame(
        [("1", "x"), ("2", "y"), (None, "z")], "k string, t string"
    )
    merged = apply_cdc_changes(base, ok, ["k"], validate=True)
    assert merged.count() == 3


def test_snapshot_diff_feeds_apply_cdc_changes(spark):
    # diff(old, new) applied back onto old reproduces new exactly
    from erpl_web_spark.operators.cdc import apply_cdc_changes, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, t string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, t string"
    )
    diff = snapshot_diff(old, new, "id", ["t"])
    changes = diff.join(new, "id", "left").select(
        "id", "t", F.when(F.col("status") == "removed", "D").otherwise("U").alias("op")
    )
    merged = apply_cdc_changes(old, changes, ["id"], op_col="op")
    assert sorted((r["id"], r["t"]) for r in merged.collect()) == sorted(
        (r["id"], r["t"]) for r in new.collect()
    )


# --------------------------------------------------------------------------
# Leakage-safe split (operators.curation.leak_safe_split)
# --------------------------------------------------------------------------

def test_leak_safe_split_keeps_clusters_together(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # chain 0-1-2, pair (10, 11), everything else isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    from erpl_web_spark.operators.curation import leak_safe_split

    out = leak_safe_split(
        docs, "doc_id", pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # cluster members share a group key AND a split
    assert rows[0]["group_key"] == rows[1]["group_key"] == rows[2]["group_key"] == 0
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[10]["group_key"] == rows[11]["group_key"] == 10
    assert rows[10]["split"] == rows[11]["split"]
    # unclustered docs key on their own id
    assert rows[50]["group_key"] == 50
    # and the assignment is the same rule hash_split applies to raw ids
    from erpl_web_spark.operators.text import hash_split

    solo = hash_split(
        docs.where(F.col("doc_id") == 50).withColumnRenamed("doc_id", "group_key"),
        "group_key",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=7,
    ).collect()[0]["split"]
    assert rows[50]["split"] == solo


# --------------------------------------------------------------------------
# Semantic decontamination (operators.curation.semantic_decontaminate)
# --------------------------------------------------------------------------

def test_semantic_decontaminate_flags_near_eval_vectors(spark):
    # centroids at ids 0 (x-axis) and 50 (y-axis); train 101 ~ eval 99
    # (the eval id must not be ≡ 0 mod stride, or it becomes its own cell)
    rows = [
        (0, [1.0, 0.0]),     # centroid cell 0
        (50, [0.0, 1.0]),    # centroid cell 50
        (99, [0.9, 0.1]),    # eval probe, assigns to cell 0
        (101, [0.89, 0.11]), # train vector, cell 0, ~eval
        (102, [0.1, 0.9]),   # train vector, cell 50: different cell, never compared
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from erpl_web_spark.operators.curation import semantic_decontaminate

    evals = df.where(F.col("vec_id") == 99)
    train = df.where(F.col("vec_id") != 99)
    got = semantic_decontaminate(
        train, evals, "vec_id", "embedding", threshold=0.9, stride=50
    ).collect()
    flagged = {(r["train_id"], r["eval_id"]) for r in got}
    assert (101, 99) in flagged
    assert (0, 99) in flagged  # the centroid itself is near the probe
    assert all(t != 102 for t, _ in flagged)
    assert all(0.9 <= r["cosine"] <= 1.0 for r in got)


# --------------------------------------------------------------------------
# BPE tokenizer training (operators.text.bpe_train / bpe_encode)
# --------------------------------------------------------------------------

def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Pure-Python Sennrich BPE reference: same tie-breaks (count desc,
    then lexicographic pair asc), same greedy left-to-right merge."""
    import collections

    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), c = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if c < min_pair_count:
            break
        merges.append((rank, a, b, c))
        newv = collections.Counter()
        for syms, n in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            newv[tuple(out)] += n
        vocab = newv
    return merges


def test_bpe_train_matches_python_reference(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from erpl_web_spark.operators.text import bpe_train

    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(df, num_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(texts, 8)


def test_bpe_train_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([("aa bb",)], "text string")
    from erpl_web_spark.operators.text import bpe_train

    # every word occurs once: with min_pair_count=2, the only learnable
    # merges are within-word pairs of count >= 2... here each pair has
    # count 1 except none, so training stops immediately
    got = bpe_train(df, num_merges=5, min_pair_count=2).collect()
    assert got == []


def test_bpe_apply_merge_is_greedy_non_overlapping(spark):
    # 'aaaa' under merge (a,a) -> [aa, aa], never the overlapping [aa,a,a]
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    from erpl_web_spark.operators.text import bpe_encode

    enc = bpe_encode(df, [(1, "a", "a", 0)]).collect()[0]["bpe_syms"]
    assert enc == ["aa", "aa", "</w>"] * 3


def test_bpe_encode_uses_merges_in_rank_order(spark):
    texts = ["low low lower lowest"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from erpl_web_spark.operators.text import bpe_encode, bpe_train

    merges = bpe_train(df, num_merges=6, min_pair_count=1)
    enc = bpe_encode(df, merges).collect()[0]["bpe_syms"]
    # encoding a training word reproduces its trained segmentation:
    # 'low' must come out as one unit ending in </w> or ['low', '</w>']
    joined = "".join(enc)
    assert joined == "low</w>low</w>lower</w>lowest</w>"
    # determinism: re-training yields the identical table
    again = bpe_train(df, num_merges=6, min_pair_count=1)
    assert sorted(map(tuple, merges.collect())) == sorted(map(tuple, again.collect()))


def test_drift_metrics_streaming_end_to_end(spark, tmp_path):
    """The drift tier behind a REAL checkpointed stream: one export
    file per micro-batch -> foreachBatch metrics_apply; after two
    batches drift_report sees exactly one (prev, curr) pair, a
    re-delivered batch id leaves history unchanged (exactly-once per
    batch via the manifest guard), and a post-hoc direct replay call
    is a no-op."""
    import os

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.expectations import drift_report, metrics_apply

    src = str(tmp_path / "exports")
    hist = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "k long, v string"

    def sink(df, bid):
        metrics_apply(df, bid, hist, key_cols=["k"], rate_cols=["v"])

    def run():
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    def export(rows, name):
        d = src + "/tmp"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(d)
        for f in os.listdir(d):
            if f.endswith(".json"):
                os.rename(f"{d}/{f}", f"{src}/{name}.json")

    export([(1, "a"), (2, "b"), (3, "c"), (4, "d")], "export0")
    run()
    assert drift_report(spark, hist, {"n_rows": ("rel", 0.5)}) is None
    export([(1, "a"), (2, None)], "export1")
    run()
    rep = {
        r["metric"]: r
        for r in drift_report(
            spark, hist, {"n_rows": ("rel", 0.25), "null_rate:v": ("abs", 0.6)}
        ).collect()
    }
    # 4 -> 2 rows: rel delta 0.5 fails 0.25; null rate 0 -> 0.5 passes
    assert rep["n_rows"]["delta"] == 0.5 and rep["n_rows"]["passed"] == 0
    assert rep["null_rate:v"]["delta"] == 0.5 and rep["null_rate:v"]["passed"] == 1
    assert manifests.committed_versions(spark, hist, "metrics") == [0, 1]

    # crash-after-commit replay: same batch id, history unchanged
    metrics_apply(
        spark.createDataFrame([(9, "z")], schema), 1, hist,
        key_cols=["k"], rate_cols=["v"],
    )
    assert manifests.committed_versions(spark, hist, "metrics") == [0, 1]
    rep2 = drift_report(spark, hist, {"n_rows": ("rel", 0.25)}).first()
    assert rep2["curr_value"] == 2.0  # still batch 1's metrics, not 9/z


def test_snapshot_stream_to_changes_end_to_end(spark, tmp_path):
    """Stream of full snapshot exports -> change feed: first export is
    all 'added', the second yields exactly its churn, and only digests
    persist as state. Driven through a real checkpointed file stream
    (one export file per micro-batch), then a direct replay call proves
    batch idempotence."""
    import os

    from erpl_web_spark.operators.cdc import (
        read_latest_snapshot,
        snapshot_stream_to_changes,
    )

    src = str(tmp_path / "exports")
    state = str(tmp_path / "state")
    changes = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "id long, t string"

    def sink(df, bid):
        snapshot_stream_to_changes(df, bid, state, changes, "id", ["t"])

    def run():
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    spark.createDataFrame(
        [(1, "a"), (2, "b")], schema
    ).coalesce(1).write.mode("overwrite").json(src + "/e0")
    # the file source walks files, not directories-with-markers; point a
    # glob at the payload files
    os.rename(src + "/e0", src + "/tmp0")
    for f in os.listdir(src + "/tmp0"):
        if f.endswith(".json"):
            os.rename(src + f"/tmp0/{f}", src + "/export0.json")
    run()
    got0 = spark.read.parquet(changes)
    assert {(r["id"], r["status"]) for r in got0.collect()} == {
        (1, "added"), (2, "added")
    }

    # second export: 1 unchanged, 2 changed, 3 added — 2nd run on the
    # SAME checkpoint processes only the new file
    spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], schema
    ).coalesce(1).write.mode("overwrite").json(src + "/tmp1")
    for f in os.listdir(src + "/tmp1"):
        if f.endswith(".json"):
            os.rename(src + f"/tmp1/{f}", src + "/export1.json")
    run()
    feed = spark.read.parquet(changes)
    assert {(r["id"], r["status"], r["batch_id"]) for r in feed.collect()} == {
        (1, "added", 0), (2, "added", 0),
        (2, "changed", 1), (3, "added", 1),
    }
    # state is digests only
    st = read_latest_snapshot(spark, state)
    assert set(st.columns) == {"id", "digest"}
    assert st.count() == 3

    # replay batch 1 (crash-after-write recovery): identical feed + state
    b1 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], schema)
    snapshot_stream_to_changes(b1, 1, state, changes, "id", ["t"])
    feed2 = spark.read.parquet(changes)
    assert {(r["id"], r["status"], r["batch_id"]) for r in feed2.collect()} == {
        (1, "added", 0), (2, "added", 0),
        (2, "changed", 1), (3, "added", 1),
    }


# --------------------------------------------------------------------------
# Randomized Python-model cross-checks for the session-5 operators
# --------------------------------------------------------------------------

def test_snapshot_diff_matches_dict_model_randomized(spark):
    import random

    rng = random.Random(404)
    old_rows = {i: rng.choice("abcde") for i in range(200)}
    new_rows = {}
    for i, v in old_rows.items():
        r = rng.random()
        if r < 0.15:
            continue                      # removed
        if r < 0.35:
            new_rows[i] = v + "!"         # changed
        else:
            new_rows[i] = v               # unchanged
    for i in range(200, 230):
        new_rows[i] = rng.choice("abcde")  # added

    want = {}
    for i in set(old_rows) | set(new_rows):
        if i not in old_rows:
            want[i] = "added"
        elif i not in new_rows:
            want[i] = "removed"
        elif old_rows[i] != new_rows[i]:
            want[i] = "changed"

    from erpl_web_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(list(old_rows.items()), "id long, t string")
    new = spark.createDataFrame(list(new_rows.items()), "id long, t string")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["t"]).collect()}
    assert got == want


def test_bpe_segmentation_is_lossless_randomized(spark):
    """Encoding invariant: for ANY corpus and ANY learned merge table,
    concatenating a document's BPE symbols reproduces its tokens with
    '</w>' terminators — merges re-segment, never alter, the text."""
    import random

    rng = random.Random(77)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    docs = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 20))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from erpl_web_spark.operators.text import EOW, bpe_encode, bpe_train, tokens_expr
    from pyspark.sql import functions as F

    merges = bpe_train(df, num_merges=15, min_pair_count=2)
    enc = bpe_encode(df, merges)
    rows = enc.select(
        "doc_id",
        F.concat_ws("", "bpe_syms").alias("joined"),
        F.concat_ws("", F.transform(
            tokens_expr("text"), lambda w: F.concat(w, F.lit(EOW))
        )).alias("want"),
    ).collect()
    assert rows and all(r["joined"] == r["want"] for r in rows)


def test_leak_safe_split_randomized_component_invariant(spark):
    import random

    rng = random.Random(99)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]

    # Python union-find model
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    from erpl_web_spark.operators.curation import leak_safe_split

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = leak_safe_split(
        docs, "doc_id", pairs, {"train": 0.7, "val": 0.3}, seed=3
    )
    rows = {r["doc_id"]: (r["group_key"], r["split"]) for r in out.collect()}
    assert len(rows) == n
    for i in range(n):
        for j in range(n):
            if find(i) == find(j):
                assert rows[i][1] == rows[j][1], (i, j)
    # group keys are the component minimum (or own id when isolated)
    touched = {x for e in edges for x in e}
    for i in range(n):
        comp_min = min(x for x in range(n) if find(x) == find(i))
        assert rows[i][0] == (comp_min if i in touched or comp_min != i else i)


def test_fuzzy_match_pairs_matches_python_model(spark):
    import random

    rng = random.Random(12)
    nouns = ["widget", "bolt", "ring"]
    adjs = ["red", "rd", "reed", "blue", "blu", "green", "grn"]
    names = sorted({f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(40)})

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if a.rsplit(" ", 1)[-1] == b.rsplit(" ", 1)[-1] and lev(a, b) <= 3
    }

    from erpl_web_spark.operators.matching import fuzzy_match_pairs

    df = spark.createDataFrame([(x,) for x in names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["distance"])
        for r in fuzzy_match_pairs(df, "name", max_distance=3).collect()
    }
    assert got == want


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime bloom-filter join pruning — the shuffle-side cousin of
    partition pruning: a selective dim filter injects a bloom filter of
    the dim's join keys into the FACT side scan, so non-matching fact
    rows die at the scan instead of riding the join shuffle. At 100 TB
    this is a first-class lever (thresholds default to 10 GB scans; here
    they are lowered to demonstrate on test data). Results must be
    byte-identical with and without the filter."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    def q():
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
        return (
            lineitem.join(sel, lineitem["l_orderkey"] == sel["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        filtered = q()
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "bloom filter was not injected"
        got = {(r["o_orderpriority"], r["n"]) for r in filtered.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    want = {(r["o_orderpriority"], r["n"]) for r in q().collect()}
    assert got == want and got


def test_dynamic_partition_pruning_prunes_fact_scan(spark, tmp_path):
    """Dynamic partition pruning: a broadcast-able dim filter on the
    partition column injects a runtime subquery into the partitioned
    fact scan, so only matching partitions are read — static partition
    pruning's runtime twin, and the first join lever to check on a
    partitioned 100 TB fact table. Result parity asserted against the
    unpruned formulation."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    out = str(tmp_path / "fact")
    lineitem.withColumn("ship_year", F.year("l_shipdate")).write.partitionBy(
        "ship_year"
    ).parquet(out)
    fact = spark.read.parquet(out)
    years = sorted(
        r["ship_year"] for r in fact.select("ship_year").distinct().collect()
    )
    pick = years[len(years) // 2]
    dim = spark.createDataFrame(
        [(y, "pick" if y == pick else "skip") for y in years],
        "ship_year int, tag string",
    )
    j = fact.join(dim.where(F.col("tag") == "pick"), "ship_year")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP subquery was not injected"
    got = j.count()
    want = lineitem.where(F.year("l_shipdate") == pick).count()
    assert got == want and got > 0


def test_audio_chunks_overlap_and_ragged_tail(spark):
    from erpl_web_spark.operators.multimodal import audio_chunks

    media = spark.createDataFrame(
        [(1, bytearray(b"x"), ("audio", "fake", 0, 0, 1000)),
         (2, bytearray(b"y"), ("audio", "fake", 0, 0, 200))],
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>",
    )
    # 1000ms at 400ms windows / 300ms hop: starts 0,300,600 (600+400=1000
    # exact) — and a shorter-than-window clip yields ONE ragged window
    got = audio_chunks(media, window_ms=400, stride_ms=300).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["start_ms"], r["dur_ms"])
        )
    assert sorted(by_id[1]) == [(0, 0, 400), (1, 300, 400), (2, 600, 400)]
    assert sorted(by_id[2]) == [(0, 0, 200)]
    # non-overlapping default: stride == window, ragged tail
    plain = audio_chunks(media.where(F.col("media_id") == 1), window_ms=300).collect()
    assert sorted((r["chunk_idx"], r["start_ms"], r["dur_ms"]) for r in plain) == [
        (0, 0, 300), (1, 300, 300), (2, 600, 300), (3, 900, 100)
    ]


def test_temperature_budgets_sqrt_weighting(spark):
    import math

    from erpl_web_spark.operators.curation import temperature_budgets

    rows = [(f"d{i}", s, 10) for s, n in [("big", 90), ("small", 10)] for i in range(n)]
    df = spark.createDataFrame(
        [(f"{s}-{i}", s, t) for i, (s2, s, t) in enumerate(rows)],
        "doc_id string, source string, n_toks int",
    )
    got = temperature_budgets(df, "source", "n_toks", total_budget=1000)
    wb, ws = math.isqrt(900), math.isqrt(100)
    assert got == {
        "big": 1000 * wb // (wb + ws),
        "small": 1000 * ws // (wb + ws),
    }
    # alpha=0.5 upsamples the small source vs proportional (which would
    # give it 10%): sqrt weighting gives it 25%
    assert got["small"] / 1000 == 0.25


def test_audio_chunks_sparse_sampling_no_phantom_windows(spark):
    # stride > window (sparse sampling): no start past the end, no
    # negative durations; stride_ms=0 is rejected, not silently coerced
    import pytest as _pytest

    from erpl_web_spark.operators.multimodal import audio_chunks

    media = spark.createDataFrame(
        [(1, bytearray(b"x"), ("audio", "fake", 0, 0, 25000))],
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>",
    )
    got = sorted(
        (r["chunk_idx"], r["start_ms"], r["dur_ms"])
        for r in audio_chunks(media, window_ms=1000, stride_ms=10000).collect()
    )
    assert got == [(0, 0, 1000), (1, 10000, 1000), (2, 20000, 1000)]
    with _pytest.raises(ValueError):
        audio_chunks(media, window_ms=500, stride_ms=0)


def test_snapshot_digests_injective_on_separator_shaped_values(spark):
    # ('a\x1fb', 'c') vs ('a', 'b\x1fc') must NOT collide: per-column
    # md5 components are fixed-width, so no join-separator ambiguity
    from erpl_web_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, "a\x1fb", "c")], "id long, x string, y string")
    new = spark.createDataFrame([(1, "a", "b\x1fc")], "id long, x string, y string")
    got = snapshot_diff(old, new, "id", ["x", "y"]).collect()
    assert [(r["id"], r["status"]) for r in got] == [(1, "changed")]


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    from erpl_web_spark.operators.text import tfidf_top_terms

    rows = [
        (1, "apple apple apple shared shared"),
        (2, "banana banana shared shared shared"),
        (3, "cherry shared apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
        for r in tfidf_top_terms(df, k=2, min_df=1).collect()
    }
    # doc 1: apple tf=3 df=2 -> 4.5; shared tf=2 df=3 -> 2.0
    assert got[(1, 1)] == ("apple", 3, 2)
    assert got[(1, 2)] == ("shared", 2, 3)
    # doc 2: banana tf=2 df=1 -> 6.0 beats shared tf=3 df=3 -> 3.0
    assert got[(2, 1)] == ("banana", 2, 1)
    # doc 3: cherry tf=1 df=1 -> 3.0; apple tf=1 df=2 -> 1.5
    assert got[(3, 1)] == ("cherry", 1, 1)
    assert got[(3, 2)] == ("apple", 1, 2)
    # min_df=2 prunes the hapax terms entirely
    pruned = {
        (r["doc_id"], r["term"])
        for r in tfidf_top_terms(df, k=2, min_df=2).collect()
    }
    assert all(t in ("apple", "shared") for _, t in pruned)


def test_gopher_rules_individual_triggers(spark):
    from erpl_web_spark.operators.text import with_gopher_rules

    good = " ".join(
        "the quick brown fox and some other normal words for all of it".split()
        * 8
    )  # 96 words, sane lengths, stopwords present
    rows = [
        (1, good),
        (2, "short text"),                                   # word count
        (3, " ".join(["supercalifragilistic"] * 60)),        # mean len + stopwords
        (4, good + " " + "# " * 30),                         # symbol ratio
        (5, "\n".join(["- bullet line here ok"] * 10)),      # bullets (and count)
        (6, good.replace(" ", "... \n", 40)),                # ellipsis lines
        (7, " ".join(["1234"] * 80)),                        # alpha ratio + stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_gopher_rules(df).collect()}
    assert got[1]["gopher_keep"]
    assert not got[2]["g_word_count"] and not got[2]["gopher_keep"]
    assert not got[3]["g_mean_word_len"]
    assert not got[4]["g_symbol_ratio"]
    assert not got[5]["g_bullet_ratio"]
    assert not got[6]["g_ellipsis_ratio"]
    assert not got[7]["g_alpha_ratio"] and not got[7]["g_stopword_hits"]


def test_clean_lines_rules(spark):
    from erpl_web_spark.operators.text import clean_lines

    text = "\n".join([
        "a good long line of content here",
        "too short",
        "Enable JavaScript to continue",
        "This site uses cookie banners everywhere",
        "All Rights Reserved by someone",
        "",
        "another perfectly fine content line",
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = clean_lines(df).collect()[0]
    assert got["n_lines"] == 6  # empty line excluded from the count
    assert got["n_lines_kept"] == 2
    assert got["clean_text"] == (
        "a good long line of content here\nanother perfectly fine content line"
    )


def test_embedding_index_apply_dedups_within_and_across_batches(spark, tmp_path):
    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        read_embedding_index,
    )

    path = str(tmp_path / "semidx")
    schema = "vec_id long, embedding array<float>"
    # batch 0: two near-identical vectors (in-batch dup) + one distinct;
    # ids 0/50 become the stored quantizer's centroids
    b0 = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (50, [0.0, 1.0, 0.0]),
            (51, [0.01, 0.999, 0.0]),   # ~dup of 50, same cell
            (7, [0.7, 0.7, 0.0]),
        ],
        schema,
    )
    embedding_index_apply(b0, 0, path, threshold=0.98)
    idx0 = read_embedding_index(spark, path)
    kept0 = {r["vec_id"] for r in idx0.collect()}
    assert 50 in kept0 and 51 not in kept0 and 0 in kept0 and 7 in kept0

    dec0 = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in spark.read.parquet(f"{path}/decisions/batch=0").collect()
    }
    assert dec0[51] == ("dup_in_batch", 50)
    assert dec0[50][0] == "kept"

    # batch 1: a near-dup of indexed 50, and a genuinely new vector
    b1 = spark.createDataFrame(
        [(100, [0.0, 0.998, 0.02]), (101, [-1.0, 0.0, 0.0])], schema
    )
    embedding_index_apply(b1, 1, path, threshold=0.98)
    kept_all = {r["vec_id"] for r in read_embedding_index(spark, path).collect()}
    assert 100 not in kept_all and 101 in kept_all
    dec1 = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in spark.read.parquet(f"{path}/decisions/batch=1").collect()
    }
    assert dec1[100] == ("dup_of_index", 50)
    assert dec1[101][0] == "kept"

    # replay batch 1: identical index + decisions (reads deltas < 1 only)
    embedding_index_apply(b1, 1, path, threshold=0.98)
    again = {r["vec_id"] for r in read_embedding_index(spark, path).collect()}
    assert again == kept_all
    dec1b = {
        r["vec_id"]: (r["status"], r["dup_of"])
        for r in spark.read.parquet(f"{path}/decisions/batch=1").collect()
    }
    assert dec1b == dec1
    # the quantizer was persisted once (positional rule: one centroid
    # per 50 rows of the 4-row first batch) and reused
    assert spark.read.parquet(f"{path}/centroids").count() == 1


def test_embedding_index_streaming_e2e(spark, tmp_path):
    """The semantic index behind a real file stream: the stored
    quantizer derived from batch 0 blocks batch 1 consistently, and a
    cross-batch near-dup vector is dropped exactly as in the
    direct-call contract."""
    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        read_embedding_index,
    )

    src = tmp_path / "vsrc"
    src.mkdir()
    idx = str(tmp_path / "vidx")
    ckpt = str(tmp_path / "vckpt")
    schema = "vec_id long, embedding array<float>"

    def run_stream():
        (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda df, bid: embedding_index_apply(df, bid, idx, threshold=0.98)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (50, [0.0, 1.0, 0.0]), (7, [0.7, 0.7, 0.0])],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert {r["vec_id"] for r in read_embedding_index(spark, idx).collect()} == {0, 50, 7}

    spark.createDataFrame(
        [(100, [0.0, 0.999, 0.01]), (101, [-1.0, 0.0, 0.0])], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()  # same checkpoint: only the new file forms batch 1
    assert {r["vec_id"] for r in read_embedding_index(spark, idx).collect()} == {0, 50, 7, 101}


def test_embedding_index_quantizer_positional_and_empty_guard(spark, tmp_path):
    """Regression: a first batch whose ids avoid multiples of stride
    must still yield a usable quantizer (positional rule), and an empty
    first batch raises instead of persisting an empty index-corrupting
    centroid table."""
    import pytest as _pytest

    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        read_embedding_index,
    )

    schema = "vec_id long, embedding array<float>"
    path = str(tmp_path / "idx1")
    b0 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (49, [0.0, 1.0])], schema
    )
    embedding_index_apply(b0, 0, path, threshold=0.98, stride=50)
    assert spark.read.parquet(f"{path}/centroids").count() == 1
    kept = {r["vec_id"] for r in read_embedding_index(spark, path).collect()}
    assert kept == {1, 49}  # 2 is an in-batch dup of 1; dedup DID run

    empty = spark.createDataFrame([], schema)
    with _pytest.raises(ValueError, match="empty first batch"):
        embedding_index_apply(empty, 0, str(tmp_path / "idx2"), stride=50)


def test_embedding_index_legacy_state_guard_runs_before_any_write(spark, tmp_path):
    """Regression (round-6 advice): a FULLY pre-manifest index dir
    (batch deltas + quantizer with _SUCCESS, no _manifests) must raise
    at entry — BEFORE the quantizer derivation commits a manifest and
    creates ``_manifests/``, which would make the legacy history
    permanently invisible and silently replace the quantizer. After
    adoption, the stored legacy quantizer is reused (never re-derived)
    and legacy deltas stay in the index."""
    import os

    import pytest as _pytest

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        read_embedding_index,
    )

    path = str(tmp_path / "legacy_idx")
    spark.createDataFrame(
        [(10, [1.0, 0.0], 1.0, 1)],
        "vec_id long, embedding array<float>, nrm double, cell long",
    ).write.parquet(f"{path}/batch=0")
    spark.createDataFrame(
        [(1, [1.0, 0.0])], "cell long, centroid_vec array<float>"
    ).write.parquet(f"{path}/centroids")

    b1 = spark.createDataFrame(
        [(11, [0.999, 0.01]), (12, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(RuntimeError, match="adopt_success_markers"):
        embedding_index_apply(b1, 1, path, threshold=0.98)
    # the probe must fire before ANY write: no protocol marker, and the
    # legacy quantizer is untouched
    assert not os.path.exists(f"{path}/_manifests")
    assert spark.read.parquet(f"{path}/centroids").count() == 1

    # partial adoption (marker exists, deltas still unmanifested) must
    # hit the quantizer guard, not silently derive a second quantizer
    assert manifests.adopt_success_markers(spark, path, "batch") == [0]
    manifests.uncommit_version(spark, path, "batch", 0)  # re-open the gap
    with _pytest.raises(RuntimeError, match="pre-manifest quantizer"):
        embedding_index_apply(b1, 1, path, threshold=0.98)

    # full adoption: batch manifests + the one-time centroid commit
    manifests.commit_version(spark, path, "batch", 0)
    manifests.commit_version(spark, path, "centroids", 0)
    embedding_index_apply(b1, 1, path, threshold=0.98)
    kept = {r["vec_id"] for r in read_embedding_index(spark, path).collect()}
    assert kept == {10, 12}  # 11 is a dup of legacy 10; history retained


def test_hashed_features_counts_and_bounds(spark):
    """Hashing-trick contract: per-doc bucket counts sum to the doc's
    token count, buckets stay in [0, num_buckets), and identical tokens
    always fold into the same bucket."""
    from erpl_web_spark.operators.text import hashed_features

    df = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "alpha  alpha"), (3, "")],
        "doc_id long, text string",
    )
    rows = hashed_features(df, num_buckets=8).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r["bucket"] < 8
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["cnt"]
    assert by_doc == {1: 4, 2: 2}  # empty doc yields no rows
    # 'alpha' in doc 1 and doc 2 lands in the same bucket
    alpha_buckets = {
        r["bucket"] for r in rows if r["cnt"] >= 2  # alpha is the only repeat
    }
    assert len(alpha_buckets) == 1


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: two documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; short docs (< k chars)
    yield none; docs with fewer than w grams yield exactly one (min of
    the shrunken window)."""
    from erpl_web_spark.operators.text import winnow_fingerprints

    shared = "the common passage that is long enough to guarantee overlap"
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix A"),
            (2, "totally different start " + shared + " other end"),
            (3, "zzz unrelated content qqq with no overlap at all here"),
            (4, "ab"),        # < k chars -> no fingerprints
            (5, "abcdef"),    # 2 grams < w -> one shrunken-window min
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    sets = {
        d: {r["fp"] for r in rows_}
        for d, rows_ in [
            (d, fps.where(F.col("doc_id") == d).collect()) for d in [1, 2, 3, 4, 5]
        ]
    }
    assert sets[1] & sets[2], "shared >= k+w-1 substring must share a fingerprint"
    assert not sets[4]
    assert len(sets[5]) == 1
    # fingerprint sets are deterministic across recomputation
    again = {r["fp"] for r in winnow_fingerprints(df, k=5, w=4)
             .where(F.col("doc_id") == 1).collect()}
    assert again == sets[1]


def test_winnow_overlap_pairs_finds_planted_passage(spark):
    """A passage shared by exactly two documents produces that pair;
    corpus-wide boilerplate fingerprints are removed by the max_df cap
    so they alone cannot create pairs."""
    from erpl_web_spark.operators.text import winnow_overlap_pairs

    boiler = "all rights reserved contact us terms of service "
    passage = "a genuinely distinctive shared passage of real content"
    rows = [
        (1, boiler + "doc one body text " + passage),
        (2, boiler + passage + " trailing content for doc two"),
        (3, boiler + "completely independent third text about gardens"),
        (4, boiler + "nothing in common here besides the footer chrome"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # max_df=2: boilerplate fps appear in 4 docs -> dropped; passage fps
    # appear in 2 docs -> kept
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=3, max_df=2).collect()
    }
    assert pairs == {(1, 2)}


def test_chunk_documents_windows_cover_and_overlap(spark):
    """Chunk windows: stride = chunk - overlap, every token covered,
    consecutive chunks share exactly `overlap` tokens, final chunk may
    be short, empty docs vanish, single-token docs yield one chunk."""
    import pytest as _pytest

    from erpl_web_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, words), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=10, overlap=4).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 6: starts 0,6,12,18 — a start at 24 would chunk only
    # tokens already inside chunk 3's overlap region (pure duplicate)
    assert [r["start_tok"] for r in d1] == [0, 6, 12, 18]
    assert [r["n_chunk_tokens"] for r in d1] == [10, 10, 10, 7]
    # consecutive chunks overlap by 4 tokens
    assert d1[0]["chunk_text"].split()[-4:] == d1[1]["chunk_text"].split()[:4]
    # full coverage: union of chunk tokens == all tokens
    covered = set()
    for r in d1:
        covered.update(r["chunk_text"].split())
    assert covered == set(words.split())
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "solo"
    assert not [r for r in rows if r["doc_id"] == 3]
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_matryoshka_audit_detects_truncation_flip(spark):
    """Planted geometry: probe aligned with neighbor A on the prefix
    dims but with neighbor B overall — the truncated pick is A, the
    full pick is B, agree=0 and the regret columns expose the gap; a
    probe whose best match dominates in both spaces agrees."""
    from erpl_web_spark.operators.similarity import matryoshka_audit

    rows = [
        # probe 0: prefix points at A(10), full vector at B(11)
        (0, [1.0, 0.0, 0.3, 0.3]),
        (10, [1.0, 0.0, -0.5, -0.5]),   # prefix-identical, tail opposite
        (11, [0.8, 0.1, 0.3, 0.3]),     # slightly off prefix, same tail
        # probe 1: C(12) dominates in both spaces
        (1, [0.0, 1.0, 0.2, 0.0]),
        (12, [0.0, 1.0, 0.2, 0.0]),
        (13, [0.5, -0.5, 0.0, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.where(F.col("vec_id") < 2)
    out = {r["probe_id"]: r for r in matryoshka_audit(emb, probes, dims=2).collect()}
    assert out[0]["trunc_top1"] == 10 and out[0]["full_top1"] == 11
    assert out[0]["agree"] == 0
    assert out[0]["full_cos_best"] > out[0]["full_cos_of_trunc_pick"]
    assert out[1]["trunc_top1"] == 12 and out[1]["full_top1"] == 12
    assert out[1]["agree"] == 1


def test_blas_top_k_probe_only_partition_yields_empty_not_crash(spark):
    """Regression: a shortlist batch whose every candidate is a masked
    self-match must be SKIPPED, not yielded as an empty frame — pandas
    types an empty list column float64 and Arrow cannot convert that to
    list<float> (crashed any partition holding only probe vectors)."""
    from erpl_web_spark.operators.similarity import cosine_top_k_blas

    solo = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert cosine_top_k_blas(solo, solo, k=3).collect() == []


def test_dhash_media_pairs_end_to_end_and_pigeonhole(spark):
    """dHash plumbing: identical payloads produce identical hashes and
    a hamming-0 pair end-to-end; hand-built hashes within 3 bits pair
    via the band pigeonhole even when the flipped bits span bands;
    4-bit-distant hashes are candidate-generated but verify-filtered."""
    from erpl_web_spark.operators.multimodal import (
        dhash_dup_pairs,
        dhash_media,
        documents_as_media,
    )

    docs = spark.createDataFrame(
        [(1, "identical payload body"), (2, "identical payload body"),
         (3, "a completely different text")],
        "doc_id long, text string",
    )
    hashes = dhash_media(documents_as_media(docs))
    rows = {r["media_id"]: (r["dhash_hi"], r["dhash_lo"]) for r in hashes.collect()}
    assert rows[1] == rows[2] and rows[1] != rows[3]
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in rows.values())
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dhash_dup_pairs(hashes).collect()}
    assert pairs == {(1, 2): 0}

    # pigeonhole: 3 flipped bits spanning three different bands still
    # share the fourth band; 4 flips in one band leave 3 shared bands
    # but fail the hamming verify
    base_hi, base_lo = 0x12345678, 0x9ABCDEF0
    h3 = spark.createDataFrame(
        [
            (10, base_hi, base_lo),
            (11, base_hi ^ 0x1 ^ 0x10000, base_lo ^ 0x1),   # 3 bits, 3 bands
            (12, base_hi ^ 0xF, base_lo),                    # 4 bits, 1 band
        ],
        "media_id long, dhash_hi long, dhash_lo long",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dhash_dup_pairs(h3, max_distance=3).collect()}
    assert got == {(10, 11): 3}

    # multi-probe (distance 4..7): 5 flips spread so EVERY band differs
    # (2,1,1,1) — invisible to the exact band join, caught by the
    # 1-bit probe ring; 8 flips arranged 2-per-band are not even
    # candidate-generated (each band differs by 2 > probe radius)
    h7 = spark.createDataFrame(
        [
            (20, base_hi, base_lo),
            (21, base_hi ^ 0x10003, base_lo ^ 0x10001),  # 5 bits: 2,1,1,1
            (22, base_hi ^ 0x30003, base_lo ^ 0x10003),  # 7 bits: 2,2,1,2
            (23, base_hi ^ 0x30003, base_lo ^ 0x30003),  # 8 bits: 2,2,2,2
        ],
        "media_id long, dhash_hi long, dhash_lo long",
    )
    assert dhash_dup_pairs(h7.where("media_id in (20, 21)"),
                           max_distance=3).count() == 0
    got7 = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in dhash_dup_pairs(h7, max_distance=7).collect()}
    assert got7[(20, 21)] == 5 and got7[(20, 22)] == 7
    assert (20, 23) not in got7  # 2 flips in every band: outside probes
    # variants pair with each other too (xor of masks is small)
    assert got7[(21, 22)] == 2 and got7[(22, 23)] == 1 and got7[(21, 23)] == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        dhash_dup_pairs(h3, max_distance=8)


def test_dhash_media_decoded_flag(spark):
    """with_decoded surfaces whether a REAL image decode produced the
    grid: on the stub path every row reports decoded=False (nothing
    was decoded — the hash is the deterministic sha256 stand-in), and
    the default 3-column schema is unchanged so oracle-pinned callers
    never see the extra column."""
    from erpl_web_spark.operators.multimodal import dhash_media, documents_as_media

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    media = documents_as_media(docs)
    assert dhash_media(media).columns == ["media_id", "dhash_hi", "dhash_lo"]
    flagged = dhash_media(media, with_decoded=True)
    assert flagged.columns == ["media_id", "dhash_hi", "dhash_lo", "decoded"]
    assert [r["decoded"] for r in flagged.collect()] == [False, False]


def test_media_and_embedding_index_compact(spark, tmp_path):
    """The generic manifest-redirect compaction works for the media and
    semantic indexes too: deltas merge into a redirected generation,
    the index union is unchanged, and the newest delta survives."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.multimodal import (
        documents_as_media,
        media_index_apply,
        media_index_compact,
        read_media_index,
    )

    idx = str(tmp_path / "midx_c")
    for bid, txt in enumerate(["payload one", "payload two", "payload three"]):
        media_index_apply(
            documents_as_media(
                spark.createDataFrame([(bid * 10, txt)], "doc_id long, text string")
            ),
            bid,
            idx,
        )
    want = {0, 10, 20}
    assert {r["media_id"] for r in read_media_index(spark, idx).collect()} == want
    assert media_index_compact(spark, idx, keep_latest=1) == 2
    assert {r["media_id"] for r in read_media_index(spark, idx).collect()} == want
    assert manifests.manifest_payload(spark, idx, "batch", 0).get("data")
    assert manifests.committed_versions(spark, idx, "batch") == [0, 2]
    # merging the newest (only replayable) version is refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_latest"):
        media_index_compact(spark, idx, keep_latest=0)

    # semantic index: same generic compaction, co-located with the
    # 'centroids' kind under the same _manifests dir (must be untouched)
    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        embedding_index_compact,
        read_embedding_index,
    )

    vidx = str(tmp_path / "vidx_c")
    vs = [(0, [1.0, 0.0]), (50, [0.0, 1.0]), (77, [0.6, 0.8])]
    for bid, row in enumerate(vs):
        embedding_index_apply(
            spark.createDataFrame([row], "vec_id long, embedding array<float>"),
            bid, vidx, threshold=0.99,
        )
    vwant = {0, 50, 77}
    assert {r["vec_id"] for r in read_embedding_index(spark, vidx).collect()} == vwant
    assert embedding_index_compact(spark, vidx, keep_latest=1) == 2
    assert {r["vec_id"] for r in read_embedding_index(spark, vidx).collect()} == vwant
    # quantizer manifest survives compaction of the batch kind
    assert manifests.committed_versions(spark, vidx, "centroids") == [0]


def test_media_index_streaming_e2e(spark, tmp_path):
    """The perceptual index behind a real checkpointed file stream: a
    batch-1 payload identical to a batch-0 keeper is dropped against
    the stored hashes, exactly as in the direct-call contract."""
    from erpl_web_spark.operators.multimodal import (
        media_index_apply,
        read_media_index,
    )

    src = tmp_path / "msrc"
    src.mkdir()
    idx = str(tmp_path / "midx_s")
    ckpt = str(tmp_path / "mckpt")
    schema = "media_id long, payload binary"

    def run_stream():
        (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(lambda df, bid: media_index_apply(df, bid, idx))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    spark.createDataFrame(
        [(1, b"payload alpha"), (2, b"payload beta")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert {r["media_id"] for r in read_media_index(spark, idx).collect()} == {1, 2}

    spark.createDataFrame(
        [(10, b"payload alpha"), (11, b"payload gamma")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()  # same checkpoint: only the new file forms batch 1
    assert {r["media_id"] for r in read_media_index(spark, idx).collect()} == {1, 2, 11}


def test_media_index_apply_dedups_within_and_across_batches(spark, tmp_path):
    """The perceptual media index (the third incremental dedup index,
    after lexical and semantic): within-batch dup dropped (min id
    kept), cross-batch dup dropped against the stored hashes, replay
    overwrites its own delta idempotently, and pre-manifest legacy
    state raises at entry before any write."""
    import os

    import pytest as _pytest

    from erpl_web_spark.operators.multimodal import (
        documents_as_media,
        media_index_apply,
        read_media_index,
    )

    def media(rows):
        return documents_as_media(
            spark.createDataFrame(rows, "doc_id long, text string")
        )

    path = str(tmp_path / "midx")
    b0 = media([(1, "first unique payload"), (2, "first unique payload"),
                (3, "second distinct payload")])
    media_index_apply(b0, 0, path)
    assert {r["media_id"] for r in read_media_index(spark, path).collect()} == {1, 3}
    dec0 = {r["media_id"]: (r["status"], r["dup_of"]) for r in
            spark.read.parquet(f"{path}/decisions/batch=0").collect()}
    assert dec0[2] == ("dup_in_batch", 1) and dec0[1][0] == "kept"

    b1 = media([(10, "first unique payload"), (11, "a brand new payload")])
    media_index_apply(b1, 1, path)
    kept = {r["media_id"] for r in read_media_index(spark, path).collect()}
    assert kept == {1, 3, 11}
    dec1 = {r["media_id"]: (r["status"], r["dup_of"]) for r in
            spark.read.parquet(f"{path}/decisions/batch=1").collect()}
    assert dec1[10] == ("dup_of_index", 1)

    # replay batch 1: identical content, no duplicate index rows
    media_index_apply(b1, 1, path)
    assert {r["media_id"] for r in read_media_index(spark, path).collect()} == kept

    # legacy pre-manifest state raises at entry, before _manifests exists
    legacy = str(tmp_path / "legacy_midx")
    spark.createDataFrame(
        [(5, 1, 2)], "media_id long, dhash_hi long, dhash_lo long"
    ).write.parquet(f"{legacy}/batch=0")
    with _pytest.raises(RuntimeError, match="adopt_success_markers"):
        media_index_apply(b1, 1, legacy)
    assert not os.path.exists(f"{legacy}/_manifests")


def test_internal_cache_tracking_is_loud_and_releasable(spark):
    """A 100-batch foreachBatch-style loop calling a persisting operator
    without cache_sink must NOT accumulate caches silently: the tracking
    registry warns once (RuntimeWarning naming the operator) as frames
    pile up, release_tracked() unpersists everything and re-arms, and
    the cache_sink path stays untracked (caller owns the lifetime)."""
    import warnings as _warnings

    from erpl_web_spark.operators import release_tracked, tracked_count
    from erpl_web_spark.operators._cache import WARN_AT
    from erpl_web_spark.operators.text import with_bigram_coverage

    release_tracked()  # isolate from caches earlier tests left behind

    def make_batch(i: int):
        # each micro-batch is a DISTINCT frame (real foreachBatch
        # semantics — per-batch source offsets make per-batch plans)
        return spark.createDataFrame(
            [(i * 2 + 1, f"the cat {i} sat on the mat"),
             (i * 2 + 2, f"the dog {i} sat on the log")],
            "doc_id long, text string",
        )

    with _warnings.catch_warnings(record=True) as seen:
        _warnings.simplefilter("always")
        for i in range(100):
            with_bigram_coverage(make_batch(i)).count()
        loud = [w for w in seen if issubclass(w.category, RuntimeWarning)
                and "cache_sink" in str(w.message)]
    assert tracked_count() == 100
    assert len(loud) == 1, "accumulation warning must fire exactly once"
    assert "_bigram_frame" in str(loud[0].message)
    assert release_tracked() == 100 and tracked_count() == 0

    # re-running the SAME plan (a bench rep loop) must not multi-count:
    # the CacheManager resolves the re-persist to the existing cache
    # entry, so the registry dedups it and the warning never fires on
    # phantom accumulation
    batch = make_batch(0)
    with _warnings.catch_warnings(record=True) as seen:
        _warnings.simplefilter("always")
        for _ in range(WARN_AT + 2):
            with_bigram_coverage(batch).count()
        assert tracked_count() == 1
        assert not [w for w in seen if issubclass(w.category, RuntimeWarning)
                    and "cache_sink" in str(w.message)]
    assert release_tracked() == 1

    # caller-owned lifetime: sink receives the frame, registry stays
    # empty, no warning even past the threshold
    with _warnings.catch_warnings(record=True) as seen:
        _warnings.simplefilter("always")
        for _ in range(WARN_AT + 2):
            sink = []
            with_bigram_coverage(batch, cache_sink=sink).count()
            assert len(sink) == 1
            for f in sink:
                f.unpersist()
        assert tracked_count() == 0
        assert not [w for w in seen if issubclass(w.category, RuntimeWarning)
                    and "cache_sink" in str(w.message)]


def test_bloom_filter_contract(spark):
    """Bloom filter one-sided error: EVERY inserted token probes
    present (no false negatives — the contract), an absent probe with
    n_hits < k is a proof of absence, and a generously-sized filter
    rejects all planted absents (deterministic hashes -> pinned)."""
    from erpl_web_spark.operators.text import bloom_filter_words, bloom_probe

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta")],
        "doc_id long, text string",
    )
    filt = bloom_filter_words(df, k=3, m_bits=4096)
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("epsilon",),
         ("zeta",), ("missing1",), ("missing2",), ("missing3",)],
        "probe string",
    )
    out = {
        r["probe"]: (r["n_hits"], r["present"])
        for r in bloom_probe(probes, filt, k=3, m_bits=4096).collect()
    }
    for tok in ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]:
        assert out[tok] == (3, True), f"false negative on {tok}"
    for tok in ["missing1", "missing2", "missing3"]:
        n, present = out[tok]
        assert n < 3 and not present  # 4096 bits, 18 set: no FP here
    # filter size is bounded by m_bits, not corpus size
    assert filt.count() <= (4096 + 47) // 48
    # DUPLICATE probe rows must not manufacture false negatives: a
    # member probed twice would accumulate 2k position rows and fail
    # n_hits == k unless bloom_probe dedupes internally (ADVICE r10).
    dup = spark.createDataFrame(
        [("alpha",), ("alpha",), ("alpha",), ("missing1",), ("missing1",)],
        "probe string",
    )
    dup_out = {
        r["probe"]: (r["n_hits"], r["present"])
        for r in bloom_probe(dup, filt, k=3, m_bits=4096).collect()
    }
    assert len(dup_out) == 2  # one row per DISTINCT probe
    assert dup_out["alpha"] == (3, True)
    assert dup_out["missing1"][0] < 3 and not dup_out["missing1"][1]


def test_pack_nextfit_string_ids(spark):
    """pack_documents_nextfit with STRING doc ids (web-corpus UUIDs):
    the output schema derives the id type from the input, shards by
    the md5 bucket, and packs in lexicographic id order."""
    from erpl_web_spark.operators.text import pack_documents_nextfit

    df = spark.createDataFrame(
        [(f"doc-{i:03d}", "tok " * (i % 5 + 1)) for i in range(20)],
        "doc_id string, text string",
    )
    out = pack_documents_nextfit(df, budget=8, n_shards=2).collect()
    assert len(out) == 20
    assert all(isinstance(r["doc_id"], str) for r in out)
    # within each shard, bin fill never exceeds budget unless the doc
    # alone does (no doc here exceeds 5 tokens)
    assert all(r["bin_fill_after"] <= 8 for r in out)


def test_url_index_election_is_one_shuffle(spark):
    """The within-batch election (_elect_first) is ONE partial-
    aggregable shuffle — min_by over the row struct, not groupBy(min)
    + join-back (two shuffles), and never a window. Plan-asserted:
    exactly one Exchange, no Join, no Window; result keeps the
    smallest id per digest with all payload columns intact."""
    from erpl_web_spark.operators.url_index import _elect_first

    df = spark.createDataFrame(
        [(5, "d1", "u5", "b5"), (2, "d1", "u2", "b2"), (9, "d2", "u9", "b9")],
        "doc_id long, digest string, url string, body string",
    )
    elected = _elect_first(df, "doc_id")
    plan = elected._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan
    rows = {r["digest"]: r for r in elected.collect()}
    assert rows["d1"]["doc_id"] == 2 and rows["d1"]["body"] == "b2"
    assert rows["d2"]["url"] == "u9"


def test_url_index_keep_first_across_batches(spark, tmp_path):
    """Fifth incremental index: one kept doc per canonical URL, first
    batch wins across batches, smallest id wins within a batch, messy
    variants (case/port/utm/trailing slash) collide via the
    canonicalizer, and a batch replay is idempotent."""
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        read_url_index,
        url_index_apply,
    )

    path = str(tmp_path / "urlidx")
    schema = "doc_id long, url string"
    b0 = spark.createDataFrame(
        [
            (2, "http://a.com/x?a=1&b=2"),
            (1, "HTTP://WWW.A.com:80/x/?b=2&a=1#f"),  # same canonical as 2
            (3, "https://b.com/y"),
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [
            (10, "http://a.com/x?utm_source=z&a=1&b=2"),  # claimed in b0
            (11, "https://b.com/y/"),                      # claimed in b0
            (12, "https://c.com/z?p=1"),                   # new
        ],
        schema,
    )
    url_index_apply(b0, 0, path)
    url_index_apply(b1, 1, path)

    kept = {
        r["doc_id"]: r["canonical_url"]
        for r in read_kept_batches(spark, path).collect()
    }
    assert kept == {
        1: "http://a.com/x?a=1&b=2",   # min-id winner within batch 0
        3: "https://b.com/y",
        12: "https://c.com/z?p=1",
    }
    claims = read_url_index(spark, path).collect()
    assert len(claims) == 3
    assert {r["batch_src"] for r in claims} == {0, 1}

    # replay idempotence: batch 1 recomputes the identical decisions
    url_index_apply(b1, 1, path)
    kept2 = {
        r["doc_id"]: r["canonical_url"]
        for r in read_kept_batches(spark, path).collect()
    }
    assert kept2 == kept


def test_url_index_bloom_prefilter_equivalence(spark, tmp_path):
    """Opt-in Bloom pre-filter (VERDICT r10 Next #4): kept sets are
    IDENTICAL with the filter on and off — even with a deliberately
    tiny m (heavy false positives: FPs only route extra rows into the
    anti-join; the no-false-negative side keeps genuinely-new digests
    from being lost). Each batch commits a bloomw increment bounded by
    ceil(m/48) rows with its bit geometry in the manifest payload."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        url_index_apply,
    )

    schema = "doc_id long, url string"
    batches = [
        spark.createDataFrame(
            [
                (b * 100 + i, f"http://site{(b * 7 + i) % 9}.com/p/{(i * i) % 13}")
                for i in range(20)
            ]
            + [(b * 100 + 50, "https://b.com/y")],
            schema,
        )
        for b in range(3)
    ]

    kept_sets = {}
    for m_bits in (None, 96, 4096):
        path = str(tmp_path / f"urlidx_{m_bits}")
        for b, df in enumerate(batches):
            url_index_apply(df, b, path, bloom_m_bits=m_bits)
        kept_sets[m_bits] = {
            (r["doc_id"], r["canonical_url"])
            for r in read_kept_batches(spark, path).collect()
        }
        if m_bits is not None:
            assert manifests.committed_versions(spark, path, "bloomw") == [0, 1, 2]
            for v in range(3):
                p = manifests.manifest_payload(spark, path, "bloomw", v)
                assert p["m_bits"] == m_bits and p["k"] == 3
                n = spark.read.parquet(f"{path}/bloomw={v}").count()
                assert n <= (m_bits + 47) // 48
    assert kept_sets[96] == kept_sets[None]
    assert kept_sets[4096] == kept_sets[None]


def test_url_index_bloom_coverage_fallback(spark, tmp_path):
    """Enabling the Bloom knob MID-STREAM must not lose documents: the
    coverage check sees batch 0 has no bloomw increment and falls back
    to the plain anti-join (the filter is an optimization, never a
    correctness dependency). A mismatched bit geometry falls back the
    same way."""
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        url_index_apply,
    )

    schema = "doc_id long, url string"
    b0 = spark.createDataFrame(
        [(1, "http://a.com/x"), (2, "https://b.com/y")], schema
    )
    b1 = spark.createDataFrame(
        [(10, "http://a.com/x"), (11, "https://c.com/z")], schema
    )
    b2 = spark.createDataFrame(
        [(20, "https://c.com/z"), (21, "https://d.com/w")], schema
    )
    path = str(tmp_path / "urlidx_mid")
    url_index_apply(b0, 0, path)                      # knob off
    url_index_apply(b1, 1, path, bloom_m_bits=4096)   # on: must fall back
    # batch 2 with a DIFFERENT geometry: increments mismatch -> fallback
    url_index_apply(b2, 2, path, bloom_m_bits=8192)
    kept = {r["doc_id"] for r in read_kept_batches(spark, path).collect()}
    # duplicates of claimed URLs dropped, new URLs kept - exactly as
    # the filterless index would decide
    assert kept == {1, 2, 11, 21}


def test_url_index_null_urls_pass_through(spark, tmp_path):
    """Rows without a URL cannot be URL-deduped: ALL of them are kept
    (NULL canonical), in every batch, claiming nothing — not collapsed
    into one NULL-digest 'winner'."""
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        read_url_index,
        url_index_apply,
    )

    path = str(tmp_path / "urlidx")
    schema = "doc_id long, url string"
    url_index_apply(
        spark.createDataFrame(
            [(1, None), (2, None), (3, "http://a.com/x")], schema
        ),
        0,
        path,
    )
    url_index_apply(
        spark.createDataFrame(
            [(10, None), (11, "http://a.com/x?utm_source=s")], schema
        ),
        1,
        path,
    )
    kept = {
        r["doc_id"]: r["canonical_url"]
        for r in read_kept_batches(spark, path).collect()
    }
    # every NULL-url row kept; URL dedup still applies to real URLs
    assert set(kept) == {1, 2, 3, 10}
    assert kept[1] is None and kept[2] is None and kept[10] is None
    # NULL rows claim nothing
    assert read_url_index(spark, path).count() == 1


def test_url_index_compaction(spark, tmp_path):
    """url_index_compact merges claim increments losslessly (redirect
    pattern); decisions after compaction are unchanged."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.url_index import (
        read_url_index,
        url_index_apply,
        url_index_compact,
    )

    path = str(tmp_path / "urlidx")
    schema = "doc_id long, url string"
    for i, u in enumerate(
        ["http://a.com/1", "http://a.com/2", "http://a.com/3"]
    ):
        url_index_apply(
            spark.createDataFrame([(i, u)], schema), i, path
        )
    before = {r["digest"] for r in read_url_index(spark, path).collect()}
    assert url_index_compact(spark, path, keep_latest=1) > 0
    after = {r["digest"] for r in read_url_index(spark, path).collect()}
    assert after == before
    assert len(manifests.committed_versions(spark, path, "urls")) == 2
    # a post-compaction batch still dedups against the merged claims
    url_index_apply(
        spark.createDataFrame(
            [(30, "http://a.com/2?utm_source=x"), (31, "http://a.com/4")],
            schema,
        ),
        3,
        path,
    )
    from erpl_web_spark.operators.url_index import read_kept_batches

    kept3 = {
        r["doc_id"]
        for r in read_kept_batches(spark, path).collect()
        if r["doc_id"] >= 30
    }
    assert kept3 == {31}


def test_url_index_streaming_e2e(spark, tmp_path):
    """The URL index behind a real file stream: foreachBatch passes
    micro-batches to url_index_apply; the kept union equals the batch
    operator's keep-first election over the full input."""
    import os

    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        url_index_apply,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "doc_id long, url string"
    spark.createDataFrame(
        [(1, "http://a.com/x?b=2&a=1"), (2, "https://b.com/y")], schema
    ).write.mode("overwrite").parquet(src + "/b0")
    (
        spark.readStream.schema(schema)
        .parquet(src + "/*")
        .writeStream.foreachBatch(lambda df, bid: url_index_apply(df, bid, idx))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    spark.createDataFrame(
        [(10, "HTTP://A.com:80/x/?a=1&b=2"), (11, "https://c.com/z")], schema
    ).write.mode("overwrite").parquet(src + "/b1")
    (
        spark.readStream.schema(schema)
        .parquet(src + "/*")
        .writeStream.foreachBatch(lambda df, bid: url_index_apply(df, bid, idx))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    kept = {r["doc_id"] for r in read_kept_batches(spark, idx).collect()}
    assert kept == {1, 2, 11}  # 10's canonical was claimed by doc 1


def test_pack_documents_nextfit_semantics(spark):
    """Next-fit whole-document packing: docs never split, a new bin
    opens when the next doc would overflow, an oversized doc occupies
    a bin alone (fill > budget), empty docs always fit the current
    bin, and bins are contiguous 0..max within every shard."""
    from erpl_web_spark.operators.text import pack_documents_nextfit

    # one shard so the scan order is fully deterministic here
    rows = [
        (1, "a b c"),        # 3
        (2, "d e"),          # 2  -> bin 0 fill 5
        (3, "f g h i"),      # 4  -> overflow (5+4>6): bin 1 fill 4
        (4, ""),             # 0  -> fits bin 1, fill 4
        (5, " ".join("x" * 1 for _ in range(9))),  # 9 > budget -> bin 2 alone
        (6, "y"),            # 1  -> 4+9? no: after oversized, bin 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["bin_id"], r["bin_fill_after"])
        for r in pack_documents_nextfit(
            df, budget=6, n_shards=1
        ).collect()
    }
    assert out == {
        1: (0, 3), 2: (0, 5), 3: (1, 4), 4: (1, 4), 5: (2, 9), 6: (3, 1),
    }

    # sharding: every doc appears exactly once; within each shard the
    # bin ids are contiguous from 0
    many = spark.createDataFrame(
        [(i, "w " * (i % 7)) for i in range(200)], "doc_id long, text string"
    )
    packed = pack_documents_nextfit(many, budget=8, n_shards=4).collect()
    assert sorted(r["doc_id"] for r in packed) == list(range(200))
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r["shard"], set()).add(r["bin_id"])
    assert len(by_shard) == 4
    for bins in by_shard.values():
        assert bins == set(range(max(bins) + 1))


def test_canonicalize_url_expr_rules(spark):
    """URL canonicalizer contract, rule by rule: scheme/host lowercase,
    www. strip, DEFAULT port strip (non-default ports name a different
    origin and are KEPT), fragment drop, trailing-slash and empty-path
    normalization, tracking-param drop, query-param sort — and the
    transform is idempotent (canonical input passes through
    unchanged)."""
    from erpl_web_spark.operators.text import canonicalize_url_expr

    rows = [
        (1, "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#frag"),
        (2, "https://example.com:443/a/b?a=1&b=2"),
        (3, "https://example.com:8443/a/b?a=1&b=2"),  # non-default: kept
        (4, "http://example.com"),                     # empty path -> /
        (5, "http://example.com/?utm_source=x&utm_medium=y"),
        (6, "http://example.com/x?fbclid=123&q=term&gclid=9"),
        (7, "http://sub.example.com/x"),               # only LEADING www strips
        (8, "http://example.com/p?z=1&m=2&a=3"),
        (9, "http://example.com/p?a=1&dup=2&dup=1"),   # dup keys both kept, sorted
        (10, "http://example.com/%70a%7Eb?x=%2f"),     # unreserved decode + hex upper
        (11, "http://example.com/x?utm_campaign&q=1"), # bare valueless tracking param
        (12, "Site.example/p%7E?utm_source=x"),        # scheme-less: verbatim passthrough
        (13, "http://example.com/a%4x%"),              # malformed escapes stay literal
        (14, "http://example.com/%75tm?%75tm_source=1&a=2"),  # obfuscated utm decoded, then dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", canonicalize_url_expr("url").alias("c")
        ).collect()
    }
    assert out[1] == "http://example.com/a/b?a=1&b=2"
    assert out[2] == "https://example.com/a/b?a=1&b=2"
    assert out[3] == "https://example.com:8443/a/b?a=1&b=2"
    assert out[4] == "http://example.com/"
    assert out[5] == "http://example.com/"
    assert out[6] == "http://example.com/x?q=term"
    assert out[7] == "http://sub.example.com/x"
    assert out[8] == "http://example.com/p?a=3&m=2&z=1"
    assert out[9] == "http://example.com/p?a=1&dup=1&dup=2"
    assert out[10] == "http://example.com/pa~b?x=%2F"
    assert out[11] == "http://example.com/x?q=1"
    assert out[12] == "Site.example/p%7E?utm_source=x"
    assert out[13] == "http://example.com/a%4x%"
    assert out[14] == "http://example.com/utm?a=2"
    # idempotence: canonicalizing a canonical URL is the identity
    canon = spark.createDataFrame(
        [(k, v) for k, v in out.items()], "doc_id long, url string"
    )
    again = {
        r["doc_id"]: r["c"]
        for r in canon.select(
            "doc_id", canonicalize_url_expr("url").alias("c")
        ).collect()
    }
    assert again == out


def test_url_dedup_report_min_id_election(spark):
    """url_dedup_report without a quality column elects the SMALLEST id
    per canonical URL; with one, the highest quality wins and ties
    break to the smaller id."""
    from erpl_web_spark.operators.dedup import url_dedup_report

    rows = [
        (10, "http://a.com/x?b=2&a=1", 5),
        (3, "HTTP://WWW.A.com:80/x/?a=1&b=2#f", 5),   # same canonical, tie q
        (7, "http://a.com/x?utm_source=s&a=1&b=2", 9),  # same canonical, best q
        (2, "https://b.com/y", 1),                     # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q long")
    plain = {
        r["canonical_url"]: (r["keep_id"], r["n_dups"])
        for r in url_dedup_report(df, "url", "doc_id").collect()
    }
    assert plain == {
        "http://a.com/x?a=1&b=2": (3, 3),
        "https://b.com/y": (2, 1),
    }
    best = {
        r["canonical_url"]: (r["keep_id"], r["n_dups"], r["best_quality"])
        for r in url_dedup_report(df, "url", "doc_id", quality_col="q").collect()
    }
    assert best == {
        "http://a.com/x?a=1&b=2": (7, 3, 9),
        "https://b.com/y": (2, 1, 1),
    }


def test_strip_html_expr_cleans_markup(spark):
    """HTML cleaner contract: script/style/comment bodies vanish
    wholesale, tags become whitespace, the six common entities decode
    (amp LAST, so '&amp;lt;' decodes to the literal '&lt;' text, not a
    re-stripped tag), and malformed markup degrades to whitespace —
    never to lost non-markup text."""
    from erpl_web_spark.operators.text import strip_html_expr

    rows = [
        (1, '<p>Hello <b>world</b></p><script>alert("x < y")</script>'),
        (2, '<style>body { color: &red }</style>A &amp;amp; B &lt;tag&gt;'),
        (3, "plain text stays &quot;as&quot; it&#39;s"),
        (4, "<div class='open.. no close   lots\n of \t space"),
        (5, "<!-- secret -->visible<!-- more\nsecret -->"),
        (6, "compare: x < y > z and 1<2 but <em>this</em> strips"),
        (7, '<?xml version="1.0"?>decl gone<?php echo "x"; ?>tail'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean"]
        for r in df.select(
            "doc_id", strip_html_expr("text").alias("clean")
        ).collect()
    }
    assert out[1] == "Hello world"
    assert out[2] == "A &amp; B <tag>"  # amp decoded last, no re-strip
    assert out[3] == 'plain text stays "as" it\'s'
    assert out[4] == "open.. no close lots of space" or "open" in out[4]
    assert out[5] == "visible"
    # bare angle brackets in prose are NOT tags (narrowed pattern
    # requires a letter, '/', '!' or '?' after '<'); tag-shaped spans strip
    assert out[6] == "compare: x < y > z and 1<2 but this strips"
    # processing-instruction / declaration spans strip like tags
    assert out[7] == "decl gone tail"


def test_bigram_logprob_ranks_prose_above_salad(spark):
    """The smoothed bigram LM score must rank text whose adjacencies
    repeat across the corpus above never-repeated word salad, and give
    0-bigram documents (empty / single-token) exactly 0.0."""
    from erpl_web_spark.operators.text import with_bigram_logprob

    prose = "the cat sat on the mat and the cat sat on the mat again"
    rows = [
        (1, prose),
        (2, prose + " happily"),              # shares almost all adjacencies
        (3, "zeppelin quartz flamingo ducat oboe warthog nimbus kelp"),
        (4, "solo"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_bigram_logprob(df).collect()}
    assert out[1]["avg_log2p"] > out[3]["avg_log2p"]
    assert out[2]["avg_log2p"] > out[3]["avg_log2p"]
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_log2p"] == 0.0
    assert out[5]["n_bigrams"] == 0 and out[5]["avg_log2p"] == 0.0
    # probabilities: every smoothed log2 P is negative for real bigrams
    assert out[3]["avg_log2p"] < 0


def test_knn_label_eval_majority_and_tie_break(spark):
    """Planted neighborhoods: a probe surrounded by label-7 vectors
    predicts 7; a probe with a 2-2 vote tie picks the SMALLER label;
    correct flags compare against the probe's own label."""
    from erpl_web_spark.operators.similarity import knn_label_eval

    rows = [
        # probe 0 (label 7): 3 label-7 neighbors nearby, 1 label-2 farther
        (0, [1.0, 0.0, 0.0], 7),
        (10, [0.99, 0.1, 0.0], 7),
        (11, [0.98, 0.15, 0.0], 7),
        (12, [0.97, 0.2, 0.0], 7),
        (13, [0.5, 0.8, 0.0], 2),
        # probe 1 (label 9): exactly two label-3 and two label-5 votes
        (1, [0.0, 0.0, 1.0], 9),
        (20, [0.0, 0.1, 0.99], 3),
        (21, [0.0, 0.15, 0.98], 3),
        (22, [0.0, 0.2, 0.97], 5),
        (23, [0.0, 0.25, 0.96], 5),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    probes = emb.where(F.col("vec_id") < 2)
    out = {
        r["probe_id"]: r
        for r in knn_label_eval(emb, probes, k=4).collect()
    }
    assert out[0]["pred_label"] == 7 and out[0]["n_votes"] == 3
    assert out[0]["correct"] == 1
    # 2-2 tie: label 3 < label 5 wins; probe's own label is 9 -> wrong
    assert out[1]["pred_label"] == 3 and out[1]["n_votes"] == 2
    assert out[1]["correct"] == 0

    # string labels must work on a default-conf ANSI session (the
    # tie-break never negates the label column)
    semb = spark.createDataFrame(
        [(i, v, {7: "cat", 2: "dog", 9: "emu", 3: "ant", 5: "bee"}[l])
         for i, v, l in rows],
        "vec_id long, embedding array<float>, label string",
    )
    sout = {
        r["probe_id"]: r
        for r in knn_label_eval(semb, semb.where(F.col("vec_id") < 2), k=4).collect()
    }
    assert sout[0]["pred_label"] == "cat" and sout[0]["correct"] == 1
    assert sout[1]["pred_label"] == "ant"  # 'ant' < 'bee' on the 2-2 tie


def test_winnow_targeted_scrub_scrubs_only_flagged_docs(spark):
    """The composed MOSS workflow: documents whose winnow-pair was
    flagged get their shared 10-token span scrubbed; an unflagged
    document with no overlap passes through normalized and untouched —
    and the scrubber's gram table never saw it."""
    from erpl_web_spark.operators.dedup import winnow_targeted_scrub

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "unique intro one " + passage + " tail one"),
        (2, "second doc opening " + passage + " closing words"),
        (3, "completely unrelated text about mountain weather patterns today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in winnow_targeted_scrub(
            df, char_k=5, w=4, min_shared=3, max_df=10, token_k=10, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    # flagged pair: the shared 10-token passage is removed from both
    assert "gamma" not in out[1]["clean_text"]
    assert "gamma" not in out[2]["clean_text"]
    assert out[1]["n_removed"] >= 10 and out[2]["n_removed"] >= 10
    assert "unique intro one" in out[1]["clean_text"]
    # unflagged doc: normalized pass-through, nothing removed
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("completely unrelated")
    assert out[3]["n_tokens"] == len(rows[2][1].split())


def test_data_dirs_skips_vanished_manifest(spark, tmp_path, monkeypatch):
    """Regression (round-6 advice): a manifest that disappears between
    the committed_versions listing and the payload read (concurrent
    retract) must make the version invisible — NOT resolve to the
    default ``kind=N`` directory, which may be deleted or hold
    pre-compaction content. Also: replacing a manifest must leave no
    missing-manifest window artifacts (tmp files)."""
    import os

    from erpl_web_spark.core import manifests

    path = str(tmp_path / "state")
    spark.createDataFrame([(1,)], "k long").write.parquet(f"{path}/v=0")
    manifests.commit_version(spark, path, "v", 0)
    # atomic replace: payload updated, no .tmp leftovers
    manifests.commit_version(spark, path, "v", 0, {"data": "v=0"})
    assert manifests.manifest_payload(spark, path, "v", 0)["data"] == "v=0"
    assert not [
        f for f in os.listdir(f"{path}/_manifests") if f.startswith(".tmp")
    ]

    # simulate a retract race: the first listing returns version 0 but
    # its manifest is gone by payload-read time and a re-list confirms
    # the retraction -> the version is skipped
    os.remove(f"{path}/_manifests/v-0.json")
    calls = {"n": 0}
    real = manifests.committed_versions

    def listing(*a, **kw):
        calls["n"] += 1
        return [0] if calls["n"] == 1 else real(*a, **kw)

    monkeypatch.setattr(manifests, "committed_versions", listing)
    assert manifests.data_dirs(spark, path, "v") == []

    # but a version that STAYS listed while its manifest is unreadable
    # must raise, not silently vanish from the union
    import pytest as _pytest

    monkeypatch.setattr(manifests, "committed_versions", lambda *a, **kw: [0])
    with _pytest.raises(IOError, match="committed manifest unreadable"):
        manifests.data_dirs(spark, path, "v")


def test_legacy_success_state_raises_until_adopted(spark, tmp_path):
    """Pre-manifest state (v=N dirs with _SUCCESS, no _manifests) must
    raise — silently rebuilding from an empty base would drop keys —
    and adopt_success_markers migrates it in place. A torn FIRST write
    under the new protocol (_manifests exists, manifest pending) stays
    invisible without raising."""
    import pytest as _pytest

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.cdc import read_latest_snapshot

    snap = str(tmp_path / "legacy")
    spark.createDataFrame([(1, 1.0)], "k long, val double").write.parquet(
        f"{snap}/v=0"
    )
    spark.createDataFrame([(1, 2.0)], "k long, val double").write.parquet(
        f"{snap}/v=1"
    )
    with _pytest.raises(RuntimeError, match="adopt_success_markers"):
        read_latest_snapshot(spark, snap)
    assert manifests.adopt_success_markers(spark, snap, "v") == [0, 1]
    got = read_latest_snapshot(spark, snap)
    assert [(r["k"], r["val"]) for r in got.collect()] == [(1, 2.0)]

    # torn first write under the protocol: marker dir exists, no commit
    torn = str(tmp_path / "torn_first")
    manifests.uncommit_version(spark, torn, "v", 0)  # creates _manifests
    spark.createDataFrame([(9, 9.0)], "k long, val double").write.parquet(
        f"{torn}/v=0"
    )
    assert read_latest_snapshot(spark, torn) is None


def test_dedup_index_compact_redirect_and_self_heal(spark, tmp_path):
    """Compaction commits the merged generation via manifest redirect
    BEFORE retracting sources — no crash point loses a committed
    document. A simulated crash right after the redirect (sources still
    committed) shows transient duplicates; the next compaction
    de-duplicates and converges."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.dedup import (
        dedup_index_apply,
        dedup_index_compact,
        read_dedup_index,
    )

    idx = str(tmp_path / "idx")
    texts = {
        0: "the quick brown fox jumps over the lazy dog tonight",
        1: "pack my box with five dozen liquor jugs right now",
        2: "how vexingly quick daft zebras jump over fences",
    }
    for bid, txt in texts.items():
        dedup_index_apply(
            spark.createDataFrame([(bid, txt)], "doc_id long, text string"), bid, idx
        )
    want = {0, 1, 2}
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == want

    merged = dedup_index_compact(spark, idx, keep_latest=1)
    assert merged == 2
    assert {r["doc_id"] for r in read_dedup_index(spark, idx).collect()} == want
    # target resolves through the manifest's data redirect
    payload = manifests.manifest_payload(spark, idx, "batch", 0)
    assert payload.get("data", "").startswith("batch=0.c")

    # simulate the crash window: re-commit batch=1 as if retraction had
    # not happened (its data is gone, so re-point it at the merged dir
    # to model 'sources still committed' with duplicate content)
    manifests.commit_version(spark, idx, "batch", 1, {"data": payload["data"]})
    dup = read_dedup_index(spark, idx)
    # gen dir (docs 0,1) read twice + batch=2 once: 5 rows, docs 0 and 1
    # transiently duplicated
    assert dup.count() == 5
    assert {r["doc_id"] for r in dup.collect()} == want  # but nothing lost

    # next compaction self-heals: keep_latest=1 merges exactly the two
    # duplicate-content versions (the newest, only-replayable version
    # is never merged — keep_latest=0 is refused by the guard) and the
    # full-row dedup restores exact counts
    dedup_index_compact(spark, idx, keep_latest=1)
    healed = read_dedup_index(spark, idx)
    assert healed.count() == len(want)
    assert {r["doc_id"] for r in healed.collect()} == want


def test_bigram_coverage_contract(spark):
    """Coverage contract: repeated-adjacency docs score 1.0, unique
    word salad scores 0.0, short docs (< 2 tokens) keep n_bigrams=0 and
    coverage 0.0, and counts are exact."""
    from erpl_web_spark.operators.text import with_bigram_coverage

    common = "good morning everyone "  # bigrams repeated across docs
    rows = [
        (1, common * 3),                 # all bigrams hyper-frequent
        (2, common * 3),
        (3, common * 3),
        (4, "zeta qoph vav resh ayin"),  # every bigram unique
        (5, "single"),                   # < 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_bigram_coverage(df, min_count=3).collect()}
    assert got[1]["n_bigrams"] == 8  # 9 tokens -> 8 adjacent pairs
    assert got[1]["bigram_coverage"] == 1.0
    assert got[4]["n_covered"] == 0 and got[4]["bigram_coverage"] == 0.0
    assert got[5]["n_bigrams"] == 0 and got[5]["bigram_coverage"] == 0.0
    assert len(got) == 5


def test_text_joinback_salting_identical_rows(spark):
    """``salt=`` fans the token/bigram count join-backs over salt
    reducers with identical results — the explicit Zipf-head
    mitigation (AQE's skew split is measured NOT to engage in this
    join-under-rollup plan shape; tools/skew_bench.py --zipf)."""
    from erpl_web_spark.operators.text import (
        with_bigram_coverage,
        with_bigram_logprob,
        with_unigram_freq_score,
    )

    prose = "the cat sat on the mat and the dog sat on the rug "
    rows = [(i, prose * (1 + i % 3) + f"tail{i}") for i in range(8)] + [(99, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plain_u = with_unigram_freq_score(df).orderBy("doc_id").collect()
    assert with_unigram_freq_score(df, salt=4).orderBy("doc_id").collect() == plain_u

    sink: list = []
    plain_c = with_bigram_coverage(df, cache_sink=sink).orderBy("doc_id").collect()
    assert (
        with_bigram_coverage(df, cache_sink=sink, salt=4).orderBy("doc_id").collect()
        == plain_c
    )

    # avg over doubles is order-sensitive in the last ulp: compare the
    # float column rounded, the exact-integer column exactly
    plain_l = with_bigram_logprob(df, cache_sink=sink).orderBy("doc_id").collect()
    salted_l = with_bigram_logprob(df, cache_sink=sink, salt=4).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["n_bigrams"]) for r in salted_l] == [
        (r["doc_id"], r["n_bigrams"]) for r in plain_l
    ]
    for a, b in zip(plain_l, salted_l):
        assert abs(a["avg_log2p"] - b["avg_log2p"]) < 1e-9
    for cached in sink:
        cached.unpersist()


def test_dedup_index_apply_failure_releases_caches(spark, tmp_path, monkeypatch):
    """A micro-batch that dies before its commit (here: the shared
    protocol tail raises) must not leak the shingle/band/verdict
    persists on a long-lived streaming driver."""
    import pytest

    from erpl_web_spark.operators import index_commit
    from erpl_web_spark.operators.dedup import dedup_index_apply

    def boom(*a, **kw):
        raise RuntimeError("injected commit failure")

    monkeypatch.setattr(index_commit, "commit_index_batch", boom)
    spark.catalog.clearCache()
    b0 = spark.createDataFrame(
        [(1, "some ordinary words repeated some ordinary words")],
        "doc_id long, text string",
    )
    with pytest.raises(RuntimeError, match="injected"):
        dedup_index_apply(b0, 0, str(tmp_path / "fidx"))
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_countmin_lookup_unseen_and_empty_cells(spark):
    """The lookup LEFT-joins the sketch (which stores only OCCUPIED
    counters): a probe hitting an EMPTY cell in any depth row must
    estimate via cnt=0 (true count is 0 there), and a token hitting no
    occupied cell at all must still get a row with est_n=0 — an inner
    join would inflate unseen tokens past the eps*N bound or drop them
    entirely (ADVICE r8 #1). Cell positions are recomputed here with
    hashlib so the empty/occupied layout is DETERMINISTIC."""
    import hashlib

    from erpl_web_spark.operators.text import countmin_lookup

    width = 64

    def cell(d: int, tok: str) -> int:
        h = hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    # hand-built sketch: occupy ONLY probe "seen"'s two cells (cnt 7, 9)
    # and, adversarially, depth-0's cell for "half" (cnt 5) while
    # leaving its depth-1 cell empty
    sketch = spark.createDataFrame(
        [
            (0, cell(0, "seen"), 7),
            (1, cell(1, "seen"), 9),
            (0, cell(0, "half"), 5),
        ],
        "d int, w int, cnt bigint",
    )
    probes = spark.createDataFrame(
        [("seen",), ("half",), ("ghost",)], "tok string"
    )
    # determinism guard: "ghost" must not collide with any occupied cell
    occupied = {(0, cell(0, "seen")), (1, cell(1, "seen")), (0, cell(0, "half"))}
    assert (0, cell(0, "ghost")) not in occupied
    assert (1, cell(1, "ghost")) not in occupied

    est = {
        r["tok"]: r["est_n"]
        for r in countmin_lookup(sketch, probes, depth=2, width=width).collect()
    }
    assert est == {"seen": 7, "half": 0, "ghost": 0}


def test_normalize_text_null_safe_and_in_place(spark):
    """The changed flag is NULL-safe (NULL text -> changed=false, not
    NULL) and is computed from the PRE-replacement expression, so
    in-place normalization (out == text_col) still reports truthfully
    (ADVICE r8 #2)."""
    from erpl_web_spark.operators.text import normalize_text

    rows = [(1, None), (2, "has nbsp"), (3, "already clean")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r["doc_id"]: (r["norm_text"], r["changed"])
        for r in normalize_text(df).collect()
    }
    assert got[1] == (None, False)          # not NULL
    assert got[2] == ("has nbsp", True)
    assert got[3] == ("already clean", False)

    # in-place: out == text_col must NOT compare against the replaced
    # column (which would make changed vacuously false)
    inplace = {
        r["doc_id"]: (r["text"], r["changed"])
        for r in normalize_text(df, out="text").collect()
    }
    assert inplace[1] == (None, False)
    assert inplace[2] == ("has nbsp", True)
    assert inplace[3] == ("already clean", False)


def test_line_index_repave_reconciles_history(spark, tmp_path):
    """line_index_repave closes the forward-only gap: after the repave,
    the clean union EQUALS the batch operator (line_dedup_corpus) run
    over the accumulated ORIGINAL corpus — early batches lose the lines
    that only became hot later; counts are untouched (still the true
    original-corpus df); a second repave is a no-op (idempotent); and a
    post-repave batch still dedups against the accumulated counts."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        line_index_repave,
        read_clean_batches,
        read_line_counts,
    )
    from erpl_web_spark.operators.text import line_dedup_corpus

    path = str(tmp_path / "lineidx")
    b0 = spark.createDataFrame(
        [
            (1, "alpha body\nshared footer"),
            (2, "beta body\nshared footer"),
            (3, "gamma body\nlate bloomer"),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (10, "delta body\nlate bloomer"),
            (11, "epsilon body\nshared footer"),
        ],
        "doc_id long, text string",
    )
    line_index_apply(b0, 0, path)
    line_index_apply(b1, 1, path)
    counts_before = {
        r["digest"]: r["n_docs"] for r in read_line_counts(spark, path).collect()
    }

    assert line_index_repave(spark, path) == 2  # both clean versions rewritten

    got = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["clean_text"])
        for r in read_clean_batches(spark, path).collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["clean_text"])
        for r in line_dedup_corpus(b0.unionByName(b1)).collect()
    }
    assert got == want
    # the late bloomer is now gone from batch 0's doc 3 too
    assert got[3][2] == "gamma body"
    # counts were NOT rewritten — still the original-corpus df facts
    counts_after = {
        r["digest"]: r["n_docs"] for r in read_line_counts(spark, path).collect()
    }
    assert counts_after == counts_before

    # idempotent: a second repave rewrites the same content
    assert line_index_repave(spark, path) == 2
    again = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["clean_text"])
        for r in read_clean_batches(spark, path).collect()
    }
    assert again == got

    # the index keeps working after a repave: a new batch dedups against
    # the accumulated counts as before
    b2 = spark.createDataFrame(
        [(20, "zeta body\nshared footer\nbrand new line")],
        "doc_id long, text string",
    )
    line_index_apply(b2, 2, path)
    final = {
        r["doc_id"]: r["clean_text"]
        for r in read_clean_batches(spark, path).collect()
    }
    assert final[20] == "zeta body\nbrand new line"


def test_line_index_repave_empty_index(spark, tmp_path):
    from erpl_web_spark.operators.line_index import line_index_repave

    assert line_index_repave(spark, str(tmp_path / "nothing")) == 0


def test_line_index_repave_sweeps_orphan_dirs(spark, tmp_path):
    """The repave's orphan sweep (ADVICE r9) deletes clean=* directories
    no committed manifest names — both crash shapes: (a) a pre-repave
    dir left by a crash between commit_version and fs.delete, and (b) a
    committed generation orphaned when a batch replay re-pointed the
    manifest back at the default dir — while leaving every
    manifest-named dir and the counts state untouched."""
    import os

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        line_index_repave,
        read_clean_batches,
    )

    path = str(tmp_path / "lineidx")
    b0 = spark.createDataFrame(
        [(1, "alpha\nshared footer"), (2, "beta\nshared footer")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "gamma\nshared footer")], "doc_id long, text string"
    )
    line_index_apply(b0, 0, path)
    line_index_apply(b1, 1, path)
    assert line_index_repave(spark, path) == 2
    # shape (a): a stale pre-repave directory the manifest no longer
    # names (as if the deleting fs.delete never ran)
    orphan_a = os.path.join(path, "clean=0")
    os.makedirs(orphan_a)
    with open(os.path.join(orphan_a, "stale.parquet"), "w") as f:
        f.write("stale")
    # shape (b): replay batch 1 — line_index_apply re-points the
    # manifest at the default clean=1 dir, orphaning the committed
    # clean=1.r1 generation
    gen_b = manifests.manifest_payload(spark, path, "clean", 1)["data"]
    assert gen_b.startswith("clean=1.r")
    line_index_apply(b1, 1, path)
    assert manifests.manifest_payload(spark, path, "clean", 1).get("data") is None
    assert os.path.isdir(os.path.join(path, gen_b))
    # a third batch advances the repave generation id, so the next
    # repave writes clean=*.r2 directories — neither orphan's NAME is
    # recreated, making their absence an unambiguous sweep signal
    b2 = spark.createDataFrame(
        [(20, "delta\nshared footer")], "doc_id long, text string"
    )
    line_index_apply(b2, 2, path)

    before = {
        r["doc_id"]: r["clean_text"]
        for r in read_clean_batches(spark, path).collect()
    }
    assert line_index_repave(spark, path) == 3
    # both orphans swept
    assert not os.path.exists(orphan_a)
    assert not os.path.exists(os.path.join(path, gen_b))
    # the on-disk clean=* set is exactly the manifest-named set — no
    # strays survive a repave
    named = {
        d.rstrip("/").rsplit("/", 1)[-1]
        for d in manifests.data_dirs(spark, path, "clean")
    }
    on_disk = {n for n in os.listdir(path) if n.startswith("clean=")}
    assert on_disk == named
    # content converged to the same repaved corpus
    after = {
        r["doc_id"]: r["clean_text"]
        for r in read_clean_batches(spark, path).collect()
    }
    assert after == before
    # counts state untouched by the sweep
    assert manifests.data_dirs(spark, path, "counts")


def test_natural_corpus_generator_deterministic_and_textlike(spark):
    """tools/corpus_gen.natural_documents: two invocations are
    byte-identical (md5-seeded, no RNG state); the Python word speller
    matches the Spark expression tier-for-tier; the token distribution
    is Zipf-headed (rank-1 word 'ba' on top); the schema matches the
    driver documents table; planted quotes land on dup_every multiples."""
    import sys

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from tools.corpus_gen import natural_documents, plant_quotes, word_py

    a = natural_documents(spark, 60, dup_every=7).collect()
    b = natural_documents(spark, 60, dup_every=7).collect()
    assert a == b
    assert [f.name for f in natural_documents(spark, 3).schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]

    # Python speller == Spark expression across all three tiers
    ids = [1, 40, 41, 1640, 1641, 50_000, 65_640]
    spelled = (
        spark.createDataFrame([(i,) for i in ids], "word_id long")
        .select("word_id", __import__("tools.corpus_gen", fromlist=["x"])
                ._word_expr(F.col("word_id")).alias("w"))
        .collect()
    )
    for r in spelled:
        assert r["w"] == word_py(r["word_id"]), (r["word_id"], r["w"])

    # Zipf head: the rank-1 spelling dominates
    toks = {}
    for r in a:
        for t in r["text"].split():
            toks[t] = toks.get(t, 0) + 1
    top = max(toks, key=toks.get)
    assert top == word_py(1)
    assert len(toks) > 1500  # tiny corpus already spans a wide vocab

    # planted quotes: exactly the dup_every multiples start with one
    quotes = plant_quotes()
    for r in a:
        first_line = r["text"].split("\n", 1)[0]
        if r["doc_id"] % 7 == 0:
            assert first_line in quotes, r["doc_id"]
        else:
            assert first_line not in quotes, r["doc_id"]


def test_dsir_identical_corpora_weights_are_zero(spark):
    """When raw == target, p-hat equals q-hat in every bucket, so each
    per-bucket log ratio — and therefore every document's log weight —
    is EXACTLY 0.0 (the same two ln() calls on the same doubles cancel
    bit-for-bit). The canonical DSIR sanity invariant."""
    from erpl_web_spark.operators.curation import dsir_logweights

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i % 3} beta alpha") for i in range(12)],
        "doc_id long, text string",
    )
    out = dsir_logweights(docs, docs, "doc_id", "text", buckets=64).collect()
    assert len(out) == 12
    assert all(r["log_w"] == 0.0 for r in out)
    assert all(r["n_grams"] == 5 for r in out)


def test_dsir_target_like_docs_score_higher(spark):
    """Documents sharing the target's vocabulary must out-score
    documents that don't, and < 2-token documents pass through as
    (0, 0.0) — the resampling contract downstream filters rely on."""
    from erpl_web_spark.operators.curation import dsir_logweights

    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zz9 qq8 kk7 vv6 zz9 qq8 kk7 vv6 zz9 qq8"),
            (3, "fox"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10 + i, "the quick brown fox likes the quick brown dog") for i in range(4)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_logweights(raw, target, "doc_id", "text").collect()}
    assert rows[1]["log_w"] > rows[2]["log_w"]
    assert rows[3]["n_grams"] == 0 and rows[3]["log_w"] == 0.0


def test_linear_probe_recovers_exact_relationship(spark):
    """On exactly-linear integer data the probe must recover the plane:
    residuals are 0 to machine precision and the weights match the
    generating coefficients."""
    from erpl_web_spark.operators.curation import fit_linear_probe

    rows = []
    for i in range(40):
        x1, x2, x3 = i % 7, (i * 3) % 11, (i * 5) % 13
        rows.append((i, x1, x2, x3, 2 * x1 + 3 * x2 - x3 + 7))
    df = spark.createDataFrame(rows, "id long, f1 long, f2 long, f3 long, y long")
    scored, w = fit_linear_probe(
        df, "id", [F.col("f1"), F.col("f2"), F.col("f3")], F.col("y")
    )
    assert abs(w["w1"] - 2) < 1e-9 and abs(w["w2"] - 3) < 1e-9
    assert abs(w["w3"] + 1) < 1e-9 and abs(w["b0"] - 7) < 1e-9
    assert all(abs(r["resid"]) < 1e-6 for r in scored.collect())


def test_linear_probe_rejects_singular_design(spark):
    """Collinear features (x3 = x1 + x2) must raise loudly, never
    return NaN weights."""
    import pytest as _pytest

    from erpl_web_spark.operators.curation import fit_linear_probe

    rows = [(i, i % 5, (i * 2) % 7, i % 5 + (i * 2) % 7, i) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, f1 long, f2 long, f3 long, y long")
    with _pytest.raises(ValueError, match="singular"):
        fit_linear_probe(df, "id", [F.col("f1"), F.col("f2"), F.col("f3")], F.col("y"))


def test_linear_probe_weights_bit_identical_to_duckdb(spark):
    """The determinism CONTRACT of fit_linear_probe, pinned exactly:
    DuckDB replaying the operator's fixed IEEE expression tree (the
    same n*Sij - Si*Sj centering and Sarrus parenthesization) produces
    the SAME binary64 weights — == equality, not approx — on data with
    noise (non-zero residuals), so the agreement is not an artifact of
    an exact linear plane."""
    duckdb = pytest.importorskip("duckdb")
    from erpl_web_spark.operators.curation import fit_linear_probe

    rows = []
    for i in range(200):
        x1 = (i * 7) % 23
        x2 = (i * i) % 31
        x3 = (i * 13) % 17
        y = 5 * x1 - 2 * x2 + 3 * x3 + (i % 11) - 4  # noisy plane
        rows.append((i, x1, x2, x3, y))
    df = spark.createDataFrame(rows, "id long, f1 long, f2 long, f3 long, y long")
    _, w = fit_linear_probe(
        df, "id", [F.col("f1"), F.col("f2"), F.col("f3")], F.col("y")
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, x1 BIGINT, x2 BIGINT, x3 BIGINT, y BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    det = (
        "{p00} * ({p11} * {p22} - {p12} * {p21})"
        " - {p01} * ({p10} * {p22} - {p12} * {p20})"
        " + {p02} * ({p10} * {p21} - {p11} * {p20})"
    )

    def d3(m):
        return det.format(
            p00=m[0][0], p01=m[0][1], p02=m[0][2],
            p10=m[1][0], p11=m[1][1], p12=m[1][2],
            p20=m[2][0], p21=m[2][1], p22=m[2][2],
        )

    dd = d3([["a11", "a12", "a13"], ["a12", "a22", "a23"], ["a13", "a23", "a33"]])
    n1 = d3([["b1", "a12", "a13"], ["b2", "a22", "a23"], ["b3", "a23", "a33"]])
    n2 = d3([["a11", "b1", "a13"], ["a12", "b2", "a23"], ["a13", "b3", "a33"]])
    n3 = d3([["a11", "a12", "b1"], ["a12", "a22", "b2"], ["a13", "a23", "b3"]])
    got = con.execute(f"""
      WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) n,
               CAST(SUM(x1) AS BIGINT) s1, CAST(SUM(x2) AS BIGINT) s2,
               CAST(SUM(x3) AS BIGINT) s3, CAST(SUM(y) AS BIGINT) sy,
               CAST(SUM(x1*x1) AS BIGINT) s11, CAST(SUM(x1*x2) AS BIGINT) s12,
               CAST(SUM(x1*x3) AS BIGINT) s13, CAST(SUM(x2*x2) AS BIGINT) s22,
               CAST(SUM(x2*x3) AS BIGINT) s23, CAST(SUM(x3*x3) AS BIGINT) s33,
               CAST(SUM(x1*y) AS BIGINT) s1y, CAST(SUM(x2*y) AS BIGINT) s2y,
               CAST(SUM(x3*y) AS BIGINT) s3y
        FROM t
      ), c AS (
        SELECT CAST(n*s11 - s1*s1 AS DOUBLE) a11, CAST(n*s12 - s1*s2 AS DOUBLE) a12,
               CAST(n*s13 - s1*s3 AS DOUBLE) a13, CAST(n*s22 - s2*s2 AS DOUBLE) a22,
               CAST(n*s23 - s2*s3 AS DOUBLE) a23, CAST(n*s33 - s3*s3 AS DOUBLE) a33,
               CAST(n*s1y - s1*sy AS DOUBLE) b1, CAST(n*s2y - s2*sy AS DOUBLE) b2,
               CAST(n*s3y - s3*sy AS DOUBLE) b3,
               CAST(sy AS DOUBLE) dsy, CAST(s1 AS DOUBLE) ds1,
               CAST(s2 AS DOUBLE) ds2, CAST(s3 AS DOUBLE) ds3, CAST(n AS DOUBLE) dn
        FROM m
      ), w AS (
        SELECT ({n1}) / ({dd}) w1, ({n2}) / ({dd}) w2, ({n3}) / ({dd}) w3,
               dsy, ds1, ds2, ds3, dn
        FROM c
      )
      SELECT w1, w2, w3, (dsy - w1*ds1 - w2*ds2 - w3*ds3) / dn AS b0 FROM w
    """).fetchone()
    assert got[0] == w["w1"] and got[1] == w["w2"]
    assert got[2] == w["w3"] and got[3] == w["b0"]


def test_weighted_sample_determinism_and_rank_contract(spark):
    """weighted_sample (A-ES): same seed -> identical sample under any
    partitioning; ranks are 1..k; excluded rows have non-positive
    weight; a different seed draws a different sample."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.curation import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("w")
    )
    a = weighted_sample(df, 50, "w", "doc_id", seed="s1").collect()
    b = weighted_sample(df.repartition(13), 50, "w", "doc_id", seed="s1").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["sample_rank"] for r in a] == list(range(1, 51))
    c = weighted_sample(df, 50, "w", "doc_id", seed="s2").collect()
    assert {r["doc_id"] for r in a} != {r["doc_id"] for r in c}
    # zero/negative weights never sampled
    z = weighted_sample(
        df.withColumn("w", F.when(F.col("doc_id") < 990, 0).otherwise(F.col("w"))),
        50, "w", "doc_id", seed="s1",
    ).collect()
    assert len(z) == 10 and all(r["doc_id"] >= 990 for r in z)


def test_weighted_sample_respects_weights_statistically(spark):
    """Heavy rows (weight 100x) must dominate the sample: with 100 of
    2000 rows carrying 100x weight, the expected heavy share of a
    k=200 draw is ~84% (without-replacement inclusion odds); a uniform
    sampler would pick ~5%. The margin is wide enough that the
    deterministic lattice-u draw clears it for any reasonable seed."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.curation import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 100.0).otherwise(1.0).alias("w"),
    )
    out = weighted_sample(df, 200, "w", "doc_id", seed="stat").collect()
    heavy = sum(1 for r in out if r["doc_id"] < 100)
    assert heavy >= 70, f"heavy rows underrepresented: {heavy}/200"


def test_hll_distinct_accuracy_bands(spark):
    """hll_distinct (p=8, 256 registers) must land inside HyperLogLog's
    error band on known cardinalities: 1.04/sqrt(256) = 6.5% standard
    error for the raw branch (20000 distinct values; assert < 3 sigma),
    and linear counting on the small-range branch (60 distinct; assert
    < 10%). Also pins partitioning invariance — register max is the
    combine, so the estimate cannot depend on the layout."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import hll_distinct

    big = spark.range(20000).select(
        F.lit(0).alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    est = hll_distinct(big, ["g"], "v", p=8).collect()[0]["hll_est"]
    assert abs(est - 20000) / 20000 < 0.20, est

    small = spark.range(60).select(
        F.lit(0).alias("g"), F.concat(F.lit("w"), F.col("id")).alias("v")
    )
    est_s = hll_distinct(small, ["g"], "v", p=8).collect()[0]["hll_est"]
    assert abs(est_s - 60) / 60 < 0.10, est_s

    est2 = hll_distinct(big.repartition(13), ["g"], "v", p=8).collect()[0][
        "hll_est"
    ]
    assert est2 == est  # bit-identical under any partitioning


def test_hll_index_incremental_batches(spark, tmp_path):
    """The on-disk HLL index: two committed batches must estimate like
    the one-pass sketch over their union; a replayed batch id is a
    no-op; a torn data write without its manifest stays invisible; a
    precision mismatch is refused (registers of different p cannot
    merge)."""
    import pytest
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.hll_index import (
        hll_index_apply,
        hll_index_estimate,
        read_hll_registers,
    )
    from erpl_web_spark.operators.text import hll_distinct

    idx = str(tmp_path / "hllidx")
    whole = spark.range(4000).select(
        (F.col("id") % 2).alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    b0 = whole.where(F.col("id") % 3 != 0)
    b1 = whole.where(F.col("id") % 3 != 1)  # overlaps b0
    hll_index_apply(b0, 0, idx, ["g"], "v", p=8)
    hll_index_apply(b1, 1, idx, ["g"], "v", p=8)
    got = {
        r["g"]: r["hll_est"] for r in hll_index_estimate(spark, idx).collect()
    }
    direct = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(
            b0.unionByName(b1).distinct(), ["g"], "v", p=8
        ).collect()
    }
    assert got == direct  # register merge is lossless, estimates equal

    # replayed batch: no-op (identical estimate, no duplicate version)
    hll_index_apply(b0.limit(1), 0, idx, ["g"], "v", p=8)
    got2 = {
        r["g"]: r["hll_est"] for r in hll_index_estimate(spark, idx).collect()
    }
    assert got2 == got

    # torn write: data dir without manifest is invisible by protocol
    whole.limit(5).select("g", F.lit(0).alias("__idx"), F.lit(40).alias("__r")) \
        .write.mode("overwrite").parquet(f"{idx}/hllregs=9")
    assert {
        r["g"]: r["hll_est"] for r in hll_index_estimate(spark, idx).collect()
    } == got

    # precision mismatch refused
    with pytest.raises(ValueError):
        hll_index_apply(b0, 2, idx, ["g"], "v", p=10)
    n_regs = read_hll_registers(spark, idx).count()
    assert n_regs <= 2 * 256


def test_hll_index_streaming_e2e(spark, tmp_path):
    """The HLL index behind a real checkpointed file stream:
    foreachBatch(hll_index_apply) with epoch_id as the batch version —
    after two availableNow passes over growing input, the index
    estimate equals the one-pass sketch over everything seen."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.hll_index import hll_index_estimate
    from erpl_web_spark.operators.hll_index import hll_index_apply
    from erpl_web_spark.operators.text import hll_distinct

    src = tmp_path / "hsrc"
    src.mkdir()
    idx = str(tmp_path / "hidx")
    ckpt = str(tmp_path / "hckpt")
    schema = "g long, v string"

    def run_stream():
        (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda df, bid: hll_index_apply(df, bid, idx, ["g"], "v", p=8)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 2).alias("g"),
            F.concat(F.lit("s"), F.col("id")).alias("v"),
        )

    batch(0, 1500).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    batch(1000, 2500).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()

    got = {r["g"]: r["hll_est"] for r in hll_index_estimate(spark, idx).collect()}
    direct = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(batch(0, 2500), ["g"], "v", p=8).collect()
    }
    assert got == direct


def test_qsketch_index_streaming_e2e(spark, tmp_path):
    """The quantile index behind a real checkpointed file stream:
    foreachBatch(qsketch_index_apply) with epoch_id as the batch
    version — after two availableNow passes over growing input, the
    merged index equals the one-pass sketch over everything seen
    BIT-EXACTLY (additivity), and quantile estimates match."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.qsketch import (
        logbucket_quantiles,
        logbucket_sketch,
        qsketch_index_apply,
        qsketch_index_quantiles,
        read_qsketch_index,
    )

    src = tmp_path / "qssrc"
    src.mkdir()
    idx = str(tmp_path / "qsidx")
    ckpt = str(tmp_path / "qsckpt")

    def run_stream():
        (
            spark.readStream.schema("v long")
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda df, bid: qsketch_index_apply(df, bid, idx, "v", sub_bits=4)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            ((F.col("id") * F.col("id") * 31) % 700000).alias("v")
        )

    batch(0, 1500).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    batch(1500, 3000).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()

    merged = {
        (r["edge"], r["width"]): r["cnt"]
        for r in read_qsketch_index(spark, idx).collect()
    }
    direct_sk = logbucket_sketch(batch(0, 3000), "v", sub_bits=4)
    direct = {
        (r["edge"], r["width"]): r["cnt"] for r in direct_sk.collect()
    }
    assert merged == direct
    got_q = {
        r["q_permille"]: (r["rank_r"], r["est_edge"])
        for r in qsketch_index_quantiles(spark, idx, [500, 990]).collect()
    }
    want_q = {
        r["q_permille"]: (r["rank_r"], r["est_edge"])
        for r in logbucket_quantiles(direct_sk, [500, 990]).collect()
    }
    assert got_q == want_q


def test_scd2_asof_lookup_boundaries(spark):
    """scd2_asof_lookup on a hand-built history: a fact AT an
    interval's valid-from matches it (closed start), a fact AT the
    next change's seq matches the NEXT interval (open end), a fact
    before the first change gets NULLs, a fact in a deleted gap gets
    NULLs, and a fact after a re-insert matches the current row."""
    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.cdc import scd2_asof_lookup, scd2_intervals

    changes = spark.createDataFrame(
        [(1, "a1", "U", 10), (1, "a2", "U", 20), (1, "a2", "D", 30),
         (1, "a3", "U", 40)],
        "k long, val string, op string, seq long",
    )
    hist = scd2_intervals(changes, ["k"], ["seq"], op_col="op")
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 20), (103, 1, 35),
         (104, 1, 50), (105, 2, 10)],
        "fid long, k long, ts long",
    )
    out = {
        r["fid"]: r["val"]
        for r in scd2_asof_lookup(
            facts, hist, ["k"], fact_seq=["ts"], hist_seq=["seq"]
        ).collect()
    }
    assert out == {
        100: None,   # before first change
        101: "a1",   # closed start: ts == valid_from
        102: "a2",   # open end: ts == next change's seq -> next interval
        103: None,   # deleted gap (delete at 30 closed a2, nothing open)
        104: "a3",   # re-insert current
        105: None,   # unknown key
    }


def test_quality_report_counts_and_null_semantics(spark):
    """quality_report: NULL predicate results count as FAILURES (an
    unknown is not a pass), uniqueness counts duplicates exactly, and
    referential_report counts orphans while exempting NULL keys."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.expectations import (
        quality_report,
        referential_report,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -4), (3, 7)], "k long, v long"
    )
    rep = {
        r["check_name"]: (r["n_rows"], r["n_failed"], r["passed"])
        for r in quality_report(
            df,
            row_checks={"nonneg_v": F.col("v") >= 0},
            unique_keys={"unique_k": ["k"]},
        ).collect()
    }
    # NULL v fails nonneg (unknown != pass); -4 fails; k=3 duplicated
    assert rep == {"nonneg_v": (4, 2, 0), "unique_k": (4, 1, 0)}

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k long")
    ri = referential_report(child, parent, ["k"], "ri").collect()[0]
    # NULL key exempt (3-row baseline), one orphan
    assert (ri["n_rows"], ri["n_failed"], ri["passed"]) == (3, 1, 0)

    # NULL-keyed rows are EXEMPT from uniqueness (cannot be compared),
    # not counted as duplicates
    nk = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    u = quality_report(nk, unique_keys={"u": ["k"]}).collect()[0]
    assert (u["n_failed"], u["passed"]) == (0, 1)

    # an EMPTY batch passes every check with 0 failures (no
    # three-valued NULL report at the publish gate)
    empty = spark.createDataFrame([], "k long, v long")
    er = {
        r["check_name"]: (r["n_rows"], r["n_failed"], r["passed"])
        for r in quality_report(
            empty,
            row_checks={"nonneg_v": F.col("v") >= 0},
            unique_keys={"unique_k": ["k"]},
        ).collect()
    }
    assert er == {"nonneg_v": (0, 0, 1), "unique_k": (0, 0, 1)}

    # adversarial check names are data, not SQL
    wr = quality_report(
        df, row_checks={"price's check, has space": F.col("v") >= 0}
    ).collect()[0]
    assert wr["check_name"] == "price's check, has space"
    import pytest

    with pytest.raises(ValueError):
        quality_report(
            df, row_checks={"x": F.col("v") >= 0}, unique_keys={"x": ["k"]}
        )


def test_drift_report_tolerance_boundary_and_null_semantics(spark, tmp_path):
    """Cross-batch drift tier (VERDICT r13 Next #5): the tolerance is
    INCLUSIVE (delta == limit passes, the tiniest excess fails — pinned
    with an exactly-representable 0.25 rel delta), a vanished baseline
    (prev=0, curr>0) is a NULL-delta FAIL, prev=curr=0 is drift 0,
    fewer than two committed batches yields None (no history), a
    replayed batch id never duplicates history, and a metric present
    on only one side fails."""
    import pytest  # noqa: F401

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.expectations import (
        batch_metrics,
        drift_report,
        metrics_apply,
    )

    path = str(tmp_path / "metrics")

    # batch 0: 4 rows, no nulls in v; batch 1: 5 rows (rel delta
    # exactly 0.25 — 5/4-1 is exact in binary), v entirely null
    b0 = spark.createDataFrame([(i, "x") for i in range(4)], "k long, v string")
    b1 = spark.createDataFrame([(i, None) for i in range(5)], "k long, v string")
    metrics_apply(b0, 0, path, key_cols=["k"], rate_cols=["v"])
    assert drift_report(spark, path, {"n_rows": ("rel", 0.25)}) is None
    metrics_apply(b1, 1, path, key_cols=["k"], rate_cols=["v"])
    # replayed batch id: history unchanged (still exactly 2 versions)
    metrics_apply(b0, 1, path, key_cols=["k"], rate_cols=["v"])
    assert manifests.committed_versions(spark, path, "metrics") == [0, 1]

    def report(tol):
        return {
            r["metric"]: r
            for r in drift_report(spark, path, tol).collect()
        }

    at = report({"n_rows": ("rel", 0.25), "null_rate:v": ("abs", 1.0)})
    assert at["n_rows"]["delta"] == 0.25 and at["n_rows"]["passed"] == 1
    assert at["null_rate:v"]["delta"] == 1.0 and at["null_rate:v"]["passed"] == 1
    below = report({"n_rows": ("rel", 0.2499999), "null_rate:v": ("abs", 0.9)})
    assert below["n_rows"]["passed"] == 0
    assert below["null_rate:v"]["passed"] == 0

    # vanished baseline: prev=0 distinct keys is undefined relative
    # change -> NULL delta, FAIL; prev=curr=0 is drift 0, PASS
    p2 = str(tmp_path / "zero")
    e0 = spark.createDataFrame([], "k string, v string")  # 0 rows
    e1 = spark.createDataFrame([("a", None)], "k string, v string")
    metrics_apply(e0, 0, p2, key_cols=["k"], rate_cols=["v"])
    metrics_apply(e1, 1, p2, key_cols=["k"], rate_cols=["v"])
    z = {
        r["metric"]: r
        for r in drift_report(
            spark, p2, {"n_rows": ("rel", 100.0), "null_rate:v": ("abs", 2.0)}
        ).collect()
    }
    assert z["n_rows"]["delta"] is None and z["n_rows"]["passed"] == 0
    # empty batch's null rate is 0.0 (not NULL): abs drift 1.0, passes
    assert z["null_rate:v"]["delta"] == 1.0 and z["null_rate:v"]["passed"] == 1

    # a toleranced metric absent from BOTH batches must FAIL loudly
    # (one row, NULL values, passed 0), not silently vanish from the
    # report — a gate that asks for a check must see its verdict
    ghost = report({"n_rows": ("rel", 0.25), "null_rate:nosuch": ("abs", 1.0)})
    assert ghost["null_rate:nosuch"]["passed"] == 0
    assert ghost["null_rate:nosuch"]["prev_value"] is None
    assert ghost["n_rows"]["passed"] == 1  # real metrics unaffected

    # prev = curr = 0 (two empty batches) is drift 0: PASS
    p4 = str(tmp_path / "empty2")
    metrics_apply(e0, 0, p4, key_cols=["k"])
    metrics_apply(e0, 1, p4, key_cols=["k"])
    z2 = {
        r["metric"]: r
        for r in drift_report(spark, p4, {"n_rows": ("rel", 0.0)}).collect()
    }
    assert z2["n_rows"]["delta"] == 0.0 and z2["n_rows"]["passed"] == 1

    # a metric only one side has (schema change between batches) fails
    p3 = str(tmp_path / "skew")
    metrics_apply(b0, 0, p3, key_cols=["k"])  # no rate metric
    metrics_apply(b1, 1, p3, key_cols=["k"], rate_cols=["v"])
    s = {
        r["metric"]: r
        for r in drift_report(spark, p3, {"null_rate:v": ("abs", 1.0)}).collect()
    }
    assert s["null_rate:v"]["passed"] == 0

    # batch_metrics tall shape is (metric, value) with exact counts
    got = {r["metric"]: r["value"] for r in batch_metrics(b0, ["k"], ["v"]).collect()}
    assert got == {"n_rows": 4.0, "n_distinct_keys": 4.0, "null_rate:v": 0.0}


def test_batch_metrics_histogram_shares(spark, tmp_path):
    """hist_cols binning semantics: exact equi-width shares over the
    non-NULL values, outliers CLAMPED into the edge bins (not
    dropped), NULLs excluded from the denominator (null_rate owns
    them), all-NULL column -> every bin share 0.0; and the per-bin abs
    drift detects a planted mass shift while stable bins pass."""
    from erpl_web_spark.operators.expectations import (
        batch_metrics,
        drift_report,
        hist_tolerances,
        metrics_apply,
    )

    # 8 non-null values on [0, 10) with 5 bins (width 2): bins get
    # 2/8, 2/8, 0, 2/8, 2/8 — including the clamped outliers -3 -> bin
    # 0 and 99 -> bin 4; one NULL excluded from the denominator
    vals = [0.1, 1.9, 2.0, 3.5, 6.0, 7.9, -3.0, 99.0, None]
    df = spark.createDataFrame([(float(v),) if v is not None else (None,) for v in vals], "x double")
    got = {
        r["metric"]: r["value"]
        for r in batch_metrics(df, hist_cols={"x": (0.0, 10.0, 5)}).collect()
    }
    # bin0: 0.1, 1.9, clamped -3; bin1: 2.0, 3.5; bin3: 6.0, 7.9;
    # bin4: clamped 99
    expect = {0: 3 / 8, 1: 2 / 8, 2: 0.0, 3: 2 / 8, 4: 1 / 8}
    assert {b: got[f"hist:x:{b}"] for b in range(5)} == expect
    assert got["n_rows"] == 9.0

    # all-NULL column: shares all 0.0, not NULL/NaN
    allnull = spark.createDataFrame([(None,), (None,)], "x double")
    g2 = {
        r["metric"]: r["value"]
        for r in batch_metrics(allnull, hist_cols={"x": (0.0, 10.0, 3)}).collect()
    }
    assert [g2[f"hist:x:{b}"] for b in range(3)] == [0.0, 0.0, 0.0]

    # drift: batch 1 moves half of bin-0's mass to bin 4
    p = str(tmp_path / "hist")
    b0 = spark.createDataFrame([(float(v),) for v in [1.0] * 4 + [9.0] * 4], "x double")
    b1 = spark.createDataFrame([(float(v),) for v in [1.0] * 2 + [9.0] * 6], "x double")
    metrics_apply(b0, 0, p, hist_cols={"x": (0.0, 10.0, 5)})
    metrics_apply(b1, 1, p, hist_cols={"x": (0.0, 10.0, 5)})
    rep = {
        r["metric"]: r
        for r in drift_report(spark, p, hist_tolerances("x", 5, 0.1)).collect()
    }
    assert rep["hist:x:0"]["passed"] == 0 and rep["hist:x:0"]["delta"] == 0.25
    assert rep["hist:x:4"]["passed"] == 0
    assert all(rep[f"hist:x:{b}"]["passed"] == 1 for b in (1, 2, 3))


def test_scd2_intervals_history_semantics(spark):
    """scd2_intervals on a hand-built change chain: upsert -> upsert ->
    delete -> re-insert must yield three intervals — the first closed
    by the second, the second closed BY THE DELETE (which emits no
    interval itself), the re-insert current — and a key whose only
    change is an upsert stays current with open end columns."""
    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.cdc import scd2_intervals

    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 10),
            (1, "a2", "U", 20),
            (1, "a2", "D", 30),
            (1, "a3", "U", 40),
            (2, "b1", "U", 15),
        ],
        "k long, val string, op string, seq long",
    )
    out = {
        (r["k"], r["seq"]): (r["val"], r["end_seq"], r["is_current"])
        for r in scd2_intervals(changes, ["k"], ["seq"], op_col="op").collect()
    }
    assert out == {
        (1, 10): ("a1", 20, False),
        (1, 20): ("a2", 30, False),  # closed by the delete
        (1, 40): ("a3", None, True),  # re-insert is current
        (2, 15): ("b1", None, True),
    }


def test_countmin_index_incremental_batches(spark, tmp_path):
    """The on-disk Count-Min index: counters are ADDITIVE, so the
    merged index must equal the single-pass sketch over the
    concatenated corpus BIT-EXACTLY (not just within the eps*N bound),
    point estimates keep the one-sided >= contract, a replayed batch
    never double-counts, and a geometry mismatch is refused."""
    import pytest
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.cms_index import (
        countmin_index_apply,
        countmin_index_lookup,
        read_countmin_index,
    )
    from erpl_web_spark.operators.text import countmin_sketch

    idx = str(tmp_path / "cmsidx")
    b0 = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, "gamma alpha")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "beta delta delta delta"), (3, "alpha")], "doc_id long, text string"
    )
    countmin_index_apply(b0, 0, idx, depth=4, width=64)
    countmin_index_apply(b1, 1, idx, depth=4, width=64)

    whole = b0.unionByName(b1)
    direct = {
        (r["d"], r["w"]): r["cnt"]
        for r in countmin_sketch(whole, depth=4, width=64).collect()
    }
    merged = {
        (r["d"], r["w"]): r["cnt"]
        for r in read_countmin_index(spark, idx).collect()
    }
    assert merged == direct  # additive merge == sketch of concatenation

    toks = spark.createDataFrame(
        [("alpha",), ("beta",), ("delta",), ("unseen",)], "tok string"
    )
    est = {
        r["tok"]: r["est_n"]
        for r in countmin_index_lookup(spark, idx, toks).collect()
    }
    true = {"alpha": 3, "beta": 3, "delta": 3, "unseen": 0}
    assert all(est[t] >= n for t, n in true.items())  # one-sided contract

    # replay: counters unchanged (no double add)
    countmin_index_apply(b0, 0, idx, depth=4, width=64)
    assert {
        (r["d"], r["w"]): r["cnt"]
        for r in read_countmin_index(spark, idx).collect()
    } == direct

    with pytest.raises(ValueError):
        countmin_index_apply(b0, 2, idx, depth=4, width=128)


def test_countmin_index_rebuild(spark, tmp_path):
    """countmin_index_rebuild (VERDICT r13 Next #4): the fresh-path
    rewrite the compaction refusal prescribes. Estimates must be
    IDENTICAL pre/post rebuild, the rebuilt index collapses to one
    committed version, a crash mid-rebuild (torn dest data, no
    manifest) replays to the same result, a second run is idempotent,
    appends continue after the swap, and an in-place rebuild is
    refused."""
    import pytest

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.cms_index import (
        countmin_index_apply,
        countmin_index_lookup,
        countmin_index_rebuild,
        read_countmin_index,
    )

    idx = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    batches = [
        spark.createDataFrame(
            [(0, "alpha beta beta"), (1, "gamma alpha")],
            "doc_id long, text string",
        ),
        spark.createDataFrame(
            [(2, "beta delta delta delta"), (3, "alpha")],
            "doc_id long, text string",
        ),
        spark.createDataFrame(
            [(4, "alpha epsilon epsilon")], "doc_id long, text string"
        ),
    ]
    for i, b in enumerate(batches):
        countmin_index_apply(b, i, idx, depth=4, width=64)
    toks = spark.createDataFrame(
        [("alpha",), ("beta",), ("delta",), ("epsilon",), ("unseen",)],
        "tok string",
    )

    def estimates(path):
        return {
            r["tok"]: r["est_n"]
            for r in countmin_index_lookup(spark, path, toks).collect()
        }

    pre = estimates(idx)

    # crash window 1 — mid data write (no _SUCCESS): invisible to readers
    import os

    spark.createDataFrame([(0, 0, 99)], "d int, w int, cnt long").write.mode(
        "overwrite"
    ).parquet(f"{dest}/cms=2")
    os.remove(f"{dest}/cms=2/_SUCCESS")
    assert read_countmin_index(spark, dest) is None
    # crash window 2 — data committed (_SUCCESS) but manifest missing:
    # a reader refuses LOUDLY instead of guessing at the torn state...
    open(f"{dest}/cms=2/_SUCCESS", "w").close()
    with pytest.raises(RuntimeError, match="pre-manifest"):
        read_countmin_index(spark, dest)

    # ...and the rebuild replay repairs both windows
    n = countmin_index_rebuild(spark, idx, dest)
    assert n == 2
    assert manifests.committed_versions(spark, dest, "cms") == [2]
    assert estimates(dest) == pre  # identical pre/post
    # merged cells equal the source's merged view bit-exactly
    src_cells = {
        (r["d"], r["w"]): r["cnt"]
        for r in read_countmin_index(spark, idx).collect()
    }
    dest_cells = {
        (r["d"], r["w"]): r["cnt"]
        for r in read_countmin_index(spark, dest).collect()
    }
    assert dest_cells == src_cells

    # idempotent second run (replay after a post-commit crash)
    assert countmin_index_rebuild(spark, idx, dest) == 2
    assert estimates(dest) == pre

    # appends continue past the rebuilt version at the new path
    extra = spark.createDataFrame([(5, "alpha alpha")], "doc_id long, text string")
    countmin_index_apply(extra, 3, dest, depth=4, width=64)
    post = estimates(dest)
    assert post["alpha"] >= pre["alpha"] + 2
    assert post["unseen"] >= 0 and post["delta"] >= pre["delta"]

    # in-place rebuild is the refused compaction
    with pytest.raises(ValueError, match="in-place"):
        countmin_index_rebuild(spark, idx, idx)
    # a dest already holding OTHER committed versions (the post-swap
    # appended batch 3 above) must be refused: writing the rebuilt
    # total NEXT TO live versions would double-count every cell
    with pytest.raises(ValueError, match="already holds"):
        countmin_index_rebuild(spark, idx, dest)
    # geometry mismatch at a replay-shaped dest (holds ONLY the
    # rebuilt version id, but with different geometry) is refused
    other = str(tmp_path / "other")
    countmin_index_apply(batches[0], 0, other, depth=4, width=128)
    dest2 = str(tmp_path / "dest2")
    countmin_index_apply(batches[0], 0, dest2, depth=4, width=64)
    with pytest.raises(ValueError, match="width"):
        countmin_index_rebuild(spark, other, dest2)


def test_quantile_metrics_drift_tier(spark, tmp_path):
    """expectations.quantile_metrics: the persisted q:<col>:<pm> edges
    drift-compare exactly like any metric (a 2x scale shift fails a
    0.2 rel tolerance, an identical batch passes with delta 0), and an
    EMPTY batch emits NO quantile rows — which the ghost-metric rule
    turns into a LOUD failure instead of a silently-passing publish."""
    from erpl_web_spark.operators.expectations import (
        drift_report,
        metrics_apply,
        quantile_metrics,
        quantile_tolerances,
    )

    base = spark.range(2000).select((F.col("id") * 13 % 90000).alias("v"))
    doubled = base.select((F.col("v") * 2).alias("v"))

    # metric naming + values equal the direct sketch quantiles
    qm = {r["metric"]: r["value"]
          for r in quantile_metrics(base, "v", [500, 990]).collect()}
    assert set(qm) == {"q:v:500", "q:v:990"}
    assert all(float(v).is_integer() and v > 0 for v in qm.values())

    tol = quantile_tolerances("v", [500, 990], 0.2)
    p = str(tmp_path / "qdrift")
    metrics_apply(base, 0, p, quantile_cols={"v": [500, 990]})
    metrics_apply(base, 1, p, quantile_cols={"v": [500, 990]})
    same = {r["metric"]: r for r in drift_report(spark, p, tol).collect()}
    assert all(r["passed"] == 1 and r["delta"] == 0.0 for r in same.values())

    metrics_apply(doubled, 2, p, quantile_cols={"v": [500, 990]})
    shifted = {r["metric"]: r for r in drift_report(spark, p, tol).collect()}
    # a 2x scale shift moves every log-bucket edge by ~1.0 rel
    assert all(r["passed"] == 0 and r["delta"] > 0.5 for r in shifted.values())

    # empty batch: no quantile rows -> toleranced metrics fail loudly
    empty = base.where(F.lit(False))
    metrics_apply(empty, 3, p, quantile_cols={"v": [500, 990]})
    ghost = {r["metric"]: r for r in drift_report(spark, p, tol).collect()}
    assert all(
        r["passed"] == 0 and r["curr_value"] is None for r in ghost.values()
    )


def test_kcore_peel_model_and_cascade(spark):
    """graph.kcore_peel: matches a Python model of bounded peeling on
    a pseudo-random graph; on a K5 clique with a pendant chain the
    chain peels (CASCADING — each removal exposes the next) while the
    clique survives at full internal degree; k<1 raises."""
    import pytest

    from erpl_web_spark.operators.graph import kcore_peel

    def model(edge_list, k, rounds):
        edges = set()
        for a, b in edge_list:
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
        nodes = {v for e in edges for v in e}
        live = set(edges)
        for _ in range(rounds):
            deg = {}
            for s, _t in live:
                deg[s] = deg.get(s, 0) + 1
            alive = {v for v, d in deg.items() if d >= k}
            live = {(s, t) for (s, t) in live if s in alive and t in alive}
        fdeg = {}
        for s, _t in live:
            fdeg[s] = fdeg.get(s, 0) + 1
        return {
            v: (1 if v in fdeg else 0, fdeg.get(v, 0)) for v in nodes
        }

    rand_edges = sorted(
        {((i * 7919) % 31, (i * i * 104729 + 3) % 31) for i in range(90)}
        - {(v, v) for v in range(31)}
    )
    df = spark.createDataFrame(rand_edges, "src long, dst long")
    got = {
        r["id"]: (r["survived"], r["deg_final"])
        for r in kcore_peel(df, k=4, rounds=3).collect()
    }
    assert got == model(rand_edges, 4, 3)

    # K5 clique (degrees 4) + pendant chain 5-6-7 (degrees <= 2):
    # k=3 peels the chain over two cascading rounds, keeps the clique
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    cl = spark.createDataFrame(k5 + chain, "src long, dst long")
    labs = {
        r["id"]: (r["survived"], r["deg_final"])
        for r in kcore_peel(cl, k=3, rounds=3).collect()
    }
    assert all(labs[v] == (1, 4) for v in range(4))
    assert labs[4][0] == 1  # clique member keeps >= 4 after chain peels
    assert labs[5] == (0, 0) and labs[6] == (0, 0) and labs[7] == (0, 0)
    assert labs == model(k5 + chain, 3, 3)

    with pytest.raises(ValueError, match="k must be"):
        kcore_peel(cl, k=0)


def test_join_size_estimate_one_sided(spark):
    """relational.join_size_estimate: with a collision-free width the
    CMS inner product equals the exact join size; undersized widths
    only ever OVERcount (the one-sided contract); NULL keys join
    nothing and must not inflate the estimate."""
    from erpl_web_spark.operators.relational import join_size_estimate

    l = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "k long")
    r = spark.createDataFrame([(1,), (2,), (2,), (4,), (None,)], "k long")
    exact = l.join(r, "k").count()
    assert exact == 4  # key1: 2x1, key2: 1x2

    wide = join_size_estimate(l, r, "k", "k", depth=3, width=4096)
    assert wide.collect()[0]["est_join_rows"] == exact
    narrow = join_size_estimate(l, r, "k", "k", depth=3, width=2)
    assert narrow.collect()[0]["est_join_rows"] >= exact

    # a many-to-many self-join: exact = sum of squared key counts
    m = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
    est = join_size_estimate(m, m, "k", "k", depth=3, width=4096)
    assert est.collect()[0]["est_join_rows"] == 10 * 10 * 3


def test_logbucket_equidepth_partitions_exactly(spark):
    """qsketch.logbucket_equidepth: the reported per-partition counts
    must equal what filtering the corpus at the returned bounds
    actually yields (the audit IS exact, not an estimate), sum to N,
    and be near-balanced on uniform data."""
    from erpl_web_spark.operators.qsketch import (
        logbucket_equidepth,
        logbucket_sketch,
    )

    df = spark.range(8000).select((F.col("id") * 17 % 40000).alias("v"))
    sk = logbucket_sketch(df, "v", sub_bits=4)
    parts = sorted(
        logbucket_equidepth(sk, 8).collect(), key=lambda r: r["bucket"]
    )
    assert [p["bucket"] for p in parts] == list(range(8))
    assert sum(p["n_rows"] for p in parts) == 8000
    assert parts[0]["lo_edge"] == 0
    vals = [r["v"] for r in df.collect()]
    bounds = [p["lo_edge"] for p in parts] + [float("inf")]
    # the docstring's granularity bound, asserted EXACTLY: a partition
    # can miss ideal only by rows sharing its two boundary buckets
    cnts = {r["edge"]: r["cnt"] for r in sk.collect()}
    for i, p in enumerate(parts):
        realized = sum(1 for v in vals if bounds[i] <= v < bounds[i + 1])
        assert p["n_rows"] == realized
        assert p["ideal_rows"] == 1000
        slack = cnts.get(bounds[i], 0) + (
            cnts.get(bounds[i + 1], 0) if i + 1 < len(parts) else 0
        )
        assert abs(p["n_rows"] - 1000) <= slack + 1
        assert p["balance_permille"] == p["n_rows"] * 1000 // 1000

    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        logbucket_equidepth(sk, 1)


def test_skew_profile_hot_key_and_tiebreak(spark):
    """relational.skew_profile: a planted hot key must surface as
    hitter 1 with the exact integer share and the salted_join factor
    that caps its per-reducer rows at the target; count ties must rank
    by the ORIGINAL numeric key order (2 before 10), not string order;
    the p50 bucket must contain the uniform-key count."""
    from erpl_web_spark.operators.relational import skew_profile

    hot = spark.range(10_000).select(F.lit(0).cast("long").alias("k"))
    cold = spark.range(5_000).select((F.col("id") % 100 + 1).alias("k"))
    prof = {
        r["hitter_rank"]: r
        for r in skew_profile(
            hot.unionByName(cold), "k", "t", top_k=3,
            target_rows_per_task=1000,
        ).collect()
    }
    top = prof[1]
    assert top["key"] == "0" and top["cnt"] == 10_000
    assert top["n_rows"] == 15_000 and top["n_keys"] == 101
    assert top["share_permille"] == 10_000 * 1000 // 15_000
    assert top["suggested_salt"] == 10  # ceil(10000 / 1000)
    # every cold key has exactly 50 rows: p50 bucket must contain 50
    assert top["p50_cnt_edge"] <= 50 < top["p50_cnt_edge"] * 2 + 2
    # ranks 2 and 3 are count-tied cold keys: numeric order, so 1, 2
    assert (prof[2]["key"], prof[3]["key"]) == ("1", "2")

    # explicit numeric-vs-string tiebreak: keys 2 and 10, equal counts
    tie = spark.createDataFrame([(2,), (10,)], "k long")
    t = {r["hitter_rank"]: r["key"]
         for r in skew_profile(tie, "k", "t", top_k=2).collect()}
    assert (t[1], t[2]) == ("2", "10")


def test_label_propagation_model_and_communities(spark):
    """graph.label_propagation: bit-identical to a Python model of the
    deterministic synchronous vote (neighbor + self labels, count ties
    to smallest) on a pseudo-random graph, and on two K5 cliques joined
    by one bridge the cliques reach DISTINCT internal consensus — the
    community behavior connected_components cannot express (one
    component, two communities)."""
    from erpl_web_spark.operators.graph import label_propagation

    def model(edge_list, rounds):
        adj = {}
        nodes = set()
        for a, b in edge_list:
            for x, y in ((a, b), (b, a)):
                adj.setdefault(x, set()).add(y)
                nodes.add(x)
        lab = {v: v for v in nodes}
        for _ in range(rounds):
            nxt = {}
            for v in nodes:
                votes = {}
                for u in adj.get(v, ()):
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
                votes[lab[v]] = votes.get(lab[v], 0) + 1
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
            lab = nxt
        return lab

    # pseudo-random sparse graph, deterministic
    rand_edges = sorted(
        {((i * 7919) % 37, (i * i * 104729 + 3) % 37) for i in range(80)}
        - {(v, v) for v in range(37)}
    )
    df = spark.createDataFrame(rand_edges, "src long, dst long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(df, iterations=3).collect()
    }
    assert got == model(rand_edges, 3)

    # two K5 cliques bridged by a single edge: distinct consensus labels
    k5a = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    k5b = [(a, b) for a in range(6, 11) for b in range(a + 1, 11)]
    bridge = [(5, 6)]
    cl = spark.createDataFrame(k5a + k5b + bridge, "src long, dst long")
    labs = {
        r["id"]: r["label"]
        for r in label_propagation(cl, iterations=4).collect()
    }
    assert len({labs[v] for v in range(1, 6)}) == 1
    assert len({labs[v] for v in range(6, 11)}) == 1
    assert labs[1] != labs[10]
    assert labs == model(k5a + k5b + bridge, 4)


def test_rrf_fuse_matches_textbook_model(spark):
    """similarity.rrf_fuse: the integer contributions
    lcm // (k + rank) must rank identically to the textbook
    sum(1/(k+rank)) double RRF (positive constant scaling), count
    n_lists, and refuse parameter combos whose lcm cannot be summed
    in BIGINT."""
    import math

    import pytest

    from erpl_web_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)],
        "query_id long, doc_id long, rank int",
    )
    out = rrf_fuse([lex, sem], k=60, max_rank=10, top_k=5).collect()
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_int"], r["n_lists"], r["rank"])
        for r in out
    }
    scale = math.lcm(*range(61, 71))
    model = {}
    for rows in (
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)],
    ):
        for q, d, r in rows:
            s, n = model.get((q, d), (0, 0))
            model[(q, d)] = (s + scale // (60 + r), n + 1)
    # integer sums and list counts match the python model exactly
    assert {kk: vv[:2] for kk, vv in got.items()} == model
    # ranking matches the textbook double-RRF ordering per query
    for q in (1, 2):
        docs = sorted(
            (d for (qq, d) in model if qq == q),
            key=lambda d: (-sum(
                1.0 / (60 + r)
                for rows in (
                    [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
                    [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)],
                )
                for (qq, dd, r) in rows if qq == q and dd == d
            ), d),
        )
        for i, d in enumerate(docs, start=1):
            assert got[(q, d)][2] == i
    # doc 11 appears in both lists and outranks every single-list doc
    assert got[(1, 11)][1] == 2 and got[(1, 11)][2] == 1

    with pytest.raises(ValueError, match="BIGINT"):
        rrf_fuse([lex, sem], k=60, max_rank=40)


def test_logbucket_sketch_and_quantiles(spark):
    """Log-bucket quantile sketch (operators.qsketch): the bucket map's
    relative-width guarantee (width/edge <= 2**-sub_bits for non-
    singleton buckets), quantile containment (the true rank-r value
    lies inside the reported bucket, with the structural
    n_below < r <= n_through proof), exclusion of NULL/negative values,
    and additive merge == single-pass sketch BIT-EXACTLY on an
    arbitrary split."""
    import math

    from erpl_web_spark.operators.qsketch import (
        logbucket_merge,
        logbucket_quantiles,
        logbucket_sketch,
    )

    # deterministic heavy-tailed values spanning 7 decades, with dups
    vals = sorted((i * i * i + 7) % (10 ** (1 + (i % 7))) for i in range(400))
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    sk = logbucket_sketch(df, "v", sub_bits=4)
    buckets = {r["edge"]: (r["width"], r["cnt"]) for r in sk.collect()}
    assert sum(c for _, c in buckets.values()) == len(vals)
    for edge, (width, _) in buckets.items():
        # singleton below 2**(m+1); otherwise rel width <= 2**-m
        assert width == 1 or width * 16 <= edge

    qs = [10, 500, 900, 999]
    out = {r["q_permille"]: r for r in logbucket_quantiles(sk, qs).collect()}
    n = len(vals)
    for q in qs:
        r = math.ceil(q * n / 1000)
        true = vals[r - 1]
        row = out[q]
        assert row["rank_r"] == r
        assert row["est_edge"] <= true < row["est_edge"] + row["bucket_width"]
        assert row["n_below"] < r <= row["n_through"]
        # the relative-error contract the docstring claims
        if true > 0:
            assert (true - row["est_edge"]) / true <= 2 ** -4 + 1e-12

    # NULLs and negatives are excluded, not mis-bucketed
    df2 = spark.createDataFrame([(None,), (-5,), (7,), (0,)], "v bigint")
    sk2 = {r["edge"]: r["cnt"] for r in
           logbucket_sketch(df2, "v", sub_bits=4).collect()}
    assert sk2 == {7: 1, 0: 1}

    # additive merge on an arbitrary split == one-pass sketch, bit-exact
    a = df.where(F.col("v") % 3 != 1)
    b = df.where(F.col("v") % 3 == 1)
    merged = {
        (r["edge"], r["width"]): r["cnt"]
        for r in logbucket_merge(
            logbucket_sketch(a, "v", sub_bits=4),
            logbucket_sketch(b, "v", sub_bits=4),
        ).collect()
    }
    direct = {(r["edge"], r["width"]): (r["cnt"]) for r in sk.collect()}
    assert merged == direct


def test_qsketch_index_batches_and_rebuild(spark, tmp_path):
    """The on-disk quantile index rides the shared additive-index core
    (whose crash/replay/guard matrix is pinned on the CMS family):
    here pin the family-specific wiring — merged index == single-pass
    sketch bit-exactly, replay no-op, sub_bits mismatch refused,
    rebuild collapses to one version with IDENTICAL quantiles, compact
    refuses."""
    import pytest

    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.qsketch import (
        logbucket_sketch,
        qsketch_index_apply,
        qsketch_index_compact,
        qsketch_index_quantiles,
        qsketch_index_rebuild,
        read_qsketch_index,
    )

    idx = str(tmp_path / "qsrc")
    whole = spark.range(1000).select((F.col("id") * 37 % 90000).alias("v"))
    batches = [
        spark.range(1000).where(F.col("id") % 3 == i).select(
            (F.col("id") * 37 % 90000).alias("v")
        )
        for i in range(3)
    ]
    for i, b in enumerate(batches):
        qsketch_index_apply(b, i, idx, "v", sub_bits=4)

    direct = {
        (r["edge"], r["width"]): r["cnt"]
        for r in logbucket_sketch(whole, "v", sub_bits=4).collect()
    }
    merged = {
        (r["edge"], r["width"]): r["cnt"]
        for r in read_qsketch_index(spark, idx).collect()
    }
    assert merged == direct

    # replay is a no-op
    qsketch_index_apply(batches[0], 0, idx, "v", sub_bits=4)
    assert {
        (r["edge"], r["width"]): r["cnt"]
        for r in read_qsketch_index(spark, idx).collect()
    } == direct

    with pytest.raises(ValueError, match="sub_bits"):
        qsketch_index_apply(batches[0], 9, idx, "v", sub_bits=5)

    pre = {(r["q_permille"], r["est_edge"], r["rank_r"])
           for r in qsketch_index_quantiles(spark, idx, [500, 990]).collect()}
    dest = str(tmp_path / "qdest")
    assert qsketch_index_rebuild(spark, idx, dest) == 2
    assert manifests.committed_versions(spark, dest, "qsk") == [2]
    post = {(r["q_permille"], r["est_edge"], r["rank_r"])
            for r in qsketch_index_quantiles(spark, dest, [500, 990]).collect()}
    assert post == pre
    with pytest.raises(ValueError, match="in-place"):
        qsketch_index_rebuild(spark, idx, idx)
    with pytest.raises(NotImplementedError):
        qsketch_index_compact(spark, idx)


def test_hll_index_compaction_and_cms_refusal(spark, tmp_path):
    """hll_index_compact must pre-MAX old batches into one generation
    with the estimate unchanged and the geometry payload preserved;
    countmin_index_compact must REFUSE (additive counters are not
    idempotent under the compactor's double-visibility crash window)."""
    import pytest
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.cms_index import countmin_index_compact
    from erpl_web_spark.operators.hll_index import (
        hll_index_apply,
        hll_index_compact,
        hll_index_estimate,
        read_hll_registers,
    )

    idx = str(tmp_path / "hllc")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.lit(0).alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )

    for i, (lo, hi) in enumerate([(0, 800), (500, 1600), (1200, 2400)]):
        hll_index_apply(batch(lo, hi), i, idx, ["g"], "v", p=8)
    before = hll_index_estimate(spark, idx).collect()[0]["hll_est"]
    merged_dirs = hll_index_compact(spark, idx)
    assert merged_dirs == 2  # batches 0 and 1 merged, newest kept
    after = hll_index_estimate(spark, idx).collect()[0]["hll_est"]
    assert after == before
    # compacted register state stays bounded at <= m rows per group
    assert read_hll_registers(spark, idx).count() <= 256
    # a post-compaction batch still applies and reads
    hll_index_apply(batch(2000, 3000), 3, idx, ["g"], "v", p=8)
    assert hll_index_estimate(spark, idx).collect()[0]["hll_est"] >= after

    with pytest.raises(NotImplementedError):
        countmin_index_compact(spark, str(tmp_path / "cmsx"))


def test_hll_registers_merge_losslessly(spark):
    """hll_merge of per-batch register sketches must equal the sketch
    built over the union in one pass — register max is the combine, so
    split-then-merge is lossless and the merged estimate matches the
    whole-corpus estimate exactly (the persisted-sketch contract:
    distinct-over-a-year from daily register tables, no re-read)."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    whole = spark.range(5000).select(
        F.lit(0).alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    # overlapping batches (dup values across batches must not inflate)
    b1 = whole.where(F.col("v").substr(2, 10).cast("long") < 3000)
    b2 = whole.where(F.col("v").substr(2, 10).cast("long") >= 2000)
    merged = hll_merge(
        hll_registers(b1, ["g"], "v", p=8),
        hll_registers(b2, ["g"], "v", p=8),
        group_cols=["g"],
    )
    direct = hll_registers(whole, ["g"], "v", p=8)
    as_set = lambda d: {(r["g"], r["__idx"], r["__r"]) for r in d.collect()}
    assert as_set(merged) == as_set(direct)
    e_m = hll_estimate(merged, ["g"], p=8).collect()[0]["hll_est"]
    e_d = hll_estimate(direct, ["g"], p=8).collect()[0]["hll_est"]
    assert e_m == e_d


def test_zorder_key_interleave_and_box_property(spark):
    """zorder_key_expr must equal the Python bit-interleave model on a
    full 32x32 grid, and the top-8-bit buckets of a 10-bit 2-D key must
    be boxes of side <= 64 in BOTH dimensions (the data-skipping
    guarantee the layout exists for — a single-column sort bounds only
    one dimension)."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.layout import (
        zorder_bucket_profile,
        zorder_key_expr,
    )

    def model(x: int, y: int, bits: int) -> int:
        k = 0
        for i in range(bits):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(grid, "x long, y long")
    got = {
        (r["x"], r["y"]): r["k"]
        for r in df.select(
            "x", "y", zorder_key_expr(["x", "y"], bits=5).alias("k")
        ).collect()
    }
    assert got == {(x, y): model(x, y, 5) for x, y in grid}

    # box property on a larger pseudo-random point set
    pts = spark.range(5000).select(
        (F.xxhash64("id") % 1024).alias("x0"),
        (F.xxhash64("id", F.lit(1)) % 1024).alias("y0"),
    ).select(
        F.abs("x0").alias("x"), F.abs("y0").alias("y")
    )
    prof = zorder_bucket_profile(pts, ["x", "y"], bits=10, bucket_bits=8)
    bad = prof.where(
        (F.col("x_max") - F.col("x_min") >= 64)
        | (F.col("y_max") - F.col("y_min") >= 64)
    ).count()
    assert bad == 0
    # 63-bit overflow guard
    import pytest

    with pytest.raises(ValueError):
        zorder_key_expr(["x", "y"], bits=32)


def test_triangle_counts_known_graphs(spark):
    """triangle_counts on graphs with known answers: K4 gives every
    node C(3,2)=3 triangles; a path gives none; two triangles sharing
    an edge give the shared endpoints 2 and the apexes 1; duplicate /
    reversed / self-loop edges are normalized away."""
    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_counts(path).count() == 0

    # bowtie: triangles {0,1,2} and {1,2,3} share edge (1,2); add noise
    # duplicates, a reversal, and a self-loop
    bow = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 1), (1, 3), (2, 3), (3, 3), (0, 1)],
        "src long, dst long",
    )
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(bow).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_pagerank_int_exact_replay(spark):
    """pagerank_int must equal an independent Python replay of the
    integer recurrence EXACTLY (bit-identical — the whole point of the
    integer formulation), be invariant under repartitioning, rank a
    star hub above its leaves, and conserve mass to within the floor
    bound in symmetric mode."""
    from collections import defaultdict

    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.graph import pagerank_int

    def model(edge_list, iters=5, d=85, unit=10**9, symmetric=False):
        if symmetric:
            edge_list = sorted(set(edge_list) | {(v, u) for u, v in edge_list})
        out: dict[int, int] = defaultdict(int)
        for u, _ in edge_list:
            out[u] += 1
        nodes = {u for e in edge_list for u in e}
        r = {v: unit for v in nodes}
        base = (100 - d) * unit // 100
        for _ in range(iters):
            m: dict[int, int] = defaultdict(int)
            for u, v in edge_list:
                m[v] += r[u] // out[u]
            r = {v: base + (d * m.get(v, 0)) // 100 for v in nodes}
        return r

    # star (hub=0) + a tail chain, directed
    edge_list = [(i, 0) for i in range(1, 8)] + [(0, 8), (8, 9), (9, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: r["rank_int"] for r in pagerank_int(edges, iterations=5).collect()
    }
    assert got == model(edge_list)
    assert got[0] == max(got.values())  # the hub outranks everyone
    # repartition invariance — integer sums are order-independent
    got2 = {
        r["id"]: r["rank_int"]
        for r in pagerank_int(edges.repartition(7), iterations=5).collect()
    }
    assert got2 == got
    # symmetric mode: exact replay + mass conservation within floor loss
    gsym = {
        r["id"]: r["rank_int"]
        for r in pagerank_int(edges, iterations=5, symmetrize=True).collect()
    }
    expect = model(edge_list, symmetric=True)
    assert gsym == expect
    n, unit = len(expect), 10**9
    assert abs(sum(gsym.values()) - n * unit) < 0.001 * n * unit


def test_pagerank_int_overflow_precondition(spark):
    """ADVICE r13: damping_pct * N * unit must fit in BIGINT or the
    85*m intermediate can overflow silently on a hub-concentrated
    graph — the operator now checks the bound exactly and raises with
    a usable unit suggestion; a unit just under the bound runs."""
    import pytest

    from erpl_web_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    too_big = 2**63 // (85 * 4) + 1  # 4 nodes, damping 85
    with pytest.raises(ValueError, match="exceeds BIGINT"):
        pagerank_int(edges, iterations=1, unit=too_big)
    ok_unit = 2**63 // (85 * 4) - 1
    got = pagerank_int(edges, iterations=1, unit=ok_unit).collect()
    assert len(got) == 4 and all(r["rank_int"] >= 0 for r in got)


def test_pagerank_int_early_stop_and_lineage_guard(spark):
    """tol early-stop (VERDICT r13 Next #6): the integer update is a
    deterministic map, so a delta=0 round is an EXACT fixpoint —
    stopping there must be bit-identical to running every remaining
    round; the stats hook shows the stop actually engaged, and the
    per-round localCheckpoint keeps a long run's lineage constant
    (pinned indirectly: a 25-round run completes without the driver
    choking on nested-join plan growth)."""
    from erpl_web_spark.operators.graph import pagerank_int

    # strongly connected with off-cycle mass so convergence is not
    # instant: 1->2->3->1 plus 4->1, 1->4; unit=1000 reaches the exact
    # integer fixpoint at round 18 (Python-modelled), inside 22 rounds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1), (1, 4)], "src long, dst long"
    )
    full = {
        r["id"]: r["rank_int"]
        for r in pagerank_int(edges, iterations=22, unit=1000).collect()
    }
    stats: dict = {}
    stopped = {
        r["id"]: r["rank_int"]
        for r in pagerank_int(
            edges, iterations=22, unit=1000, tol=0, stats=stats
        ).collect()
    }
    assert stats["final_delta"] == 0
    assert stats["rounds"] < 22  # the early stop engaged
    assert stopped == full  # bit-identical to the un-stopped run
    # tol > 0 stops no later; geometric tail bounds the distance to the
    # fixpoint by tol * 100/(100-damping) = 50 * 100/15
    s2: dict = {}
    near = {
        r["id"]: r["rank_int"]
        for r in pagerank_int(
            edges, iterations=22, unit=1000, tol=50, stats=s2
        ).collect()
    }
    assert s2["rounds"] <= stats["rounds"]
    assert sum(abs(near[k] - full[k]) for k in full) <= 50 * 100 // 15 + 4


def test_bm25_ranking_semantics(spark):
    """bm25_topk must honor the three BM25 axioms the formula encodes:
    (1) idf — a query term that is RARE in the corpus contributes more
    than a common one; (2) tf saturation — doubling tf must raise the
    score by strictly less than 2x (k1 caps repetition gaming);
    (3) length normalization — at equal tf the shorter document ranks
    first (b > 0). Plus self-retrieval on distinctive vocabulary and
    the max_df stopword cap."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.text import bm25_topk

    corpus = spark.createDataFrame(
        [
            (1, "zebra apple apple apple"),          # rare 'zebra', tf=3 'apple'
            (2, "apple banana banana banana"),
            (3, "apple cherry"),                     # short doc with 'apple'
            (4, "apple cherry date elderberry fig grape kiwi lemon"),  # long
            (5, "quux corge grault"),                # distinctive vocabulary
        ],
        "doc_id long, text string",
    )

    def top(qtext, k=5):
        q = spark.createDataFrame([(0, qtext)], "query_id long, query_text string")
        return bm25_topk(corpus, q, k=k).orderBy("rank").collect()

    # (1) idf: 'zebra' (df=1) must outrank 'apple' matches for a
    # 'zebra apple' query — doc 1 has both AND the rare term
    got = top("zebra apple")
    assert got[0]["doc_id"] == 1
    # (2) saturation: doc 1 has apple tf=3 vs doc 3 tf=1; its single-term
    # advantage must be < 3x doc 3's contribution — compare via scores
    apple = {r["doc_id"]: r["score_r"] for r in top("apple")}
    assert apple[1] < 3 * apple[3]
    # (3) length normalization: equal tf=1 for 'cherry' in docs 3 (2 toks)
    # and 4 (8 toks) -> the short doc ranks first
    cherry = top("cherry")
    assert [r["doc_id"] for r in cherry[:2]] == [3, 4]
    # self-retrieval on distinctive vocabulary
    assert top("quux grault")[0]["doc_id"] == 5
    # max_df cap: 'apple' (df=4) is dropped at max_df=3, so an
    # apple-only query returns nothing
    q = spark.createDataFrame([(0, "apple")], "query_id long, query_text string")
    assert bm25_topk(corpus, q, k=5, max_df=3).count() == 0


def test_bm25_broadcast_and_shuffle_paths_agree(spark):
    """broadcast_queries=False (VERDICT r13 Next #3, the hard-negative-
    mining contract where queries ≈ corpus and a broadcast would OOM)
    must produce IDENTICAL results to the default broadcast path — only
    the physical join strategy may differ. Pinned on a corpus-sized
    query set (every doc's own text as a query) so the shuffle path is
    exercised with the fan-out it exists for, plus a plan assert that
    the broadcast hint is really gone."""
    from erpl_web_spark.operators.text import bm25_topk

    corpus = spark.createDataFrame(
        [
            (1, "zebra apple apple apple"),
            (2, "apple banana banana banana"),
            (3, "apple cherry"),
            (4, "apple cherry date elderberry fig grape kiwi lemon"),
            (5, "quux corge grault"),
            (6, "banana date zebra"),
        ],
        "doc_id long, text string",
    )
    queries = corpus.selectExpr(
        "doc_id AS query_id", "text AS query_text"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    via_bcast = {
        key(r): (r["doc_id"], r["score_r"])
        for r in bm25_topk(corpus, queries, k=3).collect()
    }
    shuffled = bm25_topk(corpus, queries, k=3, broadcast_queries=False)
    via_shuffle = {
        key(r): (r["doc_id"], r["score_r"]) for r in shuffled.collect()
    }
    assert via_shuffle == via_bcast and len(via_bcast) > 0
    # physical pin: no broadcast of the query-term side in the plan
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_ivf_suggest_cells_recovers_true_cluster_count(spark):
    """ivf_suggest_cells (VERDICT r12 Next #5): on a corpus with 20
    planted Gaussian clusters the neighbor-radius profile must suggest
    ~20 cells — NOT the over-partitioned stride count (400 for a
    stride-50 modulo quantizer on 1000 rows twentyfold finer than the
    data) that the r12 recall sweep showed losing recall. Also pins
    the radius plateau: once the radius spans the cluster, growing it
    further (3x -> 4x median d_k) must not change the suggestion —
    the estimate keys on cluster structure, not the knob."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.similarity import (
        ivf_cell_profile,
        ivf_suggest_cells,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for c in range(20):
        for j in range(50):
            v = centers[c] + rng.normal(scale=0.05, size=16)
            pts.append((c * 50 + j, [float(x) for x in v]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = ivf_suggest_cells(df, k=10)
    assert 15 <= got <= 28, f"expected ~20 true clusters, got {got}"
    assert got < 100  # and emphatically not the 400-cell stride regime
    plateau = ivf_cell_profile(df, k=10, radius_mult=4.0).collect()[0]
    assert abs(int(plateau["suggested_cells"]) - got) <= 2


def test_weighted_sample_threshold_calibration(spark):
    """weighted_sample_threshold (VERDICT r12 Next #4): the calibrated
    threshold draw must (a) land achieved_k within binomial-ish bounds
    of the target — the m-th order statistic of a frac-sample estimates
    the k-th of the corpus with sd ~ sqrt(k/frac), pinned at 4 sigma —
    and (b) agree EXACTLY with weighted_sample on the overlap: the
    race keys are shared, so the threshold set's smallest
    min(k, achieved) keys are precisely the top-k draw's first ranks."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.curation import (
        weighted_sample,
        weighted_sample_key,
        weighted_sample_threshold,
    )

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("w")
    )
    k, frac = 200, 0.25
    rows, achieved = weighted_sample_threshold(
        df, k, "w", "doc_id", seed="thr", calibration_frac=frac
    )
    assert abs(achieved - k) <= 4 * (k / frac) ** 0.5, achieved
    got = rows.collect()
    assert len(got) == achieved
    # threshold semantics: the result is exactly {es_key <= t}, i.e. the
    # achieved_k smallest keys of the shared key frame
    keyed = weighted_sample_key(df, "w", "doc_id", seed="thr")
    expect = {
        r["doc_id"]
        for r in keyed.orderBy("es_key", "doc_id").limit(achieved).collect()
    }
    assert {r["doc_id"] for r in got} == expect
    # overlap equality with the top-k operator: first min(k, achieved)
    # ranks coincide
    n = min(k, achieved)
    topk = weighted_sample(df, k, "w", "doc_id", seed="thr")
    top_ids = [r["doc_id"] for r in topk.orderBy("sample_rank").limit(n).collect()]
    thr_ids = [
        r["doc_id"] for r in rows.orderBy("es_key", "doc_id").limit(n).collect()
    ]
    assert top_ids == thr_ids
    # determinism under repartitioning
    rows2, achieved2 = weighted_sample_threshold(
        df.repartition(13), k, "w", "doc_id", seed="thr", calibration_frac=frac
    )
    assert achieved2 == achieved
    assert {r["doc_id"] for r in rows2.collect()} == {r["doc_id"] for r in got}
    # sub-k corpus: threshold degrades to keep-all
    tiny = df.limit(10)
    rows3, achieved3 = weighted_sample_threshold(
        tiny, 100, "w", "doc_id", seed="thr", calibration_frac=frac
    )
    assert achieved3 == 10 and rows3.count() == 10


def test_url_index_streaming_e2e(spark, tmp_path):
    """The URL index behind a real checkpointed file stream (the other
    four indexes have this pin; the fifth was fault-injection-only):
    foreachBatch(url_index_apply) with epoch_id as the batch version.
    Batch 1's doc pointing at a canonical URL claimed in batch 0 is
    dropped; a fresh URL is claimed — keep-first across epochs, with
    the Bloom pre-filter ON so the streaming path also exercises the
    bloomw increments and the coverage check."""
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        url_index_apply,
    )

    src = tmp_path / "usrc"
    src.mkdir()
    idx = str(tmp_path / "uidx_s")
    ckpt = str(tmp_path / "uckpt")
    schema = "doc_id long, url string"

    def run_stream():
        (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda df, bid: url_index_apply(
                    df, bid, idx, bloom_m_bits=1024, bloom_k=3
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    spark.createDataFrame(
        [(5, "http://a.example/x?b=2&a=1"), (3, "HTTP://A.example/x?a=1&b=2")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    kept = {r["doc_id"] for r in read_kept_batches(spark, idx).collect()}
    assert kept == {3}  # in-batch election: same canonical URL, min id

    spark.createDataFrame(
        [(10, "http://a.example/x?a=1&b=2"), (11, "http://b.example/y")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()  # same checkpoint: only the new file forms epoch 1
    kept = {r["doc_id"] for r in read_kept_batches(spark, idx).collect()}
    assert kept == {3, 11}  # 10 is a cross-epoch dup; 11 is fresh


def test_weighted_sample_threshold_path_matches_topk(spark):
    """weighted_sample_key's threshold filter (the one-pass corpus-scale
    path) selects exactly the top-k set for the matching threshold: the
    keys are shared, only the selection mechanism differs."""
    from pyspark.sql import functions as F

    from erpl_web_spark.operators.curation import (
        weighted_sample,
        weighted_sample_key,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1).alias("w")
    )
    topk = weighted_sample(df, 40, "w", "doc_id", seed="thr")
    ids = {r["doc_id"] for r in topk.collect()}
    keyed = weighted_sample_key(df, "w", "doc_id", seed="thr")
    t = sorted(r["es_key"] for r in keyed.collect())[39]  # 40th smallest
    thr_ids = {r["doc_id"] for r in keyed.where(F.col("es_key") <= t).collect()}
    assert thr_ids == ids


# --------------------------------------------------------------------------
# Round-14 optimization pins: the construction rewrites (SQL-string
# expression building) must stay value-identical to the Column-API
# formulations they replaced, and the load() plan memo must stay
# metadata-only.
# --------------------------------------------------------------------------


def test_asof_join_quoted_identifiers(spark):
    """The r14 selectExpr-based asof_join must survive column names that
    need quoting (spaces, backticks) — the Column API handled them
    natively; the SQL path handles them via backtick escaping."""
    from erpl_web_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
        "`user id` int, `l ts` int, `pay``load` string",
    )
    right = spark.createDataFrame(
        [(1, 9, 1.5), (1, 20, 2.5), (2, 99, 3.5)],
        "`user id` int, `r ts` int, `va l` double",
    )
    out = asof_join(
        left, right, on="user id", left_ts="l ts", right_ts="r ts",
        right_cols=["r ts", "va l"],
    )
    got = {(r["user id"], r["l ts"]): (r["r ts"], r["va l"]) for r in out.collect()}
    assert got[(1, 10)] == (9, 1.5)
    assert got[(1, 20)] == (20, 2.5)   # equal ts visible (<= semantics)
    assert got[(2, 5)] == (None, None)


def test_minhash_expr_rewrites_match_column_api(spark):
    """r14 rewrote hashed_shingles / _signatures_from_hashes /
    band_keys_expr from per-column Column construction to single parsed
    SQL strings (~40x cheaper driver time). This pins value-identity
    against the original Column-API formulation, both hash modes."""
    from erpl_web_spark.operators.dedup import (
        _md5_long48,
        _signatures_from_hashes,
        band_keys_expr,
        grams_expr,
        hashed_shingles,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} alpha beta gamma tok{i} delta epsilon") for i in range(40)]
        + [(97, "a b"), (98, ""), (99, None)],  # sub-k / empty / NULL edges
        "doc_id long, text string",
    )

    for mode in ("xxhash64", "md5"):
        hashed = hashed_shingles(docs, "doc_id", "text", 3, hash_mode=mode)
        # Column-API reference (the pre-r14 formulation, inlined).
        if mode == "md5":
            base = F.transform(grams_expr("text", 3), lambda s: _md5_long48(s))
        else:
            base = F.transform(grams_expr("text", 3), lambda s: F.xxhash64(s))
        ref = docs.select(F.col("doc_id"), F.array_distinct(base).alias("hs"))
        assert (
            hashed.orderBy("doc_id").collect() == ref.orderBy("doc_id").collect()
        ), f"hashed_shingles drifted from Column API ({mode})"

        sigs = _signatures_from_hashes(hashed, "doc_id", 8, hash_mode=mode)
        sh = hashed.select(F.col("doc_id"), F.explode("hs").alias("h"))
        if mode == "md5":
            seeded = [
                F.min(_md5_long48(F.lit(str(i)), F.col("h"))).alias(f"mh{i}")
                for i in range(8)
            ]
        else:
            seeded = [F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh{i}") for i in range(8)]
        ref_sigs = (
            sh.groupBy("doc_id")
            .agg(*seeded)
            .select(
                F.col("doc_id"),
                F.array(*[F.col(f"mh{i}") for i in range(8)]).alias("minhash"),
            )
        )
        assert (
            sigs.orderBy("doc_id").collect() == ref_sigs.orderBy("doc_id").collect()
        ), f"signatures drifted from Column API ({mode})"

    # band keys: string form vs Column-API reference
    sigs = _signatures_from_hashes(
        hashed_shingles(docs, "doc_id", "text", 3), "doc_id", 8
    )
    new = sigs.select("doc_id", band_keys_expr(8, 4).alias("bk"))
    rpb = 2
    ref = sigs.select(
        "doc_id",
        F.array(
            *[
                F.xxhash64(F.lit(b), *[F.col("minhash")[b * rpb + r] for r in range(rpb)])
                for b in range(4)
            ]
        ).alias("bk"),
    )
    assert new.orderBy("doc_id").collect() == ref.orderBy("doc_id").collect()


def test_load_memo_is_metadata_only(spark, tmp_path):
    """load() memoizes the lazy PLAN per (session, path, mtime, size) —
    same object back on a second call, fresh data after the file
    changes (the memo must never cache results)."""
    import shutil
    import time as _time

    from erpl_web_spark.suite import load

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    tgt = sf_dir / "orders.parquet"
    spark.createDataFrame([(1, "a")], "o_orderkey long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "v1"))
    part = next((tmp_path / "v1").glob("part-*.parquet"))
    shutil.copy(part, tgt)

    d1 = load(spark, str(sf_dir), "orders")
    d2 = load(spark, str(sf_dir), "orders")
    assert d1 is d2, "second load should hit the plan memo"
    assert d1.count() == 1

    # replace the file -> (mtime, size) key changes -> fresh plan + data
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "o_orderkey long, v string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "v2"))
    part2 = next((tmp_path / "v2").glob("part-*.parquet"))
    _time.sleep(0.01)
    shutil.copy(part2, tgt)
    d3 = load(spark, str(sf_dir), "orders")
    assert d3.count() == 2, "memo must invalidate when the file changes"
