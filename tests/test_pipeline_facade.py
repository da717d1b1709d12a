"""The curation facade: stage accounting adds up, every stage drops
what it should, and stages toggle independently."""

from erpl_web_spark.pipeline import CurationConfig, curate


def _docs(spark):
    good = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, good + "one"),
        (2, good + "one"),          # exact dup of 1 -> dropped by exact stage
        (3, good.replace("lazy", "sleepy") + "one"),  # near dup of 1
        (4, "x y z"),               # too short -> quality drop
        (5, "completely different organic content with many varied words here " * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_full_pipeline(spark):
    kept, report = curate(
        _docs(spark),
        CurationConfig(use_minhash=False, near_threshold=0.5),
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 5}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["input"] == 5
    assert rep["exact_dedup_dropped"] == 1       # doc 2
    assert rep["near_dedup_dropped"] == 1        # doc 3
    assert rep["quality_dropped"] == 1           # doc 4
    assert rep["output"] == 2
    # accounting must add up exactly
    assert rep["input"] - sum(v for k, v in rep.items() if k.endswith("_dropped")) == rep["output"]


def test_curate_stages_toggle(spark):
    kept, report = curate(
        _docs(spark),
        CurationConfig(exact_dedup=False, near_dedup=False, quality_gate=False),
    )
    assert kept.count() == 5
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert set(rep) == {"input", "output"}


def test_curate_scrub_spans_stage(spark):
    """The optional scrub stage rewrites shared spans out of surviving
    docs (row-preserving: nothing dropped, modified count reported) and
    runs BEFORE quality so the gate scores the scrubbed text."""
    from pyspark.sql import functions as F

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler_a = "one ordinary sentence with plainly unique wording here " * 3
    filler_b = "another body of entirely distinct prose for the second doc " * 3
    original_3 = "Untouched THIRD document\nabout gardens and mild weather.\n" * 3
    rows = [
        (1, filler_a + passage),
        (2, passage + " " + filler_b),
        (3, original_3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    before = {
        rdd.toString() for rdd in
        spark.sparkContext._jsc.getPersistentRDDs().values()
    }
    kept, report = curate(
        df,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            scrub_spans=True, scrub_min_shared=3, scrub_token_k=10,
        ),
    )
    out = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(out) == {1, 2, 3}          # row-preserving
    assert "gamma" not in out[1] and "gamma" not in out[2]
    # untouched docs keep their ORIGINAL text byte-for-byte — casing,
    # punctuation and line structure intact (round-6 review finding:
    # a corpus-wide normalized rewrite would neuter line-based rules)
    assert out[3] == original_3
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["scrub_spans_modified"] == 2
    assert rep["input"] == rep["output"] == 3
    # the scrub's internal fingerprint/gram caches are released: only
    # the returned stage cache may remain beyond what existed before
    kept.unpersist()
    leaked = {
        rdd.toString() for rdd in
        spark.sparkContext._jsc.getPersistentRDDs().values()
    } - before
    assert not leaked, f"scrub stage leaked caches: {leaked}"


def test_curate_bigram_logprob_floor(spark):
    """The perplexity-proxy floor drops the word-salad doc whose
    adjacencies never repeat, keeps prose whose adjacencies do, and
    releases its internal bigram caches."""
    prose = "the cat sat on the mat and the cat sat on the mat again"
    rows = [
        (1, prose),
        (2, prose + " happily"),
        (3, "zeppelin quartz flamingo ducat oboe warthog nimbus kelp"),
        (4, "solo"),  # 0-bigram sentinel doc: the floor must drop it
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    before = {
        rdd.toString() for rdd in
        spark.sparkContext._jsc.getPersistentRDDs().values()
    }
    kept, report = curate(
        df,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            min_bigram_logprob=-2.0,  # salad ~-2.5, prose ~-1.7 here
        ),
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 2}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["bigram_logprob_dropped"] == 2  # salad + 0-bigram doc
    kept.unpersist()
    leaked = {
        rdd.toString() for rdd in
        spark.sparkContext._jsc.getPersistentRDDs().values()
    } - before
    assert not leaked, f"logprob stage leaked caches: {leaked}"


def test_curate_minhash_path(spark):
    kept, _ = curate(_docs(spark), CurationConfig(use_minhash=True))
    ids = {r["doc_id"] for r in kept.collect()}
    assert 5 in ids and 2 not in ids


def test_curate_unigram_floor_stage(spark):
    """The corpus-frequency floor drops the rare-token doc: one document
    made of tokens that appear nowhere else scores far below docs built
    from corpus-common vocabulary."""
    common = "alpha beta gamma delta epsilon " * 10
    rows = [
        (1, common + "zeta"),
        (2, common + "eta"),
        (3, "qwxz jkvq pzlm wvxk " * 12),  # unique-token noise doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept, report = curate(
        df,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            min_unigram_freq=0.1,  # noise doc scores 0.08, common docs 0.13
        ),
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["unigram_freq_dropped"] == 1
    assert rep["input"] - rep["unigram_freq_dropped"] == rep["output"]
    kept.unpersist()


def test_curate_caches_each_stage(spark):
    """The accounting contract: every stage after the first must read its
    predecessor from cache (InMemoryRelation in the optimized plan), the
    returned corpus stays persisted, and all intermediate caches are
    released — so the expensive upstream operators run exactly once no
    matter how many stages follow (VERDICT r3 'What's wrong #1')."""
    trace = []
    kept, report = curate(
        _docs(spark),
        CurationConfig(use_minhash=False, near_threshold=0.5),
        stage_trace=trace,
    )
    names = [n for n, _, _ in trace]
    assert names == ["input", "exact_dedup", "near_dedup", "quality"]
    for name, _, plan in trace[1:]:
        # the predecessor must be read from MATERIALIZED data, never
        # recomputed from source: an InMemoryRelation (persisted stage)
        # or a LogicalRDD (localCheckpoint lineage barrier, taken every
        # _TRUNCATE_EVERY stages to bound plan growth) both satisfy it
        assert "InMemoryRelation" in plan or "LogicalRDD" in plan, (
            f"stage {name} does not read its predecessor from"
            f" materialized data:\n{plan}"
        )
    # final stage is the returned corpus and is still persisted
    assert trace[-1][1] is kept
    assert kept.storageLevel.useMemory or kept.storageLevel.useDisk
    # every predecessor cache was released
    for name, stage_df, _ in trace[:-1]:
        lvl = stage_df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), f"stage {name} cache leaked"
    kept.unpersist()


def test_curate_decontaminate_stage(spark):
    bench_q = "which river is the longest the nile is the longest river"
    leaked = "some intro " + bench_q + " " + " ".join(f"t{i} u{i}" for i in range(25))
    rows = [(1, leaked), (2, "clean document about trains and stations " * 5),
            (3, "another clean doc with its own unique words " * 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(900, bench_q)], "bench_id long, text string")
    from erpl_web_spark.pipeline import CurationConfig, curate

    cfg = CurationConfig(quality_gate=False, contamination_threshold=0.9)
    kept, report = curate(df, cfg, benchmark=bench)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["decontaminate_dropped"] == 1
    assert rep["output"] == 2
    # no benchmark -> stage absent, behavior unchanged
    kept2, report2 = curate(df, cfg)
    assert kept2.count() == 3
    assert "decontaminate_dropped" not in {r["stage"] for r in report2.collect()}


def test_curate_near_keep_best_quality(spark):
    base = " ".join(f"token{i}" for i in range(150))
    near = base.replace("token7 ", "changed ", 1)
    noisy = base + " " + " ".join(f"{10000 + i}" for i in range(90))
    rows = [(1, noisy), (2, near), (7, "entirely separate document content here " * 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from erpl_web_spark.pipeline import CurationConfig, curate

    # min_id policy keeps doc 1 (the digit-heavy one)
    kept_min, _ = curate(df, CurationConfig(quality_gate=False, use_minhash=False, near_threshold=0.4))
    assert sorted(r["doc_id"] for r in kept_min.collect()) == [1, 7]
    # best_quality keeps doc 2 (doc 1's digit ratio costs it a heuristic)
    kept_best, rep = curate(
        df, CurationConfig(quality_gate=False, use_minhash=False, near_threshold=0.4, near_keep="best_quality")
    )
    assert sorted(r["doc_id"] for r in kept_best.collect()) == [2, 7]
    assert {r["stage"]: r["n"] for r in rep.collect()}["near_dedup_dropped"] == 1


def test_curate_split_assigns_leak_safe_splits(spark):
    from pyspark.sql import functions as F

    # near_dedup OFF + split ON: cluster members must still share a split
    kept, report = curate(
        _docs(spark),
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            use_minhash=False, near_threshold=0.5,
            split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        ),
    )
    rows = {r["doc_id"]: r["split"] for r in kept.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # docs 1/2/3 are one near-dup cluster at threshold 0.5 -> same split
    assert rows[1] == rows[2] == rows[3]
    assert set(rows.values()) <= {"train", "val", "test"}
    assert "group_key" not in kept.columns


def test_curate_split_reuses_dedup_components(spark):
    # near_dedup ON: the representative's split key is its CLUSTER label,
    # so it matches the split its (dropped) duplicates would have had
    from erpl_web_spark.operators.text import hash_split
    from pyspark.sql import functions as F

    kept, _ = curate(
        _docs(spark),
        CurationConfig(
            use_minhash=False, near_threshold=0.5,
            split_weights={"train": 0.5, "val": 0.25, "test": 0.25},
            split_seed=11,
        ),
    )
    rows = {r["doc_id"]: r["split"] for r in kept.collect()}
    assert set(rows) == {1, 5}
    # doc 1 is the representative of cluster {1,2,3}: its split is keyed
    # on component label 1 (== its own id, the cluster min)
    expect = hash_split(
        kept.sparkSession.createDataFrame([(1,)], "group_key long"),
        "group_key", {"train": 0.5, "val": 0.25, "test": 0.25}, seed=11,
    ).collect()[0]["split"]
    assert rows[1] == expect


def test_curate_gopher_stage(spark):
    from pyspark.sql import functions as F

    long_good = " ".join(
        "the quick brown fox and some other plain words for all of it".split() * 8
    )
    docs = spark.createDataFrame(
        [(1, long_good), (2, long_good + " extra"), (3, "way too short for gopher")],
        "doc_id long, text string",
    )
    kept, report = curate(
        docs,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            gopher_rules=True,
        ),
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["gopher_dropped"] == 1
    assert "gopher_keep" not in kept.columns


def test_curate_plan_growth_bounded(spark):
    """ALL stages on: the analyzed plan of the returned corpus must stay
    bounded. persist caches data but keeps full lineage, and the
    self-joining stages each embed the upstream plan 2-3x — without the
    every-K-stages localCheckpoint barrier the plan tree grows
    multiplicatively (the round-8 kitchen-sink run OOMed a 12 GB driver
    building the plan STRING on an 8 MB corpus). Plan size is
    data-independent, so a 12-doc corpus reproduces the hazard."""
    rows = [
        (i, f"u{i} v{i} " + " ".join(f"w{j} x{j} common words here" for j in range(6)))
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, report = curate(
        docs,
        CurationConfig(
            normalize=True, exact_dedup=True, near_dedup=True,
            line_dedup=True, scrub_spans=True, quality_gate=True,
            gopher_rules=False, max_boilerplate_ratio=0.9,
            min_unigram_freq=0.0, min_bigram_logprob=-30.0,
            split_weights={"train": 0.8, "val": 0.2},
        ),
    )
    n_stages = report.count()
    assert n_stages >= 11  # the full battery actually ran
    plan = kept._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 300_000, (
        f"analyzed plan grew to {len(plan)} chars — lineage barrier broken"
    )
    kept.unpersist()


def test_curate_normalize_stage(spark):
    """normalize=True rewrites only typographically-dirty docs (audit
    row counts them), and makes curly-quote variants collide in the
    downstream exact dedup — the composition the stage exists for."""
    docs = spark.createDataFrame(
        [
            (1, 'same content "quoted" here'),
            (2, "same content “quoted” here"),   # curly twin of 1
            (3, "plain unique document"),
        ],
        "doc_id long, text string",
    )
    # without normalization the twins don't collide
    kept0, _ = curate(
        docs, CurationConfig(near_dedup=False, quality_gate=False)
    )
    assert {r["doc_id"] for r in kept0.collect()} == {1, 2, 3}
    kept0.unpersist()
    kept, report = curate(
        docs,
        CurationConfig(normalize=True, near_dedup=False, quality_gate=False),
    )
    out = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(out) == {1, 3}  # min-id twin survives, post-normalize text
    assert out[1] == 'same content "quoted" here'
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["normalize_modified"] == 1  # only doc 2 was dirty
    assert rep["exact_dedup_dropped"] == 1
    kept.unpersist()


def test_curate_line_dedup_stage(spark):
    """The line-dedup stage rewrites only docs that lost a hot line
    (cross-doc boilerplate), leaves untouched docs byte-identical, is
    row-preserving (a doc losing every line survives with empty text),
    and reports the modified-doc count."""
    docs = spark.createDataFrame(
        [
            (1, "alpha unique body\nshared footer line"),
            (2, "beta unique body\nshared footer line"),
            (3, "gamma stands alone with original   spacing"),
            (4, "shared footer line"),
        ],
        "doc_id long, text string",
    )
    kept, report = curate(
        docs,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            line_dedup=True,
        ),
    )
    out = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(out) == {1, 2, 3, 4}  # row-preserving
    assert out[1] == "alpha unique body"
    assert out[2] == "beta unique body"
    # untouched doc keeps ORIGINAL text (internal spacing intact)
    assert out[3] == "gamma stands alone with original   spacing"
    assert out[4] == ""  # lost every line, still present
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["line_dedup_modified"] == 3
    assert rep["output"] == rep["input"]
    kept.unpersist()

    # keep_first: the globally-first occurrence (min (id, pos)) survives
    kept2, report2 = curate(
        docs,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            line_dedup=True, line_keep_first=True,
        ),
    )
    out2 = {r["doc_id"]: r["text"] for r in kept2.collect()}
    assert out2[1] == "alpha unique body\nshared footer line"
    assert out2[2] == "beta unique body"
    assert out2[4] == ""
    rep2 = {r["stage"]: r["n"] for r in report2.collect()}
    assert rep2["line_dedup_modified"] == 2
    kept2.unpersist()


def test_curate_media_dedup_stage(spark):
    """The media stage clusters rows whose payloads dHash-collide
    (identical bytes under the forced stub kernel), keeps the min-id
    representative, passes text-only (null-payload) rows through
    untouched, and reports the drop count."""
    shared = b"shared-media-payload-bytes-0123456789"
    rows = [
        (1, "first caption entirely unlike the others", bytearray(shared)),
        (2, "second caption with different wording here", bytearray(shared)),
        (3, "third caption about another subject matter", bytearray(b"unique-media-bytes")),
        (4, "fourth document is text only with no media", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    kept, report = curate(
        docs,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            media_dedup=True, media_decode_stub=True,
        ),
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["media_dedup_dropped"] == 1
    assert rep["input"] - rep["media_dedup_dropped"] == rep["output"]
    kept.unpersist()


def test_curate_media_real_kernel_excludes_undecodable(spark, monkeypatch):
    """On the real-decode path (media_decode_stub=False) payloads the
    image library cannot decode are EXCLUDED from pairing — identical
    corrupt byte-strings must NOT cluster on their fallback stub
    hashes — while decodable near-duplicates cluster by perceptual
    grid even when their bytes differ."""
    from erpl_web_spark.operators import multimodal

    def fake_grid(payload):
        p = bytes(payload)
        if p.startswith(b"IMG"):
            # "decodes": grid depends only on the scene byte, so two
            # different encodings of the same scene hash identically
            seed = p[3]
            return [(seed * (i + 7)) % 251 for i in range(72)], True
        return multimodal._stub_gray_grid(p), False

    monkeypatch.setattr(multimodal, "pillow_available", lambda: True)
    monkeypatch.setattr(multimodal, "_pillow_gray_grid", fake_grid)

    rows = [
        (1, "caption one with its own words", bytearray(b"IMGA-first-encoding")),
        (2, "caption two quite different text", bytearray(b"IMGA-other-bytes-entirely")),
        (3, "caption three more prose here", bytearray(b"corrupt-not-an-image")),
        (4, "caption four distinct wording", bytearray(b"corrupt-not-an-image")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    kept, report = curate(
        docs,
        CurationConfig(
            exact_dedup=False, near_dedup=False, quality_gate=False,
            media_dedup=True, media_decode_stub=False,
        ),
    )
    # 2 clusters with 1 (same scene, different bytes); 3/4 share bytes
    # but are undecodable -> excluded from pairing, both kept
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4}
    rep = {r["stage"]: r["n"] for r in report.collect()}
    assert rep["media_dedup_dropped"] == 1
    kept.unpersist()


def test_curate_media_real_kernel_requires_pillow(spark):
    """media_decode_stub=False without Pillow fails loudly instead of
    silently degrading to the stub."""
    import pytest

    from erpl_web_spark.operators import multimodal

    if multimodal.pillow_available():
        pytest.skip("Pillow installed; the guard only fires without it")
    docs = spark.createDataFrame(
        [(1, "a few plain words", bytearray(b"xx"))],
        "doc_id long, text string, payload binary",
    )
    with pytest.raises(NotImplementedError):
        curate(
            docs,
            CurationConfig(
                exact_dedup=False, near_dedup=False, quality_gate=False,
                media_dedup=True, media_decode_stub=False,
            ),
        )


def test_curate_failure_releases_all_caches(spark):
    """A curate() that dies mid-pipeline (here: a benchmark frame
    missing the text column, failing the decontaminate stage AFTER
    several stages have persisted) must release every cached frame —
    stage caches, cluster labels, operator sinks — before re-raising."""
    import pytest

    spark.catalog.clearCache()
    bad_bench = spark.createDataFrame([(1,)], "bench_id long")  # no text
    with pytest.raises(Exception):
        curate(_docs(spark), CurationConfig(use_minhash=False), benchmark=bad_bench)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _barrier_rdd_level(frame):
    """Storage level of a localCheckpoint'd frame's backing RDD (the
    LogicalRDD's checkpoint RDD — NOT df.storageLevel, which consults
    only the CacheManager and is always NONE for checkpointed frames)."""
    return frame._jdf.queryExecution().analyzed().rdd().getStorageLevel()


def test_curate_releases_superseded_barrier_blocks(spark):
    """A lineage-barrier stage (localCheckpoint every _TRUNCATE_EVERY
    stages) is invisible to unpersist(); once its successor is
    materialized its checkpoint RDD blocks must be freed EXPLICITLY,
    not left for driver GC + ContextCleaner — stage_trace holding a
    reference would otherwise pin them forever (ADVICE r8 #3)."""
    trace = []
    kept, _ = curate(
        _docs(spark),
        CurationConfig(use_minhash=False, near_threshold=0.5),
        stage_trace=trace,
    )
    names = [n for n, _, _ in trace]
    assert names == ["input", "exact_dedup", "near_dedup", "quality"]
    # stage 3 (near_dedup) sits on the barrier and was superseded
    lvl = _barrier_rdd_level(trace[2][1])
    assert not (lvl.useMemory() or lvl.useDisk()), (
        "superseded barrier checkpoint blocks leaked: " + lvl.description()
    )
    kept.unpersist()


def test_curate_final_barrier_repersisted_and_released(spark):
    """When the LAST stage lands on a lineage barrier, the returned
    corpus is re-persisted (eagerly, so unpersist() works for the
    caller) and the barrier's checkpoint RDD is freed immediately —
    the values must survive the hand-off intact."""
    trace = []
    kept, report = curate(
        _docs(spark),
        CurationConfig(near_dedup=False, use_minhash=False),
        stage_trace=trace,
    )
    names = [n for n, _, _ in trace]
    assert names == ["input", "exact_dedup", "quality"]  # 3rd = barrier
    assert kept.storageLevel.useMemory or kept.storageLevel.useDisk
    lvl = _barrier_rdd_level(kept)
    assert not (lvl.useMemory() or lvl.useDisk()), (
        "final-stage barrier checkpoint blocks leaked: " + lvl.description()
    )
    # near-dedup is off, so the near-dup doc 3 survives alongside 1, 5
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 5}
    kept.unpersist()


def test_curate_failure_releases_barrier_blocks(spark):
    """The exception path frees barrier checkpoint RDDs too, not just
    CacheManager entries."""
    import pytest

    spark.catalog.clearCache()
    trace = []
    bad_bench = spark.createDataFrame([(1,)], "bench_id long")  # no text
    with pytest.raises(Exception):
        curate(
            _docs(spark),
            CurationConfig(use_minhash=False),
            stage_trace=trace,
            benchmark=bad_bench,
        )
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert len(trace) >= 3  # the barrier stage materialized before the crash
    lvl = _barrier_rdd_level(trace[2][1])
    assert not (lvl.useMemory() or lvl.useDisk()), (
        "failed-curate barrier checkpoint blocks leaked: " + lvl.description()
    )


def test_curate_scrub_max_df_caps_gate(spark):
    """CurationConfig.scrub_max_df reaches the winnow gate: a span
    shared by MANY documents (df above the cap) no longer generates
    candidate pairs — those docs pass through unscrubbed — while a
    rare two-document overlap is still detected and scrubbed. With the
    default cap both overlaps are scrubbed (the knob, off, changes
    nothing)."""
    # the filler words must share NO 5-char gram across documents (a
    # repeated stem like "doc{d}tok{i}" shares grams, and winnowing's
    # window-min SELECTION then gives some of them low df, cross-
    # linking unrelated docs) — derive each filler word from md5 so
    # cross-doc gram overlap is structurally absent; likewise the two
    # span vocabularies share no gram with each other
    import hashlib

    rare = " ".join(f"kumquat{i}" for i in range(14))
    hot = " ".join(f"walrus{i}" for i in range(14))

    def filler(d):
        def word(i):
            h = int(hashlib.md5(f"fill:{d}:{i}".encode()).hexdigest()[:12], 16)
            letters = "abcdefghijklmnopqrstuvwxyz"
            out = []
            for _ in range(8):
                out.append(letters[h % 26])
                h //= 26
            return "".join(out)

        return " ".join(word(i) for i in range(30))

    rows = [(1, filler(1) + " " + rare), (2, filler(2) + " " + rare)]
    rows += [(d, filler(d) + " " + hot) for d in range(3, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = CurationConfig(
        exact_dedup=False, near_dedup=False, quality_gate=False,
        scrub_spans=True,
    )

    from dataclasses import replace

    capped, report = curate(docs, replace(base, scrub_max_df=3))
    rep = {r["stage"]: r["n"] for r in report.collect()}
    # the rare pair is still caught (doc 2 loses the span; doc 1 keeps
    # the first occurrence) but the 6-doc hot span is gated away
    scrubbed_txt = {r["doc_id"]: r["text"] for r in capped.collect()}
    assert rep["scrub_spans_modified"] >= 1
    assert "kumquat0" not in scrubbed_txt[2] or "kumquat0" not in scrubbed_txt[1]
    for d in range(3, 9):
        assert "walrus0" in scrubbed_txt[d], f"hot span scrubbed from doc {d}"
    capped.unpersist()

    full, report2 = curate(docs, base)  # default cap: both overlaps fire
    rep2 = {r["stage"]: r["n"] for r in report2.collect()}
    assert rep2["scrub_spans_modified"] > rep["scrub_spans_modified"]
    txt2 = {r["doc_id"]: r["text"] for r in full.collect()}
    assert sum("walrus0" in t for t in txt2.values()) <= 1
    full.unpersist()
