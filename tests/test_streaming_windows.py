"""Event-time streaming operators driven through REAL readStream/
writeStream micro-batch execution (availableNow over a file source),
pinned against the equivalent batch computation on the same rows."""

import pytest

from pyspark.sql import functions as F

from erpl_web_spark.streaming.windows import (
    running_totals,
    session_windows,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events table rewritten as micro-timestamp parquet files — the
    streaming file-source input."""
    from erpl_web_spark.suite import load

    path = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, events_dir, builder, name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = builder(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode({"rt": "update", "dd": "append", "ssj": "append"}.get(name, "complete"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    got = _run_stream(
        spark, events_dir,
        lambda s: windowed_counts(s, window="6 hours", keys=["event_type"]),
        "wc",
    ).collect()
    batch = windowed_counts(
        spark.read.parquet(events_dir), window="6 hours", keys=["event_type"]
    ).collect()
    key = lambda r: (r["event_type"], r["window_start"])
    assert {key(r): r["n_events"] for r in got} == {key(r): r["n_events"] for r in batch}
    assert len(got) > 1
    # window bounds are aligned 6-hour buckets
    for r in got[:5]:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 6 * 3600


def test_session_windows_stream(spark, events_dir):
    got = _run_stream(
        spark, events_dir, lambda s: session_windows(s, gap="1 hour"), "sess"
    )
    rows = got.collect()
    assert rows
    batch_total = spark.read.parquet(events_dir).count()
    assert sum(r["n_events"] for r in rows) == batch_total  # every event in a session
    # sessions for one user never overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1


def test_running_totals_stateful(spark, events_dir):
    got = _run_stream(spark, events_dir, running_totals, "rt")
    # update-mode memory sink: last row per user wins
    final = {
        r["user_id"]: r
        for r in sorted(got.collect(), key=lambda r: r["n_events"])
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("m"))
        .collect()
    )
    expect = {r["user_id"]: r for r in batch}
    assert set(final) == set(expect)
    sample = list(expect)[:20]
    for u in sample:
        assert final[u]["n_events"] == expect[u]["n"]
        assert final[u]["last_ts"] == expect[u]["m"]


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    from erpl_web_spark.streaming.windows import stream_dedup

    # duplicate every file once -> each event_id appears (at least) twice
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_dir)
    base.union(base).repartition(4).write.mode("overwrite").parquet(dup_dir)
    got = _run_stream(
        spark, dup_dir, lambda s: stream_dedup(s, watermark="10 minutes"), "dd"
    )
    n_distinct = base.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_interval_join_matches_batch(spark, events_dir):
    from erpl_web_spark.streaming.windows import stream_interval_join

    def build(s):
        return stream_interval_join(
            s.where("event_type = 'click'"),
            s.where("event_type = 'purchase'"),
            within="30 minutes",
        )

    got = _run_stream(spark, events_dir, build, "ssj")
    b = spark.read.parquet(events_dir)
    batch = build(b)
    assert got.count() == batch.count() > 0
    # every pair respects the interval contract
    bad = got.where("r_ts < l_ts OR r_ts > l_ts + INTERVAL 30 MINUTES").count()
    assert bad == 0


def test_document_pipeline_operators_run_on_streams(spark, sf_dir, tmp_path_factory):
    """The per-row pipeline operators (quality scoring, hash split,
    seeded shuffle keys) are pure expressions, so the same code runs
    unchanged on a document *stream* — micro-batch output must equal the
    batch run over the same files."""
    from erpl_web_spark.operators.curation import seeded_shuffle_key
    from erpl_web_spark.operators.text import hash_split, with_quality_score
    from erpl_web_spark.suite import load

    path = str(tmp_path_factory.mktemp("docs_stream"))
    load(spark, sf_dir, "documents").repartition(3).write.mode("overwrite").parquet(path)

    def build(df):
        scored = with_quality_score(df).where("quality_keep")
        split = hash_split(scored, "doc_id", {"train": 0.8, "val": 0.2}, method="md5")
        return seeded_shuffle_key(split, "doc_id", seed=3, method="md5").select(
            "doc_id", "split", "shuffle_key"
        )

    schema = spark.read.parquet(path).schema
    q = (
        build(spark.readStream.schema(schema).parquet(path))
        .writeStream.format("memory")
        .queryName("docpipe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("docpipe").collect()}
    want = {tuple(r) for r in build(spark.read.parquet(path)).collect()}
    assert got == want and len(got) > 0
