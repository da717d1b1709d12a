"""Event-time streaming operators: watermarked windowed aggregation,
session windows, and a custom stateful operator.

The reference has no continuous streaming (SURVEY.md §2.I: ODP CDC is its
only incremental surface — wrapped as a streaming source in
``odp_stream``). These operators supply the streaming half a large-scale
pipeline needs on top: late-data-tolerant rollups over event streams.
All are thin, declarative compositions — Spark's incremental planner owns
state store layout, watermark GC, and exactly-once sink semantics.

Each builder takes a *streaming* DataFrame (``spark.readStream...``) and
returns the transformed streaming DataFrame for ``writeStream``; the same
expression works on a batch DataFrame, which is how the tests pin
semantics (batch run == availableNow streaming run over the same files).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Spark watermarks require TIMESTAMP (instant semantics); naive
    parquet timestamps (isAdjustedToUTC=false, e.g. the driver's
    events.ts micros) arrive as TIMESTAMP_NTZ. The engine session pins
    spark.sql.session.timeZone=UTC, so casting relabels the same wall
    clock deterministically; non-NTZ inputs pass through untouched."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
    return df


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) windowed counts with
    an event-time watermark bounding state for late data.

    Output: key cols + window_start, window_end, n_events, n_users.
    """
    keys = keys or []
    events = _with_event_time(events, ts_col)
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-key session windows (gap-based) via the built-in
    ``session_window`` — state closes ``gap`` past the watermark.

    Output: key, session_start, session_end, n_events.
    """
    events = _with_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("last_event_type", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("last_type", StringType()),
    ]
)


def running_totals(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running event count + latest event, maintained across micro-batches.

    The shape the built-ins can't express: arbitrary per-key state carried
    forward indefinitely (here a counter + last-seen record; the same
    skeleton hosts dedup caches, CDC merge state, enrichment accumulators).
    State is partitioned by key — executors each hold their shard.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        n, last_ts, last_type = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            n += len(pdf)
            last_ts = pdf[ts_col].iloc[-1].to_pydatetime()
            last_type = str(pdf[type_col].iloc[-1])
        state.update((n, last_ts, last_type))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key_tuple[0]],
                "n_events": [n],
                "last_ts": [last_ts],
                "last_event_type": [last_type],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    events = _with_event_time(events, ts_col)
    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins, and the
    key cache self-expires once the watermark passes — bounded state, the
    property a plain ``dropDuplicates`` on an unbounded stream lacks.
    The streaming twin of the batch ``operators.dedup`` family (an
    at-most-once filter for replayed/overlapping source reads, e.g. ODP
    delta fetches after a token-expiry full reload)."""
    return _with_event_time(events, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(id_cols or ["event_id"])


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join bounded by an event-time interval: pairs
    (l, r) with the same key where ``l_ts <= r_ts <= l_ts + within``
    (e.g. click -> purchase attribution). Watermarks on BOTH sides plus
    the interval condition let Spark GC join state; without them a
    stream-stream join buffers forever. The same expression runs on
    batch DataFrames (watermarks are no-ops there), which is how tests
    pin semantics.

    Output: key, l_ts, l_type, r_ts, r_type.
    """
    l = _with_event_time(left, ts_col).select(
        F.col(key),
        F.col(ts_col).alias("l_ts"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", watermark)
    r = _with_event_time(right, ts_col).select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_type").alias("r_type"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col(key) == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop("r_key")
