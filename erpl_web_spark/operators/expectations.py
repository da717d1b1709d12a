"""Declarative data-quality expectations — the validation gate a
pipeline runs before publishing a batch (the Deequ/Great-Expectations
shape, engine-native): row-level predicates, table-level aggregate
invariants, and referential integrity, each reported as a
(check_name, n_rows, n_failed, passed) row.

Scale shape: ALL row-level checks evaluate in ONE pass over the table
(one aggregate of conditional sums — adding a check adds a column to
the agg, not a scan); uniqueness rides the same aggregate via
count vs count_distinct; referential integrity is one left-anti join
per (child, parent) pair, broadcast when the parent's key side is
dimension-sized. Nothing corpus-scale reaches the driver — the report
is checks-many rows.

Round 14 adds the CROSS-BATCH tier (the Deequ anomaly-detection
shape): :func:`batch_metrics` profiles a batch as tall (metric, value)
rows, :func:`metrics_apply` persists them under the manifest commit
protocol (the HLL/CMS index pattern), and :func:`drift_report`
compares the latest committed batch against the previous one under
per-metric relative/absolute tolerances — so a publish gate catches
"this batch is fine in isolation but 40% smaller than yesterday".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    row_checks: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One-pass expectations report over ``df``.

    ``row_checks``: name -> boolean Column that must hold on every row
    (NULL counts as a failure — an unknown is not a pass).
    ``unique_keys``: name -> key column list that must be duplicate-free
    over rows whose key tuple is fully non-NULL (NULL keys cannot be
    compared for uniqueness, matching ``referential_report``'s NULL
    exemption; check them with a completeness row check).
    Returns one row per check: (check_name, n_rows, n_failed, passed
    0/1). An EMPTY input passes every check with n_failed = 0 — the
    publish gate must not three-value an empty batch. Check names are
    carried as typed literals (never spliced into SQL), so any string
    is a valid name; a name used in both dicts raises.
    """
    row_checks = row_checks or {}
    unique_keys = unique_keys or {}
    if not row_checks and not unique_keys:
        raise ValueError("quality_report needs at least one check")
    dup = set(row_checks) & set(unique_keys)
    if dup:
        raise ValueError(f"check names used in both dicts: {sorted(dup)}")
    # positional aliases: check names never appear in SQL identifiers
    aggs = [F.count("*").cast("long").alias("__n")]
    names = list(row_checks) + list(unique_keys)
    for i, cond in enumerate(row_checks.values()):
        aggs.append(
            F.coalesce(
                F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__f{i}")
        )
    for j, keys in enumerate(unique_keys.values()):
        nn = None
        for k in keys:
            c = F.col(k).isNotNull()
            nn = c if nn is None else nn & c
        aggs.append(
            (
                F.coalesce(F.sum(nn.cast("int")), F.lit(0))
                - F.count_distinct(*[F.col(k) for k in keys])
            )
            .cast("long")
            .alias(f"__f{len(row_checks) + j}")
        )
    one = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("check_name"),
                    F.col(f"__f{i}").alias("n_failed"),
                )
                for i, n in enumerate(names)
            ]
        )
    ).alias("__c")
    return one.select(pairs, F.col("__n").alias("n_rows")).select(
        F.col("__c.check_name").alias("check_name"),
        "n_rows",
        F.col("__c.n_failed").alias("n_failed"),
        (F.col("__c.n_failed") == 0).cast("int").alias("passed"),
    )


def batch_metrics(
    df: DataFrame,
    key_cols: list[str] | None = None,
    rate_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
) -> DataFrame:
    """One-pass profile of a batch as tall (metric, value) rows — the
    unit of state the cross-batch drift tier persists (VERDICT r13
    Next #5, the Deequ anomaly-detection shape): ``n_rows``,
    ``n_distinct_keys`` (struct-distinct over ``key_cols``, so NULL
    key components still count), and ``null_rate:<col>`` per rate
    column (NULL-count / n_rows; 0.0 on an empty batch — an absent
    batch has no nulls, and the gate must not three-value emptiness).

    Values are doubles, exact for any count below 2^53; rates divide
    two exact counts, so the SAME inputs give bit-identical doubles in
    any IEEE engine — what makes the drift oracle value-hashable.
    ONE aggregate pass regardless of metric count (a metric is a
    column of the agg, not a scan).

    ``hist_cols``: col -> (lo, hi, nbins) adds ``hist:<col>:<bin>``
    metrics — each bin's SHARE of the column's non-NULL values under
    fixed equi-width binning (``floor((v - lo) / (hi - lo) * nbins)``,
    clamped to [0, nbins-1] so outliers land in the edge bins instead
    of vanishing). Fixed bins, not quantiles, deliberately: shares are
    exact count ratios (bit-identical cross-engine, mergeable across
    partitions inside the same aggregate) and an abs tolerance per bin
    in :func:`drift_report` is the distribution-shift check — see
    :func:`hist_tolerances`. NULLs are excluded here (null_rate owns
    them); an all-NULL or empty batch emits share 0.0 for every bin.
    """
    key_cols = key_cols or []
    rate_cols = rate_cols or []
    hist_cols = hist_cols or {}
    aggs = [F.count("*").cast("double").alias("n_rows")]
    names = ["n_rows"]
    if key_cols:
        aggs.append(
            F.count_distinct(F.struct(*key_cols)).cast("double").alias("__k")
        )
        names.append("n_distinct_keys")
    for i, c in enumerate(rate_cols):
        aggs.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")).cast("double")
                / F.count("*"),
                F.lit(0.0),
            ).alias(f"__r{i}")
        )
        names.append(f"null_rate:{c}")
    n_hist = 0
    for c, (lo, hi, nbins) in hist_cols.items():
        v = F.col(c).cast("double")
        binned = F.least(
            F.lit(nbins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (v - F.lit(float(lo)))
                    / F.lit(float(hi) - float(lo))
                    * F.lit(nbins)
                ).cast("int"),
            ),
        )
        for b in range(nbins):
            # the isNotNull gate matters: Spark's greatest() IGNORES
            # NULLs, so a NULL value's clamp lands on 0, not NULL —
            # ungated, every NULL row would count into bin 0
            aggs.append(
                F.coalesce(
                    F.try_divide(
                        F.sum(
                            (v.isNotNull() & (binned == b)).cast("long")
                        ).cast("double"),
                        F.sum(v.isNotNull().cast("long")),
                    ),
                    F.lit(0.0),
                ).alias(f"__h{n_hist}")
            )
            names.append(f"hist:{c}:{b}")
            n_hist += 1
    one = df.agg(*aggs)
    cols = (
        ["n_rows"]
        + (["__k"] if key_cols else [])
        + [f"__r{i}" for i in range(len(rate_cols))]
        + [f"__h{i}" for i in range(n_hist)]
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("metric"), F.col(c).alias("value")
                )
                for n, c in zip(names, cols)
            ]
        )
    ).alias("__m")
    return one.select(pairs).select(
        F.col("__m.metric").alias("metric"), F.col("__m.value").alias("value")
    )


def hist_tolerances(
    col: str, nbins: int, limit: float
) -> dict[str, tuple[str, float]]:
    """Tolerance dict for one histogram column: every ``hist:<col>:<b>``
    bin share compared with abs ``limit``. Per-bin abs share delta is
    the distribution-shift check — a mass shift of x into a bin moves
    that bin's share by x, so limit bounds the detectable shift
    directly (and SUM of per-bin deltas is 2x total-variation
    distance, for calibration)."""
    return {f"hist:{col}:{b}": ("abs", limit) for b in range(nbins)}


def quantile_metrics(
    df: DataFrame,
    col: str,
    qs_permille: list[int],
    sub_bits: int = 4,
) -> DataFrame:
    """Tall (metric, value) rows ``q:<col>:<permille>`` — log-bucket
    quantile edges (``operators.qsketch``) of a NON-NEGATIVE BIGINT
    column (quantize upstream: cents, bytes, token counts), the
    distribution-drift profile for columns whose RANGE is unknown or
    unbounded. ``hist_cols`` needs a fixed [lo, hi) domain chosen in
    advance; the log buckets adapt to any magnitude, so a p99 that
    quietly drifts 10x still lands a metric the gate can compare.
    Values are integer bucket edges cast to double (exact below 2^53),
    so a "rel" tolerance in :func:`drift_report` is bit-identical
    cross-engine; bucket granularity means a shift below
    ``2**-sub_bits`` can read as delta 0 — the tolerance should sit
    above that quantization floor.

    An EMPTY (or all-NULL/negative) batch emits NO rows — and the
    ghost-metric rule in :func:`drift_report` then fails the
    toleranced quantile loudly instead of letting an empty publish
    slide through.

    One geometry-bounded sketch pass next to batch_metrics' aggregate
    pass; the quantile extraction windows over the ~1k-row sketch."""
    from erpl_web_spark.operators.qsketch import (
        logbucket_quantiles,
        logbucket_sketch,
    )

    sk = logbucket_sketch(df.select(F.col(col)), col, sub_bits)
    q = logbucket_quantiles(sk, qs_permille)
    return q.select(
        F.concat(
            F.lit(f"q:{col}:"), F.col("q_permille").cast("string")
        ).alias("metric"),
        F.col("est_edge").cast("double").alias("value"),
    )


def quantile_tolerances(
    col: str, qs_permille: list[int], limit: float
) -> dict[str, tuple[str, float]]:
    """Tolerance dict for one quantile-profiled column: every
    ``q:<col>:<pm>`` edge compared with rel ``limit`` (set limit above
    the 2**-sub_bits bucket-quantization floor)."""
    return {f"q:{col}:{q}": ("rel", float(limit)) for q in qs_permille}


def metrics_apply(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    key_cols: list[str] | None = None,
    rate_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    quantile_cols: dict[str, list[int]] | None = None,
) -> None:
    """foreachBatch sink: persist this batch's :func:`batch_metrics`
    (plus :func:`quantile_metrics` rows for ``quantile_cols``: col ->
    permille list) as ``metrics=<batch_id>`` under the manifest commit
    protocol (the HLL/CMS index discipline — manifest written strictly
    after the parquet write, so a torn write is invisible and a
    replayed batch id is a no-op). State is metrics-many rows per
    batch: the history a publish gate needs for drift checks, at no
    corpus-scale cost."""
    from erpl_web_spark.core import manifests

    spark = batch_df.sparkSession
    if batch_id in manifests.committed_versions(spark, path, "metrics"):
        return  # replay: history must not gain a duplicate batch
    m = batch_metrics(batch_df, key_cols, rate_cols, hist_cols)
    for c, qs in (quantile_cols or {}).items():
        m = m.unionByName(quantile_metrics(batch_df, c, qs))
    m.write.mode("overwrite").parquet(f"{path}/metrics={batch_id}")
    manifests.commit_version(spark, path, "metrics", batch_id)


def drift_report(
    spark,
    path: str,
    tolerances: dict[str, tuple[str, float]],
    before: int | None = None,
) -> DataFrame | None:
    """Compare the latest committed metrics batch against the previous
    one — the cross-batch tier a real publish gate runs NEXT TO the
    single-batch :func:`quality_report` (row-count delta, distinct-key
    delta, null-rate drift vs the last committed batch).

    ``tolerances``: metric -> ("rel", limit) or ("abs", limit).
    rel compares ``|curr/prev - 1|`` (the rate-of-change contract for
    counts); abs compares ``|curr - prev|`` (for rates already in
    [0, 1]). A vanished baseline (prev = 0, curr > 0) has no defined
    relative change: delta is NULL and the check FAILS — unknown is
    not a pass, the ``quality_report`` NULL convention. prev = curr =
    0 is drift 0. The limit is inclusive: delta == limit passes
    (pytest pins the boundary). A toleranced metric recorded in
    NEITHER batch still gets its row — NULL values, delta NULL,
    passed 0 — so a misspelled or never-collected metric fails the
    gate loudly instead of silently vanishing from the report.

    Returns one row per toleranced metric — (curr_batch, metric,
    prev_value, curr_value, delta rounded to 1e-9, mode, max_delta,
    passed 0/1) — or None with fewer than two committed batches
    (no history yet; nothing to drift against). ``before`` restricts
    to batches strictly below it, so a gate can replay any historical
    pair. Both sides of the comparison are metrics-many rows: the
    whole report is a driver-side-trivial join, never a corpus scan.
    """
    from erpl_web_spark.core import manifests

    versions = manifests.committed_versions(spark, path, "metrics", before=before)
    if len(versions) < 2:
        return None
    prev_id, curr_id = versions[-2], versions[-1]
    prev = spark.read.parquet(f"{path}/metrics={prev_id}").select(
        "metric", F.col("value").alias("prev_value")
    )
    curr = spark.read.parquet(f"{path}/metrics={curr_id}").select(
        "metric", F.col("value").alias("curr_value")
    )
    joined = prev.join(curr, "metric", "full_outer")
    tol_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("metric"),
                    F.lit(mode).alias("mode"),
                    F.lit(float(limit)).alias("max_delta"),
                )
                for m, (mode, limit) in tolerances.items()
            ]
        )
    ).alias("__t")
    tol_df = spark.range(1).select(tol_rows).select(
        "__t.metric", "__t.mode", "__t.max_delta"
    )
    # Drive from the tolerance side: a toleranced metric absent from
    # BOTH batches must still surface (NULL values, passed 0) — a gate
    # that asked for a check must see its verdict, not a missing row.
    out = tol_df.join(joined, "metric", "left")
    delta = F.when(
        F.col("mode") == "abs",
        F.abs(F.col("curr_value") - F.col("prev_value")),
    ).otherwise(
        F.when(F.col("prev_value") > 0.0,
               F.abs(F.col("curr_value") / F.col("prev_value") - 1.0))
        .when(F.col("curr_value") == 0.0, F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )
    return out.select(
        F.lit(int(curr_id)).cast("long").alias("curr_batch"),
        "metric",
        "prev_value",
        "curr_value",
        F.round(delta, 9).alias("delta"),
        "mode",
        "max_delta",
        (delta.isNotNull() & (delta <= F.col("max_delta")))
        .cast("int")
        .alias("passed"),
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str],
    check_name: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity check: every non-NULL child key tuple must
    exist in ``parent``. One left-anti join on the keys (parent side
    reduced to distinct keys and broadcast by default — dimension
    tables; pass False for fact-sized parents). Same report schema as
    :func:`quality_report`, union them for one gate."""
    nn = child
    for k in keys:
        nn = nn.where(F.col(k).isNotNull())
    pk = parent.select(*keys).distinct()
    if broadcast_parent:
        pk = F.broadcast(pk)
    orphans = nn.join(pk, keys, "left_anti")
    return (
        nn.agg(
            F.count("*").cast("long").alias("n_rows"),
        )
        .crossJoin(orphans.agg(F.count("*").cast("long").alias("n_failed")))
        .select(
            F.lit(check_name).alias("check_name"),
            "n_rows",
            "n_failed",
            (F.col("n_failed") == 0).cast("int").alias("passed"),
        )
    )
