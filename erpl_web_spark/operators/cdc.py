"""CDC change application: merge a batch of keyed change rows
(upserts + deletes) into a snapshot.

The reference's ODP surface delivers delta rows and leaves applying
them to the user (SURVEY.md §2.I; `odp_odata_read_bind_data.cpp` only
advances tokens — SAP ODP payloads carry their change markers as
ordinary columns). This operator is the missing half of a usable CDC
pipeline: snapshot ∘ apply(changes) == next snapshot.

Design for scale:
- One shuffle on the merge keys for the latest-change window, and the
  anti-join against the base reuses that same key partitioning; change
  batches are typically ≪ base, so Spark broadcasts the join side
  automatically under AQE.
- No driver-side state; the streaming wrapper rides foreachBatch where
  Spark's checkpointed offsets give exactly-once application per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_cdc_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str | None = None,
    seq_cols: list[str] | None = None,
    delete_ops: tuple[str, ...] = ("D",),
    validate: bool = False,
) -> DataFrame:
    """Merge ``changes`` into ``base``: the latest change per key wins;
    delete ops remove the key, anything else upserts the full row image.

    ``changes`` must contain ``base``'s columns (the row image) plus
    optionally ``op_col`` (change mode; rows matching ``delete_ops``
    delete) and ``seq_cols`` (change ordering — REQUIRED for
    determinism whenever a batch may carry several changes for one key;
    without it the batch must be key-unique, as ODP per-request deltas
    are). A NULL ``op_col`` value upserts (NULL is "not a delete op",
    not "drop the row" — the isin predicate is wrapped null-safely so
    three-valued logic can't silently discard the change).

    ``validate=True`` enforces the seq_cols=None key-uniqueness
    contract with one cheap count-distinct action on the (skinny) key
    projection of the batch and raises naming the duplicate count —
    a malformed feed fails loudly instead of silently emitting
    duplicate key rows into the snapshot.
    """
    img_cols = base.columns
    if validate and not seq_cols:
        kd = changes.select(*keys)
        # distinct over a STRUCT of the keys: a struct is never NULL
        # itself, so NULL key components still count as distinct values
        # (bare count_distinct(k) would skip NULL-keyed rows entirely)
        n_rows, n_keys = kd.groupBy().agg(
            F.count(F.lit(1)), F.count_distinct(F.struct(*keys))
        ).first()
        if n_rows != n_keys:
            raise ValueError(
                "apply_cdc_changes: seq_cols=None requires a key-unique "
                f"batch, but {n_rows - n_keys} duplicate key row(s) found "
                "— pass seq_cols so the latest change per key can win "
                "deterministically"
            )
    if seq_cols:
        # Ties on the sequence columns break deterministically by the
        # remaining row content (arbitrary but stable across runs and
        # partitionings — a bare row_number over a tied window is not).
        tiebreak = [
            c for c in img_cols if c not in keys and c not in seq_cols
        ]
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in seq_cols],
            *[F.col(c).desc_nulls_last() for c in tiebreak],
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        latest = changes
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    upserts = latest
    if op_col is not None:
        upserts = upserts.where(_not_a_delete(op_col, delete_ops))
    return untouched.unionByName(upserts.select(*img_cols))


def _not_a_delete(op_col: str, delete_ops: tuple[str, ...]):
    """Null-safe "keep this change" predicate: a NULL op is NOT a
    delete, so the row upserts. A bare ``~col.isin(...)`` evaluates to
    NULL for a NULL op and where() would silently drop the row —
    three-valued logic turning "unknown op" into "delete"."""
    return ~F.coalesce(F.col(op_col).isin(*delete_ops), F.lit(False))


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("D",),
    end_prefix: str = "end_",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a keyed change
    stream: every surviving change row becomes one validity interval —
    valid-from = its own ``seq_cols``, valid-to = the NEXT change's
    ``seq_cols`` for the same key (NULL while current; emitted as
    ``end_<seq_col>`` columns plus an ``is_current`` flag). Delete ops
    CLOSE the prior interval without opening one: the lead() is
    computed over ALL changes including deletes, then delete rows are
    dropped — so a key whose latest change is a delete has a fully
    closed history and no current row.

    This is the standard warehouse treatment of a CDC/ODP delta feed
    (as-of queries join on ``valid_from <= ts < end``): where
    ``apply_cdc_changes`` keeps only the latest image, this keeps the
    full history as intervals. One shuffle (the key-partitioned
    window); change ordering must be total per key — ties on
    ``seq_cols`` break deterministically by the remaining row content,
    the ``apply_cdc_changes`` convention.
    """
    tiebreak = [
        c
        for c in changes.columns
        if c not in keys and c not in seq_cols and c != op_col
    ]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in seq_cols],
        *[F.col(c).asc_nulls_last() for c in tiebreak],
    )
    out = changes
    for c in seq_cols:
        out = out.withColumn(end_prefix + c, F.lead(c).over(w))
    out = out.withColumn(
        "is_current", F.col(end_prefix + seq_cols[0]).isNull()
    )
    if op_col is not None:
        # null-safe: a NULL op opens an interval like any upsert (see
        # _not_a_delete — bare ~isin would NULL out and drop the row)
        out = out.where(_not_a_delete(op_col, delete_ops)).drop(op_col)
    return out


def scd2_asof_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_seq: list[str],
    hist_seq: list[str],
    end_prefix: str = "end_",
    how: str = "left",
) -> DataFrame:
    """Point-in-time dimension lookup against :func:`scd2_intervals`
    output: each fact row joins the ONE history interval covering its
    ``fact_seq`` position — ``hist_seq <= fact_seq < end_<hist_seq>``
    (open end = current, covers everything after). Tuple comparisons
    use the composite-seq lexicographic order, matching the interval
    builder's window order.

    Exactly-one-match is structural: a key's intervals partition its
    timeline (each valid-to IS the next valid-from), so the range
    filter after the key equi-join keeps at most one interval per
    fact — no window, no dedup. Facts before a key's first interval
    (or on a deleted gap) get NULLs under ``how="left"``. The join is
    an EQUI join on the keys with the range as a post-filter: Spark
    plans a hash join keyed on ``keys``, and per-key history fan-out
    is bounded by that key's change count — the standard temporal-
    dimension shape, no theta join.
    """
    hist = history
    fact_tuple = F.struct(*[facts[c] for c in fact_seq])
    from_tuple = F.struct(*[hist[c] for c in hist_seq])
    end_cols = [end_prefix + c for c in hist_seq]
    end_tuple = F.struct(*[hist[c] for c in end_cols])
    cond = None
    for k in keys:
        c = facts[k] == hist[k]
        cond = c if cond is None else cond & c
    cond = cond & (from_tuple <= fact_tuple)
    cond = cond & (hist[end_cols[0]].isNull() | (fact_tuple < end_tuple))
    joined = facts.join(hist, cond, how)
    # drop the history side's duplicated key columns
    return joined.drop(*[hist[k] for k in keys])


def merge_to_parquet_snapshots(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    op_col: str | None = None,
    seq_cols: list[str] | None = None,
    retain_versions: int | None = None,
) -> None:
    """foreachBatch sink: apply each CDC micro-batch to the previous
    snapshot and write snapshot version ``path/v=<batch_id>``.

    Versioned directories keep each write-out immutable; a version is
    visible to ``read_latest_snapshot`` only once its manifest commits
    (``core.manifests`` — manifest written strictly after the parquet
    write, readers list manifests only, so a torn write is invisible).
    Works on any Hadoop-visible filesystem; on a real deployment a
    lakehouse MERGE can replace the whole sink.

    Replay-safe: the base snapshot is the highest complete version
    STRICTLY BELOW ``batch_id``. When Spark replays a batch whose write
    already committed (crash after the parquet commit but before the
    checkpoint commit), the merge re-derives v=<batch_id> from
    v=<batch_id - 1> instead of reading the very directory it is about
    to overwrite — reading v=<batch_id> itself would both break
    idempotence and make Spark refuse the overwrite ("Cannot overwrite
    a path that is also being read from"), wedging the stream.

    ``retain_versions`` bounds storage: after the new version commits,
    complete versions older than ``batch_id - retain_versions`` are
    deleted. Spark only ever replays the most recent uncommitted batch,
    so any ``retain_versions >= 1`` preserves replay safety (the replay
    of batch N re-reads v=N-1, the newest retained version); None keeps
    every version (a full time-travel history).
    """
    from erpl_web_spark.core import manifests

    spark = batch_df.sparkSession
    latest = read_latest_snapshot(spark, path, before=batch_id)
    base = latest if latest is not None else batch_df.filter(F.lit(False))
    merged = apply_cdc_changes(base, batch_df, keys, op_col, seq_cols)
    # replay guard: if a previous attempt committed v=batch_id, retract
    # its manifest BEFORE clobbering the data — readers must never
    # resolve a version to a directory mid-overwrite
    manifests.uncommit_version(spark, path, "v", batch_id)
    merged.write.mode("overwrite").parquet(f"{path}/v={batch_id}")
    # manifest written last: the version becomes reader-visible here
    manifests.commit_version(spark, path, "v", batch_id)
    if retain_versions is not None:
        cutoff = batch_id - retain_versions
        for n in manifests.committed_versions(spark, path, "v", before=cutoff):
            manifests.retract_version(spark, path, "v", n, f"v={n}")


def read_latest_snapshot(spark, path: str, before: int | None = None) -> DataFrame | None:
    """Highest manifest-committed snapshot version, or None. Lists the
    manifest directory only (``core.manifests``) — data directories
    without a committed manifest (torn writes) are invisible, and the
    path may live on any Hadoop-visible filesystem, not just the
    driver-local disk.

    ``before`` restricts to versions strictly below the given batch id —
    the replay-idempotence guard used by ``merge_to_parquet_snapshots``.
    """
    from erpl_web_spark.core import manifests

    dirs = manifests.data_dirs(spark, path, "v", before=before)
    if not dirs:
        # refuse to treat pre-manifest state as absent: merging against
        # an empty base would silently drop every key not in this batch
        manifests.assert_no_legacy_state(spark, path, "v")
        return None
    return spark.read.parquet(dirs[-1])


def snapshot_digests(
    df: DataFrame, id_col: str, compare_cols: list[str]
) -> DataFrame:
    """Map-side reduction of a snapshot to (id, 16-byte md5 digest of
    the compared columns). The row digest is the md5 of the
    CONCATENATED PER-COLUMN md5s: fixed-width components make the
    encoding injective — no separator that column VALUES could contain
    (a '\\x1f'-joined concat would collide ('a\\x1fb','c') with
    ('a','b\\x1fc')). NULL encodes as a 32-char non-hex marker, so it
    can never collide with a real value's digest. This skinny table is
    the ONLY thing the diff machinery ever shuffles or stores — bodies
    stay at the source."""
    null_mark = F.lit("n" * 32)  # not valid hex: disjoint from any md5
    parts = [
        F.when(F.col(c).isNull(), null_mark).otherwise(
            F.md5(F.col(c).cast("string"))
        )
        for c in compare_cols
    ]
    return df.select(
        F.col(id_col), F.md5(F.concat(*parts)).alias("digest")
    )


def digest_diff(
    old_digests: DataFrame,
    new_digests: DataFrame,
    id_col: str,
    status_col: str = "status",
) -> DataFrame:
    """added/removed/changed rows from two (id, digest) tables: one
    full-outer shuffle on the id, unchanged rows dropped, so the output
    is O(churn).

    The join is NULL-SAFE on the id (``eqNullSafe`` — still an
    equi-join for the planner, the key is just wrapped), so a NULL-id
    row present in both snapshots compares its digests like any other
    id instead of reporting a phantom added+removed pair. Limitation
    (documented, matching the snapshot contract that ids are unique):
    at most ONE NULL id per side — several NULL ids would cross-join
    among themselves, as they would under any grouping of "the" NULL
    key."""
    o = old_digests.select(
        F.col(id_col).alias("__id_old"), F.col("digest").alias("__h_old")
    )
    n = new_digests.select(
        F.col(id_col).alias("__id_new"), F.col("digest").alias("__h_new")
    )
    joined = o.join(
        n, F.col("__id_old").eqNullSafe(F.col("__id_new")), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("__id_new"), F.col("__id_old")).alias(id_col),
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias(status_col),
    ).where(F.col(status_col) != "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """Content-level diff of two corpus snapshots: which ids were
    ``added``, ``removed``, or ``changed`` between crawls/exports.

    The reference's CDC surface (SURVEY §2.I) assumes the source emits
    change markers; many real sources (HTTP exports, object-store drops)
    only give you full snapshots — this derives the change feed from
    them, turning any snapshot-only source into a CDC input for
    ``apply_cdc_changes``. Each side reduces to (id, digest) map-side
    (``snapshot_digests``) before the single full-outer shuffle.
    """
    return digest_diff(
        snapshot_digests(old, id_col, compare_cols),
        snapshot_digests(new, id_col, compare_cols),
        id_col,
        status_col,
    )


def snapshot_stream_to_changes(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    changes_path: str,
    id_col: str,
    compare_cols: list[str],
) -> None:
    """foreachBatch sink turning a STREAM of full snapshot exports into
    a CDC change feed: each micro-batch is one complete export (e.g. a
    file-source with maxFilesPerTrigger=1 over periodic dumps); the sink
    diffs it against the previous export and appends
    (id, status, batch_id) change rows under ``changes_path``.

    Only the (id, digest) table persists between batches (versioned
    under ``state_path`` exactly like ``merge_to_parquet_snapshots``) —
    state size is O(ids), independent of row width. The first batch
    emits every id as ``added`` (initial load).

    Replay-safe by the same construction as the merge sink: the
    baseline is the highest digest version STRICTLY BELOW ``batch_id``,
    and both writes are per-batch-directory overwrites, so a replayed
    batch reproduces byte-identical output instead of double-diffing.
    """
    spark = batch_df.sparkSession
    new_dig = snapshot_digests(batch_df, id_col, compare_cols)
    prev = read_latest_snapshot(spark, state_path, before=batch_id)
    if prev is None:
        prev = new_dig.where(F.lit(False))
    changes = digest_diff(prev, new_dig, id_col).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    )
    from erpl_web_spark.core import manifests

    # same commit discipline for BOTH outputs: uncommit before a replay
    # overwrite, manifest written only after the data write returns (a
    # consumer of the change feed can read committed batches via
    # manifests.read_committed_union(spark, changes_path, "batch"))
    manifests.uncommit_version(spark, changes_path, "batch", batch_id)
    changes.write.mode("overwrite").parquet(f"{changes_path}/batch={batch_id}")
    manifests.commit_version(spark, changes_path, "batch", batch_id)
    manifests.uncommit_version(spark, state_path, "v", batch_id)
    new_dig.write.mode("overwrite").parquet(f"{state_path}/v={batch_id}")
    manifests.commit_version(spark, state_path, "v", batch_id)


def incremental_agg_update(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    sign_col: str | None = None,
) -> DataFrame:
    """Incremental maintenance of a sum/count aggregate table: fold a
    change slice into the existing snapshot WITHOUT rescanning the
    fact history — the materialized-view pattern that turns an O(total)
    refresh into O(delta).

    ``sum_cols`` maps aggregate column -> source expression column in
    ``changes``; ``sign_col`` (+1 insert / -1 retract) enables deletes
    and updates-as-retract-plus-insert. Aggregating the (small) delta
    first, then combining with the snapshot, keeps the shuffle at
    |delta agg| + |snapshot| rows on the group keys. Groups whose count
    reaches zero are dropped (full retraction).
    """
    sign = F.col(sign_col) if sign_col else F.lit(1)
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias(count_col),
        *[
            F.sum(sign * F.col(src)).alias(dst)
            for dst, src in sum_cols.items()
        ],
    )
    combined = snapshot.select(*keys, count_col, *sum_cols).unionByName(
        delta.select(*keys, count_col, *sum_cols)
    )
    return (
        combined.groupBy(*keys)
        .agg(
            F.sum(count_col).cast("bigint").alias(count_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .where(F.col(count_col) > 0)
    )
