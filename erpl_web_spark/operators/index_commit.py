"""Shared publish-and-record tail of the incremental dedup indexes.

The lexical (``dedup.dedup_index_apply``), semantic
(``similarity.embedding_index_apply``) and perceptual media
(``multimodal.media_index_apply``) indexes differ only in how they
GENERATE candidates; the protocol tail — publish the keeper delta under
the manifest commit protocol and record per-item decisions — is
identical and lives here once, so a protocol fix lands in one place
(the same reasoning that hoisted ``manifests.compact_versions``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def commit_index_batch(
    spark,
    path: str,
    batch_id: int,
    keepers: DataFrame,
    batch_ids: DataFrame,
    in_batch_drops: DataFrame,
    index_dups: DataFrame,
    id_col: str,
) -> None:
    """Publish ``keepers`` as ``path/batch=<batch_id>`` (replay guard:
    retract a previous attempt's manifest before the overwrite;
    manifest re-written LAST, so the delta is never reader-visible
    while half-written) and write the per-item decision record to
    ``path/decisions/batch=<batch_id>`` as (id, status
    'kept'|'dup_in_batch'|'dup_of_index', dup_of).

    ``batch_ids``: one row per incoming item (just ``id_col``);
    ``in_batch_drops``: (id_col, dup_of) for within-batch losers;
    ``index_dups``: (new_id, dup_of) for losers against the stored
    index. Callers own the persist/unpersist lifecycle of the frames
    they pass in (both writes here materialize them).
    """
    from erpl_web_spark.core import manifests

    manifests.uncommit_version(spark, path, "batch", batch_id)
    keepers.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")
    manifests.commit_version(spark, path, "batch", batch_id)

    decisions = (
        batch_ids.join(in_batch_drops, id_col, "left")
        .join(
            index_dups.withColumnRenamed("new_id", id_col)
            .withColumnRenamed("dup_of", "__idx_of"),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.when(F.col("dup_of").isNotNull(), F.lit("dup_in_batch"))
            .when(F.col("__idx_of").isNotNull(), F.lit("dup_of_index"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce(F.col("dup_of"), F.col("__idx_of")).alias("dup_of"),
        )
    )
    decisions.write.mode("overwrite").parquet(f"{path}/decisions/batch={batch_id}")
