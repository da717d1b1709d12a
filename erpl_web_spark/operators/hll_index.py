"""Incremental HyperLogLog index — the sixth on-disk incremental state
next to the lexical/semantic/media/line/URL indexes: per-batch HLL
register sketches (``text.hll_registers``) appended as versioned
parquet under the manifest commit protocol (``core.manifests``), so
"distinct users over a year of daily batches" is a register merge over
at most ``batches x 2**p`` tiny rows per group — the raw batches are
never re-read.

Why registers and not estimates: estimates don't merge (max of two
estimates is meaningless), registers do (per-register max IS the union
sketch, losslessly — pytest-pinned in test_operators). Each committed
version carries its ``(p, groups)`` in the manifest payload; apply
refuses a mismatched ``p`` (registers of different precision cannot be
merged) instead of silently corrupting the union.

Replay-safe: a foreachBatch retry of an already-committed batch id is
a no-op (the manifest is the commit point); a torn data write without
its manifest is invisible to readers by protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def read_hll_registers(spark, path: str, before: int | None = None):
    """Merged register state over every committed batch (or None when
    the index is empty): one (groups..., __idx, __r) row per register,
    the per-register MAX across batches. Feed to ``text.hll_estimate``
    (or call :func:`hll_index_estimate`)."""
    from pyspark.sql import functions as F

    from erpl_web_spark.core import manifests

    union = manifests.read_committed_union(spark, path, "hllregs", before=before)
    if union is None:
        return None
    groups = _index_meta(spark, path)["groups"]
    return union.groupBy(*groups, "__idx").agg(F.max("__r").alias("__r"))


def _index_meta(spark, path: str) -> dict:
    from erpl_web_spark.core import manifests

    versions = manifests.committed_versions(spark, path, "hllregs")
    return manifests.manifest_payload(spark, path, "hllregs", versions[-1])


def hll_index_apply(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    group_cols: list[str],
    value: str = "value",
    p: int = 8,
) -> None:
    """foreachBatch sink: sketch this batch's values into HLL registers
    and commit them as ``hllregs=<batch_id>``. Idempotent on replay
    (committed batch ids are skipped). Raises on a ``p`` mismatch with
    the existing index — precision cannot change mid-index."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.text import hll_registers

    spark = batch_df.sparkSession
    committed = manifests.committed_versions(spark, path, "hllregs")
    if batch_id in committed:
        return  # replayed batch: the manifest is the commit point
    if committed:
        meta = _index_meta(spark, path)
        if meta["p"] != p or meta["groups"] != list(group_cols):
            raise ValueError(
                f"hll index at {path} was built with p={meta['p']}, "
                f"groups={meta['groups']}; got p={p}, groups={list(group_cols)}"
            )
    regs = hll_registers(batch_df, list(group_cols), value, p)
    regs.write.mode("overwrite").parquet(f"{path}/hllregs={batch_id}")
    manifests.commit_version(
        spark, path, "hllregs", batch_id,
        payload={"p": p, "groups": list(group_cols)},
    )


def hll_index_compact(spark, path: str, keep_latest: int = 1) -> int:
    """Compact old committed register batches into one pre-MAXed
    generation (``core.manifests.compact_versions`` with a semantic
    merge): valid because register max is idempotent under the
    protocol's crash-recovery double-visibility window — doubled rows
    cannot change a max (unlike the ADDITIVE cms index, which refuses
    compaction). Pre-maxing also bounds the merged directory at 2**p
    rows per group regardless of how many batches were merged. The
    index's (p, groups) geometry is re-attached to the redirect
    manifest so ``_index_meta`` keeps working if the redirected
    version ever becomes the newest."""
    from erpl_web_spark.core import manifests

    meta = _index_meta(spark, path)

    def merge(union):
        from pyspark.sql import functions as F

        return union.groupBy(*meta["groups"], "__idx").agg(
            F.max("__r").alias("__r")
        )

    return manifests.compact_versions(
        spark, path, "hllregs", keep_latest=keep_latest,
        merge=merge, extra_payload={"p": meta["p"], "groups": meta["groups"]},
    )


def hll_index_estimate(spark, path: str, before: int | None = None):
    """Per-group cardinality estimates from the committed index (or
    None when empty) — (groups..., n_zero_regs, hll_est)."""
    from erpl_web_spark.operators.text import hll_estimate

    regs = read_hll_registers(spark, path, before=before)
    if regs is None:
        return None
    meta = _index_meta(spark, path)
    return hll_estimate(regs, meta["groups"], meta["p"])
