"""Shared core of the ADDITIVE on-disk sketch indexes — Count-Min
(``cms_index``) and the log-bucket quantile sketch (``qsketch``): one
implementation of the versioned-sketch-parquet protocol instead of a
copy per family.

An additive index commits one sketch per batch under the manifest
protocol (``core.manifests`` — the commit point that makes foreachBatch
replays no-ops) and reads back the per-key SUM of every committed
version, which by additivity equals the single-pass sketch of the
concatenated corpus bit-exactly. The same additivity is why these
indexes REFUSE the manifest compactor (its crash window shows merged-
away rows twice, and doubled rows double a sum — where the HLL index's
register MAX shrugs) and instead prune via :func:`index_rebuild`: a
full rewrite into a fresh path with no double-visibility window.

Every family supplies its sketch as a DataFrame with key columns plus a
``cnt`` BIGINT, its ``kind`` (the manifest namespace / partition
prefix), and its ``geometry`` (the payload keys two sketches must agree
on before their cells may be summed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _geom_str(geom: dict) -> str:
    return ", ".join(f"{k}={v}" for k, v in geom.items())


def index_meta(spark, path: str, kind: str) -> dict:
    """Payload of the latest committed version (geometry lives here)."""
    from erpl_web_spark.core import manifests

    versions = manifests.committed_versions(spark, path, kind)
    return manifests.manifest_payload(spark, path, kind, versions[-1])


def index_read(
    spark, path: str, kind: str, key_cols: list[str], before: int | None = None
):
    """Merged sketch over every committed batch — per-key SUM of
    ``cnt`` — or None when the index is empty."""
    from erpl_web_spark.core import manifests

    union = manifests.read_committed_union(spark, path, kind, before=before)
    if union is None:
        return None
    return union.groupBy(*key_cols).agg(F.sum("cnt").alias("cnt"))


def index_apply(
    sketch_df: DataFrame, batch_id: int, path: str, kind: str, geometry: dict
) -> bool:
    """foreachBatch sink body: commit ``sketch_df`` as
    ``<kind>=<batch_id>``. Returns False (untouched) when the batch id
    is already committed — counters must never be double-added on a
    replay; raises on a geometry mismatch with the existing index
    (cells of different geometry must not be summed)."""
    from erpl_web_spark.core import manifests

    spark = sketch_df.sparkSession
    committed = manifests.committed_versions(spark, path, kind)
    if batch_id in committed:
        return False
    if committed:
        meta = index_meta(spark, path, kind)
        got = {k: meta.get(k) for k in geometry}
        if got != geometry:
            raise ValueError(
                f"{kind} index at {path} was built with {_geom_str(got)}; "
                f"got {_geom_str(geometry)}"
            )
    sketch_df.write.mode("overwrite").parquet(f"{path}/{kind}={batch_id}")
    manifests.commit_version(spark, path, kind, batch_id, payload=dict(geometry))
    return True


def index_refuse_compact(kind: str, rebuild_name: str):
    """The deliberate compaction refusal, shared verbatim: additive
    counters are not idempotent under the compactor's double-visibility
    crash window (merged-away rows visible TWICE until retractions
    complete double every sum, where HLL's register max is unchanged).
    Accumulation is bounded anyway — each batch adds at most a
    geometry-bounded number of rows — and pruning, when it matters, is
    the fresh-path rebuild."""
    raise NotImplementedError(
        f"{kind}_index refuses compaction: additive counters are not "
        "idempotent under the compactor's double-visibility crash "
        f"window (see docstring); use {rebuild_name} into a fresh "
        "path instead"
    )


def index_rebuild(
    spark,
    path: str,
    dest_path: str,
    kind: str,
    key_cols: list[str],
    geometry_keys: list[str],
) -> int:
    """The pruning path the compaction refusal prescribes: merge every
    committed batch sketch into ONE version at a FRESH path and commit
    it there — no double-visibility window, because readers keep
    resolving the OLD path until the caller swaps to ``dest_path``.
    After the swap, ``index_apply`` appends to the rebuilt index
    exactly as before (streaming batch ids stay monotone past the
    rebuilt version, which keeps the id of the LAST source batch).

    Crash/replay safety, by construction:
    - crash BEFORE the dest commit — dest holds torn data with no
      manifest (invisible to readers); the source is never touched;
      re-running redoes the rebuild from the same committed union.
    - crash AFTER the dest commit — re-running uncommits, rewrites
      byte-identical rows, and recommits: idempotent.
    - rebuilding IN PLACE is refused — that is exactly the refused
      compaction (the source must stay readable until the swap).

    Raises when the source is empty, when ``dest_path`` already holds
    committed versions other than the rebuild's own id (only the
    crashed-after-commit replay may find its version there — any other
    live version would be double-counted by the merged read), or when
    the replay version's geometry differs. Returns the version id
    committed at ``dest_path``.
    """
    from erpl_web_spark.core import manifests

    if dest_path.rstrip("/") == path.rstrip("/"):
        raise ValueError(
            f"{kind}_index rebuild: dest_path must differ from path — "
            "an in-place rewrite is the refused compaction (readers "
            "would see merged-away rows twice in the crash window)"
        )
    committed = manifests.committed_versions(spark, path, kind)
    if not committed:
        raise ValueError(f"{kind}_index rebuild: no committed index at {path}")
    meta = index_meta(spark, path, kind)
    geometry = {k: meta.get(k) for k in geometry_keys}
    n = committed[-1]
    dest_committed = manifests.committed_versions(spark, dest_path, kind)
    foreign = [v for v in dest_committed if v != n]
    if foreign:
        raise ValueError(
            f"{kind}_index rebuild: dest {dest_path} already holds "
            f"committed versions {foreign}; a rebuilt total next to "
            f"live versions would double-count — rebuild into a fresh "
            f"path and swap"
        )
    if dest_committed:
        dmeta = manifests.manifest_payload(spark, dest_path, kind, n)
        dgeom = {k: dmeta.get(k) for k in geometry_keys}
        if dgeom != geometry:
            raise ValueError(
                f"{kind}_index rebuild: dest {dest_path} holds a "
                f"{_geom_str(dgeom)} index; source is {_geom_str(geometry)}"
            )
    merged = index_read(spark, path, kind, key_cols)
    # replay guard, the merge-sink discipline: retract a previous
    # attempt's manifest BEFORE clobbering its data directory
    manifests.uncommit_version(spark, dest_path, kind, n)
    merged.write.mode("overwrite").parquet(f"{dest_path}/{kind}={n}")
    manifests.commit_version(
        spark,
        dest_path,
        kind,
        n,
        payload={
            **geometry,
            "rebuilt_from": path,
            "rebuilt_batches": committed,
        },
    )
    return n
