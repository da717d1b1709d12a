"""Incremental Count-Min index — the seventh on-disk incremental state
(next to lexical/semantic/media/line/URL/HLL): per-batch Count-Min
sketches (``text.countmin_sketch``) committed as versioned parquet
under the manifest protocol, so corpus-lifetime token frequencies are
a counter merge over at most ``batches x depth x width`` rows — the
raw batches are never re-read.

Where the HLL index merges registers by MAX, Count-Min counters are
ADDITIVE: the per-cell SUM of the batch sketches IS the sketch of the
concatenated corpus, bit-exactly (pytest-pinned) — so point estimates
from the merged index carry the same one-sided ±εN contract as a
single-pass sketch over everything. Each committed version records its
``(depth, width)``; apply refuses a mismatch (cells of different
geometry must not be summed).

Replay-safe: the manifest is the commit point, so a foreachBatch retry
of a committed batch id is a no-op — counters are never double-added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _index_meta(spark, path: str) -> dict:
    from erpl_web_spark.core import manifests

    versions = manifests.committed_versions(spark, path, "cms")
    return manifests.manifest_payload(spark, path, "cms", versions[-1])


def read_countmin_index(spark, path: str, before: int | None = None):
    """Merged (d, w, cnt) sketch over every committed batch — per-cell
    SUM — or None when the index is empty."""
    from erpl_web_spark.core import manifests

    union = manifests.read_committed_union(spark, path, "cms", before=before)
    if union is None:
        return None
    return union.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def countmin_index_apply(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> None:
    """foreachBatch sink: sketch this batch's token frequencies and
    commit them as ``cms=<batch_id>``. Idempotent on replay; raises on
    a (depth, width) mismatch with the existing index."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.text import countmin_sketch

    spark = batch_df.sparkSession
    committed = manifests.committed_versions(spark, path, "cms")
    if batch_id in committed:
        return  # replayed batch: counters must not be double-added
    if committed:
        meta = _index_meta(spark, path)
        if meta["depth"] != depth or meta["width"] != width:
            raise ValueError(
                f"cms index at {path} was built with depth={meta['depth']}, "
                f"width={meta['width']}; got depth={depth}, width={width}"
            )
    sk = countmin_sketch(batch_df, text_col, depth, width)
    sk.write.mode("overwrite").parquet(f"{path}/cms={batch_id}")
    manifests.commit_version(
        spark, path, "cms", batch_id, payload={"depth": depth, "width": width}
    )


def countmin_index_compact(spark, path: str, keep_latest: int = 1) -> int:
    """REFUSED, deliberately: Count-Min rows are ADDITIVE, and the
    manifest compactor's crash-recovery contract makes merged-away
    rows visible TWICE until retractions complete — doubled rows
    double a sum (where the HLL index's register max is unchanged),
    so a crash mid-compaction would silently inflate every estimate.
    Accumulation is harmless here anyway: each batch adds at most
    depth x width rows (1024 at the defaults), so even 10k batches
    stay a ~10M-row union. If pruning ever matters, use
    ``countmin_index_rebuild`` — a full rewrite into a fresh path has
    no double-visibility window."""
    raise NotImplementedError(
        "cms_index refuses compaction: additive counters are not "
        "idempotent under the compactor's double-visibility crash "
        "window (see docstring); use countmin_index_rebuild into a "
        "fresh path instead"
    )


def countmin_index_rebuild(spark, path: str, dest_path: str) -> int:
    """The compaction RECIPE ``countmin_index_compact`` prescribes,
    made an operator (VERDICT r13 Next #4): merge every committed
    batch sketch into ONE version at a FRESH path and commit it there —
    the full-rewrite pruning path that has no double-visibility window,
    because readers keep resolving the OLD path until the caller swaps
    to ``dest_path``. After the swap, ``countmin_index_apply`` appends
    to the rebuilt index exactly as before (streaming batch ids stay
    monotone past the rebuilt version).

    One pass: the per-cell SUM over the committed union (additivity
    makes that SUM bit-identical to a single-pass sketch of the whole
    corpus, the property the index is built on) written as
    ``cms=<last batch id>`` under the manifest protocol. The payload
    records geometry plus the rebuilt batch ids for audit.

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
    the replay version's (depth, width) differs. Returns the version
    id committed at ``dest_path``.
    """
    from erpl_web_spark.core import manifests

    if dest_path.rstrip("/") == path.rstrip("/"):
        raise ValueError(
            "countmin_index_rebuild: dest_path must differ from path — "
            "an in-place rewrite is the refused compaction (readers "
            "would see merged-away rows twice in the crash window)"
        )
    committed = manifests.committed_versions(spark, path, "cms")
    if not committed:
        raise ValueError(f"countmin_index_rebuild: no committed index at {path}")
    meta = _index_meta(spark, path)
    n = committed[-1]
    dest_committed = manifests.committed_versions(spark, dest_path, "cms")
    # The ONLY committed version the dest may hold is n itself — the
    # crashed-after-commit replay. Anything else (a previous rebuild's
    # different id, or post-swap appended batches) means the rebuilt
    # TOTAL would sit next to live additive versions and the merged
    # read would double-count every cell.
    foreign = [v for v in dest_committed if v != n]
    if foreign:
        raise ValueError(
            f"countmin_index_rebuild: dest {dest_path} already holds "
            f"committed versions {foreign}; a rebuilt total next to "
            f"live versions would double-count — rebuild into a fresh "
            f"path and swap"
        )
    if dest_committed:
        dmeta = manifests.manifest_payload(spark, dest_path, "cms", n)
        if dmeta.get("depth") != meta["depth"] or dmeta.get("width") != meta["width"]:
            raise ValueError(
                f"countmin_index_rebuild: dest {dest_path} holds a "
                f"depth={dmeta.get('depth')}, width={dmeta.get('width')} "
                f"index; source is depth={meta['depth']}, width={meta['width']}"
            )
    merged = read_countmin_index(spark, path)
    # replay guard, the merge-sink discipline: retract a previous
    # attempt's manifest BEFORE clobbering its data directory
    manifests.uncommit_version(spark, dest_path, "cms", n)
    merged.write.mode("overwrite").parquet(f"{dest_path}/cms={n}")
    manifests.commit_version(
        spark,
        dest_path,
        "cms",
        n,
        payload={
            "depth": meta["depth"],
            "width": meta["width"],
            "rebuilt_from": path,
            "rebuilt_batches": committed,
        },
    )
    return n


def countmin_index_lookup(
    spark, path: str, tokens: DataFrame, tok_col: str = "tok",
    before: int | None = None,
):
    """Point-estimate tokens against the merged committed index (or
    None when empty) — (tok_col, est_n), est_n >= true count always."""
    from erpl_web_spark.operators.text import countmin_lookup

    sk = read_countmin_index(spark, path, before=before)
    if sk is None:
        return None
    meta = _index_meta(spark, path)
    return countmin_lookup(sk, tokens, tok_col, meta["depth"], meta["width"])
