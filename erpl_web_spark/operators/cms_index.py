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

The versioned-parquet protocol itself — apply/read/rebuild, replay
no-ops, the compaction refusal — is the shared additive-index core
(``operators.additive_index``), one implementation serving this family
and the log-bucket quantile index (``qsketch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from erpl_web_spark.operators import additive_index as _ai

_KIND = "cms"
_KEYS = ["d", "w"]
_GEOM = ["depth", "width"]


def _index_meta(spark, path: str) -> dict:
    return _ai.index_meta(spark, path, _KIND)


def read_countmin_index(spark, path: str, before: int | None = None):
    """Merged (d, w, cnt) sketch over every committed batch — per-cell
    SUM — or None when the index is empty."""
    return _ai.index_read(spark, path, _KIND, _KEYS, before=before)


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
    from erpl_web_spark.operators.text import countmin_sketch

    sk = countmin_sketch(batch_df, text_col, depth, width)
    _ai.index_apply(
        sk, batch_id, path, _KIND, {"depth": depth, "width": width}
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
    _ai.index_refuse_compact(_KIND, "countmin_index_rebuild")


def countmin_index_rebuild(spark, path: str, dest_path: str) -> int:
    """The compaction RECIPE ``countmin_index_compact`` prescribes,
    made an operator (VERDICT r13 Next #4): merge every committed
    batch sketch into ONE version at a FRESH path and commit it there,
    readers resolving the OLD path until the caller swaps. Crash/
    replay semantics, the foreign-version and geometry guards, and the
    in-place refusal are the shared additive-index contract — see
    :func:`additive_index.index_rebuild` (pytest pins them on THIS
    family). Returns the version id committed at ``dest_path``."""
    return _ai.index_rebuild(spark, path, dest_path, _KIND, _KEYS, _GEOM)


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
