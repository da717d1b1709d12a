"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()``/``oracle_sql()``
expose the oracle-checked suite from ``erpl_web_spark.suite`` (SURVEY.md
§2.F relational surface + driver-mandated pipeline operators). Queries
with ``oracle=None`` are genuinely non-SQL-expressible (seeded-hash LSH
banding) and get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from erpl_web_spark.session import apply_engine_conf  # noqa: E402
from erpl_web_spark.suite import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    apply_engine_conf(spark)
    q = all_queries()["q01_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


# Sample-rotation order for the driver's prefix-based per-round check.
# Round 8: CHANGED-semantics entries outrank the regression rotation —
# the 11 vacuity-audit remediations planted new corpora, so their old
# green rows verified a version that no longer exists; they lead,
# followed by the two brand-new round-8 entries, then the regression
# bands (r04-latest in registration order, r05-latest backfill; r07
# already re-confirmed all r01/r03-latest rows green). Names are
# stable; unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- round-8 vacuity-audit remediations: the planted corpora CHANGED
    # these entries' values, so each needs a fresh driver row proving the
    # non-vacuous version green (old rows verified the vacuous version) --
    "dedup_exact",
    "text_redact_pii",
    "regex_funcs",
    "text_quality",
    "set_except",
    "pipeline_pack_documents",
    "multimodal_tiles",
    "dedup_containment",
    "dedup_keep_best",
    "text_gopher_rules",
    "text_clean_lines",
    # -- new in round 8 (need their first driver rows) --
    "pipeline_curate_media",
    "text_unigram_freq_salted",
    "dedup_allpairs_prefix",
    "curation_quantile_filter",
    "text_quality_linear",
    "text_line_dedup",
    "pipeline_curate_lines",
    "text_bpe_encode",
    "text_normalize",
    "text_line_dedup_keepfirst",
    "text_paragraph_dedup",
    "pipeline_curate_normalize",
    "text_line_dedup_salted",
    "pipeline_line_index_batches",
    "text_countmin_topk",
    # -- latest driver green is r04 (oldest band after the r07 rotation) --
    "multimodal_frames",
    "udtf_chunk_tokens",
    "chunk_tokens_native",
    "curation_cap_per_source",
    "curation_diverse_sample",
    "curation_contamination",
    "curation_stratified_sample",
    "text_token_diversity",
    "dedup_cluster_components",
    "dedup_cluster_summary",
    "embedding_quantize_stats",
    "similarity_ann_ivf_int8",
    "pipeline_curate_corpus",
    "pipeline_shuffle_order",
    "cdc_apply_merge",
    "text_boilerplate_ngrams",
    "text_boilerplate_ratio",
    "curation_mixture_upsample",
    "cdc_incremental_agg",
    "text_vocab_topk",
    "curation_token_budget",
    "dedup_substring_kgram",
    "curation_contamination_pairs",
    # -- backfill: oldest r05-latest names --
    "embedding_cluster_semantic",
    "dedup_substring_scrub",
    "match_fuzzy_parts",
    "match_resolve_parts",
    "cdc_snapshot_diff",
    "pipeline_split_leak_safe",
    "curation_decontaminate_semantic",
    "text_bpe_pairs",
    "similarity_threshold_sweep",
    "dedup_source_overlap",
    "multimodal_audio_chunks",
    "curation_temperature_mixture",
    "text_tfidf_topk",
    "pipeline_corpus_report",
    "text_lang_confusion",
    "similarity_recall_at_k",
    "text_bigram_topk",
    "set_except_all",
    "set_intersect_all",
    "odata_apply_groupby",
]


def _ordered_queries():
    reg = all_queries()
    rank = {n: i for i, n in enumerate(_SAMPLE_PRIORITY)}
    names = sorted(reg, key=lambda n: (rank.get(n, len(rank)), 0))
    # stable sort keeps registration order within the non-priority tail
    return {n: reg[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _ordered_queries().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                apply_engine_conf(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(q.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
