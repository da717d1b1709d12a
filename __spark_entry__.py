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
# Round 13 (VERDICT r12 Next #1): latest-row histogram over the
# CORRECTNESS_r*.json union is r08x15 / r09x48 / r10x49 / r11x46 /
# r12x50 — the fifteen r08-stale names lead (the only entries whose
# latest driver row is r08), then the round-13 additions (which need
# their first driver rows), then the 48-name r09 band alphabetically;
# the ~16 r09 names past the 50-sample prefix fill the next round.
# Names are stable; unlisted entries keep registration order after
# these.
_SAMPLE_PRIORITY = [
    # -- latest driver row is r08 (missed the r12 prefix) --
    "text_clean_lines",
    "text_countmin_topk",
    "text_gopher_rules",
    "text_line_dedup",
    "text_line_dedup_keepfirst",
    "text_line_dedup_salted",
    "text_normalize",
    "text_paragraph_dedup",
    "text_quality",
    "text_quality_linear",
    "text_redact_pii",
    "text_token_diversity",
    "text_unigram_freq_salted",
    "text_vocab_topk",
    "udtf_chunk_tokens",
    # -- new in round 13 (need their first driver rows) --
    "dedup_containment_natural",
    "dedup_substring_natural",
    "curation_weighted_threshold",
    "similarity_ivf_cell_profile",
    "text_bm25_topk",
    "graph_pagerank",
    "layout_zorder_profile",
    "agg_hll_distinct",
    "text_bm25_natural",
    "pipeline_hll_index_batches",
    "cdc_scd2_intervals",
    "cdc_scd2_asof_lookup",
    "quality_expectations",
    "graph_triangles",
    # -- latest driver row is r09 --
    "agg_approx_distinct",
    "agg_histogram",
    "asof_join_forward",
    "bitwise_funcs",
    "cdc_snapshot_diff",
    "codec_funcs",
    "cohort_retention",
    "curation_decontaminate_semantic",
    "curation_temperature_mixture",
    "dedup_minhash_lsh_md5",
    "dedup_source_overlap",
    "dedup_substring_scrub",
    "diag_profile_orders",
    "events_resample_1h",
    "events_value_anomaly",
    "funnel_stages",
    "interval_funcs",
    "interval_join_bucketed",
    "match_fuzzy_parts",
    "match_resolve_parts",
    "min_cost_supplier",
    "multimodal_audio_chunks",
    "null_safe_funcs",
    "odata_apply_groupby",
    "pipeline_corpus_report",
    "pipeline_line_index_repave",
    "pipeline_split_leak_safe",
    "q04_order_priority",
    "q07_volume_shipping",
    "q08_market_share",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_idle_cohorts",
    "sequence_funcs",
    "set_except_all",
    "set_intersect_all",
    "similarity_recall_at_k",
    "similarity_threshold_sweep",
    "stat_corr_matrix",
    "string_distance_funcs",
    "text_bigram_topk",
    "text_bpe_pairs",
    "text_lang_confusion",
    "text_tfidf_topk",
    "unpivot_part_attrs",
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
