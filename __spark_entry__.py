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
# Round 14 (VERDICT r13 Next #1): latest-row histogram over the
# CORRECTNESS_r*.json union is r09x28 / r10x50 / r11x50 / r12x50 /
# r13x50 — the 28 r09-stale names lead (judge-listed burn-down set),
# then the round-14 additions (need their first driver rows), then the
# alphabetically-first r10-band names to fill the 50-slot prefix; the
# remaining r10 names queue behind them for round 15. Names are
# stable; unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- latest driver row is r09 (the r13-verdict burn-down list) --
    "dedup_cluster_minhash",
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
    # -- new in round 14 (need their first driver rows) --
    "quality_drift_report",
    "quality_drift_histogram",
    "pipeline_cms_index_rebuild",
    "agg_quantile_sketch",
    "pipeline_qsketch_index_batches",
    "retrieval_hybrid_rrf",
    "graph_labelprop",
    "diag_skew_profile",
    "diag_join_size_estimate",
    "layout_range_bounds",
    "graph_kcore",
    "quality_drift_quantiles",
    # -- stalest of the r10 band (alphabetical) fills the 50-slot prefix --
    "analytics_event_transitions",
    "analytics_market_basket",
    "analytics_rfm_segments",
    "array_funcs",
    "asof_join_events",
    "cdc_delta_batch",
    "date_funcs",
    "dedup_cluster_minhash_md5",
    "dedup_simhash_md5",
    "dedup_url_canonical",
    "dedup_winnow_overlap",
    "dedup_winnow_scrub",
    "distinct_projection",
    "embedding_matryoshka_audit",
    "filter_in_case_coalesce",
    "join_anti",
    "join_broadcast_dims",
    "join_full_outer",
    "join_semi",
    "join_theta_pairs",
    "json_funcs",
    # -- remainder of the r10 band queues for round 15 --
    "map_funcs",
    "math_funcs",
    "multimodal_dhash_pairs",
    "multimodal_dhash_values",
    "odata_expand_nested",
    "odata_select_filter_top",
    "pipeline_pack_nextfit",
    "pipeline_url_index_batches",
    "pivot_order_status",
    "q02_min_cost_supplier",
    "q09_product_type_profit",
    "q11_important_stock",
    "q12_shipping_modes",
    "q16_supplier_relationship",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "set_intersect",
    "set_union",
    "similarity_ann_lsh_md5",
    "similarity_knn_label_eval",
    "sort_topk",
    "string_funcs",
    "text_bigram_coverage",
    "text_bigram_logprob",
    "text_bloom_membership",
    "text_bpe_merges",
    "text_chunk_windows",
    "text_hashed_features",
    "text_url_canonicalize",
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
