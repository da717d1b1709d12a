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
# Round 15 (VERDICT r14 Next #8): latest-row histogram over the
# CORRECTNESS_r*.json union is r10x40 / r11x50 / r12x50 / r13x50 /
# r14x50 -- the 40 r10-stale names lead (the band the r14 rotation
# left), then the alphabetically-first r11 names fill the 50-slot
# prefix; the remaining r11 names queue behind them for round 16.
# Names are stable; unlisted entries keep registration order after
# these.
_SAMPLE_PRIORITY = [
    # -- latest driver row is r10 (the band the r14 rotation left; 40) --
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
    # -- alphabetically-first r11-band names fill the 50-slot prefix --
    "agg_avg_int",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "agg_stats_exact",
    "curation_dsir_natural",
    "curation_quality_probe",
    "dedup_embedding",
    # -- remainder of the r11 band queues for round 16 --
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_natural",
    "embedding_centroid",
    "embedding_covariance",
    "embedding_pca_planted",
    "embedding_pca_project",
    "events_window_rollup",
    "explode_words",
    "having_groups",
    "join_left_counts",
    "join_salted_skew",
    "multimodal_decode",
    "multimodal_dhash_pairs_d7",
    "pipeline_hash_split",
    "pipeline_length_buckets",
    "pipeline_url_index_bloom",
    "pivot_status_counts",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_revenue_delta",
    "q13_order_distribution",
    "q14_promo_revenue",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_cosine_top3",
    "similarity_hard_negatives",
    "struct_funcs",
    "text_bigram_natural",
    "text_bpe_natural",
    "text_html_strip",
    "text_winnow_fingerprints",
    "text_winnow_natural",
    "window_lag_lead",
    "window_moving_frame",
    "window_rank_orders",
    "window_sessionize",
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
