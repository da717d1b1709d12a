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
# Round 6: the 20 entries with no green driver row lead — first the 4
# whose latest driver row is a stale r01/r04 err (fixed and judge-verified
# locally, needs a green hash row), then the 16 never driver-sampled
# (oracle-backed first, the rows-only text_bpe_merges last). The remaining
# ~30 slots of the prefix-50 interleave the OLDEST previously-verified
# names (last sampled in r01/r02) so the sample keeps regression-detection
# power instead of only maximizing first-time coverage. Names are stable;
# unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- stale driver errs, fixed locally, need a green row --
    "array_funcs",
    "map_funcs",
    "odata_expand_nested",
    "embedding_pca_project",
    # -- never driver-sampled, oracle-backed --
    "q02_min_cost_supplier",
    "q09_product_type_profit",
    "q11_important_stock",
    "q12_shipping_modes",
    "q16_supplier_relationship",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "pivot_order_status",
    "analytics_rfm_segments",
    "analytics_market_basket",
    "analytics_event_transitions",
    "text_hashed_features",
    "text_winnow_fingerprints",
    "dedup_winnow_overlap",
    "text_bigram_coverage",
    # -- never driver-sampled, rows-only (golden-fixture pinned) --
    "text_bpe_merges",
    # -- new this round --
    "dedup_winnow_scrub",
    "text_chunk_windows",
    "embedding_matryoshka_audit",
    "similarity_knn_label_eval",
    "text_bigram_logprob",
    "multimodal_dhash_pairs",
    "multimodal_dhash_values",
    "text_html_strip",
    # -- regression rotation: verified in r01/r02, not re-checked since --
    "asof_join_events",
    "window_rank_orders",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_theta_pairs",
    "join_broadcast_dims",
    "window_lag_lead",
    "window_moving_frame",
    "window_sessionize",
    "sort_topk",
    "set_union",
    "set_intersect",
    "set_except",
    "distinct_projection",
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "json_funcs",
    "odata_select_filter_top",
    "cdc_delta_batch",
    "filter_in_case_coalesce",
    "subquery_scalar_avg",
    "having_groups",
    "union_all_tagged",
    "pivot_status_counts",
    "explode_words",
    "window_distribution",
    "agg_stats_exact",
    "join_salted_skew",
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
