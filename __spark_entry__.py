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
# Round 7: every entry now has a green driver row (r6 union milestone),
# so the policy is pure regression rotation — OLDEST latest-green first.
# The 25 entries whose latest green row is r01 (16) or r03 (9) lead, in
# registration order; entries NEW this round follow (first-time rows);
# the rest of the prefix-50 backfills with the oldest r04-latest names.
# Names are stable; unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- latest driver green is r01 --
    "subquery_scalar_avg",
    "having_groups",
    "union_all_tagged",
    "pivot_status_counts",
    "explode_words",
    "window_distribution",
    "agg_stats_exact",
    "join_salted_skew",
    "events_window_rollup",
    "regex_funcs",
    "struct_funcs",
    "subquery_correlated_exists",
    "agg_percentiles",
    "q06_revenue_delta",
    "q13_order_distribution",
    "q14_promo_revenue",
    # -- latest driver green is r03 --
    "q01_pricing_summary",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_avg_int",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "join_left_counts",
    # -- new in round 7 (first driver rows) --
    "multimodal_dhash_pairs_d7",
    # -- backfill: oldest r04-latest names --
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "text_lang_id",
    "text_quality",
    "text_lang_profile",
    "text_unigram_freq",
    "similarity_cosine_top3",
    "embedding_covariance",
    "similarity_hard_negatives",
    "pipeline_length_buckets",
    "similarity_ann_lsh",
    "multimodal_decode",
    "similarity_ann_ivf",
    "dedup_embedding",
    "text_redact_pii",
    "text_repetition",
    "pipeline_hash_split",
    "embedding_centroid",
    "pipeline_pack_documents",
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
