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
# Round 11 (VERDICT r10 Next #2): the judge's latest-row histogram is
# r06x6 / r07x45 / r08x50 / r09x49 / r10x50 — the round-11 additions
# (which need their first driver rows) lead, then the 51 entries whose
# latest driver row is <= r07 (the six r06-latest names first); the
# four r07 names past the 50-sample prefix fill the next round. Names
# are stable; unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- new in round 11 (need their first driver rows) --
    "text_winnow_natural",
    "dedup_simhash_natural",
    "text_bigram_natural",
    "embedding_pca_planted",
    "text_bpe_natural",
    "curation_dsir_natural",
    "pipeline_url_index_bloom",
    "curation_quality_probe",
    # -- latest driver row is r06 (oldest band) --
    "text_html_strip",
    "text_winnow_fingerprints",
    "window_lag_lead",
    "window_moving_frame",
    "window_rank_orders",
    "window_sessionize",
    # -- latest driver row is r07 --
    "agg_avg_int",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "agg_stats_exact",
    "dedup_embedding",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_centroid",
    "embedding_covariance",
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
    "subquery_correlated_exists",
    "subquery_scalar_avg",
    "text_lang_id",
    "text_lang_profile",
    "text_repetition",
    "text_stats",
    "text_unigram_freq",
    "union_all_tagged",
    "window_distribution",
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
