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
# Round 12 (VERDICT r11 Next #1): latest-row histogram over the
# CORRECTNESS_r*.json union is r07x9 / r08x50 / r09x49 / r10x50 /
# r11x50 — the nine r07 names that missed the r11 50-sample prefix
# lead, then the round-12 additions (which need their first driver
# rows), then the 50-name r08 band alphabetically; the ~11 r08 names
# past the 50-sample prefix fill the next round. Names are stable;
# unlisted entries keep registration order after these.
_SAMPLE_PRIORITY = [
    # -- latest driver row is r07 (missed the r11 prefix) --
    "text_stats",
    "text_lang_id",
    "text_lang_profile",
    "text_repetition",
    "text_unigram_freq",
    "subquery_correlated_exists",
    "subquery_scalar_avg",
    "union_all_tagged",
    "window_distribution",
    # -- new in round 12 (need their first driver rows) --
    "dedup_minhash_natural",
    "dedup_allpairs_natural",
    "similarity_ivf_trained",
    "similarity_ann_ivf_trained",
    "curation_weighted_sample",
    "curation_contamination_bloom",
    # -- latest driver row is r08 --
    "cdc_apply_merge",
    "cdc_incremental_agg",
    "chunk_tokens_native",
    "curation_cap_per_source",
    "curation_contamination",
    "curation_contamination_pairs",
    "curation_diverse_sample",
    "curation_mixture_upsample",
    "curation_quantile_filter",
    "curation_stratified_sample",
    "curation_token_budget",
    "dedup_allpairs_prefix",
    "dedup_cluster_components",
    "dedup_cluster_summary",
    "dedup_containment",
    "dedup_exact",
    "dedup_keep_best",
    "dedup_substring_kgram",
    "embedding_cluster_semantic",
    "embedding_quantize_stats",
    "multimodal_frames",
    "multimodal_tiles",
    "pipeline_curate_corpus",
    "pipeline_curate_lines",
    "pipeline_curate_media",
    "pipeline_curate_normalize",
    "pipeline_line_index_batches",
    "pipeline_pack_documents",
    "pipeline_shuffle_order",
    "regex_funcs",
    "set_except",
    "similarity_ann_ivf_int8",
    "text_boilerplate_ngrams",
    "text_boilerplate_ratio",
    "text_bpe_encode",
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
