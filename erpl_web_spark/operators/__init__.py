"""Large-scale operators: relational helpers + LLM-data-pipeline ops.

Everything here is expressed with built-in pyspark.sql.functions so the
work stays inside WholeStageCodegen; Python executes only in the
explicitly-marked multimodal decode stubs (Arrow-batched mapInPandas).
"""

from erpl_web_spark.operators.relational import asof_join, expand_entity, top_k
from erpl_web_spark.operators.dedup import (
    exact_dedup_report,
    fingerprint_documents,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_documents,
    simhash_near_dup_pairs,
)
from erpl_web_spark.operators.similarity import (
    ann_top_k_ivf,
    ann_top_k_ivf_rerank,
    ann_top_k_lsh,
    cosine_top_k,
    lsh_bucket_candidates,
    quantize_int8,
    with_vector_norm,
)
from erpl_web_spark.operators.text import (
    boilerplate_ngrams,
    bpe_encode,
    bpe_train,
    clean_lines,
    line_dedup_corpus,
    linear_quality_score,
    normalize_text,
    countmin_sketch,
    countmin_lookup,
    hash_split,
    with_boilerplate_ratio,
    with_text_stats,
    with_language_id,
    with_quality_score,
    token_count_expr,
)
from erpl_web_spark.operators._cache import release_tracked, tracked_count
from erpl_web_spark.operators.graph import component_summary, connected_components
from erpl_web_spark.operators.cdc import (
    apply_cdc_changes,
    incremental_agg_update,
    merge_to_parquet_snapshots,
)
from erpl_web_spark.operators.line_index import (
    line_index_apply,
    line_index_compact,
    read_clean_batches,
    read_line_counts,
)
from erpl_web_spark.operators.curation import (
    mixture_upsample,
    quantile_filter,
    seeded_shuffle_key,
    token_budget_sample,
    write_training_shards,
)

__all__ = [
    "asof_join",
    "expand_entity",
    "top_k",
    "exact_dedup_report",
    "fingerprint_documents",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_documents",
    "simhash_near_dup_pairs",
    "bpe_encode",
    "bpe_train",
    "clean_lines",
    "line_dedup_corpus",
    "linear_quality_score",
    "normalize_text",
    "countmin_sketch",
    "countmin_lookup",
    "quantile_filter",
    "line_index_apply",
    "line_index_compact",
    "read_clean_batches",
    "read_line_counts",
    "ann_top_k_ivf",
    "ann_top_k_ivf_rerank",
    "ann_top_k_lsh",
    "cosine_top_k",
    "lsh_bucket_candidates",
    "quantize_int8",
    "with_vector_norm",
    "boilerplate_ngrams",
    "hash_split",
    "with_boilerplate_ratio",
    "with_text_stats",
    "with_language_id",
    "with_quality_score",
    "token_count_expr",
    "component_summary",
    "connected_components",
    "apply_cdc_changes",
    "incremental_agg_update",
    "merge_to_parquet_snapshots",
    "mixture_upsample",
    "seeded_shuffle_key",
    "token_budget_sample",
    "write_training_shards",
    "release_tracked",
    "tracked_count",
]
