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
    cosine_top_k,
    lsh_bucket_candidates,
    with_vector_norm,
)
from erpl_web_spark.operators.text import (
    with_text_stats,
    with_language_id,
    with_quality_score,
    token_count_expr,
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
    "cosine_top_k",
    "lsh_bucket_candidates",
    "with_vector_norm",
    "with_text_stats",
    "with_language_id",
    "with_quality_score",
    "token_count_expr",
]
