"""Python UDTFs (table functions) — the §2.F UDTF surface.

The reference's table functions are C++ scans; Spark's Python UDTF is the
user-extensible analogue: a class whose ``eval`` yields rows, used via
``LATERAL``/table-function syntax. UDTFs run in Python workers — fine for
control-plane fan-outs, but for bulk row explosion prefer the native
equivalent which stays in whole-stage codegen; ``chunk_tokens_native``
below is that twin, and the oracle suite pins both to identical output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk_text: string, n_tokens: int")
class ChunkTokens:
    """Context-window chunking: split a document's whitespace tokens
    (lowercased) into fixed-size chunks; one row per chunk with a 1-based
    index. Empty documents produce one empty chunk, so every input row
    appears in the output (a reshape, never a filter)."""

    def eval(self, text: str, size: int):  # noqa: D102
        toks = [t for t in re.split(r"\s+", (text or "").lower()) if t]
        n_chunks = max((len(toks) + size - 1) // size, 1)
        for c in range(1, n_chunks + 1):
            chunk = toks[(c - 1) * size : c * size]
            yield c, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL use (``LATERAL chunk_tokens(text, 32)``)."""
    spark.udtf.register("chunk_tokens", ChunkTokens)


def chunk_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", size: int = 32
) -> DataFrame:
    """Lateral-join the UDTF against a document table."""
    register_udtfs(df.sparkSession)
    df.createOrReplaceTempView("__udtf_docs")
    return df.sparkSession.sql(
        f"""
        SELECT {id_col}, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM __udtf_docs, LATERAL chunk_tokens({text_col}, {int(size)}) AS c
        """
    )


def chunk_tokens_native(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", size: int = 32
) -> DataFrame:
    """Codegen-path twin of ``chunk_tokens`` (explode over a transformed
    chunk array): identical output, no Python in the loop — the
    production choice for bulk chunking."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != "")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(size)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda c: F.concat_ws(" ", F.slice(toks, (c - 1) * size + 1, size)),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk_text")
    ).select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("chunk_idx"),
        "chunk_text",
        F.when(F.col("chunk_text") == "", 0)
        .otherwise(F.size(F.split("chunk_text", " ")))
        .cast("int")
        .alias("n_tokens"),
    )
