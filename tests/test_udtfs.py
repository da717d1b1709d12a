"""Python UDTF surface: chunking UDTF vs its codegen twin."""

from __future__ import annotations


def test_chunk_udtf_matches_native(spark, sf_dir):
    from erpl_web_spark.functions.udtfs import chunk_tokens, chunk_tokens_native
    from erpl_web_spark.suite import load

    docs = load(spark, sf_dir, "documents").limit(50)
    a = chunk_tokens(docs, size=16).orderBy("doc_id", "chunk_idx").collect()
    b = chunk_tokens_native(docs, size=16).orderBy("doc_id", "chunk_idx").collect()
    assert a == b
    assert len(a) > 50  # real fan-out
    for r in a:
        assert r.n_tokens <= 16


def test_chunk_udtf_empty_text(spark):
    from erpl_web_spark.functions.udtfs import chunk_tokens

    df = spark.createDataFrame([(1, ""), (2, "one two three")], "doc_id long, text string")
    rows = chunk_tokens(df, size=2).orderBy("doc_id", "chunk_idx").collect()
    assert [(r.doc_id, r.chunk_idx, r.n_tokens) for r in rows] == [
        (1, 1, 0),
        (2, 1, 2),
        (2, 2, 1),
    ]
