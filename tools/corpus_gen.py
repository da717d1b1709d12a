"""Natural-vocabulary synthetic corpus: Zipf token frequencies over a
~50k-word vocabulary, Heaps-law vocabulary growth, lognormal document
lengths, latent topics — the text-like counterpart to the driver's
~40-word `documents.parquet`.

WHY (VERDICT r8, Next #1): three round-8 scale measurements bottom out
in the same confound — the fixed tiny vocabulary. The winnow gate
saturates (every 5-gram fingerprint is corpus-wide), the exact
all-pairs prefix join goes super-linear (every shingle is shared by
thousands of docs), and IVF recall collapses (hashed features of a
40-word vocab have no usable geometry). This generator provides
vocabulary that behaves like text, so those boundaries can be
re-measured at realistic entropy (tools/lsh_recall.py --natural,
tools/ann_recall.py --natural, tools/natural_bounds.py, and
tools/curate_bench.py --sf on a generated directory).

Construction (all deterministic, md5-seeded, PURE Spark expressions —
no driver-side text building, so any n_docs the cluster can hold):

- **Zipf**: per-token rank = floor(V^u) with u uniform from the hash —
  the exact inverse-CDF for Zipf s=1 (P(rank=r) ~ 1/(r ln V)); the
  rank-1 word lands at ~ln2/lnV ~ 6.7% of tokens for V=30k, matching
  English "the".
- **Spelling**: rank -> pronounceable syllable word (40 CV syllables,
  1/2/3-syllable tiers by rank), so common words are SHORT (Zipf's law
  of abbreviation) and character n-grams have realistic diversity —
  the property the winnow/BPE/char-shingle operators care about.
- **Topics**: each doc draws a latent topic (T=50); ~30% of its tokens
  come from the topic's own 400-word Zipf slice. Gives documents
  topical coherence and gives hashed bag-of-words embeddings real
  cluster structure (bow_embeddings below) — the realistic middle
  ground between round 8's ±1-center vectors and its structureless
  testdata vectors.
- **Heaps**: emerges from Zipf sampling (V(n) ~ K n^beta); the CLI
  MEASURES it rather than asserting it, printing the rank-frequency
  slope and the V(n) curve so "behaves like text" is itself a checked
  number.
- **Lengths**: lognormal via Irwin-Hall(4) normal approximation,
  median ~150 tokens, clamped to [10, 1500]; newline every 20 tokens
  (line structure for the line-dedup / clean-lines operators).
- **Planted duplication** (``dup_every``): every k-th document gets one
  of 5 fixed 25-token quotes prepended as its first line — cross-doc
  duplicated spans for scrub/line-dedup measurements; 0 disables.

Schema matches /root/testdata/sf*/documents.parquet exactly:
(doc_id bigint, text string, lang string, source string, n_chars
bigint).

Usage:
    python tools/corpus_gen.py --n-docs 5000 --out .scratch/natural_5k
    python tools/corpus_gen.py --n-docs 5000 --diagnostics-only
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, ".")

from pyspark.sql import Column, DataFrame, functions as F  # noqa: E402

# 40 consonant-vowel syllables; 1..3-syllable words cover 65_640 ids
_SYL = [c + v for c in "bdklmnrs" for v in "aeiou"]

VOCAB_GLOBAL = 30_000
TOPICS = 50
TOPIC_VOCAB = 400  # per topic; total vocab = 30k + 50*400 = 50k
TOPIC_FRAC = 0.30
LINE_TOKENS = 20


def _h(*parts) -> Column:
    """Deterministic 48-bit hash of the joined parts (engine-portable
    md5 idiom used across the repo)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", *[p.cast("string") for p in parts]).cast("binary")),
            1, 12,
        ),
        16, 10,
    ).cast("bigint")


def _u(*parts) -> Column:
    """Uniform in (0, 1] from the hash (never 0, so log/rank math is safe)."""
    return (_h(*parts) % 16_777_216 + 1) / 16_777_216.0


def _word_expr(word_id: Column) -> Column:
    """Spell word ``word_id`` (1-based) from syllables: ids 1-40 are one
    syllable, 41-1640 two, 1641-65640 three — so low-rank (frequent)
    words are short, Zipf's law of abbreviation."""
    syl = F.array(*[F.lit(s) for s in _SYL])

    def at(i: Column) -> Column:
        return F.element_at(syl, (i + 1).cast("int"))

    j2 = word_id - 41
    j3 = word_id - 1641
    return (
        F.when(word_id <= 40, at(word_id - 1))
        .when(
            word_id <= 1640,
            F.concat(at(F.floor(j2 / 40)), at(j2 % 40)),
        )
        .otherwise(
            F.concat(
                at(F.floor(j3 / 1600)),
                at(F.floor(j3 / 40) % 40),
                at(j3 % 40),
            )
        )
    )


def word_py(word_id: int) -> str:
    """Python twin of :func:`_word_expr` (diagnostics, quote planting,
    tests)."""
    if word_id <= 40:
        return _SYL[word_id - 1]
    if word_id <= 1640:
        j = word_id - 41
        return _SYL[j // 40] + _SYL[j % 40]
    j = word_id - 1641
    return _SYL[j // 1600] + _SYL[(j // 40) % 40] + _SYL[j % 40]


def _zipf_rank(u: Column, vmax: int) -> Column:
    """Inverse-CDF Zipf(s=1) sample over ranks 1..vmax: rank =
    floor(vmax^u) gives P(rank=r) = (ln(r+1)-ln r)/ln(vmax) ~ 1/(r ln V)."""
    r = F.floor(F.exp(u * math.log(vmax))).cast("bigint")
    return F.least(F.greatest(r, F.lit(1)), F.lit(vmax))


# five fixed 25-token quotes from mid-rank global vocabulary (in-vocab,
# so planted duplication doesn't distort the token distribution)
def plant_quotes() -> list[str]:
    return [
        " ".join(word_py(100 * q + 7 + 4 * i) for i in range(25))
        for q in range(1, 6)
    ]


def natural_documents(
    spark,
    n_docs: int,
    seed: str = "nat9",
    dup_every: int = 0,
) -> DataFrame:
    """Generate the corpus as one declarative plan over spark.range —
    partitions scale with n_docs, no driver-side text."""
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    d = F.col("doc_id")

    # lognormal length via Irwin-Hall(4): z ~ N(0,1) approx
    s = sum(((_h(F.lit(seed), d, F.lit(f"L{i}")) % 1024) / 1024.0) for i in range(4))
    z = (s - 2.0) / 0.5774
    n_tok = F.least(
        F.greatest(F.round(F.exp(F.lit(math.log(150.0)) + 0.7 * z)).cast("int"), F.lit(10)),
        F.lit(1500),
    )
    topic = (_h(F.lit(seed), d, F.lit("topic")) % TOPICS).cast("bigint")

    def token(p: Column) -> Column:
        is_topic = (_h(F.lit(seed), d, p, F.lit("b")) % 100) < int(TOPIC_FRAC * 100)
        g_rank = _zipf_rank(_u(F.lit(seed), d, p, F.lit("g")), VOCAB_GLOBAL)
        t_rank = _zipf_rank(_u(F.lit(seed), d, p, F.lit("t")), TOPIC_VOCAB)
        word_id = F.when(
            is_topic, F.lit(VOCAB_GLOBAL) + topic * TOPIC_VOCAB + t_rank
        ).otherwise(g_rank)
        return _word_expr(word_id)

    toks = F.transform(F.sequence(F.lit(0), n_tok - 1), token)
    out = docs.withColumn("__toks", toks).withColumn("__n_tok", n_tok)

    n_lines = F.ceil(F.col("__n_tok") / LINE_TOKENS).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(F.col("__toks"), i * LINE_TOKENS + 1, LINE_TOKENS), " "
            ),
        ),
        "\n",
    )
    out = out.withColumn("text", text)

    if dup_every:
        quotes = plant_quotes()
        qarr = F.array(*[F.lit(q) for q in quotes])
        pick = F.element_at(
            qarr, (F.floor(d / dup_every) % len(quotes) + 1).cast("int")
        )
        out = out.withColumn(
            "text",
            F.when(d % dup_every == 0, F.concat(pick, F.lit("\n"), F.col("text")))
            .otherwise(F.col("text")),
        )

    langs = F.array(*[F.lit(x) for x in
                      ["en", "en", "en", "en", "en", "en", "es", "de", "zh", "fr"]])
    return out.select(
        "doc_id",
        "text",
        F.element_at(langs, (_h(F.lit(seed), d, F.lit("lang")) % 10 + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (_h(F.lit(seed), d, F.lit("src")) % 20).cast("string")).alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def bow_embeddings(docs: DataFrame, dim: int = 32) -> DataFrame:
    """Hashed bag-of-words embeddings (feature hashing: each token maps
    to one of ``dim`` buckets with a +-1 sign), L2-normalized — the
    realistic embedding source: documents sharing topical vocabulary
    correlate, everything else decorrelates, so cluster structure is as
    strong as the corpus' topical coherence and no stronger. Pure
    per-row expressions (O(dim * n_tok) per doc), one corpus scan.
    Returns (vec_id, embedding array<float>, label = topic proxy)."""
    toks = F.split(F.regexp_replace(F.col("text"), r"\s+", " "), " ")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    raw = F.transform(
        dims,
        lambda dd: F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + F.when(
                _h(t) % dim == dd,
                F.when(_h(t, F.lit("s")) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
            ).otherwise(F.lit(0.0)),
        ),
    )
    norm = F.sqrt(F.aggregate(F.col("__raw"), F.lit(0.0), lambda a, x: a + x * x))
    vec = F.transform(
        F.col("__raw"), lambda x: (x / F.greatest(F.col("__norm"), F.lit(1e-12))).cast("float")
    )
    return (
        docs.withColumn("__raw", raw)
        .withColumn("__norm", norm)
        .select(
            F.col("doc_id").alias("vec_id"),
            vec.alias("embedding"),
            # label: the dominant-topic proxy used only for diagnostics
            (_h(F.lit("nat9"), F.col("doc_id"), F.lit("topic")) % TOPICS)
            .cast("int")
            .alias("label"),
        )
    )


def diagnostics(spark, docs: DataFrame) -> None:
    """Measure (not assert) the text-likeness: Zipf rank-frequency
    slope, Heaps exponent, head frequency, vocabulary size."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.regexp_replace("text", r"\s+", " "), " ")).alias("tok")
    ).where(F.col("tok") != "")
    toks = toks.persist()
    total = toks.count()
    freq = (
        toks.groupBy("tok").count().orderBy(F.desc("count"), F.asc("tok")).limit(2000).collect()
    )
    vocab = toks.select("tok").distinct().count()
    print(f"# corpus: {total} tokens, vocab {vocab}")
    print("top-10:", [(r["tok"], r["count"]) for r in freq[:10]])
    print(f"head frequency p(rank1) = {freq[0]['count'] / total:.4f}"
          f" (English 'the' ~ 0.06)")
    # rank-frequency log-log slope over ranks 10..1000 (skip the head,
    # where tier boundaries kink the curve)
    import statistics
    pts = [(math.log(i + 1), math.log(r["count"])) for i, r in enumerate(freq) if 9 <= i < 1000]
    mx = statistics.mean(x for x, _ in pts)
    my = statistics.mean(y for _, y in pts)
    slope = sum((x - mx) * (y - my) for x, y in pts) / sum((x - mx) ** 2 for x, _ in pts)
    print(f"zipf rank-frequency slope (ranks 10-1000): {slope:.3f} (text ~ -1)")
    # Heaps: V(n) over doc-id prefixes
    n_docs = docs.count()
    print("heaps V(n) by doc prefix:")
    prev = None
    for frac in (0.01, 0.1, 0.5, 1.0):
        k = max(1, int(n_docs * frac))
        sub = toks.where(F.col("doc_id") < k)
        n = sub.count()
        v = sub.select("tok").distinct().count()
        beta = ""
        if prev and n > prev[0]:
            beta = f"  beta={((math.log(v) - math.log(prev[1])) / (math.log(n) - math.log(prev[0]))):.3f}"
        print(f"  n={n:>10}  V={v:>8}{beta}")
        prev = (n, v)
    toks.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--out", default=None, help="write documents.parquet under this dir")
    ap.add_argument("--dup-every", type=int, default=0)
    ap.add_argument("--embeddings", action="store_true",
                    help="also write embeddings.parquet (hashed BoW)")
    ap.add_argument("--diagnostics-only", action="store_true")
    args = ap.parse_args()

    from erpl_web_spark.session import get_spark

    spark = get_spark("corpus-gen")
    spark.sparkContext.setLogLevel("ERROR")
    docs = natural_documents(spark, args.n_docs, dup_every=args.dup_every)
    if args.out and not args.diagnostics_only:
        docs.repartition(32).write.mode("overwrite").parquet(args.out + "/documents.parquet")
        print(f"wrote {args.out}/documents.parquet")
        if args.embeddings:
            written = spark.read.parquet(args.out + "/documents.parquet")
            bow_embeddings(written).repartition(32).write.mode("overwrite").parquet(
                args.out + "/embeddings.parquet"
            )
            print(f"wrote {args.out}/embeddings.parquet")
        docs = spark.read.parquet(args.out + "/documents.parquet")
    diagnostics(spark, docs)


if __name__ == "__main__":
    main()
