"""Corpus-curation operators for training-data pipelines: per-group
caps, benchmark-contamination detection, stratified sampling.

These are the selection/cleaning steps a C4/RefinedWeb-style pipeline
runs after dedup (operators.dedup) and quality scoring (operators.text):

- ``cap_per_group``: keep at most N documents per group (domain, source,
  site) in a deterministic order — the standard guard against a single
  domain dominating the corpus. One window per group partition; no
  global sort.
- ``contamination_report``: per-document n-gram containment against a
  benchmark/eval set — the decontamination step that keeps test data out
  of training corpora. Shingles hash to 64-bit keys once per side; the
  only join is hash-equality against the (much smaller) distinct
  benchmark shingle set, so cost is corpus-shingles x matches, never
  corpus x benchmark.
- ``stratified_sample``: deterministic per-stratum hash sampling
  (md5/xxhash64 bucket rule shared with text.hash_split) — downsample
  overrepresented languages/sources reproducibly: re-runs, cluster
  resizes, and repartitioning never change the sample.

Design for 100 TB: no Python UDFs, no driver materialization; shuffles
key on group values or 64-bit shingle hashes, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from erpl_web_spark.operators.dedup import hashed_shingles


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column | str],
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per group, by deterministic order.

    Spark plans the rank filter as WindowGroupLimit: each partition
    keeps a bounded top-n heap per group before the full window sort —
    at scale the shuffle carries at most n rows per group per map task.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    exact: bool = True,
) -> DataFrame:
    """Keep rows whose ``score_col`` reaches their group's q-quantile —
    the per-language quality-floor stage of web-corpus pipelines
    (CCNet/FineWeb style: drop the weakest q of every language rather
    than one global cutoff that silently empties low-resource groups).

    Scale posture: the cutoff is computed as a per-group AGGREGATE and
    joined back (AQE broadcasts the tiny side) — value-threshold
    semantics, NOT a per-group rank/sort, so no group's rows ever
    concentrate in one task (the window-rank formulation would put
    each language's whole corpus through a single partition's sort).
    Ties at the cutoff are all kept: "at least the quantile value" is
    the contract, which keeps the filter a pure row-local predicate
    after the join.

    ``exact=True`` uses sort-based ``percentile`` (small/medium group
    counts, oracle-parity testing); at 100 TB switch ``exact=False``
    for ``approx_percentile`` (t-digest, partial-aggregable, no
    per-group sort). The cutoff is rounded to 6 decimals so an
    integer-valued score column can never land ulp-close to the
    boundary (interpolated cutoffs are midpoints between integers;
    rounding removes cross-engine interpolation-formula noise).

    Returns the kept rows with a ``cutoff`` column appended.
    """
    fn = F.percentile if exact else (lambda c, p: F.approx_percentile(c, F.lit(p)))
    cuts = df.groupBy(group_col).agg(
        F.round(fn(F.col(score_col), q), 6).alias("cutoff")
    )
    # no forced broadcast: the cutoff table has one row per group, tiny
    # for language-like groupings but potentially huge for per-domain
    # ones — AQE picks the broadcast join at runtime when it measures
    # small instead of the operator betting on group cardinality
    return df.join(cuts, group_col).where(F.col(score_col) >= F.col("cutoff"))


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    bloom_m_bits: int | None = None,
    bloom_k: int = 3,
) -> DataFrame:
    """Per-document containment of benchmark n-grams:
    |doc-shingles ∩ benchmark-shingles| / |doc-shingles|.

    Both sides shingle-hash once (64-bit xxhash64, see
    dedup.hashed_shingles); the benchmark collapses to its distinct
    shingle-hash set, which is typically small enough for a broadcast
    hash join. Containment (not Jaccard) is the decontamination metric:
    a short eval question fully embedded in a long training document
    still scores 1.0. Returns (id_col, n_shingles, n_matched,
    contamination) for every document with at least one shingle.

    ``bloom_m_bits`` (opt-in) inserts a Bloom pre-filter between the
    corpus shingles and the benchmark join — the URL-index trick
    applied to decontamination. It pays off when the benchmark shingle
    set is TOO BIG to broadcast (a full eval-suite union at crawl
    scale): the plain path then degrades to a corpus-shingles x
    benchmark SHUFFLE join, while the Bloom filter stays
    ceil(m_bits/48) rows — broadcast-cheap at any benchmark size — and
    routes definitely-clean shingles (any unset bit) around the join
    entirely, so only ~true_match_rate + FP_rate of corpus shingles
    reach it. No false negatives (the r10 value-hash-proven side), and
    false positives are resolved by the exact join they pass into, so
    the REPORT is bit-identical with the filter on or off — which is
    exactly what the suite oracle checks.
    """
    doc_sh = hashed_shingles(df, id_col, text_col, shingle_k).select(
        F.col(id_col), F.explode("hs").alias("h")
    )
    bench_sh = (
        hashed_shingles(benchmark, id_col, text_col, shingle_k)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    if bloom_m_bits:
        from erpl_web_spark.operators.text import _bloom_positions, bloom_filter_values

        bloom = bloom_filter_values(bench_sh, "h", k=bloom_k, m_bits=bloom_m_bits)
        pos = doc_sh.select(
            F.col(id_col),
            F.col("h"),
            F.explode(
                _bloom_positions(F.col("h").cast("string"), bloom_k, bloom_m_bits)
            ).alias("pos"),
        ).select(
            id_col,
            "h",
            F.floor(F.col("pos") / 48).cast("bigint").alias("word"),
            (F.col("pos") % 48).cast("int").alias("bit"),
        )
        hit = F.expr(
            "shiftrightunsigned(coalesce(mask, CAST(0 AS BIGINT)), bit)"
        ).bitwiseAND(F.lit(1))
        # NOTE: this groupBy collapses duplicate (id, h) rows, so
        # bit-identity with the bloom-off path relies on
        # hashed_shingles emitting DISTINCT per-doc hashes
        # (array_distinct upstream); if that invariant changed, the
        # two paths' n_matched counts would silently diverge.
        possible = (
            pos.join(F.broadcast(bloom), "word", "left")
            .groupBy(id_col, "h")
            .agg(F.sum(hit).cast("int").alias("n_hits"))
            .where(F.col("n_hits") == bloom_k)
            .select(id_col, "h")
        )
        matched = possible.join(F.broadcast(bench_sh), "h", "left_semi")
        totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
        hits = matched.groupBy(id_col).agg(F.count("*").alias("n_matched"))
        report = totals.join(hits, id_col, "left").select(
            id_col,
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    else:
        # Single corpus pass (r14, guide §2.3): the old shape ran the
        # shingle-hash+explode pipeline TWICE — once under the semi-join
        # for n_matched, once for the n_shingles totals — then joined
        # the two aggregates back together. A left join against the
        # broadcast benchmark set (distinct, so multiplicity 1) lets ONE
        # groupBy produce both counts: count(*) = shingles,
        # count(match-marker) = non-null matches. Same integers, same
        # report, half the text-processing work and no totals⨝hits join.
        marked = doc_sh.join(
            F.broadcast(bench_sh.withColumn("__m", F.lit(1))), "h", "left"
        )
        report = marked.groupBy(id_col).agg(
            F.count("*").alias("n_shingles"),
            F.count("__m").alias("n_matched"),
        )
    return report.select(
        id_col,
        "n_shingles",
        "n_matched",
        (
            F.col("n_matched").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("contamination"),
    )


def pairwise_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairwise fuzzy decontamination: WHICH benchmark item leaked into
    which training document.

    :func:`contamination_report` pools all benchmark shingles, so a doc
    matching scattered common shingles from many different eval items can
    score high without any single item actually leaking. This variant
    attributes overlap per (doc, benchmark-item) pair — the shape eval
    decontamination takes in practice (n-gram overlap vs each specific
    eval example). It is EXACT — no LSH, no recall loss — yet never goes
    quadratic: an inverted shingle-index equi-join on 64-bit hashes
    surfaces only pairs sharing at least one shingle, and the benchmark
    side (eval suites are small) broadcasts, so corpus shingles stream
    through a map-side hash join; the single shuffle groups hit counts on
    (doc, bench) keys.

    Returns (id_col, bench_id_col, inter, jaccard, containment_bench)
    with containment_bench = |∩| / |bench shingles| — the leak metric: a
    benchmark item fully embedded in a longer training doc scores 1.0 —
    filtered to containment_bench >= threshold.
    """
    ce = hashed_shingles(df, id_col, text_col, shingle_k).select(
        F.col(id_col), F.size("hs").alias("n_a"), F.explode("hs").alias("h")
    )
    be = hashed_shingles(benchmark, bench_id_col, text_col, shingle_k).select(
        F.col(bench_id_col), F.size("hs").alias("n_b"), F.explode("hs").alias("h")
    )
    hits = (
        ce.join(F.broadcast(be), "h")
        .groupBy(id_col, bench_id_col)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.count("*").alias("inter"),
        )
    )
    return (
        hits.select(
            id_col,
            bench_id_col,
            "inter",
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias(
                "jaccard"
            ),
            (F.col("inter") / F.col("n_b")).alias("containment_bench"),
        )
        .where(F.col("containment_bench") >= threshold)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    seed: int = 42,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum downsampling by id-hash bucket.

    A row survives iff ``h(seed, id) % 10_000 < fraction * 10_000`` for
    its stratum — the same bucket rule as text.hash_split, so samples
    are stable across runs/cluster sizes and nest monotonically
    (a 10% sample is a subset of the 20% sample). ``method='md5'`` is
    the cross-engine-reproducible path; 'xxhash64' the JVM-codegen fast
    path. Strata missing from ``fractions`` get ``default_fraction``.
    Map-only: no shuffle, no Python.
    """
    if method == "md5":
        digest = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
        bucket = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % 10_000
    else:
        bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(10_000))
    threshold = None
    for name, frac in fractions.items():
        t = F.lit(int(round(frac * 10_000)))
        threshold = (
            F.when(F.col(strata_col) == name, t)
            if threshold is None
            else threshold.when(F.col(strata_col) == name, t)
        )
    thr = (
        F.lit(int(round(default_fraction * 10_000)))
        if threshold is None
        else threshold.otherwise(int(round(default_fraction * 10_000)))
    )
    return df.where(bucket < thr)


def seeded_shuffle_key(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    method: str = "xxhash64",
    out: str = "shuffle_key",
) -> DataFrame:
    """Deterministic pseudo-random global ordering for training epochs:
    ``shuffle_key = h(seed, id)``. Materialize the epoch order with
    ``repartitionByRange(out).sortWithinPartitions(out)`` — a scalable
    distributed sort (range exchange + local sort), never a global
    single-partition window. A new seed per epoch reshuffles; the order
    is stable across runs, cluster sizes, and input partitioning, which
    a ``rand()``-based shuffle cannot guarantee.

    ``method='xxhash64'`` is the JVM-codegen fast path; ``'md5'`` is the
    engine-portable contract (same convention as ``text.hash_split``).
    """
    if method == "md5":
        digest = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
        key = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    else:
        key = F.xxhash64(F.lit(seed), F.col(id_col))
    return df.withColumn(out, key)


def mixture_upsample(
    df: DataFrame,
    strata_col: str,
    repeats: dict[str, int],
    default_repeats: int = 1,
) -> DataFrame:
    """Training-mixture weighting by integer repetition: each stratum's
    rows appear ``repeats[stratum]`` times (epoch upsampling — the
    'wiki x3, web x1' recipe), with ``copy_idx`` distinguishing copies
    so a downstream seeded shuffle interleaves them deterministically.

    A JVM-side explode over a literal CASE — map-only, no shuffle, no
    Python; output size is exactly sum(n_s * r_s).
    """
    factor = None
    for name, r in repeats.items():
        c = F.lit(int(r))
        factor = F.when(F.col(strata_col) == name, c) if factor is None else factor.when(
            F.col(strata_col) == name, c
        )
    factor = F.lit(default_repeats) if factor is None else factor.otherwise(default_repeats)
    # explicit empty array for repeat factor 0: sequence(1, 0) counts DOWN
    # in Spark (same hazard as dedup.grams_expr) and would leak one copy
    seq = F.when(factor >= 1, F.sequence(F.lit(1), factor)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy_idx", F.explode(seq))


def write_training_shards(
    df: DataFrame,
    path: str,
    shards: int,
    id_col: str,
    seed: int = 42,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize a training corpus as ``shards`` shard files in seeded
    pseudo-random order: repartitionByRange on the shuffle key (a
    distributed range sort — the scalable global ordering) +
    sortWithinPartitions, so shard i holds the i-th contiguous key range
    and every shard is internally ordered. Re-running with the same seed
    reproduces the exact layout; a new seed reshuffles every epoch.
    """
    keyed = seeded_shuffle_key(df, id_col, seed=seed)
    writer = (
        keyed.repartitionByRange(shards, "shuffle_key")
        .sortWithinPartitions("shuffle_key")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    token_col: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic token-budget sampling: per stratum, keep documents
    in seeded-hash order until the cumulative token count reaches the
    stratum's budget (the 'take 1B tokens of source X' mixture recipe).

    Hash-ordered cumulative sums make the selection stable across runs,
    cluster sizes, and input partitioning; adding documents to a
    stratum never evicts earlier-hash selections below budget. The
    window is per stratum — the stratum is the unit of parallelism
    (same posture as sequence packing); across strata everything runs
    in parallel.
    """
    from pyspark.sql.window import Window

    keyed = seeded_shuffle_key(df, id_col, seed=seed, method="md5")
    budget = None
    for name, b in budgets.items():
        c = F.lit(int(b))
        budget = F.when(F.col(strata_col) == name, c) if budget is None else budget.when(
            F.col(strata_col) == name, c
        )
    if default_budget is None:
        budget = budget.otherwise(F.lit(None)) if budget is not None else F.lit(None)
    else:
        budget = (
            F.lit(int(default_budget))
            if budget is None
            else budget.otherwise(int(default_budget))
        )
    w = (
        Window.partitionBy(strata_col)
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = keyed.withColumn("__budget", budget).withColumn(
        "cum_tokens", F.sum(F.col(token_col).cast("bigint")).over(w)
    )
    # keep while the running total INCLUDING this doc stays within budget;
    # unbudgeted strata (NULL budget) are dropped entirely
    return (
        out.where(F.col("cum_tokens") <= F.col("__budget"))
        .drop("__budget")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str | Column,
    id_col: str = "doc_id",
    seed: str = "ws",
    hash_mode: str = "xxhash64",
    lattice: int = 4096,
) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement (Efraimidis–
    Spiliopoulou–Tsoukatos A-ES, the one-pass reservoir family): each
    row gets an exponential race key ``e = -ln(u)/w`` from a
    deterministic per-id uniform ``u`` and its positive weight ``w``;
    the ``k`` smallest keys ARE a weighted sample without replacement
    (the min of exponentials wins proportionally to its rate). This is
    the quality-weighted corpus-sampling step a pretraining pipeline
    runs after scoring: "draw 10M documents with probability
    proportional to quality weight", reproducibly.

    Determinism: ``u`` comes from the engine-portable hash of
    (seed, id) reduced to a ``lattice``-point grid ((j + 0.5)/lattice
    — never 0, so ln is finite), exactly the natural-corpus idiom, so
    re-runs, repartitioning, and cluster resizes never change the
    sample, and the md5 mode is replayable in any engine. Rows with
    non-positive weight are excluded (weight 0 = never sampled).

    Scale: the key is a map-side column expression; the global top-k
    runs as TakeOrderedAndProject (per-partition top-k, k-row driver
    merge) — nothing corpus-sized shuffles or reaches the driver. The
    rank window orders the k selected rows only. ``k`` here is a
    config-scale sample size; for corpus-scale draws, compute the key
    column and filter on a key threshold instead (one pass, no top-k).

    Returns the selected rows' (id, weight, sample_rank 1..k).
    """
    keyed = weighted_sample_key(df, weight_col, id_col, seed, hash_mode, lattice)
    top = keyed.orderBy("es_key", id_col).limit(int(k))
    rank_w = Window.orderBy("es_key", id_col)
    return (
        top.withColumn("sample_rank", F.row_number().over(rank_w).cast("int"))
        .drop("es_key")
    )


def weighted_sample_key(
    df: DataFrame,
    weight_col: str | Column,
    id_col: str = "doc_id",
    seed: str = "ws",
    hash_mode: str = "xxhash64",
    lattice: int = 4096,
) -> DataFrame:
    """The A-ES race key as a column — the corpus-scale path
    :func:`weighted_sample`'s docstring points at: for draws too big
    for a top-k (a 10%-of-100-TB mixture slice), compute ``es_key``
    map-side and FILTER on a threshold instead — one pass, no global
    ordering anywhere. Calibrate the threshold on a sample (the k-th
    smallest key of an x% sample estimates the (k/x%)-th of the
    corpus), or iterate: P(key < t) per row is 1 - exp(-w*t), so the
    expected take of a candidate t is a map-side aggregate away.
    Returns (id, weight, es_key); rows with non-positive weight are
    excluded (never sampled). Filtering ``es_key <= t`` yields exactly
    the same set as :func:`weighted_sample` with k = |{key <= t}| —
    the keys are shared, only the selection mechanism differs.
    """
    from erpl_web_spark.operators.dedup import lattice_index

    w = (weight_col if isinstance(weight_col, Column) else F.col(weight_col)).cast(
        "double"
    )
    j = lattice_index(seed, id_col, hash_mode, lattice)
    u = (j.cast("double") + F.lit(0.5)) / F.lit(float(lattice))
    return df.select(
        F.col(id_col), w.alias("weight"), (-F.log(u) / w).alias("es_key")
    ).where(w > 0)


def weighted_sample_threshold(
    df: DataFrame,
    k: int,
    weight_col: str | Column,
    id_col: str = "doc_id",
    seed: str = "ws",
    hash_mode: str = "xxhash64",
    lattice: int = 4096,
    calibration_frac: float = 0.25,
) -> tuple[DataFrame, int]:
    """The corpus-scale weighted draw :func:`weighted_sample_key`'s
    docstring describes, as an operator: calibrate a key threshold on
    a deterministic sample, then take the whole draw with ONE map-side
    filter — no global top-k anywhere, so ``k`` can be 10M documents
    out of 100 TB.

    Calibration: a deterministic ``calibration_frac`` Bernoulli sample
    (portable hash of (seed:cal, id) against the lattice — re-runs and
    repartitions never change membership) estimates the corpus's k-th
    smallest race key by its own m-th smallest, m = round(k * frac):
    if the sample sees fraction ``frac`` of the corpus uniformly, the
    key that is m-th smallest among sampled rows sits near the
    (m/frac)-th = k-th smallest overall. Only those m config-scale key
    values ever reach the driver (TakeOrdered of m rows).

    Returns ``(rows, achieved_k)``: the selected (id, weight, es_key)
    rows — exactly ``weighted_sample``'s set for k = achieved_k, the
    keys being shared — and their count. achieved_k concentrates
    around ``k`` with sd ~ sqrt(k / calibration_frac) (the sampling
    error of the order-statistic estimate); callers needing an exact
    k re-rank the achieved set, which is already ~k rows. If the
    calibration sample has fewer than m rows the threshold is +inf
    and the whole (sub-k-sized) corpus is returned.

    Scale shape: two map-side passes over the keyed corpus (the
    calibration filter feeding a TakeOrdered of m rows, then the
    threshold filter) plus a count — zero corpus-sized shuffles,
    nothing corpus-sized at the driver.
    """
    from erpl_web_spark.operators.dedup import lattice_index

    keyed = weighted_sample_key(df, weight_col, id_col, seed, hash_mode, lattice)
    cal_cut = max(1, int(round(calibration_frac * lattice)))
    j_cal = lattice_index(f"{seed}:cal", id_col, hash_mode, lattice)
    m = max(1, int(round(k * cal_cut / lattice)))
    # TakeOrderedAndProject: m config-scale key values to the driver
    cal_keys = (
        keyed.where(j_cal < cal_cut)
        .orderBy("es_key")
        .limit(m)
        .select("es_key")
        .collect()
    )
    if len(cal_keys) < m:
        rows = keyed  # sample under-ran m: corpus is sub-k-sized, keep all
    else:
        t = max(r["es_key"] for r in cal_keys)  # the m-th smallest
        rows = keyed.where(F.col("es_key") <= F.lit(t))
    return rows, rows.count()


def leak_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float],
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    seed: int = 42,
    out: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: every member of a
    near-duplicate cluster lands in the SAME split, so paraphrases of a
    validation document can never leak into training — hashing raw doc
    ids (text.hash_split) silently splits duplicate pairs across the
    boundary and inflates eval scores.

    ``pairs`` is any near-dup edge set (MinHash-LSH, exact-Jaccard,
    SimHash); connected components collapse it to cluster labels, each
    document's split key becomes its cluster label (its own id when
    unclustered), and the deterministic hash-bucket rule from
    ``hash_split`` assigns the split. Adding new documents never
    reassigns existing clusters.

    Scale shape: the component loop shuffles (long, long) label rows
    (operators.graph); the label join back onto the corpus is keyed on
    the id, and cluster labels are typically ≪ corpus so AQE broadcasts
    the label side. Returns ``df`` + (group_key, split). Ids must be
    integral (the connected-components contract); hash string ids to
    64-bit first.
    """
    from erpl_web_spark.operators.graph import connected_components

    labels = connected_components(pairs, pair_a, pair_b)
    return split_by_cluster(
        df, id_col, labels, weights, seed=seed, out=out, method=method
    )


def split_by_cluster(
    df: DataFrame,
    id_col: str,
    labels: DataFrame,
    weights: dict[str, float],
    seed: int = 42,
    out: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """The cluster-keyed split rule shared by ``leak_safe_split`` and
    the curation facade: given (id, component) labels, every row's
    split key is its cluster label (its own id when unlabeled), bucketed
    by ``text.hash_split``. One definition, so the bucketing and
    NULL-component handling cannot diverge between entry points."""
    from erpl_web_spark.operators.text import hash_split

    lab = labels.select(F.col("id").alias(id_col), F.col("component"))
    keyed = df.join(lab, id_col, "left").withColumn(
        "group_key", F.coalesce(F.col("component"), F.col(id_col).cast("long"))
    ).drop("component")
    return hash_split(keyed, "group_key", weights, seed=seed, out=out, method=method)


def semantic_decontaminate(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    stride: int = 50,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag training vectors whose
    cosine similarity to ANY eval/benchmark vector reaches ``threshold``.
    The semantic complement of ``contamination_report`` — n-gram
    containment misses paraphrased eval questions; embedding similarity
    catches them.

    Blocked by the shared IVF coarse quantizer (operators.similarity):
    both sides assign to their nearest cell, candidate pairs must share
    a cell, and the exact cosine verifies. Cost is Σ|cell∩train|·|cell∩eval|,
    never |train|·|eval|; the eval side is tiny and arrives broadcast.
    As with any ANN blocking, a contaminated pair whose members quantize
    to different cells is missed — raise nprobe semantics by passing
    trained centroids (ivf_train_centroids) for production recall.

    Returns (train_id, eval_id, cosine) for every flagged pair; a
    downstream drop is a left-anti join on train_id.
    """
    from erpl_web_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        ivf_centroids,
    )

    cents = centroids if centroids is not None else ivf_centroids(
        train.unionByName(evals), id_col, vec_col, stride
    )
    t = ivf_assign(train, cents, id_col, vec_col).select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).alias("__tv"),
        F.col("nrm").alias("__tn"),
        "cell",
    )
    e = ivf_assign(evals, cents, id_col, vec_col).select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("__ev"),
        F.col("nrm").alias("__en"),
        "cell",
    )
    joined = t.join(F.broadcast(e), "cell")
    cos = dot_expr(F.col("__tv"), F.col("__ev")) / (F.col("__tn") * F.col("__en"))
    return (
        joined.select("train_id", "eval_id", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def temperature_budgets(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    total_budget: int,
) -> dict[str, int]:
    """Temperature-weighted (alpha = 0.5) per-stratum token budgets from
    corpus statistics: budget_s = total * sqrt(tokens_s) / Σ sqrt —
    the standard multilingual/multi-source rebalancing rule (upsamples
    small sources relative to proportional sampling; see GPT-3 /
    mT5-style mixing). Feed the result to ``token_budget_sample``.

    The per-stratum totals collapse to one row per source before the
    driver sees them — budgets are configuration-scale data (a handful
    of sources), not corpus-scale. Integer sqrt (``math.isqrt``) keeps
    the arithmetic exact and engine-portable: floor(sqrt(n)) is
    bit-reproducible in any engine for n < 2^52.
    """
    import math

    rows = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(
            F.coalesce(
                F.sum(F.col(token_col).cast("bigint")), F.lit(0)
            ).alias("__t")
        )
        .collect()
    )
    weights = {r[0]: math.isqrt(int(r["__t"])) for r in rows}
    denom = sum(weights.values())
    if denom == 0:
        return {k: 0 for k in weights}
    return {k: int(total_budget) * w // denom for k, w in weights.items()}


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    hash_mode: str = "xxhash64",
    cache_sink: list | None = None,
) -> DataFrame:
    """Hashed-bigram importance log-weights for Data Selection via
    Importance Resampling (DSIR, Xie et al. 2023): score every raw
    document by how much more likely its features are under a TARGET
    corpus than under the raw corpus itself,

        log_w(doc) = sum over bigram occurrences of
                     ln p_target(bucket) - ln q_raw(bucket),

    where bigrams hash into ``buckets`` cells and both distributions are
    add-1 smoothed. High log_w = looks like the target; resample with
    the existing machinery (``quantile_filter`` on log_w, or
    ``token_budget_sample`` over the kept set).

    Returns (id, n_grams, log_w); documents with < 2 tokens get 0/0.0.

    Scale shape: BOTH corpora are scanned once (the raw bigram frame is
    persisted via ``_bigram_frame`` and reread by the model count and
    the join-back); the feature model is AT MOST ``buckets`` rows no
    matter the corpus size — hashing is what makes DSIR's n-gram model
    feasible at web scale, and here it also bounds the broadcast — so
    the per-doc scoring join broadcasts and the only corpus-sized
    shuffle carries (id, double) rows. The bucket totals ride in as
    1-row broadcast crossJoins, nothing collects to the driver.
    ``hash_mode="md5"`` selects the engine-portable 48-bit family
    (oracle mode, suite/natural.py ``curation_dsir_natural``);
    xxhash64 is the production default.
    """
    from erpl_web_spark.operators._cache import track_persist
    from erpl_web_spark.operators.dedup import _md5_long48
    from erpl_web_spark.operators.text import _bigram_frame

    def bucket(w1: Column, w2: Column) -> Column:
        h = _md5_long48(w1, w2) if hash_mode == "md5" else F.xxhash64(w1, w2)
        return F.pmod(h, F.lit(buckets)).alias("b")

    rb = _bigram_frame(raw, id_col, text_col, cache_sink).select(
        id_col, bucket(F.col("w1"), F.col("w2"))
    )
    tb = _bigram_frame(target, id_col, text_col, cache_sink).select(
        bucket(F.col("w1"), F.col("w2"))
    )
    rc = rb.groupBy("b").agg(F.count("*").cast("bigint").alias("rn"))
    # the model tables are <= buckets rows; persist the raw side — it
    # feeds both its own total and the ratio join
    rc = track_persist(rc, "dsir_logweights", cache_sink)
    tc = tb.groupBy("b").agg(F.count("*").cast("bigint").alias("tn"))
    rtot = rc.agg(F.sum("rn").cast("bigint").alias("rtot"))
    ttot = tc.agg(F.coalesce(F.sum("tn"), F.lit(0)).cast("bigint").alias("ttot"))
    ratio = (
        # both sides are <= buckets rows; the hint spares a sort-merge
        # of two tiny frames (observed in the r12 initial-plan audit)
        rc.join(F.broadcast(tc), "b", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tn"), F.lit(0)) + 1).cast("double")
                    / (F.col("ttot") + buckets)
                )
                - F.log(
                    (F.col("rn") + 1).cast("double") / (F.col("rtot") + buckets)
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        rb.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("lr").alias("log_w"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def fit_linear_probe(
    df: DataFrame,
    id_col: str,
    features: list[Column],
    target: Column,
) -> tuple[DataFrame, dict[str, float]]:
    """Distributed least-squares fit of a 3-feature linear probe (the
    FineWeb-Edu pattern: distill an expensive quality labeler into a
    cheap linear scorer that the whole corpus can afford), returning
    (scored rows, weights). Exactly three features + an intercept.

    Scale split, the ``pca_project`` pattern generalized to regression:
    the corpus is reduced to FIFTEEN exact int64 moments in ONE
    partial-aggregable pass (n, the four sums, the ten pairwise
    products — features and target must be integer-valued columns;
    quantize ratios with ``floor(r * 10**6)`` first), the 4x4 normal
    equations are solved CLOSED-FORM on the driver (centered 3x3
    Cramer), and scoring is a map-only expression with the weights
    inlined as literals. Nothing corpus-sized leaves the executors.

    Determinism contract (what makes the suite oracle value-hashable):
    the moments are exact integers, identical in any engine; the solve
    is a FIXED IEEE-double expression tree — centered entries as
    ``n*Sij - Si*Sj`` (int64-exact, then one deterministic int->double
    conversion), the Sarrus 3x3 expansion written in one
    parenthesization, intercept as ``(Sy - w1*S1 - w2*S2 - w3*S3)/n``
    — so an oracle replaying the same tree gets BIT-IDENTICAL weights
    and predictions, not merely close ones (tests pin this against
    DuckDB). Singular designs (collinear features) raise rather than
    return NaN weights.

    Returns the input rows with ``pred`` (double) and ``resid``
    (target - pred) appended, plus {"b0", "w1", "w2", "w3"}.
    """
    x1, x2, x3 = [f.cast("bigint") for f in features]
    y = target.cast("bigint")
    base = df.select(
        F.col(id_col), x1.alias("x1"), x2.alias("x2"), x3.alias("x3"), y.alias("y")
    )
    m = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("x3").alias("s3"), F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("x3")).alias("s13"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x2") * F.col("x3")).alias("s23"),
        F.sum(F.col("x3") * F.col("x3")).alias("s33"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("x3") * F.col("y")).alias("s3y"),
    ).collect()[0]

    n = int(m["n"])
    if n == 0:
        raise ValueError("cannot fit a probe on an empty input")
    # centered normal-equation entries, int64-exact BEFORE the single
    # int->double conversion (IEEE round-half-even, engine-identical);
    # the common n/n^2 scaling cancels inside the Cramer ratios
    a11 = float(n * int(m["s11"]) - int(m["s1"]) * int(m["s1"]))
    a12 = float(n * int(m["s12"]) - int(m["s1"]) * int(m["s2"]))
    a13 = float(n * int(m["s13"]) - int(m["s1"]) * int(m["s3"]))
    a22 = float(n * int(m["s22"]) - int(m["s2"]) * int(m["s2"]))
    a23 = float(n * int(m["s23"]) - int(m["s2"]) * int(m["s3"]))
    a33 = float(n * int(m["s33"]) - int(m["s3"]) * int(m["s3"]))
    b1 = float(n * int(m["s1y"]) - int(m["s1"]) * int(m["sy"]))
    b2 = float(n * int(m["s2y"]) - int(m["s2"]) * int(m["sy"]))
    b3 = float(n * int(m["s3y"]) - int(m["s3"]) * int(m["sy"]))

    # Sarrus expansion — ONE fixed parenthesization, replicated verbatim
    # by the suite oracle so the division results are bit-identical
    def det3(p11, p12, p13, p21, p22, p23, p31, p32, p33):
        return (
            p11 * (p22 * p33 - p23 * p32)
            - p12 * (p21 * p33 - p23 * p31)
            + p13 * (p21 * p32 - p22 * p31)
        )

    d = det3(a11, a12, a13, a12, a22, a23, a13, a23, a33)
    if d == 0.0:
        raise ValueError("singular design: features are collinear")
    w1 = det3(b1, a12, a13, b2, a22, a23, b3, a23, a33) / d
    w2 = det3(a11, b1, a13, a12, b2, a23, a13, b3, a33) / d
    w3 = det3(a11, a12, b1, a12, a22, b2, a13, a23, b3) / d
    b0 = (
        float(m["sy"]) - w1 * float(m["s1"]) - w2 * float(m["s2"])
        - w3 * float(m["s3"])
    ) / float(n)

    pred = (
        F.lit(b0)
        + F.lit(w1) * F.col("x1").cast("double")
        + F.lit(w2) * F.col("x2").cast("double")
        + F.lit(w3) * F.col("x3").cast("double")
    )
    scored = base.select(
        id_col, "x1", "x2", "x3", "y",
        pred.alias("pred"),
        (F.col("y").cast("double") - pred).alias("resid"),
    )
    return scored, {"b0": b0, "w1": w1, "w2": w2, "w3": w3}
