"""Third batch of relational-surface queries: classic TPC-H shapes adapted
to the driver's synthetic schema (q06/q13/q14/q17/q18/q22), the q02-style
min-join-back idiom, unpivot, and bounded-error approximate distinct.

Same conventions as suite/relational.py: decimal accumulation for float
sums, identical aliases on both sides, double arithmetic kept
IEEE-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erpl_web_spark.suite import load, register
from erpl_web_spark.suite.relational import dsum


@register(
    "q06_revenue_delta",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def q06_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + scalar
    aggregate. The whole WHERE clause reaches the parquet scan as
    PushedFilters — at 100 TB this is the difference between reading a
    year's partitions and reading everything."""
    l = load(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    )
    return l.where(f).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join count then a second aggregation over
    the counts (customers bucketed by how many orders they placed).
    First agg shuffles on c_custkey; second input is one row per
    customer, so the re-shuffle is tiny."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100 AS DOUBLE) * promo_rev / total_rev AS promo_pct,
           promo_rev, total_rev
    FROM (
      SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                   AS DECIMAL(18,4))) AS DOUBLE) AS promo_rev,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
    )
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate over a fact-dim join,
    emitting a ratio. part is broadcast — no shuffle of lineitem."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    sums = joined.agg(
        dsum(promo, scale=4).alias("promo_rev"),
        dsum(rev, scale=4).alias("total_rev"),
    )
    return sums.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
        "promo_rev",
        "total_rev",
    )


@register(
    "q17_small_quantity",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa ON pa.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: compare each row against its group's average
    (decorrelated to an aggregate + self-join). The per-part average is
    small (one row per part) so it broadcasts; the brand filter prunes
    before the join. avg is computed as exact-decimal sum / count so both
    engines do the same single double division."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).join(
        F.broadcast(pa), F.col("l_partkey") == F.col("pk")
    )
    return j.where(F.col("l_quantity") < 0.5 * F.col("avg_qty")).agg(
        (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").alias("n_small"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery = aggregate →
    semi-join → re-aggregate. The hot-order keyset is small, so the
    semi-join broadcasts instead of shuffling lineitem twice."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    hot = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 180)
        .select("l_orderkey")
    )
    o_hot = o.join(
        F.broadcast(hot), o.o_orderkey == hot.l_orderkey, "left_semi"
    )
    j = c.join(o_hot, c.c_custkey == o_hot.o_custkey).join(
        l, o_hot.o_orderkey == l.l_orderkey
    )
    return j.groupBy("c_name", "o_orderkey", "o_totalprice").agg(
        dsum(F.col("l_quantity")).alias("total_qty")
    )


@register(
    "q22_idle_cohorts",
    oracle="""
    SELECT SUBSTRING(c_name, 18, 1) AS cohort,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderstatus = 'F' AND o.o_totalprice > 50000
      )
    GROUP BY cohort
    """,
)
def q22_idle_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join
    + substring cohort aggregation. The threshold is a 1-row broadcast;
    the anti-join side is filtered before joining."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    thr = c.where(F.col("c_acctbal") > 0).agg(
        (dsum(F.col("c_acctbal")) / F.count("*")).alias("thr")
    )
    big_f = o.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000)
    ).select("o_custkey")
    idle = c.join(big_f, c.c_custkey == big_f.o_custkey, "left_anti")
    rich_idle = idle.crossJoin(F.broadcast(thr)).where(
        F.col("c_acctbal") > F.col("thr")
    )
    return rich_idle.groupBy(
        F.substring("c_name", 18, 1).alias("cohort")
    ).agg(
        F.count("*").alias("n_cust"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH m AS (
      SELECT l_partkey AS pk, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, m.min_price, MIN(l.l_suppkey) AS best_supp
    FROM lineitem l
    JOIN m ON l.l_partkey = m.pk AND l.l_extendedprice = m.min_price
    GROUP BY l.l_partkey, m.min_price
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 idiom: min-per-group then join back on (group, min) to
    recover the full row, with MIN over ties for determinism. One
    aggregate + one broadcast join — no window sort over the fact
    table."""
    l = load(spark, sf_dir, "lineitem")
    m = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    j = l.join(
        F.broadcast(m),
        (l.l_partkey == m.pk) & (l.l_extendedprice == m.min_price),
    )
    return j.groupBy("l_partkey", "min_price").agg(
        F.min("l_suppkey").alias("best_supp")
    )


@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
    """,
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt). Spark's unpivot is a zero-shuffle
    narrow transform; the oracle states the same contract as UNION ALL."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct with a verifiable contract: the query
    emits whether the sketch estimate lands within 10% of the exact
    count (rsd=0.01, so the bound holds with enormous margin — and
    deterministically, HLL++ has no randomness). At 100 TB the sketch is
    mergeable map-side state instead of a distinct shuffle."""
    o = load(spark, sf_dir, "orders")
    # The two aggregates run as SEPARATE single-pass aggregations joined
    # on the 5-row group key (r14, guide §1.2): combined in one agg, the
    # distinct-rewrite (Expand) makes the HLL++ sketch evaluate per
    # (priority, custkey) group — ~100k 16KB-register sketch inits plus
    # a 100k-sketch merge tree, measured 3.7 s warm at sf0.1 for a 150k
    # row table. Split, the sketch sees one partial per task per group
    # (32x5) and the whole query runs in one scan-bound pass per branch
    # (0.5 s). Aggregate VALUES are identical — HLL++ is deterministic
    # and merge-associative, count_distinct is exact either way.
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_exact"),
    )
    approx = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_approx"),
    )
    # Schema contract note (ADVICE r14): the inner join on the group key
    # drops a NULL group — sound because o_orderpriority is a TPC-H NOT
    # NULL column; a nullable group key would need eqNullSafe.
    agg = exact.join(approx, "o_orderpriority")
    ok = (
        F.abs(F.col("n_approx") - F.col("n_exact"))
        / F.col("n_exact").cast("double")
        <= 0.1
    )
    return agg.select("o_orderpriority", "n_exact", ok.alias("approx_ok"))


@register(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 4096 AS b_or,
           xor(o_orderkey, 85) AS b_xor,
           CAST(o_orderkey << 2 AS BIGINT) AS b_shl,
           CAST(o_orderkey >> 3 AS BIGINT) AS b_shr,
           CAST(bit_count(o_orderkey) AS INT) AS b_pop
    FROM orders
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface (and/or/xor/shifts/popcount) — the primitives the
    SimHash and banding operators build on."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(85)).alias("b_xor"),
        F.shiftleft(k, 2).cast("long").alias("b_shl"),
        F.shiftright(k, 3).cast("long").alias("b_shr"),
        F.bit_count(k).alias("b_pop"),
    )


@register(
    "interval_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           CAST(o_orderdate AS DATE) - 7 AS minus_7d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow
    FROM orders
    """,
)
def interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: add/sub days, add months, month/quarter
    boundaries, ISO weekday."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("plus_30d"),
        F.date_sub(d, 7).alias("minus_7d"),
        F.add_months(d, 2).alias("plus_2m"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("quarter_start"),
        F.quarter(d).alias("qtr"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
    )


@register(
    "string_distance_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS INT) AS lev_name_brand,
           CAST(levenshtein(p_type, p_brand) AS INT) AS lev_type_brand,
           split_part(p_name, ' ', 2) AS name_word2,
           translate(p_type, 'EOC', 'eoc') AS type_xlate,
           lpad(p_brand, 12, '*') AS brand_lpad,
           rpad(p_type, 12, '.') AS type_rpad,
           reverse(p_name) AS name_rev
    FROM part
    """,
)
def string_distance_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance and string-shaping surface (levenshtein, split_part,
    translate, pad, reverse) — the scalar primitives under fuzzy matching
    and entity resolution. All JVM-codegen built-ins; at 100 TB this is a
    single narrow projection stage with no shuffle."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("lev_name_brand"),
        F.levenshtein("p_type", "p_brand").alias("lev_type_brand"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("name_word2"),
        F.translate("p_type", "EOC", "eoc").alias("type_xlate"),
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_type", 12, ".").alias("type_rpad"),
        F.reverse("p_name").alias("name_rev"),
    )


@register(
    "codec_funcs",
    oracle="""
    SELECT p_partkey,
           base64(CAST(p_name AS BLOB)) AS name_b64,
           hex(p_name) AS name_hex,
           CAST(unhex(hex(p_name)) AS VARCHAR) AS name_roundtrip,
           CAST(from_base64(base64(CAST(p_name AS BLOB))) AS VARCHAR) AS name_b64_rt,
           format('{}#{:03d}', p_brand, p_size) AS brand_size_fmt
    FROM part
    """,
)
def codec_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface (base64/hex round-trips, printf formatting) —
    the reference emits `BINARY_CONTENT_BASE64:`-prefixed payloads
    (src/http_client.cpp charset path), so codec parity matters for any
    downstream decode."""
    p = load(spark, sf_dir, "part")
    name_bin = F.col("p_name").cast("binary")
    return p.select(
        "p_partkey",
        F.base64(name_bin).alias("name_b64"),
        F.hex(name_bin).alias("name_hex"),
        F.unhex(F.hex(name_bin)).cast("string").alias("name_roundtrip"),
        F.unbase64(F.base64(name_bin)).cast("string").alias("name_b64_rt"),
        F.format_string("%s#%03d", F.col("p_brand"), F.col("p_size")).alias("brand_size_fmt"),
    )


@register(
    "null_safe_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(TRY_CAST(p_brand AS INT) AS DOUBLE) AS brand_as_int,
           TRY_CAST(split_part(p_brand, '#', 2) AS INT) AS brand_num,
           CAST(greatest(p_size, 25) AS INT) AS size_floor25,
           CAST(least(p_size, 25) AS INT) AS size_cap25,
           CAST(nullif(p_size, 11) AS DOUBLE) AS size_not11,
           ifnull(nullif(p_size, 11), -1) AS size_not11_filled,
           (p_size IS NOT DISTINCT FROM 11) AS is_exactly_11
    FROM part
    """,
)
def null_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts and null-propagation surface: TRY_CAST (malformed
    input -> NULL, never a failed 100 TB job), greatest/least, nullif/
    ifnull, null-safe equality."""
    p = load(spark, sf_dir, "part")
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        # DOUBLE on both sides: nullable int columns flip to float64 in the
        # pandas canonicalizer only when NULLs are present — pin it.
        F.col("p_brand").try_cast("int").cast("double").alias("brand_as_int"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).try_cast("int").alias("brand_num"),
        F.greatest(sz, F.lit(25)).cast("int").alias("size_floor25"),
        F.least(sz, F.lit(25)).cast("int").alias("size_cap25"),
        F.nullif(sz, F.lit(11)).cast("double").alias("size_not11"),
        F.ifnull(F.nullif(sz, F.lit(11)), F.lit(-1)).alias("size_not11_filled"),
        sz.eqNullSafe(F.lit(11)).alias("is_exactly_11"),
    )


@register(
    "sequence_funcs",
    oracle="""
    SELECT p_partkey,
           array_to_string(generate_series(1, least(p_size, 5)), '|') AS seq,
           array_to_string(list_reverse(generate_series(1, least(p_size, 5))), '|') AS seq_rev,
           CAST(len(generate_series(1, least(p_size, 5))) AS INT) AS seq_len,
           CAST(generate_series(1, least(p_size, 5))[2] AS DOUBLE) AS second_elem
    FROM part
    """,
)
def sequence_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazily generated integer sequences (Spark `sequence` ≡ DuckDB
    `generate_series`) — the building block for calendar spines and
    explode-free range fan-outs. Sequences are '|'-serialized because
    the driver canonicalizer cannot hash ARRAY cells."""
    p = load(spark, sf_dir, "part")
    seq = F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(5))).cast("array<bigint>")
    as_str = lambda c: F.concat_ws("|", F.transform(c, lambda x: x.cast("string")))
    return p.select(
        "p_partkey",
        as_str(seq).alias("seq"),
        as_str(F.reverse(seq)).alias("seq_rev"),
        F.size(seq).alias("seq_len"),
        F.try_element_at(seq, F.lit(2)).cast("double").alias("second_elem"),
    )
