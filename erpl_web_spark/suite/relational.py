"""Relational surface conformance suite (SURVEY.md §2.F).

The reference delegates all relational execution to its host engine; our
host is Spark SQL. Each query here is a DataFrame program whose physical
plan Catalyst owns (broadcast vs shuffle joins, partial aggregation,
TakeOrderedAndProject top-k, AQE), with a DuckDB oracle proving the
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erpl_web_spark.operators.relational import asof_join, top_k
from erpl_web_spark.suite import load, register


def dsum(col: Column, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent float sum: quantize each value to ``scale``
    decimals as an exact scaled BIGINT, sum integers, divide once.

    Semantically identical to ``SUM(CAST(col AS DECIMAL(prec,scale)))
    :: DOUBLE`` (the oracle formulation — per-row round-half-up at the
    same scale, exact accumulation, one correctly-rounded conversion)
    but 3-4x faster end-to-end: Spark's decimal SUM widens the buffer
    past 18 digits into the BigDecimal slow path, while a long SUM stays
    in the hash-aggregate primitive fast path. Verified value-hash-equal
    to the decimal oracle across every dsum query at both driver SFs.
    ``prec`` is kept for signature compatibility; long accumulation
    covers the same 18-digit range."""
    unit = F.lit(float(10 ** scale))
    return F.sum(F.round(col * unit).cast("long")).cast("double") / unit


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-shuffle partial-aggregated group-by.

    Deliberately NOT spread: partial aggregation reduces the scan to a
    handful of rows before any exchange, and since dsum moved the sums
    onto the long-accumulation fast path the per-row arithmetic is
    cheaper than the full-row rebalance shuffle a single-row-group test
    file would need (measured 0.75s vs 1.03s at sf0.1 on local[32]).
    On real multi-split data the scan parallelizes natively either way."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price, scale=4).alias("sum_disc_price"),
        dsum(charge, scale=6).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_avg_int",
    oracle="""
    SELECT event_type,
           CAST(AVG(user_id) AS DOUBLE) AS avg_user,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_avg_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.avg("user_id").cast("double").alias("avg_user"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    l = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(revenue, scale=4).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    headline=True,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: big fact joins shuffle on keys, constant-size dims
    (nation, region) broadcast by hint. supplier is deliberately NOT
    hinted — it grows with scale factor (~1 M rows at sf100), so a
    hard-coded broadcast would become a driver/executor memory hazard at
    100 TB; the planner's autoBroadcastJoinThreshold / AQE picks
    broadcast at small SF and falls back to shuffle join when supplier
    outgrows the threshold."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # r14: nation|x|region pre-joined into ONE broadcast dim (constant
    # size: 25 x 5 rows at any SF) and applied to customer FIRST — the
    # ASIA predicate is the query's only selective filter (keeps ~1/5 of
    # customers), so pushing it ahead of the fact joins shrinks every
    # downstream join input (guide §3); Catalyst does not reorder joins
    # without CBO stats. Plan: 5 BroadcastExchanges -> 4, and the c|x|o
    # build side carries only ASIA customers. Inner-join reassociation —
    # same rows, same oracle.
    nr = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        c.join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(revenue, scale=4).alias("revenue"))
    )


@register(
    "join_left_counts",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                    AND o_totalprice > 200000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                        AND o_totalprice > 200000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           CAST(c.n_cust AS DOUBLE) AS n_cust,
           CAST(s.n_supp AS DOUBLE) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join count columns are DOUBLE on both sides: they are NULL
    for unmatched rows at small SFs, and a nullable integral column
    canonicalizes to float64 only when NULLs happen to occur — the
    SF-dependent dtype-drift class the strict gate exists to catch."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
            F.col("c.n_cust").cast("double").alias("n_cust"),
            F.col("s.n_supp").cast("double").alias("n_supp"),
        )
    )


@register(
    "join_theta_pairs",
    oracle="""
    SELECT p1.p_brand AS brand, COUNT(*) AS n_pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
    GROUP BY p1.p_brand
    """,
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: equi key (brand) carries the shuffle, the range
    predicate rides along — never a cartesian product."""
    p1 = load(spark, sf_dir, "part").alias("p1")
    p2 = load(spark, sf_dir, "part").alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.p_brand") == F.col("p2.p_brand"))
            & (F.col("p1.p_size") < F.col("p2.p_size")),
        )
        .groupBy(F.col("p1.p_brand").alias("brand"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           MAX(c.ts) AS last_click_ts
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    headline=True,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest click <= purchase ts per user) via the
    union+window operator — one shuffle, no range-join explosion. The
    oracle states the same semantics as a (quadratic) range join + MAX."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts"],
    )
    return out.select("event_id", "user_id", "ts", F.col("click_ts").alias("last_click_ts"))


# --------------------------------------------------------------------------
# Window family
# --------------------------------------------------------------------------

@register(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
             CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderstatus) AS INT) AS status_rank
      FROM orders)
    WHERE rn <= 3
    """,
    headline=True,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_dr = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.dense_rank().over(w_dr).alias("status_rank"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           value - LAG(value) OVER w AS delta_prev,
           CAST(LEAD(event_id) OVER w AS DOUBLE) AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        # DOUBLE on both sides: nullable integer outputs canonicalize as
        # float64 only when NULLs are present, so pin the dtype explicitly.
        F.lead("event_id").over(w).cast("double").alias("next_event_id"),
    )


@register(
    "window_moving_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
    FROM events
    """,
)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w3 = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w3).cast("double").alias("mov_sum3"),
        F.count("*").over(wrun).alias("running_n"),
    )


@register(
    "window_sessionize",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events)
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — interval arithmetic keeps it independent
    of session timezone (NTZ-safe)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap <= F.expr("INTERVAL 30 MINUTES"), 0).otherwise(1).alias("new_session"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session").over(wrun).alias("session_id"),
    )


# --------------------------------------------------------------------------
# Sort / set ops / distinct
# --------------------------------------------------------------------------

@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    )


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_custkey % 3 <> 0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT with a right side that overlaps but never covers
    the left (ordering customers NOT divisible by 3), so both the drop
    path and the keep path are exercised and the result is non-empty
    at every SF — the previous operands (customer nations minus
    supplier nations) compared empty-to-empty, a vacuous check
    (round-8 vacuity audit)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 3 != 0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    # subtract == EXCEPT DISTINCT (set semantics), unlike exceptAll.
    return c.subtract(o)


@register(
    "set_except_all",
    oracle="""
    SELECT o_orderstatus AS status, CAST(year(o_orderdate) AS INT) AS yr FROM orders
    EXCEPT ALL
    SELECT 'F' AS status, CAST(1996 AS INT) AS yr FROM range(5000)
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: per-row multiplicity subtraction (Spark
    exceptAll), vs set_except's distinct semantics."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"), F.year("o_orderdate").alias("yr")
    )
    probe = spark.range(5000).select(F.lit("F").alias("status"), F.lit(1996).alias("yr"))
    return o.exceptAll(probe)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_orderstatus AS status, CAST(year(o_orderdate) AS INT) AS yr FROM orders
    INTERSECT ALL
    SELECT 'F' AS status, CAST(1996 AS INT) AS yr FROM range(5000)
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: min-of-multiplicities semantics (Spark
    intersectAll)."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"), F.year("o_orderdate").alias("yr")
    )
    probe = spark.range(5000).select(F.lit("F").alias("status"), F.lit(1996).alias("yr"))
    return o.intersectAll(probe)


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTR(c_name, 1, 9) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           TRIM(c_name) AS name_trim,
           REPLACE(c_name, 'Customer', 'Cust') AS name_repl,
           (c_mktsegment LIKE '%ING%') AS is_ing,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_num
    FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_repl"),
        F.col("c_mktsegment").like("%ING%").alias("is_ing"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_num"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           STRFTIME(o_orderdate, '%Y-%m') AS order_ym,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc,
           CAST(CEIL(l_extendedprice) AS DOUBLE) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS DOUBLE) AS price_floor,
           ROUND(l_extendedprice, 1) AS price_round,
           SQRT(l_quantity) AS qty_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.round("l_extendedprice", 1).alias("price_round"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           embedding[1] AS first_comp,
           embedding[64] AS last_comp,
           CAST(GREATEST(list_max(embedding), 0) AS FLOAT) AS max_pos,
           embedding[2] AS head_2,
           embedding[3] AS head_3,
           embedding[4] AS head_4
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface (size/element_at/array_max/slice). Outputs are kept
    scalar (the slice is projected to per-position columns) because the
    driver's canonicalizer cannot hash ARRAY cells."""
    e = load(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_comp"),
        F.element_at("embedding", 64).alias("last_comp"),
        F.greatest(F.array_max("embedding"), F.lit(0).cast("float")).alias("max_pos"),
        F.element_at(head4, 2).alias("head_2"),
        F.element_at(head4, 3).alias("head_3"),
        F.element_at(head4, 4).alias("head_4"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           (CAST(json_extract_string(props, '$.k') AS INT) > 50) AS k_high
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k_val"), (k > 50).alias("k_high"))


# --------------------------------------------------------------------------
# OData-shaped queries (pushdown surface over local tables)
# --------------------------------------------------------------------------

@register(
    "odata_select_filter_top",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20
    """,
)
def odata_select_filter_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's $select/$filter/$top contract (SURVEY.md §2.C) over
    a local table: Catalyst pushes the filter+projection into the scan."""
    c = load(spark, sf_dir, "customer")
    return top_k(
        c.where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000)).select(
            "c_custkey", "c_name", "c_acctbal"
        ),
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        20,
    )


@register(
    "odata_apply_groupby",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(c_nationkey) AS BIGINT) AS nation_sum,
           MAX(c_custkey) AS max_cust,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def odata_apply_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$apply aggregation pushdown end-to-end (SURVEY.md §2.C13,
    beyond-reference): a loopback OData v4 service over customer.parquet
    computes groupby((c_mktsegment),aggregate(...)) SERVER-side; the
    engine sends the compiled $apply, single-partition-plans the read,
    and type-decodes the aggregated page. The DuckDB oracle aggregates
    the same parquet — hash equality proves the whole pushdown path.
    Integer measures keep the oracle exact (no float-sum order drift)."""
    from erpl_web_spark.odata.datasource import ensure_registered
    from erpl_web_spark.suite.odata_local import ensure_server

    ensure_registered(spark)
    url = ensure_server(sf_dir, table="customer", entity="Customers")
    return (
        spark.read.format("odata")
        .option("url", url)
        .option("groupby", "c_mktsegment")
        .option(
            "aggregate",
            "c_nationkey with sum as nation_sum, c_custkey with max as max_cust, "
            "$count as n_rows",
        )
        .load()
    )


@register(
    "odata_expand_nested",
    oracle="""
    SELECT o_custkey AS c_custkey,
           array_to_string(list_sort(list(o_orderkey)), '|') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def odata_expand_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$expand contract (SURVEY.md §2.D4): child rows nested as a sorted
    array per parent — the aggregation shape behind expand_entity. The
    array is serialized '|'-joined so the driver canonicalizer can hash
    it (ARRAY cells are unhashable in its pandas sort)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.concat_ws(
            "|",
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
            ),
        ).alias("order_keys"),
        F.count("*").alias("n_orders"),
    )


@register(
    "cdc_delta_batch",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, MAX(event_id) AS new_token
    FROM events WHERE event_id > 500
    GROUP BY event_type
    """,
)
def cdc_delta_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODP-style delta fetch (SURVEY.md §2.I): rows past the stored delta
    token, plus the next token (max cursor) the subscription would commit."""
    e = load(spark, sf_dir, "events")
    return (
        e.where(F.col("event_id") > 500)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.max("event_id").alias("new_token"))
    )


@register(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1,
           s2.t2, s3.t3,
           (s2.user_id IS NOT NULL) AS reached_click,
           (s3.user_id IS NOT NULL) AS reached_purchase
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (view -> click -> purchase): each stage is the
    MIN event time strictly after the previous stage's time — the
    cascade decorrelates to per-stage aggregates joined on user_id, so
    every stage is one key-partitioned aggregate over an
    already-filtered slice (no per-user re-scan, no window over the
    whole event history). The three stage frames share the user_id
    partitioning end-to-end."""
    e = load(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id", "t1", "t2", "t3",
            F.col("t2").isNotNull().alias("reached_click"),
            F.col("t3").isNotNull().alias("reached_purchase"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) / 7.0) AS INT)
               AS week_offset
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM a GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen ISO week,
    distinct-active counts per week offset. First-seen is one user-keyed
    aggregate; the activity join reuses the same key partitioning and
    the distinct collapses before the final (cohort, offset) roll-up —
    both engines truncate weeks to Monday, so buckets align."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    a = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7.0
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return a.groupBy("cohort_week", "week_offset").agg(F.count("*").alias("n_active"))


@register(
    "agg_histogram",
    oracle="""
    SELECT LEAST(CAST(FLOOR(o_totalprice / 5000.0) AS INT), 11) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
    FROM orders GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (5k buckets, top-clamped): engine-portable
    manual binning — floor-divide + clamp is identical arithmetic in
    any engine, where width_bucket builtins differ in edge semantics.
    One map-side-combinable aggregate."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 5000.0).cast("int"), F.lit(11))
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice")).alias("bucket_total"),
    )


@register(
    "asof_join_forward",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           MIN(p.ts) AS next_purchase_ts
    FROM events c LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts >= c.ts
    WHERE c.event_type = 'click'
    GROUP BY c.event_id, c.user_id, c.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (first purchase AT/after each click — time-to-convert):
    same union+window operator scanning descending, still one shuffle;
    the oracle states the semantics as a quadratic range join + MIN."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    out = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="p_ts",
        right_cols=["p_ts"], direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("p_ts").alias("next_purchase_ts")
    )


@register(
    "events_resample_1h",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
      FROM bounds
    )
    SELECT g.user_id, g.slot,
           MAX(e.ts) AS last_event_ts,
           COUNT(e.ts) AS n_in_hour
    FROM grid g LEFT JOIN events e
      ON e.user_id = g.user_id AND e.event_type = 'purchase'
     AND e.ts >= g.slot AND e.ts < g.slot + INTERVAL 1 HOUR
    GROUP BY g.user_id, g.slot
    """,
)
def events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to an hourly grid per user (gap-filling):
    the grid is a JVM sequence explode between each user's hour bounds;
    per-slot stats come from joining events into their slot by
    timestamp truncation — an equi-join on (user, hour), NOT a range
    join, so it shuffles once on the grid key and stays linear. Slots
    with no events survive with zero counts (the gaps a training
    pipeline must see)."""
    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("slot"),
    )
    slotted = e.select(
        F.col("user_id").alias("e_user"),
        F.date_trunc("hour", F.col("ts")).alias("e_slot"),
        "ts",
    )
    return (
        grid.join(
            slotted,
            (F.col("user_id") == F.col("e_user")) & (F.col("slot") == F.col("e_slot")),
            "left",
        )
        .groupBy("user_id", "slot")
        .agg(
            F.max("ts").alias("last_event_ts"),
            F.count("ts").alias("n_in_hour"),
        )
    )


@register(
    "diag_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM((o_orderkey IS NULL)::INT) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM((o_custkey IS NULL)::INT) AS BIGINT),
           COUNT(DISTINCT o_custkey) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM((o_orderstatus IS NULL)::INT) AS BIGINT),
           COUNT(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*),
           CAST(SUM((o_orderdate IS NULL)::INT) AS BIGINT),
           COUNT(DISTINCT o_orderdate) FROM orders
    """,
)
def diag_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in one aggregation pass (operators.relational.
    profile_columns): null and exact-distinct counts for four orders
    columns, unpivoted via stack — one scan regardless of column count
    (the oracle's UNION ALL shape would scan once per column)."""
    from erpl_web_spark.operators.relational import profile_columns

    return profile_columns(
        load(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
    )


def _skew_oracle() -> str:
    """Twin of operators.relational.skew_profile over two surfaces —
    per-key counts, top-5 hitters (count ties to the smallest key in
    its ORIGINAL type), integer share/salt arithmetic, and the
    log-bucket p50/p99 of rows-per-key (the qsketch bit arithmetic
    inlined over the count column)."""
    def surface(s: str, src: str, label: str) -> str:
        return f"""
    {s}_counts AS (
      SELECT k AS key_t, CAST(COUNT(*) AS BIGINT) AS cnt FROM {src} GROUP BY 1
    ),
    {s}_stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM {s}_counts
    ),
    {s}_sb AS (
      SELECT cnt, greatest(length(format('{{:b}}', cnt)) - 1 - 4, 0) AS s
      FROM {s}_counts
    ),
    {s}_sk AS (
      SELECT ((cnt >> s) << s) AS edge, CAST(COUNT(*) AS BIGINT) AS bc
      FROM {s}_sb GROUP BY 1
    ),
    {s}_cum AS (
      SELECT edge, CAST(SUM(bc) OVER (ORDER BY edge) AS BIGINT) AS cum,
             CAST(SUM(bc) OVER () AS BIGINT) AS n
      FROM {s}_sk
    ),
    {s}_q AS (
      SELECT q, MIN(edge) AS est FROM (
        SELECT qq.q, c.edge
        FROM (SELECT unnest([500, 990]) AS q) qq JOIN {s}_cum c
          ON c.cum >= (CAST(qq.q AS BIGINT) * c.n + 999) // 1000
      ) GROUP BY q
    ),
    {s}_hit AS (
      SELECT key_t, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, key_t ASC) AS hitter_rank
      FROM {s}_counts ORDER BY cnt DESC, key_t ASC LIMIT 5
    ),
    {s}_out AS (
      SELECT '{label}' AS surface, CAST(h.hitter_rank AS INT) AS hitter_rank,
             CAST(h.key_t AS VARCHAR) AS key, h.cnt,
             CAST(h.cnt * 1000 // st.n_rows AS BIGINT) AS share_permille,
             st.n_rows, st.n_keys, st.max_cnt,
             CAST(p50.est AS BIGINT) AS p50_cnt_edge,
             CAST(p99.est AS BIGINT) AS p99_cnt_edge,
             CAST((st.max_cnt + 255) // 256 AS BIGINT) AS suggested_salt
      FROM {s}_hit h, {s}_stats st,
           (SELECT est FROM {s}_q WHERE q = 500) p50(est),
           (SELECT est FROM {s}_q WHERE q = 990) p99(est)
    )"""

    # the documents token fragment (= pipeline._SQL_TOKS, inlined to
    # keep suite modules import-independent)
    toks_src = (
        "(SELECT unnest(list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> '')) AS k FROM documents)"
    )
    users_src = "(SELECT user_id AS k FROM events)"
    return f"""
    WITH {surface('a', toks_src, 'doc_tokens')},
    {surface('b', users_src, 'event_users')}
    SELECT * FROM a_out UNION ALL SELECT * FROM b_out
    """


@register("diag_skew_profile", oracle=_skew_oracle())
def diag_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators.relational.skew_profile)
    over two key surfaces in one report: the Zipf document-token
    column (the viral-term risk BM25's max_df and the salted unigram
    entries mitigate) and the near-uniform events.user_id (the
    suggested_salt = 1 negative control). Each surface costs the SAME
    map-side-combined groupBy the diagnosed operation would run; heavy
    hitters come from TakeOrderedAndProject, the count distribution
    from the geometry-bounded log-bucket quantile sketch — so the
    whole profile, including the suggested salted_join factor, is
    integer arithmetic and value-hash-checked cross-engine. The
    measure -> configure loop for join_salted_skew, as an operator."""
    from erpl_web_spark.operators.relational import skew_profile
    from erpl_web_spark.operators.text import tokens_expr

    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select(F.explode(tokens_expr("text")).alias("tok"))
    users = load(spark, sf_dir, "events").select("user_id")
    # target 256 is deliberately tight so the testdata-scale corpus
    # exercises the salt arithmetic with a non-trivial factor (the
    # production target is ~10^6 rows/task; the formula is the same)
    return skew_profile(
        toks, "tok", "doc_tokens", target_rows_per_task=256
    ).unionByName(
        skew_profile(users, "user_id", "event_users", target_rows_per_task=256)
    )


def _join_est_oracle() -> str:
    """Twin of operators.relational.join_size_estimate for three join
    pairs: per-side 3x64 CMS over the stringified key (the
    text_countmin_topk hash arithmetic), per-row inner product, MIN
    over rows, next to the realized join counts."""
    def sk(s: str, src: str) -> str:
        return f"""
    {s}_f AS (
      SELECT g.d, t.k
      FROM (SELECT CAST(k AS VARCHAR) AS k FROM {src} WHERE k IS NOT NULL) t,
           (SELECT unnest(range(0, 3)) AS d) g
    ),
    {s}_sk AS (
      SELECT d,
             CAST(CAST('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || k), 1, 8)
                  AS BIGINT) % 64 AS INT) AS w,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {s}_f GROUP BY 1, 2
    )"""

    def est(s: str, a: str, b: str) -> str:
        return f"""
    {s}_est AS (
      SELECT CAST(MIN(ip) AS BIGINT) AS est FROM (
        SELECT a.d, SUM(a.cnt * b.cnt) AS ip
        FROM {a}_sk a JOIN {b}_sk b USING (d, w) GROUP BY a.d)
    )"""

    return f"""
    WITH {sk('ok', '(SELECT o_orderkey AS k FROM orders)')},
    {sk('lk', '(SELECT l_orderkey AS k FROM lineitem)')},
    {sk('ck', '(SELECT c_custkey AS k FROM customer)')},
    {sk('oc', '(SELECT o_custkey AS k FROM orders)')},
    {sk('pk', '(SELECT l_partkey AS k FROM lineitem)')},
    {est('p1', 'ok', 'lk')},
    {est('p2', 'ck', 'oc')},
    {est('p3', 'pk', 'pk')},
    x1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM orders
           JOIN lineitem ON o_orderkey = l_orderkey),
    x2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM customer
           JOIN orders ON c_custkey = o_custkey),
    x3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM lineitem a
           JOIN lineitem b ON a.l_partkey = b.l_partkey)
    SELECT 'orders_lineitem' AS pair, p1_est.est AS est_join_rows,
           x1.exact AS exact_join_rows, p1_est.est - x1.exact AS overcount
    FROM p1_est, x1
    UNION ALL
    SELECT 'customer_orders', p2_est.est, x2.exact, p2_est.est - x2.exact
    FROM p2_est, x2
    UNION ALL
    SELECT 'lineitem_selfpart', p3_est.est, x3.exact, p3_est.est - x3.exact
    FROM p3_est, x3
    """


@register("diag_join_size_estimate", oracle=_join_est_oracle())
def diag_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join output-size prediction from Count-Min inner products
    (operators.relational.join_size_estimate — the AMS/CM sketch
    technique) audited against the realized counts for three shapes:
    two FK joins (orders-lineitem, customer-orders) and the
    many-to-many lineitem self-join on l_partkey whose quadratic
    output is exactly what the estimator exists to flag BEFORE the
    join runs. depth=3 x width=64 is deliberately undersized so hash
    collisions produce VARYING positive overcounts, and the one-sided
    est >= exact contract is value-hash-checked cross-engine (the
    text_countmin_topk posture) — each sketch is one map-side-combined
    pass over just the key column, reusable across every join
    candidate that touches it."""
    from erpl_web_spark.operators.relational import join_size_estimate

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")

    def pair(name, l, r, lk, rk):
        est = join_size_estimate(l, r, lk, rk, depth=3, width=64)
        # Exact |l ⋈ r| via sufficient statistics (r14): the realized
        # count of an equi-join is Σ_k n_l(k)·n_r(k), so two map-side-
        # combined per-key counts and a key-sized join replace the
        # materialized join (the lineitem self-join on l_partkey alone
        # produced ~18M rows just to count them). Same integer.
        exact = (
            l.groupBy(F.col(lk).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__cl"))
            .join(
                r.groupBy(F.col(rk).alias("__k"))
                .agg(F.count(F.lit(1)).alias("__cr")),
                "__k",
            )
            .agg(
                # coalesce: an EMPTY join must still report 0 (the old
                # count() formulation's value), not a NULL sum
                F.coalesce(
                    F.sum(F.col("__cl") * F.col("__cr")), F.lit(0).cast("bigint")
                ).alias("exact_join_rows")
            )
        )
        return est.crossJoin(exact).select(
            F.lit(name).alias("pair"),
            "est_join_rows",
            "exact_join_rows",
            (F.col("est_join_rows") - F.col("exact_join_rows")).alias(
                "overcount"
            ),
        )

    return (
        pair("orders_lineitem", orders, li, "o_orderkey", "l_orderkey")
        .unionByName(pair("customer_orders", cust, orders, "c_custkey", "o_custkey"))
        .unionByName(pair("lineitem_selfpart", li, li, "l_partkey", "l_partkey"))
    )


@register(
    "interval_join_bucketed",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (purchase within 1h after a click) via time-bucket
    equi-join: both sides bucket ts to the hour, clicks join buckets
    h and h+1, and the exact interval predicate filters after. The
    equi-join on (user, bucket) is hash-partitioned and AQE-splittable —
    the theta formulation Spark would otherwise pick degenerates to a
    per-key cross product. Candidate blowup is bounded: each click
    meets only its two adjacent buckets."""
    e = load(spark, sf_dir, "events")
    hour_us = 3_600_000_000  # microseconds per hour, exact integer bucketing
    bucket = (F.unix_micros(F.col("ts").cast("timestamp")) / hour_us).cast("long")
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        bucket.alias("b"),
    )
    c2 = c.select("click_id", "user_id", "click_ts", F.explode(
        F.array(F.col("b"), F.col("b") + 1)).alias("jb"))
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        bucket.alias("jb"),
    )
    return (
        c2.join(p, ["user_id", "jb"])
        .where(
            (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    )


@register(
    "stat_corr_matrix",
    oracle="""
    WITH u AS (
      SELECT CAST(ROUND(l_quantity * 100) AS DECIMAL(18,0)) AS q,
             CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0)) AS p,
             CAST(ROUND(l_discount * 100) AS DECIMAL(18,0)) AS d
      FROM lineitem
    ), m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(q) AS DOUBLE) AS s_q,
             CAST(SUM(p) AS DOUBLE) AS s_p,
             CAST(SUM(d) AS DOUBLE) AS s_d,
             CAST(SUM(q * q) AS DOUBLE) AS p_qq,
             CAST(SUM(p * p) AS DOUBLE) AS p_pp,
             CAST(SUM(d * d) AS DOUBLE) AS p_dd,
             CAST(SUM(q * p) AS DOUBLE) AS p_qp,
             CAST(SUM(q * d) AS DOUBLE) AS p_qd,
             CAST(SUM(p * d) AS DOUBLE) AS p_pd
      FROM u
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           ROUND((n * p_qp - s_q * s_p) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_pp - s_p * s_p)), 12) AS pearson_r
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           ROUND((n * p_qd - s_q * s_d) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_dd - s_d * s_d)), 12)
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           ROUND((n * p_pd - s_p * s_d) / (sqrt(n * p_pp - s_p * s_p) * sqrt(n * p_dd - s_d * s_d)), 12)
    FROM m
    """,
)
def stat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix over lineitem numerics in ONE pass.
    Values integerize to cents first (r is scale-invariant), so every
    moment sum is exact 128-bit decimal in both engines; see
    operators.relational.corr_matrix for why engine corr() aggregates
    are not cross-engine comparable."""
    from erpl_web_spark.operators.relational import corr_matrix

    out = corr_matrix(
        load(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    # r rounded to 12 decimals on BOTH sides: the moment sums are exact
    # decimals, but the final double expression drifts ~1e-16 relative
    # between engines at sf0.1 row counts (caught by the round-6 sf0.1
    # full-gate sweep).
    return out.select("col_a", "col_b", F.round("pearson_r", 12).alias("pearson_r"))


@register(
    "events_value_anomaly",
    oracle="""
    WITH u AS (
      SELECT user_id, value,
             CAST(ROUND(value * 1000000) AS DECIMAL(19,0)) AS v
      FROM events
    ), m AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(v) AS DOUBLE) AS s,
             CAST(SUM(v * v) AS DOUBLE) AS ss
      FROM u GROUP BY user_id
    ), stats AS (
      SELECT user_id, n,
             s / n / 1000000.0 AS mean_value,
             sqrt((n * ss - s * s)) / n / 1000000.0 AS std_value
      FROM m
    )
    SELECT st.user_id, st.n, st.mean_value, st.std_value,
           CAST(SUM(CASE WHEN abs(u.value - st.mean_value)
                              > 2.0 * st.std_value THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM u JOIN stats st ON u.user_id = st.user_id
    GROUP BY st.user_id, st.n, st.mean_value, st.std_value
    """,
)
def events_value_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier counts (|value - mean| > 2 sigma): moments come
    from micro-unit integer sums (exact in both engines; population std
    via the nΣx²-(Σx)² identity is then fixed double arithmetic, unlike
    engine stddev aggregates whose streaming updates round differently).
    Two key-partitioned aggregations sharing the user_id shuffle."""
    e = load(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1_000_000).cast("decimal(19,0)")
    m = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    stats = m.select(
        "user_id",
        "n",
        (F.col("s") / F.col("n") / 1e6).alias("mean_value"),
        (F.sqrt(F.col("n") * F.col("ss") - F.col("s") * F.col("s")) / F.col("n") / 1e6).alias(
            "std_value"
        ),
    )
    return (
        e.join(stats, "user_id")
        .groupBy("user_id", "n", "mean_value", "std_value")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("mean_value"))
                    > 2.0 * F.col("std_value"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
