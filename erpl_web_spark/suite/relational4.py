"""Fourth batch of relational-surface queries: the remaining TPC-H
shapes expressible on the driver's synthetic schema — q04 (EXISTS
semi-join), q07 (two-sided nation volume), q08 (market share), q10
(returned-item ranking), q15 (top-supplier scalar-max join-back), q19
(disjunctive join predicates), q21 (EXISTS + NOT EXISTS chain).

The synthetic lineitem has no commitdate/receiptdate/shipmode, so the
date predicates of q04/q12/q21 are adapted to l_shipdate vs o_orderdate
("shipped late" = shipped more than 60 days after ordering); the join
topology and decorrelation idioms — the parts that matter for plan
quality — match the original queries.

Same conventions as suite/relational.py: decimal accumulation for float
sums, identical aliases on both sides, double arithmetic kept
IEEE-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erpl_web_spark.suite import load, register
from erpl_web_spark.suite.relational import dsum, top_k


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (ref README.md SQL surface): EXISTS decorrelates to
    a LEFT SEMI join — Spark never materializes the lineitem side, and
    the quarter filter prunes orders before the shuffle. Adapted
    predicate: 'a lineitem shipped >60 days after ordering' (the
    synthetic schema has no commit/receipt dates)."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation dims broadcast; the disjunctive pair filter applies after
    the broadcast joins so the big fact shuffles only on its join keys."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle="""
    SELECT yr,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
                / CAST(SUM(v) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS v,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    GROUP BY yr
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    revenue by order year — conditional aggregation over a 7-way join;
    every dimension broadcasts, the two fact tables shuffle once each.
    Sums accumulate as decimals so the share division is the only
    floating-point step (engine-identical)."""
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    v = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vdec = v.cast("decimal(18,4)")
    joined = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vdec).otherwise(
                F.lit(0).cast("decimal(18,4)"))).alias("num"),
            F.sum(vdec).alias("den"),
        )
        .select(
            "yr",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias("mkt_share"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window. The returnflag + date filters reach the scans;
    TakeOrderedAndProject caps the sort at 20 rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue"))
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("c_custkey")], 20)


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarterly revenue, keep the max.
    The scalar MAX is a 1-row broadcast cross join (the decorrelated
    'revenue view' idiom); exact-decimal accumulation makes the equality
    against MAX deterministic in both engines."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicates. The part side
    prunes to the three brands before broadcasting; the OR tree evaluates
    post-join (it references both tables, so it cannot be a join key)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND n.n_name = 'NATION_1'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order — an EXISTS (left-semi) plus NOT EXISTS
    (left-anti) chain on the same fact table. 'Late' adapts to
    l_shipdate > o_orderdate + 60 days (no commit/receipt dates in the
    synthetic schema). All correlated subqueries decorrelate to
    semi/anti joins on l_orderkey — no per-row re-scan anywhere."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    l1 = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(late)
        .select("l_orderkey", "l_suppkey")
    )
    # another supplier on the same order (semi)
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    has_other = l1.join(
        others,
        (F.col("o2_orderkey") == F.col("l_orderkey"))
        & (F.col("o2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    # ...but no OTHER supplier was late on that order (anti)
    other_late = l1.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    only_late = has_other.join(
        other_late,
        (F.col("o3_orderkey") == F.col("l_orderkey"))
        & (F.col("o3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                       F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q12_shipping_modes",
    oracle="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN '90+'
                  WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN '60-89'
                  WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN '30-59'
                  ELSE '0-29' END AS delay_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY delay_bucket
    """,
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counting per category. The
    synthetic schema has no l_shipmode, so the category is the shipping
    delay bucket (days between order and ship date) — same
    join + CASE-pivot aggregation pattern as the original."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    delay = (
        F.when(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "90+")
        .when(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), "60-89")
        .when(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "30-59")
        .otherwise("0-29")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(delay.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "pivot_order_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY yr
    """,
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's relational PIVOT surface (groupBy().pivot(values)): status
    categories become columns. Fixed value list keeps the plan a single
    aggregate (no extra distinct-values job) — required at scale, where
    an unbounded pivot would first scan for the category set."""
    o = load(spark, sf_dir, "orders")
    counts = (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )
    spend = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        dsum(F.col("o_totalprice")).alias("total_spend")
    )
    return counts.join(spend, "yr")


@register(
    "analytics_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT custkey, recency_days, frequency, monetary,
             NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS r_quartile,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey ASC) AS f_quartile,
             NTILE(4) OVER (ORDER BY monetary DESC, custkey ASC) AS m_quartile
      FROM cust
    )
    SELECT r_quartile, f_quartile, m_quartile,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for recency (days
    since last order, vs the corpus max date), frequency, and monetary
    value, rolled up to segment sizes — the classic CRM/marketing
    cohorting query. One groupBy to per-customer metrics, three NTILE
    windows over the (small) customer dimension with custkey tiebreaks
    so bucket boundaries are deterministic, one final rollup. At scale
    the windows sort the CUSTOMER table, never the fact table."""
    o = load(spark, sf_dir, "orders")
    max_date = o.agg(F.max("o_orderdate").alias("d"))
    cust = (
        o.crossJoin(F.broadcast(max_date))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.date_diff(F.first("d"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            dsum(F.col("o_totalprice")).alias("monetary"),
        )
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("custkey"))
    scored = (
        cust.withColumn("r_quartile", F.ntile(4).over(w_r))
        .withColumn("f_quartile", F.ntile(4).over(w_f))
        .withColumn("m_quartile", F.ntile(4).over(w_m))
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count("*").alias("n_customers"),
        dsum(F.col("monetary")).alias("segment_value"),
    )


@register(
    "analytics_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders, CAST(rank AS INT) AS rank FROM (
      SELECT part_a, part_b, n_orders,
             ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rank
      FROM pairs
    ) WHERE rank <= 20
    """,
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most often bought in
    the same order. The within-order self-join is quadratic only in
    ORDER SIZE (single-digit line counts), keyed on the order — one
    shuffle; pair counts partial-aggregate before their exchange; the
    global top-20 is a TakeOrderedAndProject-size problem with full
    tiebreaks for determinism."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("part_a", "part_b", "n_orders", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "analytics_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def analytics_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (the Markov counts behind
    funnel discovery and next-action prediction): per-user time-ordered
    LEAD, then a global pair count. One shuffle on user_id for the
    window (event_id tiebreak makes simultaneous events deterministic),
    one partial-aggregated pair rollup."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.withColumn("next_type", F.lead("event_type").over(w))
    return (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
