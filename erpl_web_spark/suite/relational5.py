"""Fifth batch: the last five TPC-H shapes — q02 (correlated MIN
join-back over a region-scoped supply relation), q09 (product-type
profit by nation and year), q11 (important-stock scalar-threshold
HAVING), q16 (supplier-relationship COUNT DISTINCT with NOT IN), q20
(potential-promotion nested-IN semi-join chain). With these the suite
covers all 22 TPC-H query topologies.

The synthetic schema has no ``partsupp`` table, so q02/q11/q16/q20
derive the part-supplier relationship from lineitem:
``supply(partkey, suppkey, qty, unit_cost)`` with
``unit_cost = MIN(l_extendedprice / l_quantity)`` standing in for
ps_supplycost and the summed shipped quantity for ps_availqty. The join
topology, decorrelation idioms, and aggregate shapes — the parts that
matter for plan quality — match the original queries; only the
predicates are adapted (as in suite/relational4.py).

Reference delegates all of this to its host engine (DuckDB); see
SURVEY.md §2.F and reference README.md's SQL-surface examples.

Same conventions as suite/relational.py: decimal accumulation for float
sums, identical aliases on both sides, per-row double arithmetic left
IEEE-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erpl_web_spark.suite import load, register
from erpl_web_spark.suite.relational import dsum, top_k


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-derived part-supplier relation shared by the
    partsupp-shaped queries. One shuffle on (partkey, suppkey) — the
    same key partsupp would be bucketed on at scale — with map-side
    partial aggregation; never wider than four columns."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        dsum(F.col("l_quantity"), scale=2).alias("ps_qty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_unit_cost"),
    )


_SUPPLY_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_qty,
             MIN(l_extendedprice / l_quantity) AS ps_unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@register(
    "q02_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_unit_cost, s.s_acctbal, s.s_name, n.n_name
      FROM supply ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_unit_cost AS unit_cost
    FROM part p JOIN eu ON p.p_partkey = eu.ps_partkey
    WHERE p.p_size = 15
      AND eu.ps_unit_cost = (
        SELECT MIN(e2.ps_unit_cost) FROM eu e2
        WHERE e2.ps_partkey = p.p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the EUROPE supplier(s) with
    the minimum unit cost. The correlated MIN subquery decorrelates to a
    window min over ONE supply pipeline (a join-back against a second
    aggregate would scan and aggregate lineitem twice — Spark shares no
    common subplans); the part filter pushes below the supply aggregation
    as a broadcast semi-join because the per-part MIN is independent
    across parts. Dims broadcast; MIN over doubles needs no decimal
    detour (no accumulation, so it is order-exact)."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part").where(F.col("p_size") == 15)
    l = load(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    supply = l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_unit_cost"))
    eu = supply.join(
        F.broadcast(
            load(spark, sf_dir, "supplier")
            .join(
                F.broadcast(load(spark, sf_dir, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                F.broadcast(
                    load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("s_suppkey", "s_acctbal", "s_name", "n_name")
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    w = Window.partitionBy("ps_partkey")
    best = (
        eu.withColumn("mc_cost", F.min("ps_unit_cost").over(w))
        .where(F.col("ps_unit_cost") == F.col("mc_cost"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_unit_cost").alias("unit_cost"),
        )
    )
    return top_k(
        best,
        [F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")],
        100,
    )


@register(
    "q09_product_type_profit",
    oracle="""
    SELECT nation, yr,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, yr
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern. p_retailprice * quantity stands in for
    ps_supplycost (no partsupp). The LIKE filter prunes part before it
    broadcasts; lineitem and orders each shuffle once on their join key;
    the profit expression stays in per-row double space (IEEE-identical
    across engines) and only the SUM goes through decimal."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr")
        )
        .agg(dsum(amount, scale=4).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    nat AS (
      SELECT ps.ps_partkey AS partkey,
             CAST(SUM(CAST(ps.ps_unit_cost * ps.ps_qty AS DECIMAL(18,4))) AS DOUBLE) AS value
      FROM supply ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY ps.ps_partkey
    )
    SELECT partkey, value FROM nat
    WHERE value > (
      SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 0.002 FROM nat
    )
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supply value within one nation, keeping
    parts whose value exceeds a fraction of the nation's total — the
    scalar-subquery HAVING decorrelates to a 1-row broadcast cross join.
    Value sums accumulate as decimal so the threshold comparison is
    engine-identical; the fraction multiply is a single double op."""
    nat = (
        _supply(spark, sf_dir)
        .join(
            F.broadcast(
                load(spark, sf_dir, "supplier")
                .join(
                    F.broadcast(
                        load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("ps_partkey").alias("partkey"))
        .agg(dsum(F.col("ps_unit_cost") * F.col("ps_qty"), scale=4).alias("value"))
    )
    threshold = nat.agg(
        (dsum(F.col("value"), scale=4) * F.lit(0.002)).alias("threshold")
    )
    return (
        nat.join(F.broadcast(threshold), F.col("value") > F.col("threshold"))
        .select("partkey", "value")
    )


@register(
    "q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM (
      SELECT p.p_brand, p.p_type, p.p_size, ps.l_suppkey AS suppkey
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
    )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    excluding a supplier denylist — NOT IN decorrelates to a broadcast
    left-anti join ('suppliers with complaints' adapts to negative
    account balance). The distinct pair projection and the count-distinct
    agg share the same (partkey, suppkey)-keyed shuffle."""
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        pairs.join(F.broadcast(bad), F.col("suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                                 AND l_shipdate <  TIMESTAMP '1998-01-01'
                                THEN l_quantity ELSE 0 END AS DECIMAL(18,2)))
                  AS DOUBLE) AS qty97,
             CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                                 AND l_shipdate <  TIMESTAMP '1997-01-01'
                                THEN l_quantity ELSE 0 END AS DECIMAL(18,2)))
                  AS DOUBLE) AS qty96
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM shipped WHERE qty97 > 0.5 * qty96
      )
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'small%'-named parts whose shipped
    volume grew (1997 > half of 1996) — the original's nested IN
    subqueries (partsupp IN parts, availqty > correlated shipped sum)
    become two semi-joins: part names prune lineitem via broadcast
    semi-join, and the qualifying supplier keys semi-join into supplier.
    The correlated scalar subquery is a conditional aggregate over the
    same grouping — one shuffle, no re-scan."""
    small = load(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    l = load(spark, sf_dir, "lineitem").join(
        F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )

    def year_qty(start: str, end: str):
        in_window = (F.col("l_shipdate") >= F.lit(start).cast("timestamp")) & (
            F.col("l_shipdate") < F.lit(end).cast("timestamp")
        )
        return dsum(F.when(in_window, F.col("l_quantity")).otherwise(0.0), scale=2)

    grown = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(
            year_qty("1997-01-01", "1998-01-01").alias("qty97"),
            year_qty("1996-01-01", "1997-01-01").alias("qty96"),
        )
        .where(F.col("qty97") > 0.5 * F.col("qty96"))
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            load(spark, sf_dir, "nation").where(
                F.col("n_name").isin(
                    "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
                )
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return s.join(
        grown, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")
