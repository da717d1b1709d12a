"""Second batch of relational-surface queries: subqueries, conditional
expressions, HAVING, UNION ALL, pivot, explode, distribution windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from erpl_web_spark.suite import load, register
from erpl_web_spark.suite.relational import dsum


@register(
    "filter_in_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS urgency,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
    """,
)
def filter_in_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
    )
    return o.where(F.col("o_orderstatus").isin("F", "P")).select(
        "o_orderkey",
        urgency.alias("urgency"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


@register(
    "subquery_scalar_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: Catalyst plans the inner agg once and broadcasts
    the scalar — no per-row recomputation."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM __sq_orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM __sq_orders)
        """
    )


@register(
    "having_groups",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@register(
    "union_all_tagged",
    oracle="""
    SELECT kind, COUNT(*) AS n, CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS bal FROM supplier
    )
    GROUP BY kind
    """,
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("bal")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("bal")
    )
    return (
        c.unionAll(s)
        .groupBy("kind")
        .agg(F.count("*").alias("n"), dsum(F.col("bal")).alias("total"))
    )


@register(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "explode_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word
    """,
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "agg_stats_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(MEDIAN(l_orderkey) AS DOUBLE) AS median_key,
           MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # count_distinct is aggregated separately from the buffering
    # aggregates and joined back on the 3-row group key (r14): combined,
    # the distinct-rewrite (Expand) duplicates every row and makes the
    # median buffer insert per expanded row — same Expand pathology as
    # agg_approx_distinct, measured 2.9 s at sf0.1 vs 1.1 s split.
    # Values identical: exact aggregates, deterministic either way.
    exact = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
    )
    rest = l.groupBy("l_returnflag").agg(
        F.median("l_orderkey").cast("double").alias("median_key"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    # Schema contract note (ADVICE r14): the inner join on the group key
    # drops a NULL group — NOT equivalent to the one-aggregate form in
    # general. Sound here because l_returnflag is a TPC-H NOT NULL
    # column (a NULL group cannot exist on either side); a nullable
    # group key would need eqNullSafe.
    return exact.join(rest, "l_returnflag").select(
        "l_returnflag", "n_parts", "median_key", "first_ship", "last_ship"
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (explicit heavy-hitter skew handling): output is
    row-identical to the plain join — which is exactly what the oracle
    checks — while the hot keys fan out over 8 salt buckets."""
    from erpl_web_spark.operators.relational import salted_join

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(o, c, "o_custkey", "inner", salt=8).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


@register(
    "events_window_rollup",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
           time_bucket(INTERVAL 6 HOURS, ts) + INTERVAL 6 HOURS AS window_end,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2, 3
    """,
)
def events_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming.windows.windowed_counts (same 6-hour
    tumbling buckets Spark's window() produces) with exact user counts so
    DuckDB's time_bucket can oracle it."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


@register(
    "map_funcs",
    oracle="""
    WITH g AS (
      SELECT o_custkey, o_orderstatus AS st, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey,
           array_to_string(list_sort(list(st)), '|') AS statuses,
           CAST(list_sum(list(n)) AS BIGINT) AS total_orders,
           CAST(COALESCE(MAX(CASE WHEN st = 'F' THEN n END), 0) AS BIGINT) AS n_f,
           MAX(CASE WHEN st = 'O' THEN TRUE ELSE FALSE END) AS has_open
    FROM g GROUP BY o_custkey
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed processing (map_from_entries / map_keys / map_values /
    element_at / map_contains_key) with scalar/string outputs so the
    oracle comparison stays engine-neutral (the key list is '|'-joined —
    the driver canonicalizer cannot hash ARRAY cells): per-customer
    status->count map, queried for totals and per-status lookups."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey", "o_orderstatus").count()
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "count")))
        ).alias("st_map")
    )
    return m.select(
        "o_custkey",
        F.concat_ws("|", F.sort_array(F.map_keys("st_map"))).alias("statuses"),
        F.aggregate(F.map_values("st_map"), F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("total_orders"),
        F.coalesce(F.element_at("st_map", F.lit("F")), F.lit(0)).cast("long").alias("n_f"),
        F.map_contains_key("st_map", F.lit("O")).alias("has_open"),
    )


@register(
    "regex_funcs",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' ref ' || CAST(doc_id * 7 AS VARCHAR)
                  || repeat(' 42', CAST(doc_id % 4 AS INT)) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           regexp_extract(text, '([A-Za-z]{6,})', 1) AS first_long_word,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
           CAST(regexp_matches(text, '(?i)data') AS BOOLEAN) AS mentions_data
    FROM aug
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract_all/extract/replace/match — same regex
    dialect (RE2-compatible subset) evaluates identically in both
    engines. Each document gets a digit tail (' ref <7*doc_id>' plus
    doc_id%4 repeats of ' 42') — the raw corpus is digit-free, which
    left n_numbers vacuously 0 and masked untouched for seven rounds,
    hiding the group-index crash below (round-8 vacuity audit)."""
    d = load(spark, sf_dir, "documents")
    aug = d.withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" ref "),
            (F.col("doc_id") * 7).cast("string"),
            F.repeat(F.lit(" 42"), (F.col("doc_id") % 4).cast("int")),
        ),
    )
    return aug.select(
        "doc_id",
        # idx=0 (whole match) explicitly: PySpark defaults idx to 1, and
        # a group-less pattern with idx=1 CRASHES on the first row whose
        # text actually matches — invisible on digit-free test corpora,
        # caught by the round-8 sf1 gate (synthesized texts carry digit
        # suffixes). DuckDB's regexp_extract_all defaults to group 0.
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_numbers"),
        F.regexp_extract("text", "([A-Za-z]{6,})", 1).alias("first_long_word"),
        F.regexp_replace("text", "[0-9]+", "#").alias("masked"),
        F.col("text").rlike("(?i)data").alias("mentions_data"),
    )


@register(
    "struct_funcs",
    oracle="""
    SELECT o_orderkey,
           struct_extract({'custkey': o_custkey, 'price': o_totalprice}, 'custkey') AS info_custkey,
           struct_extract({'custkey': o_custkey, 'price': o_totalprice}, 'price') AS info_price,
           struct_extract(struct_pack(a := o_orderkey, b := o_custkey), 'a') + 1 AS nested_calc
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction + field access, projected back to scalars so
    the cross-engine compare never sees engine-specific struct rendering
    (Spark Rows are tuple-like; DuckDB structs are dicts)."""
    o = load(spark, sf_dir, "orders")
    info = F.struct(
        F.col("o_custkey").alias("custkey"), F.col("o_totalprice").alias("price")
    )
    packed = F.struct(F.col("o_orderkey").alias("a"), F.col("o_custkey").alias("b"))
    return o.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        info.getField("custkey").alias("info_custkey"),
        info.getField("price").alias("info_price"),
        (packed.getField("a") + 1).alias("nested_calc"),
    )


@register(
    "subquery_correlated_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface (Catalyst decorrelates
    to a left-semi join) — the one suite entry exercising spark.sql()
    end-to-end rather than the DataFrame API."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql("""
        SELECT o_orderkey, o_totalprice
        FROM sq_orders o
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """)


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont, both linear interpolation over the sorted set)."""
    l = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    # Feed the Percentile buffer (value, frequency) pairs from a codegen
    # count pre-aggregation instead of raw rows (r14): the exact sorted
    # multiset the interpolation walks is unchanged — same doubles,
    # A/B pinned toPandas().equals — but the per-row OpenHashMap insert
    # path moves from the ObjectAggregate into a codegen HashAggregate
    # (measured 3.0 -> 1.9 s warm at sf0.1).
    pre = l.groupBy("l_returnflag", price.alias("__p")).agg(
        F.count(F.lit(1)).alias("__f")
    )
    return pre.groupBy("l_returnflag").agg(
        F.percentile(F.col("__p"), F.lit(0.25), F.col("__f")).alias("p25"),
        F.percentile(F.col("__p"), F.lit(0.5), F.col("__f")).alias("p50"),
        F.percentile(F.col("__p"), F.lit(0.75), F.col("__f")).alias("p75"),
    )
