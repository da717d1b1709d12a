"""Relational helper operators the reference inherits from its host engine.

The reference (DataZooDE/erpl-web) delegates joins/windows to DuckDB
(SURVEY.md §2.F); the ones Spark lacks as single calls are built here as
compositions of DataFrame ops so Catalyst still owns the physical plan.

Scale notes (100 TB target):
- ``asof_join`` is the union+window formulation: ONE shuffle on the join
  key (no range-join explosion, no per-key collect). Equivalent to
  DuckDB's ASOF JOIN semantics (nearest right.ts <= left.ts per key).
- ``expand_entity`` reproduces OData ``$expand`` semantics
  (reference: src/odata_edm.cpp:246-286 builds LIST(STRUCT) columns;
  README.md:388-395 documents expand == pre-nested left join): a
  shuffle-aggregated collect_list, NOT a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the matching right row
    within the same ``on`` key(s) — pandas ``merge_asof`` semantics.

    ``direction='backward'`` (default): greatest ``right_ts <= left_ts``;
    ``'forward'``: smallest ``right_ts >= left_ts``; ``'nearest'``: the
    closer of the two (ties -> backward, matching pandas).

    Implemented as tagged-union + ordered window with ``last(ignorenulls)``:
    a single shuffle on the key, linear in |left|+|right| (nearest adds a
    second sort over the same partitioning, still one shuffle). This is
    the formulation that survives skew/scale, unlike a range join
    (quadratic per key) or a per-key collect.

    ``tolerance`` (an SQL interval body, e.g. ``"1 HOUR"``) bounds how far
    a match may be — a right row outside ``tolerance`` yields NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    # The whole operator is built from parsed SQL strings rather than
    # per-column Column objects: the Column-API formulation issued ~700
    # py4j round trips per call (~0.25 s of driver time, paid per bench
    # rep); the selectExpr form is the IDENTICAL logical plan in ~10
    # calls (r14 measurement, OPTIMIZATION_r14.md). Identifiers are
    # backtick-quoted so arbitrary column names survive the parser.
    def q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    keys_q = [q(k) for k in keys]
    payload_q = [q(c) for c in left_payload]

    # Tag order: right rows sort BEFORE left rows at equal ts, so a right
    # row at exactly left_ts is visible to that left row (<= semantics).
    r = right.selectExpr(
        *keys_q,
        f"{q(right_ts)} AS __ts",
        "0 AS __side",
        *[
            f"CAST(NULL AS {left.schema[c].dataType.simpleString()}) AS {q(c)}"
            for c in left_payload
        ],
        *[f"{q(c)} AS {q('__r_' + c)}" for c in right_cols],
        f"{q(right_ts)} AS __r___match_ts",
    )
    l = left.selectExpr(
        *keys_q,
        f"{q(left_ts)} AS __ts",
        "1 AS __side",
        *payload_q,
        *[
            f"CAST(NULL AS {right.schema[c].dataType.simpleString()}) AS {q('__r_' + c)}"
            for c in right_cols
        ],
        f"CAST(NULL AS {right.schema[right_ts].dataType.simpleString()}) AS __r___match_ts",
    )
    unioned = r.unionByName(l)
    sides = {"backward": ["b"], "forward": ["f"], "nearest": ["b", "f"]}[direction]
    filled_exprs = []
    keys_csv = ", ".join(keys_q)
    for d in sides:
        # At equal ts the right row must sort BEFORE the left row in both
        # scan directions so <=/>= matches are visible; __side 0 < 1
        # handles that under asc and desc alike.
        ts_dir = "ASC" if d == "b" else "DESC"
        over = (
            f"OVER (PARTITION BY {keys_csv} ORDER BY __ts {ts_dir}, __side ASC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        filled_exprs += [
            f"last({q('__r_' + c)}, true) {over} AS {q(f'__{d}_{c}')}"
            for c in right_cols
        ]
        filled_exprs.append(f"last(__r___match_ts, true) {over} AS __{d}_mts")
    filled = unioned.selectExpr(
        *keys_q, "__ts", "__side", *payload_q, *filled_exprs
    )

    def gap(d: str) -> str:
        return f"(__ts - __{d}_mts)" if d == "b" else f"(__{d}_mts - __ts)"

    if tolerance is None:
        tol_sql = None
    else:
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        ts_type = left.schema[left_ts].dataType
        if isinstance(ts_type, (TimestampType, TimestampNTZType, DateType)):
            tol_sql = f"INTERVAL {tolerance}"
        else:  # numeric event time -> numeric tolerance (DOUBLE, as before)
            tol_f = float(tolerance)
            if tol_f != tol_f:  # NaN
                # repr() renders nan/inf as unquoted tokens the SQL
                # parser rejects; the quoted Java forms cast to the
                # same doubles F.lit() used to produce (ADVICE r14).
                tol_sql = "CAST('NaN' AS DOUBLE)"
            elif tol_f == float("inf"):
                tol_sql = "CAST('Infinity' AS DOUBLE)"
            elif tol_f == float("-inf"):
                tol_sql = "CAST('-Infinity' AS DOUBLE)"
            else:
                tol_sql = f"CAST({tol_f!r} AS DOUBLE)"

    def valid(d: str) -> str:
        has = f"__{d}_mts IS NOT NULL"
        if tol_sql is None:
            return f"({has})"
        return f"(({has}) AND ({gap(d)} <= {tol_sql}))"

    if direction in ("backward", "forward"):
        d = sides[0]
        pick = {
            c: f"CASE WHEN {valid(d)} THEN {q(f'__{d}_{c}')} END" for c in right_cols
        }
    else:
        # nearest: the closer valid side wins; ties -> backward (pandas).
        use_b = f"({valid('b')} AND ((NOT {valid('f')}) OR ({gap('b')} <= {gap('f')})))"
        pick = {
            c: (
                f"CASE WHEN {use_b} THEN {q(f'__b_{c}')} "
                f"ELSE CASE WHEN {valid('f')} THEN {q(f'__f_{c}')} END END"
            )
            for c in right_cols
        }
    out = filled.where("__side = 1").selectExpr(
        *keys_q,
        f"__ts AS {q(left_ts)}",
        *payload_q,
        *[f"{pick[c]} AS {q(c)}" for c in right_cols],
    )
    return out


def expand_entity(
    parent: DataFrame,
    child: DataFrame,
    on: str | list[str],
    expand_name: str,
    child_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """OData ``$expand`` as a Spark plan: parent LEFT JOIN pre-nested child.

    ``expand='Orders'`` on Customers in the reference yields an
    ``Orders LIST(STRUCT(...))`` column (src/odata_edm.cpp:246-286). Here:
    child is aggregated per key into a sorted array<struct>, then
    left-joined; the aggregation is a map-side-combinable shuffle and the
    join is broadcastable when the nested side is small.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if child_cols is None:
        child_cols = [c for c in child.columns if c not in keys]
    struct_col = F.struct(*[F.col(c) for c in child_cols])
    nested = child.groupBy(*keys).agg(F.collect_list(struct_col).alias(expand_name))
    if order_col is not None:
        # sort_array orders struct arrays by fields in order — put the sort
        # key first so output is deterministic regardless of shuffle order.
        first = [order_col] + [c for c in child_cols if c != order_col]
        struct_sorted = F.struct(*[F.col(c) for c in first])
        nested = child.groupBy(*keys).agg(
            F.sort_array(F.collect_list(struct_sorted)).alias(expand_name)
        )
    return parent.join(nested, on=keys, how="left")


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k: Catalyst plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps + single driver merge, no full sort at scale."""
    return df.orderBy(*order_by).limit(k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with key salting for heavy-hitter skew.

    AQE's skew-join split handles most skew at runtime; salting is the
    explicit fallback when one key dominates so badly that a single
    shuffle partition would still spill (or when AQE is unavailable).
    The big/skewed side gets a deterministic salt in [0, salt) derived
    from hashing its non-key columns (falling back to the key when there
    are none), so one hot key fans out across ``salt`` reducers; the
    smaller side is replicated ``salt`` times via a broadcast-joined
    salt-id table — the standard replicate-the-small-side construction.
    Output columns/rows equal the plain ``left.join(right, on, how)``.

    Supported ``how``: inner / left (the directions where only the right
    side is replicated; for right/full, swap the arguments).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'; swap sides otherwise")
    keys = [on] if isinstance(on, str) else list(on)
    non_key = [c for c in left.columns if c not in keys] or keys
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salt)).cast("int")
    salted_left = left.withColumn("__salt", l_salt)
    salt_ids = left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    salted_right = right.crossJoin(F.broadcast(salt_ids))
    out = salted_left.join(salted_right, keys + ["__salt"], how)
    return out.drop("__salt")


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data profile: (column, n_rows, n_nulls, n_distinct).

    All columns are profiled in ONE aggregation pass over the input (a
    single scan; count/count-distinct per column as parallel aggregate
    expressions), then unpivoted driver-side from the 1-row result via
    a literal stack — no per-column jobs, no second scan. The ingest
    pre-flight: schema drift, null floods, and key-cardinality
    anomalies all show up here before a pipeline consumes the table.
    """
    cols = columns or df.columns
    # Generated aliases are keyed by column INDEX, not name: name-keyed
    # aliases collide for names containing the separator (e.g. 'a_b'),
    # silently selecting the wrong aggregate. Name literals in the stack
    # are quote-escaped so arbitrary identifiers survive selectExpr.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __nn_{}, __nd_{}".format(c.replace("\\", "\\\\").replace("'", "\\'"), i, i)
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
    ).select(
        "column_name", F.col("__n").alias("n_rows"), "n_nulls", "n_distinct"
    )


def corr_matrix(df: DataFrame, cols: list[str], unit_scale: int = 100) -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregation pass.

    Values are integerized at ``unit_scale`` (default cents) before the
    moment sums — Pearson r is invariant to linear scaling, and integer
    moments stay EXACT in 128-bit decimal in any engine, where decimal
    products near 38 digits get truncated differently per engine and
    streaming corr() aggregates (Welford vs naive) round differently.
    The final (nΣxy - ΣxΣy)/sqrt(...)/sqrt(...) is a fixed sequence of
    double ops — deterministic and oracle-comparable. One scan,
    C + C(C+1)/2 parallel aggregate expressions, 1-row result unpivoted
    via a literal stack.
    """
    # Moment aliases are keyed by column INDEX (__p_{i}_{j}, i <= j):
    # name-keyed aliases (__p_{a}_{b}) are ambiguous for names containing
    # underscores (cols ['a','b_b','a_b','b'] all map to __p_a_b_b),
    # silently selecting the wrong moment sum.
    iu = lambda c: F.round(F.col(c) * unit_scale).cast("decimal(18,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(iu(c)).alias(f"__s_{i}"))
    for i, a in enumerate(cols):
        for j in range(i, len(cols)):
            aggs.append(F.sum(iu(a) * iu(cols[j])).alias(f"__p_{i}_{j}"))
    one = df.agg(*aggs)

    def corr_expr(i: int, j: int):
        n = F.col("__n").cast("double")
        sa, sb = F.col(f"__s_{i}").cast("double"), F.col(f"__s_{j}").cast("double")
        lo, hi = min(i, j), max(i, j)
        sab = F.col(f"__p_{lo}_{hi}").cast("double")
        saa = F.col(f"__p_{i}_{i}").cast("double")
        sbb = F.col(f"__p_{j}_{j}").cast("double")
        return (n * sab - sa * sb) / (
            F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        )

    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    out = one.select(
        *[corr_expr(i, j).alias(f"__r_{i}_{j}") for i, j in pairs]
    )

    def lit(c: str) -> str:
        return "'{}'".format(c.replace("\\", "\\\\").replace("'", "\\'"))

    stack = ", ".join(
        f"{lit(cols[i])}, {lit(cols[j])}, __r_{i}_{j}" for i, j in pairs
    )
    return out.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, pearson_r)"
    )


def skew_profile(
    df: DataFrame,
    key_col: str,
    surface: str,
    top_k: int = 5,
    target_rows_per_task: int = 4096,
    sub_bits: int = 4,
) -> DataFrame:
    """Shuffle-key skew diagnostic — the measurement that decides
    between a plain join/groupBy, AQE's runtime skew split, and an
    explicit :func:`salted_join`: per-key counts (ONE map-side-combined
    groupBy, the same shuffle the diagnosed operation would run), the
    ``top_k`` heavy hitters, and the count DISTRIBUTION summarized by
    the log-bucket quantile sketch (``operators.qsketch`` — the p50/p99
    bucket edges of rows-per-key, integer-exact so the whole profile is
    value-hash-checkable cross-engine).

    Each heavy-hitter row carries the corpus scalars alongside it:

        (surface, hitter_rank, key, cnt, share_permille,
         n_rows, n_keys, max_cnt, p50_cnt_edge, p99_cnt_edge,
         suggested_salt)

    ``share_permille = cnt * 1000 div n_rows`` and ``suggested_salt =
    ceil(max_cnt / target_rows_per_task)`` are integer arithmetic: the
    salt factor that caps the hottest key's per-reducer rows at the
    target is exactly the ``salt`` argument :func:`salted_join` takes,
    closing the measure -> configure loop. suggested_salt = 1 reads as
    "no salting needed".

    Scale shape: the key-count groupBy is the only corpus-scale stage;
    hitters come from a TakeOrderedAndProject (never a full-table
    window), the scalar moments from one aggregate over the skinny
    count frame, and the quantile sketch is geometry-bounded (~1k
    rows). ``surface`` tags the profiled key so several profiles can
    union into one report.
    """
    from erpl_web_spark.operators.qsketch import (
        logbucket_quantiles,
        logbucket_sketch,
    )

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    # selection AND ranking both tie-break on the ORIGINAL key type —
    # ranking a numeric key's ties as strings would disagree with the
    # selection order (and any SQL twin) whenever 2 vs 10 tie
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
    hitters = (
        counts.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(top_k)
        .withColumn("hitter_rank", F.row_number().over(w).cast("int"))
        .select(
            F.col(key_col).cast("string").alias("key"), "cnt", "hitter_rank"
        )
    )
    stats = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    qs = logbucket_quantiles(
        logbucket_sketch(counts, "cnt", sub_bits), [500, 990]
    )
    p50 = qs.where(F.col("q_permille") == 500).select(
        F.col("est_edge").alias("p50_cnt_edge")
    )
    p99 = qs.where(F.col("q_permille") == 990).select(
        F.col("est_edge").alias("p99_cnt_edge")
    )
    t = int(target_rows_per_task)
    return (
        hitters.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p99))
        .select(
            F.lit(surface).alias("surface"),
            "hitter_rank",
            "key",
            "cnt",
            F.expr("cnt * 1000 div n_rows").alias("share_permille"),
            "n_rows",
            "n_keys",
            "max_cnt",
            "p50_cnt_edge",
            "p99_cnt_edge",
            F.expr(f"(max_cnt + {t - 1}) div {t}").alias("suggested_salt"),
        )
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Equi-join OUTPUT-size estimate from two Count-Min sketches,
    without running the join — the sketch inner-product technique
    (Alon-Matias-Szegedy frequency moments; Cormode & Muthukrishnan
    2005 §4.2 for the CM form): the true join size is
    ``sum over keys of cntL(k) * cntR(k)``, and for each hash row d,
    ``sum over w of sketchL[d,w] * sketchR[d,w]`` never undercounts it
    (colliding keys only ADD cross terms); the estimate takes the MIN
    over the depth rows, with expected overcount <= |L|*|R| / width.

    The decision this powers at 100 TB: before committing to a join
    strategy, two geometry-bounded sketches (depth x width rows each,
    one map-side-combined pass per side — reusable across MANY join
    candidates) predict whether the output explodes (key-skew cross
    products, accidental many-to-many) — the same summary-first
    posture as :func:`skew_profile`, but for the PAIRED distribution.

    All-integer arithmetic on md5 buckets (``text.countmin_sketch_col``),
    so the estimate — and therefore its one-sided >= contract — is
    bit-identical cross-engine and value-hash-checkable. Returns one
    row: (est_join_rows,). Compare with the realized count to audit.
    """
    from erpl_web_spark.operators.text import countmin_sketch_col

    skl = countmin_sketch_col(left.select(F.col(left_key)), left_key, depth, width)
    skr = countmin_sketch_col(
        right.select(F.col(right_key)), right_key, depth, width
    )
    prod = (
        skl.alias("a")
        .join(skr.alias("b"), ["d", "w"])
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return prod.agg(F.min("ip").alias("est_join_rows"))
