"""Property-based tests (hypothesis) for the pure translation layers —
the code most exposed to adversarial inputs: filter literal encoding,
query-param merging, and the lenient JSON value decoder."""

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from erpl_web_spark.core.url import canonicalize_query_key, merge_query_params
from erpl_web_spark.odata.filters import translate_filters
from erpl_web_spark.odata.json_decode import decode_value

try:  # Spark 4 moved Filter classes
    from pyspark.sql.datasource import EqualTo
except ImportError:
    from pyspark.sql.connect.datasource import EqualTo  # pragma: no cover


scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=1200),
    st.datetimes(min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)),
)


@settings(max_examples=300, deadline=None)
@given(value=scalars, version=st.sampled_from([2, 4]))
def test_filter_translation_total_and_escaped(value, version):
    """Any scalar either translates (with quotes escaped, never raw) or
    lands in the residual list — translate_filters never raises, and
    pushed+residual always partition the input."""
    f = EqualTo(("Name",), value)
    expr, pushed, residual = translate_filters([f], odata_version=version)
    assert len(pushed) + len(residual) == 1
    if pushed:
        assert expr is not None and expr.startswith("Name eq ")
        lit = expr[len("Name eq "):]
        if isinstance(value, str):
            # reference skip rules: empty / oversized strings are residual
            assert value != "" and len(value) <= 1000
            assert lit[0] == lit[-1] == "'"
            # interior quotes doubled: undoubling round-trips to the value
            assert lit[1:-1].replace("''", "'") == value
    else:
        assert expr is None


@settings(max_examples=200, deadline=None)
@given(
    user=st.dictionaries(
        st.sampled_from(["$filter", "%24filter", "$select", "$top", "custom", "%24top"]),
        st.text(min_size=1, max_size=30).filter(lambda s: "&" not in s),
        max_size=4,
    ),
    gen=st.dictionaries(
        st.sampled_from(["$filter", "$select", "$top", "$skip", "$format"]),
        st.text(min_size=1, max_size=30),
        max_size=4,
    ),
)
def test_merge_query_params_invariants(user, gen):
    """User $filter always survives; keys are canonical and deduplicated;
    generated values win everywhere else."""
    out = merge_query_params(user, gen)
    assert all(k == canonicalize_query_key(k) for k in out)
    assert len(set(out)) == len(out)
    user_canon = {canonicalize_query_key(k): v for k, v in user.items()}
    if "$filter" in user_canon:
        assert out["$filter"] == user_canon["$filter"]
    for k, v in gen.items():
        if canonicalize_query_key(k) != "$filter" or "$filter" not in user_canon:
            assert out[canonicalize_query_key(k)] == v


json_values = st.recursive(
    st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=60),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=8,
)

TYPES = [
    BooleanType(), IntegerType(), LongType(), DoubleType(),
    DecimalType(18, 4), StringType(), TimestampType(),
]


@settings(max_examples=300, deadline=None)
@given(value=json_values, data_type=st.sampled_from(TYPES))
def test_decode_value_lenient_total(value, data_type):
    """PERMISSIVE decode contract (reference odata_content.cpp:1155-1160):
    any JSON value decodes to the target type or None — never an
    exception — and numeric strings round-trip."""
    out = decode_value(value, data_type)
    if isinstance(data_type, IntegerType) and isinstance(out, int):
        assert -(2**31) <= out < 2**31
    if isinstance(value, bool) and isinstance(data_type, BooleanType):
        assert out is value
    if isinstance(value, int) and not isinstance(value, bool) and isinstance(data_type, LongType):
        assert out == value
    if isinstance(data_type, StringType) and isinstance(value, str):
        assert out == value


@settings(max_examples=100, deadline=None)
@given(
    ms=st.integers(min_value=-62135596800000, max_value=253402300799000),
    offset=st.one_of(
        st.none(),
        st.tuples(st.sampled_from("+-"), st.integers(0, 14), st.sampled_from([0, 30, 45])),
    ),
)
def test_decode_v2_date_format(ms, offset):
    """OData v2 /Date(ms±HHMM)/ decodes to the epoch timestamp truncated
    to whole seconds toward zero (C++ integer division,
    odata_content.cpp:666-677); a zone-offset suffix is ignored like the
    reference, which parses only the leading ms digits."""
    suffix = f"{offset[0]}{offset[1]:02d}{offset[2]:02d}" if offset else ""
    out = decode_value(f"/Date({ms}{suffix})/", TimestampType())
    if out is not None:
        secs = -((-ms) // 1000) if ms < 0 else ms // 1000
        expect = dt.datetime.fromtimestamp(secs, dt.timezone.utc).replace(tzinfo=None)
        assert out == expect
        if offset:
            assert out == decode_value(f"/Date({ms})/", TimestampType())


# ---------------------------------------------------------------------------
# Lenient-cast matrix (reference odata_content.cpp:122-183 dispatch + the
# per-type deserializers): for EVERY declared EDM-mapped Spark type and any
# JSON shape, decode is total, typed-or-NULL, and accepts the string
# rendering of every native value it accepts.
# ---------------------------------------------------------------------------

from decimal import Decimal as _Dec  # noqa: E402

from pyspark.sql.types import (  # noqa: E402
    ArrayType as _Arr,
    BinaryType as _Bin,
    ByteType as _I8,
    DateType as _Date,
    FloatType as _F32,
    ShortType as _I16,
    StructField as _SF,
    StructType as _Struct,
)

ALL_TYPES = [
    BooleanType(), _I8(), _I16(), IntegerType(), LongType(),
    _F32(), DoubleType(), DecimalType(18, 4), StringType(),
    TimestampType(), _Date(), _Bin(),
    _Arr(LongType()), _Struct([_SF("a", LongType()), _SF("b", StringType())]),
]

_PY_TYPE = {
    BooleanType: bool, _I8: int, _I16: int, IntegerType: int, LongType: int,
    _F32: float, DoubleType: float, DecimalType: _Dec, StringType: str,
    TimestampType: dt.datetime, _Date: dt.date, _Bin: bytes,
    _Arr: list, _Struct: tuple,
}


@settings(max_examples=500, deadline=None)
@given(value=json_values, data_type=st.sampled_from(ALL_TYPES))
def test_decode_matrix_total_and_typed(value, data_type):
    """Any (declared type x JSON shape) combination decodes to the
    declared type's Python value or None — never an exception, never a
    mistyped value (which would corrupt Spark's internal rows)."""
    out = decode_value(value, data_type)
    if out is None:
        return
    expected = _PY_TYPE[type(data_type)]
    assert isinstance(out, expected), f"{data_type}: {value!r} -> {out!r}"
    if isinstance(data_type, BooleanType):
        assert not isinstance(out, int) or isinstance(out, bool)
    if isinstance(data_type, (_I8, _I16, IntegerType, LongType)):
        bits = {_I8: 8, _I16: 16, IntegerType: 32, LongType: 64}[type(data_type)]
        assert -(1 << (bits - 1)) <= out < (1 << (bits - 1))
    if isinstance(data_type, _Arr):
        assert all(x is None or isinstance(x, int) for x in out)
    if isinstance(data_type, _Struct):
        a, b = out
        assert a is None or isinstance(a, int)
        assert b is None or isinstance(b, str)


@settings(max_examples=500, deadline=None)
@given(
    value=st.one_of(
        st.integers(min_value=-(2**70), max_value=2**70),
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    data_type=st.sampled_from(
        [_I8(), _I16(), IntegerType(), LongType(), _F32(), DoubleType(), DecimalType(18, 4)]
    ),
)
def test_decode_string_or_native_equivalence(value, data_type):
    """Every numeric deserializer accepts the string rendering of a
    native value and returns the same result (reference: each
    DeserializeJson* has a yyjson_is_str branch driving the same cast),
    with out-of-range values -> NULL on both paths. (Booleans are
    covered by unit tests: the decoder is a documented strict superset
    of the reference's quirky matrix there — the reference accepts
    'true'/'1'/'0' but errors on 'false' and numerics.)"""
    rendered = repr(value)
    native = decode_value(value, data_type)
    via_str = decode_value(rendered, data_type)
    if isinstance(native, float) or isinstance(via_str, float):
        if native is not None and via_str is not None:
            assert via_str == native or (math.isnan(via_str) and math.isnan(native))
        # float repr round-trips exactly in Python, so both sides agree
        # on None-ness too
        assert (native is None) == (via_str is None)
    else:
        assert via_str == native


@settings(max_examples=200, deadline=None)
@given(secs=st.floats(min_value=-62135596800.0, max_value=253402300799.0))
def test_decode_epoch_real_timestamp(secs):
    """Real-number epoch seconds truncate toward zero to whole seconds
    (odata_content.cpp:685-688 static_cast<int64_t>)."""
    out = decode_value(secs, TimestampType())
    if out is not None:
        expect = dt.datetime.fromtimestamp(int(secs), dt.timezone.utc).replace(tzinfo=None)
        assert out == expect


@settings(max_examples=200, deadline=None)
@given(days=st.integers(min_value=-719162, max_value=2932896))
def test_decode_numeric_date_is_epoch_days(days):
    """Numeric JSON for an Edm.Date column is days since epoch
    (odata_content.cpp:612-620), not seconds."""
    out = decode_value(days, _Date())
    assert out == dt.date(1970, 1, 1) + dt.timedelta(days=days)


# ---------------------------------------------------------------------------
# Pushdown soundness under null semantics: for any supported filter and any
# row set (with NULLs), "rows the server keeps for the pushed expression,
# evaluated with OData v4 null rules" composed with "Spark re-applying the
# residual" must equal Spark's own 3-valued filter semantics.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    GreaterThan as _GT,
    In as _In,
    IsNotNull as _INN,
    IsNull as _IN,
    LessThan as _LT,
    Not as _Not,
)


def _odata_eval_clause(row, clause: str) -> bool:
    clause = clause.strip()
    if clause.startswith("not (") and clause.endswith(")"):
        return not _odata_eval(row, clause[len("not ("):-1])
    """OData v4 evaluation of 'Col op lit': eq/ne treat null as a value
    (null equals only itself, 'null ne v' is TRUE); lt/gt/le/ge with a
    null operand are false."""
    import re as _re

    m = _re.match(r"^(\w+) (eq|ne|gt|ge|lt|le) (.+)$", clause)
    assert m, clause
    col, op, lit_s = m.groups()
    lit = None if lit_s == "null" else (
        lit_s[1:-1].replace("''", "'") if lit_s.startswith("'") else float(lit_s)
    )
    v = row.get(col)
    if op == "eq":
        return v == lit if lit is not None else v is None
    if op == "ne":
        return v != lit if lit is not None else v is not None
    if v is None or lit is None:
        return False  # ordering comparisons with null are false
    return {"gt": v > lit, "ge": v >= lit, "lt": v < lit, "le": v <= lit}[op]


def _split_top(expr: str, sep: str) -> list[str]:
    """Split on a connective at paren depth 0."""
    parts, depth, cur, i = [], 0, "", 0
    while i < len(expr):
        if expr[i] == "(":
            depth += 1
        elif expr[i] == ")":
            depth -= 1
        if depth == 0 and expr[i : i + len(sep)] == sep:
            parts.append(cur)
            cur = ""
            i += len(sep)
            continue
        cur += expr[i]
        i += 1
    parts.append(cur)
    return parts


def _wrapped(expr: str) -> bool:
    """True if the whole expr is one (...) group."""
    if not (expr.startswith("(") and expr.endswith(")")):
        return False
    depth = 0
    for i, ch in enumerate(expr):
        depth += ch == "("
        depth -= ch == ")"
        if depth == 0:
            return i == len(expr) - 1
    return False


def _odata_eval(row, expr: str) -> bool:
    """Recursive evaluation of the expressions our translator emits:
    and/or trees, paren groups, `not (...)`, comparison clauses."""
    expr = expr.strip()
    ands = _split_top(expr, " and ")
    if len(ands) > 1:
        return all(_odata_eval(row, p) for p in ands)
    ors = _split_top(expr, " or ")
    if len(ors) > 1:
        return any(_odata_eval(row, p) for p in ors)
    if _wrapped(expr):
        return _odata_eval(row, expr[1:-1])
    return _odata_eval_clause(row, expr)


def _spark_semantics(row, f) -> bool:
    """Spark's 3-valued logic collapsed to keep/drop (NULL -> drop)."""
    v = row.get(f.attribute[0]) if hasattr(f, "attribute") else None
    t = type(f)
    if t is EqualTo:
        return False if (v is None or f.value is None) else v == f.value
    if t is _GT:
        return False if (v is None or f.value is None) else v > f.value
    if t is _LT:
        return False if (v is None or f.value is None) else v < f.value
    if t is _IN:
        return v is None
    if t is _INN:
        return v is not None
    if t is _In:
        return _in_3vl(v, f.value) is True
    if t is _Not:
        inner = f.child
        iv = row.get(inner.attribute[0])
        it = type(inner)
        if it is EqualTo:
            return False if (iv is None or inner.value is None) else iv != inner.value
        if it is _GT:
            return False if (iv is None or inner.value is None) else not (iv > inner.value)
        if it is _LT:
            return False if (iv is None or inner.value is None) else not (iv < inner.value)
        if it is _IN:
            return iv is not None
        if it is _INN:
            return iv is None
        if it is _In:
            return _in_3vl(iv, inner.value) is False  # NOT(null) -> drop
    raise AssertionError(f"unhandled {f}")


def _in_3vl(v, cands):
    """Spark's 3-valued IN: empty list -> false; null operand -> null;
    match -> true; no match with a null candidate -> null; else false."""
    if not cands:
        return False
    if v is None:
        return None
    if any(c is not None and v == c for c in cands):
        return True
    if any(c is None for c in cands):
        return None
    return False


_vals = st.one_of(st.none(), st.floats(min_value=-5, max_value=5, allow_nan=False),
                  st.sampled_from(["a", "b", "c"]))
_numbers = st.one_of(st.none(), st.floats(min_value=-5, max_value=5, allow_nan=False))


def _filters_strategy():
    num_f = st.one_of(
        st.builds(lambda v: EqualTo(("X",), v), _numbers),
        st.builds(lambda v: _GT(("X",), v), _numbers),
        st.builds(lambda v: _LT(("X",), v), _numbers),
        st.just(_IN(("X",))),
        st.just(_INN(("X",))),
        st.builds(lambda vs: _In(("X",), tuple(vs)),
                  st.lists(_numbers, min_size=0, max_size=4)),
    )
    return st.one_of(num_f, num_f.map(_Not))


@settings(max_examples=400, deadline=None)
@given(
    rows=st.lists(_numbers, min_size=0, max_size=8),
    f=_filters_strategy(),
)
def test_pushdown_composition_soundness(rows, f):
    """server-keeps(pushed, OData-null-rules) ∧ spark-keeps(residual)
    == spark-keeps(original) for every row — i.e. the translation never
    loses or invents rows, including around NULLs (the ADVICE hazards)."""
    try:
        expr, pushed, residual = translate_filters([f], odata_version=4)
    except Exception as e:  # translator must be total
        raise AssertionError(f"translate_filters raised {e} for {f}")
    assert len(pushed) + len(residual) == 1
    for x in rows:
        row = {"X": x}
        want = _spark_semantics(row, f)
        server_keeps = _odata_eval(row, expr) if expr is not None else True
        residual_keeps = all(_spark_semantics(row, r) for r in residual)
        assert (server_keeps and residual_keeps) == want, (
            f"filter={f} row={row} expr={expr!r} "
            f"server={server_keeps} residual={residual_keeps} want={want}"
        )


@settings(max_examples=500, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    chunk=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunk_window_arithmetic_properties(n, chunk, data):
    """The chunk-window formula used by operators.text.chunk_documents
    (n_chunks = floor((max(n - overlap, 1) - 1) / stride) + 1, chunk i
    = tokens[i*stride : i*stride + chunk]) guarantees, for every
    (n_tokens, chunk_tokens, overlap): full coverage of all token
    positions, every chunk non-empty, every chunk after the first both
    overlaps its predecessor by exactly `overlap` positions (when long
    enough) AND contributes at least one NEW position — i.e. no
    pure-duplicate suffix chunks (the round-6 review finding)."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    if n == 0:
        return  # empty docs are filtered before the expansion
    n_chunks = (max(n - overlap, 1) - 1) // stride + 1
    spans = [
        (i * stride, min(i * stride + chunk, n)) for i in range(n_chunks)
    ]
    # non-empty chunks, full coverage, monotone starts
    assert all(a < b for a, b in spans)
    covered = set()
    for a, b in spans:
        covered.update(range(a, b))
    assert covered == set(range(n))
    # each later chunk adds >= 1 position not in any earlier chunk
    seen: set[int] = set()
    for a, b in spans:
        assert set(range(a, b)) - seen, f"redundant chunk {(a, b)} n={n}"
        seen.update(range(a, b))


def test_url_canonicalizer_cross_engine_on_random_urls(spark):
    """Randomized cross-engine equivalence for the URL canonicalizer:
    400 seeded messy URLs (case noise, default/odd ports, percent
    escapes incl. malformed ones, tracking params in shuffled order,
    fragments, trailing slashes, scheme-less strings) evaluated by
    Spark's canonicalize_url_expr AND DuckDB's independent SQL
    rendering (_SQL_CANON_FROM_URLS). The suite entries pin the
    planted fixture; this pins the input DOMAIN — any divergence on a
    combination the fixture never planted fails here."""
    import random

    import duckdb

    from erpl_web_spark.operators.text import canonicalize_url_expr
    from erpl_web_spark.suite.pipeline import _SQL_CANON_FROM_URLS

    rng = random.Random(12012)
    schemes = ["http", "HTTP", "https", "HTTPS", ""]
    hosts = ["Site.example", "WWW.site.example", "www.SITE.example",
             "a.b.example", "xn--caf-dma.example"]
    ports = ["", ":80", ":443", ":8080"]
    segs = ["p", "%7E", "%70", "Q%2fr", "x%2Fy", "bad%g1", "tail%", "%"]
    params = ["a=1", "b=2", "x=%2f", "x=%2F", "utm_source=x", "fbclid=1",
              "utm_campaign", "gclid=9", "", "k=v=w"]

    def mk(i: int) -> str:
        s = rng.choice(schemes)
        host = rng.choice(hosts)
        if not s:
            return host + "/p%7E?utm_source=x"
        path = "/".join(rng.sample(segs, rng.randint(0, 3)))
        path = ("/" + path if path else rng.choice(["", "/"]))
        if path and rng.random() < 0.4:
            path += "/"
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        frag = "#s" + str(i) if rng.random() < 0.3 else ""
        return f"{s}://{host}{rng.choice(ports)}{path}" + (
            "?" + q if q else "") + frag

    rows = [(i, 0, mk(i)) for i in range(400)]
    sdf = spark.createDataFrame(rows, "doc_id long, n_chars long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in sdf.select(
            "doc_id", canonicalize_url_expr("url").alias("c")
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE urls(doc_id BIGINT, n_chars BIGINT, url VARCHAR)"
    )
    con.executemany("INSERT INTO urls VALUES (?, ?, ?)", rows)
    want = dict(
        con.execute(
            f"WITH {_SQL_CANON_FROM_URLS} "
            "SELECT doc_id, canonical_url FROM canon"
        ).fetchall()
    )
    diffs = {
        i: (rows[i][2], got[i], want[i])
        for i in got
        if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:3]}"


def test_normalize_text_cross_engine_on_random_strings(spark):
    """Randomized cross-engine equivalence for text normalization: 500
    seeded strings over an adversarial alphabet (curly quotes, en/em
    dashes, NBSP, stripped C0 controls, KEPT controls \\t/\\n/\\r,
    DEL, multi-space runs, edge-positioned whitespace) evaluated by
    Spark's normalize_text expression AND the DuckDB rendering the
    text_normalize oracle uses (_SQL_NORMALIZE_EXPR). Domain-level pin
    beyond the entry's planted tail."""
    import random

    import duckdb

    from erpl_web_spark.operators.text import normalize_text
    from erpl_web_spark.suite.pipeline import _SQL_NORMALIZE_EXPR

    rng = random.Random(20126)
    alphabet = (
        list("abcXYZ09.,!")
        + ["‘", "’", "“", "”", "–", "—",
           " ", "\x01", "\x08", "\x0b", "\x0c", "\x1f", "\x7f",
           "\t", "\n", "\r", " ", "  ", "   "]
    )

    def mk() -> str:
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))

    rows = [(i, mk()) for i in range(500)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in normalize_text(sdf, "text", out="n").select("doc_id", "n").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {_SQL_NORMALIZE_EXPR} FROM t"
        ).fetchall()
    )
    diffs = {
        i: (repr(rows[i][1]), repr(got[i]), repr(want[i]))
        for i in got
        if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:3]}"


def test_strip_html_cross_engine_on_random_markup(spark):
    """Randomized cross-engine equivalence for the HTML stripper: 400
    seeded concatenations of adversarial markup pieces — mixed-case
    tags with attributes, self-closing tags, comments and script/style
    blocks INCLUDING unterminated ones, entities next to bare &/</>,
    doctype and processing instructions — through Spark's
    strip_html_expr (Java regex) and the oracle's _sql_strip_html
    rendering (DuckDB RE2). The fixed HTML shell in text_html_strip
    pins one composition; this pins the markup domain."""
    import random

    import duckdb

    from erpl_web_spark.operators.text import strip_html_expr
    from erpl_web_spark.suite.pipeline import _sql_strip_html

    rng = random.Random(30127)
    pieces = [
        "plain text ", "words & more ", "<p>", "</p>", "<P CLASS='x'>",
        "<br/>", "<img src='a.png' alt='x y'>", "<!-- comment -->", "<!--",
        "-->", "<script>var a=1 && 2;</script>", "<SCRIPT type='t'>x",
        "</script>", "<style>p{color:red}</style>", "<style>q{",
        "</style>", "&amp;", "&lt;tag&gt;", "&quot;q&quot;", "&#39;",
        "&nbsp;", "&", "<", ">", "a<b", "5 > 3", "<?xml version='1'?>",
        "<!DOCTYPE html>", "\n", "\t", "   ",
    ]

    def mk() -> str:
        return "".join(rng.choice(pieces) for _ in range(rng.randint(0, 12)))

    from pyspark.sql import functions as F

    rows = [(i, mk()) for i in range(400)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in sdf.select(
            "doc_id", strip_html_expr(F.col("text")).alias("c")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {_sql_strip_html('text')} FROM t"
        ).fetchall()
    )
    diffs = {
        i: (repr(rows[i][1]), repr(got[i]), repr(want[i]))
        for i in got
        if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:2]}"


def test_redact_pii_cross_engine_on_random_text(spark):
    """Randomized cross-engine equivalence for PII redaction: 400
    seeded concatenations of PII and NEAR-MISS pieces (emails with
    odd local parts, bare @, IPv4s at word boundaries and embedded in
    version strings, SSN shapes vs longer digit runs, phone-like runs
    with parens/spaces/dashes at the 8-digit threshold boundary)
    through Spark's redact_pii (Java regex, \\b semantics) and the
    oracle's _PII_SQL rendering (DuckDB RE2). The entry's planted tail
    pins one composition; this pins the pattern domain."""
    import random

    import duckdb

    from erpl_web_spark.operators.text import redact_pii
    from erpl_web_spark.suite.pipeline import _PII_SQL

    rng = random.Random(40128)
    pieces = [
        "plain words ", "a.b-c_9%+x@mail.example.org ", "no@tld ",
        "user@@double.example.com ", "@lonely ", "x@y.io.",
        "10.1.2.3 ", "v1.2.3.4beta ", "256.300.1.2 ", "1.2.3.4.5 ",
        "ip:10.9.8.7, ", "123-45-6789 ", "1234-56-7890 ", "123-456-789 ",
        "+1 415 555 0133 ", "(020) 7946-0958 ", "12345678 ", "1234567 ",
        "tel+44 20 7946 0958. ", "- - - ", "code 99 ",
    ]

    def mk() -> str:
        return "".join(rng.choice(pieces) for _ in range(rng.randint(0, 8)))

    rows = [(i, mk()) for i in range(400)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["redacted"]
        for r in redact_pii(sdf, "text").select("doc_id", "redacted").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(f"SELECT doc_id, {_PII_SQL} FROM t").fetchall()
    )
    diffs = {
        i: (repr(rows[i][1]), repr(got[i]), repr(want[i]))
        for i in got
        if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:2]}"


def test_tokenizer_cross_engine_on_random_text(spark):
    """Randomized cross-engine equivalence for the SHARED tokenizer —
    text.tokens_expr (Java \\s+ split of lowercased text, empties
    dropped) vs the _SQL_TOKS DuckDB rendering that underpins most
    oracle entries: 500 seeded strings over an adversarial alphabet
    (multi-space runs, tab/newline/CR/form-feed, NBSP and Unicode
    spaces U+2028/U+2003 — which NEITHER engine's ASCII \\s matches,
    so they must stay inside tokens — accented letters, sharp s,
    digits/punct, DEL, edge-positioned whitespace).

    Two measured engine-boundary divergences are EXCLUDED from the
    domain and pinned as divergences below, so a behavior change in
    either engine surfaces: (1) vertical tab U+000B — Java \\s matches
    it, DuckDB/RE2's does not; (2) dotted capital I U+0130 — Java
    lowercases to 'i' + combining dot (two codepoints), DuckDB to
    plain 'i'. The driver corpora (ASCII-ish documents, syllable
    natural corpus) contain neither, which is what keeps the oracle
    gate sound; this test is the record of that boundary."""
    import random

    import duckdb

    from pyspark.sql import functions as F  # noqa: F401

    from erpl_web_spark.operators.text import tokens_expr
    from erpl_web_spark.suite.pipeline import _SQL_TOKS

    rng = random.Random(20137)
    alphabet = (
        list("abcXYZ09.,!-_'")
        + ["É", "Æ", "ß", "å",
           " ", "  ", "   ", "\t", "\n", "\r", "\f",
           "\xa0", " ", " ", "\x7f"]
    )

    def mk() -> str:
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))

    rows = [(i, mk()) for i in range(500)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in sdf.select("doc_id", tokens_expr("text").alias("t")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute(f"SELECT doc_id, {_SQL_TOKS} FROM t").fetchall())
    diffs = {
        i: (repr(rows[i][1]), got[i], want[i]) for i in got if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:3]}"

    # the documented boundary, pinned AS divergences (see docstring)
    vt = spark.createDataFrame([(0, "a\x0bb")], "doc_id long, text string")
    assert vt.select(tokens_expr("text").alias("t")).collect()[0]["t"] == ["a", "b"]
    assert con.execute(
        f"SELECT {_SQL_TOKS} FROM (SELECT 'a' || chr(11) || 'b' AS text)"
    ).fetchone()[0] == ["a\x0bb"]
    dotted = spark.createDataFrame([(0, "İ")], "doc_id long, text string")
    assert dotted.select(tokens_expr("text").alias("t")).collect()[0]["t"] == [
        "i̇"
    ]
    assert con.execute(
        f"SELECT {_SQL_TOKS} FROM (SELECT 'İ' AS text)"
    ).fetchone()[0] == ["i"]


def test_md5_long48_cross_engine_on_random_strings(spark):
    """Randomized cross-engine pin for the _md5_long48 hash family —
    the primitive EVERY md5-mode oracle twin (MinHash, SimHash, DSIR,
    A-ES keys, the natural corpus itself) rests on: 500 seeded strings
    over an adversarial alphabet (colon — the join separator, so
    multi-arg ambiguity surfaces if an engine rendered args
    differently — unicode accents, digits, empty-adjacent pieces)
    hashed by the Spark expression and by the DuckDB rendering
    CAST('0x' || substring(md5(s), 1, 12) AS BIGINT); plus the 2-arg
    form against md5(a || ':' || b), including integer args (the
    CAST-to-string rendering both engines must agree on)."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    from erpl_web_spark.operators.dedup import _md5_long48

    rng = random.Random(20138)
    alphabet = list("abcXYZ09.,!:") + ["É", "ß", " ", "::", ":"]

    def mk() -> str:
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))

    rows = [(i, mk(), rng.randint(-10**12, 10**12)) for i in range(500)]
    sdf = spark.createDataFrame(rows, "i long, s string, n long")
    got = {
        r["i"]: (r["h1"], r["h2"])
        for r in sdf.select(
            "i",
            _md5_long48(F.col("s")).alias("h1"),
            _md5_long48(F.col("s"), F.col("n")).alias("h2"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        i: (h1, h2)
        for i, h1, h2 in con.execute(
            "SELECT i,"
            " CAST('0x' || substring(md5(s), 1, 12) AS BIGINT),"
            " CAST('0x' || substring(md5(s || ':' || CAST(n AS VARCHAR)), 1, 12)"
            "      AS BIGINT)"
            " FROM t"
        ).fetchall()
    }
    diffs = {i: (repr(rows[i][1]), got[i], want[i]) for i in got if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:3]}"


def test_shingles_cross_engine_on_random_text(spark):
    """Randomized cross-engine equivalence for the 3-token shingle
    assembly — dedup.shingles_expr (guarded sliding window + concat_ws
    + array_distinct) vs the _SQL_SHINGLES DuckDB rendering every
    containment/Jaccard/MinHash oracle builds on: 400 seeded strings
    with 0..8 tokens (the k-boundary: <3 tokens must yield an EMPTY
    set in both engines, not bogus slices — the sequence(1, n-2)
    count-DOWN hazard shingles_expr guards), repeated tokens (distinct
    semantics), and messy whitespace from the tokenizer's shared
    domain."""
    import random

    import duckdb

    from erpl_web_spark.operators.dedup import shingles_expr
    from erpl_web_spark.suite.pipeline import _SQL_SHINGLES, _SQL_TOKS

    rng = random.Random(20139)
    words = ["alpha", "beta", "Gamma", "dd", "x9", "beta"]
    seps = [" ", "  ", "\t", "\n"]

    def mk() -> str:
        n = rng.randint(0, 8)
        return rng.choice(seps).join(rng.choice(words) for _ in range(n))

    rows = [(i, mk()) for i in range(400)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in sdf.select(
            "doc_id", shingles_expr("text", 3).alias("sh")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        i: sorted(sh)
        for i, sh in con.execute(
            f"SELECT doc_id, {_SQL_SHINGLES} FROM "
            f"(SELECT doc_id, {_SQL_TOKS} AS __toks FROM t)"
        ).fetchall()
    }
    diffs = {i: (repr(rows[i][1]), got[i], want[i]) for i in got if got[i] != want[i]}
    assert not diffs, f"{len(diffs)} divergences, first: {list(diffs.items())[:3]}"
    # the k-boundary is exercised, not vacuous: some docs are sub-3-token
    assert any(len(s) == 0 for s in got.values())
    assert any(len(s) > 0 for s in got.values())
