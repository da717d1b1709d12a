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
@given(ms=st.integers(min_value=-62135596800000, max_value=253402300799000))
def test_decode_v2_date_format(ms):
    """OData v2 /Date(ms)/ decodes to the epoch timestamp truncated to
    whole seconds (reference odata_content.cpp:666-677)."""
    out = decode_value(f"/Date({ms})/", TimestampType())
    if out is not None:
        expect = dt.datetime.fromtimestamp((ms // 1000), dt.timezone.utc).replace(tzinfo=None)
        assert out == expect
