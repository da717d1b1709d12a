from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringStartsWith,
)

from erpl_web_spark.odata.filters import translate_filters


def t1(f, version=4):
    expr, pushed, residual = translate_filters([f], version)
    return expr, len(pushed), len(residual)


def test_comparison_operators():
    assert t1(EqualTo(("Age",), 30)) == ("Age eq 30", 1, 0)
    assert t1(GreaterThan(("Age",), 30)) == ("Age gt 30", 1, 0)
    assert t1(GreaterThanOrEqual(("Age",), 30)) == ("Age ge 30", 1, 0)
    assert t1(LessThan(("Age",), 30)) == ("Age lt 30", 1, 0)
    assert t1(LessThanOrEqual(("Age",), 30)) == ("Age le 30", 1, 0)


def test_string_quoting_and_escaping():
    expr, _, _ = translate_filters([EqualTo(("Name",), "O'Brien")], 2)
    assert expr == "Name eq 'O''Brien'"  # v2 '' escaping


def test_boolean_and_null():
    assert t1(EqualTo(("Active",), True))[0] == "Active eq true"
    assert t1(IsNull(("X",)))[0] == "X eq null"
    assert t1(IsNotNull(("X",)))[0] == "X ne null"


def test_skip_rules_go_residual():
    # empty-string comparison not pushed (reference :747-751)
    expr, pushed, residual = translate_filters([EqualTo(("Name",), "")], 4)
    assert expr is None and pushed == [] and len(residual) == 1
    # >1000-char value not pushed (:754-757)
    expr, pushed, residual = translate_filters([EqualTo(("Name",), "x" * 1001)], 4)
    assert expr is None and len(residual) == 1


def test_multiple_filters_joined_with_and():
    expr, pushed, residual = translate_filters(
        [EqualTo(("Country",), "Germany"), GreaterThan(("Age",), 21)], 4
    )
    assert expr == "Country eq 'Germany' and Age gt 21"
    assert len(pushed) == 2 and residual == []


def test_mixed_pushed_and_residual():
    expr, pushed, residual = translate_filters(
        [EqualTo(("A",), "x"), EqualTo(("B",), "")], 4
    )
    assert expr == "A eq 'x'"
    assert len(pushed) == 1 and len(residual) == 1


def test_in_becomes_or_chain():
    expr, _, _ = translate_filters([In(("C",), ("a", "b"))], 4)
    assert expr == "(C eq 'a' or C eq 'b')"


def test_not_negates_comparisons():
    # Negated comparisons carry an explicit null exclusion: OData v4
    # evaluates `null ne 1` as TRUE while Spark's NOT(col = 1) drops
    # null rows, and pushed filters are not re-applied engine-side.
    assert t1(Not(EqualTo(("A",), 1)))[0] == "(A ne 1 and A ne null)"
    assert t1(Not(LessThan(("A",), 1)))[0] == "(A ge 1 and A ne null)"
    assert t1(Not(IsNull(("A",))))[0] == "A ne null"


def test_null_value_comparisons_stay_residual():
    # Spark `col = null` / NOT(col = null) match nothing; OData
    # `col eq null` matches null rows. Must not be pushed.
    for f in (EqualTo(("A",), None), GreaterThan(("A",), None),
              Not(EqualTo(("A",), None))):
        expr, pushed, residual = translate_filters([f], 4)
        assert expr is None and pushed == [] and len(residual) == 1


def test_in_skips_null_candidates():
    expr, pushed, _ = translate_filters([In(("C",), ("a", None, "b"))], 4)
    assert expr == "(C eq 'a' or C eq 'b')" and len(pushed) == 1
    # all-null candidate list -> residual (Spark's IN keeps no rows)
    expr, pushed, residual = translate_filters([In(("C",), (None,))], 4)
    assert expr is None and pushed == [] and len(residual) == 1


def test_string_functions_by_version():
    assert t1(StringStartsWith(("N",), "ab"))[0] == "startswith(N, 'ab')"
    assert t1(StringContains(("N",), "ab"))[0] == "contains(N, 'ab')"
    assert t1(StringContains(("N",), "ab"), version=2)[0] == "substringof('ab', N)"


def test_nested_attribute_path():
    expr, _, _ = translate_filters([EqualTo(("Home", "City"), "Berlin")], 4)
    assert expr == "Home/City eq 'Berlin'"
