import datetime as dt
from decimal import Decimal

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from erpl_web_spark.odata.json_decode import (
    decode_rows,
    decode_value,
    extract_rows_payload,
    next_link,
    total_count,
)


def test_v2_legacy_date_format():
    # /Date(ms)/ truncated to whole seconds (odata_content.cpp:666-677)
    v = decode_value("/Date(1000000123456)/", TimestampType())
    assert v == dt.datetime(2001, 9, 9, 1, 48, 43)
    # with offset suffix
    v2 = decode_value("/Date(1000000000000+0200)/", TimestampType())
    assert v2 == dt.datetime(2001, 9, 9, 1, 46, 40)


def test_iso_and_epoch_timestamps():
    assert decode_value("2023-01-15T10:30:00Z", TimestampType()) == dt.datetime(
        2023, 1, 15, 10, 30
    )
    assert decode_value(1673778600, TimestampType()) == dt.datetime(2023, 1, 15, 10, 30)
    assert decode_value("garbage", TimestampType()) is None  # error -> NULL


def test_lenient_scalar_casts():
    assert decode_value("42", LongType()) == 42
    assert decode_value(42.9, IntegerType()) == 42
    assert decode_value("true", BooleanType()) is True
    assert decode_value(0, BooleanType()) is False
    assert decode_value("12.5", DecimalType(10, 2)) == Decimal("12.5")
    assert decode_value(True, StringType()) == "true"
    assert decode_value("not-a-number", LongType()) is None


def test_nested_struct_and_array():
    schema = StructType([
        StructField("Name", StringType()),
        StructField("Tags", ArrayType(StringType())),
        StructField("Home", StructType([
            StructField("City", StringType()),
            StructField("Zip", IntegerType()),
        ])),
    ])
    rows = decode_rows(
        {"value": [{"Name": "a", "Tags": ["x", "y"], "Home": {"City": "B", "Zip": "10"}}]},
        schema,
    )
    assert rows == [("a", ["x", "y"], ("B", 10))]


def test_v2_nested_collection_results_shape():
    # v2 wraps nested collections in {"results": [...]}
    schema = StructType([StructField("Items", ArrayType(StringType()))])
    rows = decode_rows({"d": {"results": [{"Items": {"results": ["a", "b"]}}]}}, schema)
    assert rows == [(["a", "b"],)]


def test_missing_fields_null_and_meta_exclusion():
    schema = StructType([StructField("A", StringType()), StructField("B", LongType())])
    rows = decode_rows(
        {"d": {"results": [{"A": "x", "__metadata": {"uri": "u"}}]}}, schema
    )
    assert rows == [("x", None)]


def test_payload_shapes_and_links():
    assert extract_rows_payload({"value": [{"a": 1}]}) == [{"a": 1}]
    assert extract_rows_payload({"d": {"results": [{"a": 1}]}}) == [{"a": 1}]
    assert extract_rows_payload({"d": [{"a": 1}]}) == [{"a": 1}]
    assert next_link({"@odata.nextLink": "x"}) == "x"
    assert next_link({"d": {"__next": "y"}}) == "y"
    assert next_link({"value": []}) is None
    assert total_count({"@odata.count": 7}) == 7
    assert total_count({"d": {"__count": "9"}}) == 9
