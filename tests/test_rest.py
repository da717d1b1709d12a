"""Generic REST connector: all four pagination dialects + parallel
offset partitioning, against the fixture server's /rest/* endpoints."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType

from erpl_web_spark.sources.rest import rest_read


def _ids(df):
    return [r.item_id for r in df.orderBy("item_id").collect()]


def test_rest_offset_single_stream(spark, fixture_server):
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/offset-items",
        paginate="offset",
        data_path="items",
        page_size=9,
    )
    assert _ids(df) == list(range(23))
    assert isinstance(df.schema["item_id"].dataType, LongType)
    assert isinstance(df.schema["score"].dataType, DoubleType)


def test_rest_offset_server_capped_page_size(spark, fixture_server):
    """A server that caps page size below the requested limit returns
    'short' full pages; the scan must continue to an empty page instead
    of silently truncating after the first short page."""
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/capped-items",
        paginate="offset",
        data_path="items",
        page_size=20,  # server caps at 5
    )
    assert _ids(df) == list(range(23))


def test_rest_offset_parallel_partitions(spark, fixture_server):
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/offset-items",
        paginate="offset",
        data_path="items",
        total_path="total",
        page_size=5,
        parallelism=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert _ids(df) == list(range(23))
    # disjoint offset ranges hit the server (6-item chunks)
    reqs = [
        r["query"]
        for r in fixture_server.state.log
        if r["path"] == "/rest/offset-items" and "offset" in r.get("query", {})
    ]
    offsets = {int(r["offset"]) for r in reqs}
    assert {0, 6, 12, 18} <= offsets


def test_rest_page_numbers(spark, fixture_server):
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/page-items",
        paginate="page",
        data_path="items",
        page_size=10,
    )
    assert _ids(df) == list(range(23))


def test_rest_cursor(spark, fixture_server):
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/cursor-items",
        paginate="cursor",
        data_path="data.items",
        cursor_path="data.next_cursor",
        page_size=8,
    )
    assert _ids(df) == list(range(23))


def test_rest_link_header(spark, fixture_server):
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/link-items",
        paginate="link",
        data_path="",
    )
    assert _ids(df) == list(range(23))


def test_rest_secret_auth_reaches_wire(spark, fixture_server, secrets_file):
    from erpl_web_spark.core.secrets import SecretRegistry

    reg = SecretRegistry(persist_path=secrets_file)
    reg.create_secret(
        "rest-fx", "http_bearer", scope=fixture_server.base_url + "/rest/",
        token="rest-tok",
    )
    fixture_server.state.log.clear()
    df = rest_read(
        spark,
        fixture_server.base_url + "/rest/offset-items",
        paginate="offset",
        data_path="items",
        page_size=50,
    )
    assert df.count() == 23
    auths = {
        r["headers"].get("Authorization")
        for r in fixture_server.state.log
        if r["path"] == "/rest/offset-items"
    }
    assert auths == {"Bearer rest-tok"}
