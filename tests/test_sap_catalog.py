"""SAP Gateway catalog discovery (A7, ODP half of A9) + Excel delete-rows
(B6) against the fixture server."""

import pytest

from erpl_web_spark.core.http import HttpClient
from erpl_web_spark.sources.graph import GraphClient, graph_excel_delete_rows
from erpl_web_spark.sources.sap_catalog import odata_sap_show, odp_odata_show


@pytest.fixture()
def sap_base(fixture_server):
    return fixture_server.base_url + "/sap"


def test_odata_sap_show_merges_v2_and_v4(spark, sap_base):
    df = odata_sap_show(spark, sap_base, http=HttpClient())
    rows = {r["service_id"]: r for r in df.collect()}
    assert set(rows) == {"ZSVC_ORDERS", "ZSVC_PLAIN", "ZSVC_V4_TRAVEL"}
    assert rows["ZSVC_ORDERS"]["version"] == "V2"
    assert rows["ZSVC_ORDERS"]["description"] == "Orders service"
    # Title fallback when Description is absent (reference parity).
    assert rows["ZSVC_PLAIN"]["description"] == "Plain service"
    assert rows["ZSVC_V4_TRAVEL"]["version"] == "V4"
    assert rows["ZSVC_V4_TRAVEL"]["service_url"].endswith("/ztravel")


def test_odp_odata_show_filters_odp_entity_sets(spark, sap_base, fixture_server):
    df = odp_odata_show(spark, sap_base, http=HttpClient())
    rows = sorted(df.collect(), key=lambda r: r["entity_set_id"])
    # Only EntityOf*/FactsOf* pass the prefix filter; PlainSet and the
    # non-ODP service drop out entirely.
    assert [r["entity_set_id"] for r in rows] == ["EntityOfOrders", "FactsOfSales"]
    assert all(r["service_id"] == "ZSVC_ORDERS" for r in rows)
    assert all(r["change_tracking"] is True for r in rows)
    assert rows[0]["entity_set_url"].endswith("/ZSVC_ORDERS/EntityOfOrders")
    # $expand=EntitySets reached the wire.
    req = fixture_server.state.requests_for(
        "/sap/sap/opu/odata/iwfnd/catalogservice;v=2/ServiceCollection")[-1]
    assert req["query"].get("$expand") == "EntitySets"


def test_excel_delete_rows_matching_column(fixture_server):
    client = GraphClient(fixture_server.base_url + "/graph", HttpClient())
    state = fixture_server.state
    state.excel_rows = [["a", 1.0], ["b", 2.0], ["a", 3.0]]
    n = graph_excel_delete_rows(client, "f1", "T1", 0, "a")
    assert n == 2
    assert state.excel_rows == [["b", 2.0]]
    # Session opened for the mutation (write ops require one).
    assert state.excel_sessions


def test_excel_delete_rows_numeric_compare(fixture_server):
    client = GraphClient(fixture_server.base_url + "/graph", HttpClient())
    state = fixture_server.state
    state.excel_rows = [["a", 1.0], ["b", 2.0], ["a", 3.0]]
    # Numeric cells compare via the reference's %.6f rendering.
    n = graph_excel_delete_rows(client, "f1", "T1", 1, "2.000000")
    assert n == 1
    assert state.excel_rows == [["a", 1.0], ["a", 3.0]]


def test_excel_delete_rows_descending_under_index_shift(fixture_server):
    """Every delete shifts all higher row indices down by one (the
    fixture pops from a real list, like the Graph API): a run of
    ADJACENT matches is the worst case, where ascending deletion would
    remove wrong rows and then overrun. Descending deletion (the
    reference's motivation, graph_excel_client.cpp:432-536) leaves
    exactly the non-matching rows."""
    client = GraphClient(fixture_server.base_url + "/graph", HttpClient())
    state = fixture_server.state
    state.excel_rows = [["a", 1.0], ["a", 2.0], ["a", 3.0], ["b", 4.0], ["a", 5.0]]
    n = graph_excel_delete_rows(client, "f1", "T1", 0, "a")
    assert n == 4
    assert state.excel_rows == [["b", 4.0]]


def test_excel_delete_rows_no_match(fixture_server):
    client = GraphClient(fixture_server.base_url + "/graph", HttpClient())
    state = fixture_server.state
    state.excel_rows = [["a", 1.0]]
    assert graph_excel_delete_rows(client, "f1", "T1", 0, "zzz") == 0
    assert state.excel_rows == [["a", 1.0]]
