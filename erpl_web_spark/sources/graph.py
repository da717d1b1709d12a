"""Microsoft Graph connectors: Entra ID, SharePoint lists, Excel
workbooks, Teams, Outlook, Planner (reference A17-A22, B1-B6).

Shapes reproduced from the reference:
- fixed snake_case schemas with camelCase JSON extraction
  (graph_entra_functions.cpp:98, 199, 295, 391; planner :140-298;
  sharepoint :80-243; excel :214-363);
- pagination merges ``value`` arrays across ``@odata.nextLink`` pages
  with a MAX_GRAPH_PAGES=10000 cap (graph_client.cpp:15, 203-245);
- SharePoint list columns typed from facets: number/currency -> DOUBLE,
  boolean -> BOOLEAN, dateTime -> TIMESTAMP, else VARCHAR
  (graph_sharepoint_type_mapper.hpp:16-34);
- Excel usedRange: row 0 = headers; cell types from valueTypes +
  numberFormat (date formats -> TIMESTAMP)
  (graph_excel_functions.cpp:455-515, 70);
- writers are per-row API calls (B1/B2) or batched rows/add with a
  workbook session (B4, graph_excel_client.cpp:103-111).

Discovery/catalog results are small -> driver-built DataFrames. Bulk
item reads use Graph's sequential opaque skiptoken, so the page chain is
protocol-bound (same as the reference); large fan-out writes go through
``http_call`` (executor-parallel).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from erpl_web_spark.core.http import HttpClient
from erpl_web_spark.core.secrets import default_registry
from erpl_web_spark.odata.json_decode import decode_value

MAX_GRAPH_PAGES = 10000
DEFAULT_GRAPH_BASE = "https://graph.microsoft.com/v1.0"


class GraphClient:
    def __init__(self, base_url: str = DEFAULT_GRAPH_BASE, http: HttpClient | None = None):
        self.base_url = base_url.rstrip("/")
        self.http = http or HttpClient(
            auth_headers=default_registry.auth_headers_for_url(self.base_url)
        )

    def get_json(self, path: str) -> Any:
        url = self.base_url + path
        resp = self.http.get(url, headers={"Accept": "application/json"})
        if resp.status >= 400:
            raise RuntimeError(f"Graph HTTP {resp.status} from {url}")
        return resp.json()

    def get_paged_values(self, path: str) -> list[dict]:
        """Merge `value` arrays across @odata.nextLink pages (E6)."""
        url = self.base_url + path
        out: list[dict] = []
        pages = 0
        while url:
            resp = self.http.get(url, headers={"Accept": "application/json"})
            if resp.status >= 400:
                raise RuntimeError(f"Graph HTTP {resp.status} from {url}")
            doc = resp.json()
            out.extend(doc.get("value", []))
            pages += 1
            if pages >= MAX_GRAPH_PAGES:
                break
            url = doc.get("@odata.nextLink")
            if url and url.startswith("/"):
                url = self.base_url + url
        return out

    def request(self, method: str, path: str, body: dict | None = None) -> Any:
        url = self.base_url + path
        resp = self.http.request(
            method, url,
            body=json.dumps(body) if body is not None else None,
            content_type="application/json" if body is not None else None,
        )
        if resp.status >= 400:
            raise RuntimeError(f"Graph HTTP {resp.status} from {url}: {resp.text[:200]}")
        return resp.json() if resp.raw else None


GRAPH_BATCH_MAX_REQUESTS = 20  # Graph JSON-batching hard cap per envelope
GRAPH_BATCH_MAX_BYTES = 1 << 20  # stay well under Graph's 4 MB body limit


def graph_batch_execute(
    client: GraphClient,
    requests: list[dict],
    max_requests: int = GRAPH_BATCH_MAX_REQUESTS,
    max_bytes: int = GRAPH_BATCH_MAX_BYTES,
) -> list[dict]:
    """Coalesce individual Graph calls into ``POST /$batch`` envelopes —
    the request-count lever for bulk writers (generalizing the
    reference's Excel rows/add batching, graph_excel_client.cpp:103-111,
    to every Graph mutation surface).

    ``requests`` are dicts with ``method``, ``url`` (Graph-relative) and
    optional ``body``. Envelopes are cut by a dual budget: at most
    ``max_requests`` subrequests (Graph caps JSON batching at 20) AND at
    most ``max_bytes`` of serialized subrequest JSON — whichever fills
    first — so many small writes coalesce while a few huge ones don't
    blow the service's body limit. Returns one response dict
    ``{"id", "status", "body"}`` per input, in input order.

    Throttling: Graph applies 429/503 PER SUBREQUEST inside a 200
    envelope (the transport-level retry in core.http never sees them),
    so throttled subrequests are collected and re-issued in follow-up
    envelopes — honoring the largest subresponse ``Retry-After`` (capped
    at 30 s) — up to ``throttle_retries`` rounds. Any other failed
    subresponse raises immediately (id + status named) so partial
    failures are attributable, never silent.
    """
    import time as _time

    results: list[dict | None] = [None] * len(requests)

    def run_round(todo: list[int]) -> tuple[list[int], float]:
        """Send ``todo`` (input indices) in budget-cut envelopes; fill
        ``results``; return (throttled indices, max retry-after sec)."""
        throttled: list[int] = []
        retry_after = 0.0
        chunk: list[tuple[int, int]] = []  # (index, size)
        chunk_bytes = 0

        def flush():
            nonlocal chunk, chunk_bytes, retry_after
            if not chunk:
                return
            envelope = {
                "requests": [
                    {
                        "id": str(i),
                        "method": requests[i]["method"],
                        "url": requests[i]["url"],
                        **(
                            {"body": requests[i]["body"],
                             "headers": {"Content-Type": "application/json"}}
                            if requests[i].get("body") is not None
                            else {}
                        ),
                    }
                    for i, _ in chunk
                ]
            }
            doc = client.request("POST", "/$batch", envelope) or {}
            got = {str(resp.get("id")): resp for resp in doc.get("responses", [])}
            for i, _ in chunk:
                resp = got.get(str(i))
                if resp is None:
                    raise RuntimeError(f"Graph $batch dropped response id={i}")
                status = int(resp.get("status", 0))
                if status in (429, 503):
                    throttled.append(i)
                    headers = {
                        str(k).lower(): v
                        for k, v in (resp.get("headers") or {}).items()
                    }
                    try:
                        retry_after = max(retry_after, float(headers.get("retry-after", 0)))
                    except (TypeError, ValueError):
                        pass
                elif status >= 400:
                    raise RuntimeError(
                        f"Graph $batch subrequest id={i} failed with "
                        f"HTTP {status}: {str(resp.get('body'))[:200]}"
                    )
                else:
                    results[i] = resp
            chunk, chunk_bytes = [], 0

        for i in todo:
            size = len(json.dumps(requests[i], default=str))
            if chunk and (len(chunk) >= max_requests or chunk_bytes + size > max_bytes):
                flush()
            chunk.append((i, size))
            chunk_bytes += size
        flush()
        return throttled, retry_after

    todo = list(range(len(requests)))
    throttle_retries = 3
    for attempt in range(throttle_retries + 1):
        todo, retry_after = run_round(todo)
        if not todo:
            break
        if attempt == throttle_retries:
            raise RuntimeError(
                f"Graph $batch: {len(todo)} subrequests still throttled (429/503) "
                f"after {throttle_retries} retry rounds"
            )
        _time.sleep(min(retry_after, 30.0))
    return results  # type: ignore[return-value]


def _ts(v):
    return decode_value(v, TimestampType())


def _rows_df(spark: SparkSession, rows: list[tuple], schema: StructType) -> DataFrame:
    return spark.createDataFrame(rows, schema)


def _schema(*fields: tuple[str, Any]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# -- Entra ID (A17) ---------------------------------------------------------

USERS_SCHEMA = _schema(
    ("id", StringType()), ("display_name", StringType()),
    ("user_principal_name", StringType()), ("mail", StringType()),
    ("job_title", StringType()), ("department", StringType()),
    ("account_enabled", BooleanType()),
)


def graph_users(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/users")
    rows = [
        (i.get("id"), i.get("displayName"), i.get("userPrincipalName"),
         i.get("mail"), i.get("jobTitle"), i.get("department"),
         i.get("accountEnabled"))
        for i in items
    ]
    return _rows_df(spark, rows, USERS_SCHEMA)


GROUPS_SCHEMA = _schema(
    ("id", StringType()), ("display_name", StringType()),
    ("description", StringType()), ("mail", StringType()),
    ("mail_enabled", BooleanType()), ("security_enabled", BooleanType()),
)


def graph_groups(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/groups")
    rows = [
        (i.get("id"), i.get("displayName"), i.get("description"), i.get("mail"),
         i.get("mailEnabled"), i.get("securityEnabled"))
        for i in items
    ]
    return _rows_df(spark, rows, GROUPS_SCHEMA)


DEVICES_SCHEMA = _schema(
    ("id", StringType()), ("display_name", StringType()),
    ("operating_system", StringType()), ("os_version", StringType()),
    ("trust_type", StringType()), ("account_enabled", BooleanType()),
)


def graph_devices(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/devices")
    rows = [
        (i.get("id"), i.get("displayName"), i.get("operatingSystem"),
         i.get("operatingSystemVersion"), i.get("trustType"), i.get("accountEnabled"))
        for i in items
    ]
    return _rows_df(spark, rows, DEVICES_SCHEMA)


SIGNIN_SCHEMA = _schema(
    ("id", StringType()), ("user_display_name", StringType()),
    ("user_principal_name", StringType()), ("app_display_name", StringType()),
    ("ip_address", StringType()), ("created_datetime", TimestampType()),
    ("status", StringType()),
)


def graph_signin_logs(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/auditLogs/signIns")
    rows = [
        (i.get("id"), i.get("userDisplayName"), i.get("userPrincipalName"),
         i.get("appDisplayName"), i.get("ipAddress"), _ts(i.get("createdDateTime")),
         json.dumps(i.get("status")) if i.get("status") is not None else None)
        for i in items
    ]
    return _rows_df(spark, rows, SIGNIN_SCHEMA)


# -- SharePoint (A18, B2) ---------------------------------------------------

SITES_SCHEMA = _schema(
    ("id", StringType()), ("name", StringType()), ("display_name", StringType()),
    ("web_url", StringType()), ("created_at", TimestampType()),
)


def graph_show_sites(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/sites?search=*")
    rows = [
        (i.get("id"), i.get("name"), i.get("displayName"), i.get("webUrl"),
         _ts(i.get("createdDateTime")))
        for i in items
    ]
    return _rows_df(spark, rows, SITES_SCHEMA)


DRIVES_SCHEMA = _schema(
    ("id", StringType()), ("name", StringType()), ("drive_type", StringType()),
    ("web_url", StringType()), ("created_at", TimestampType()),
    ("modified_at", TimestampType()),
)


def graph_show_drives(spark: SparkSession, client: GraphClient, site_id: str) -> DataFrame:
    items = client.get_paged_values(f"/sites/{site_id}/drives")
    rows = [
        (i.get("id"), i.get("name"), i.get("driveType"), i.get("webUrl"),
         _ts(i.get("createdDateTime")), _ts(i.get("lastModifiedDateTime")))
        for i in items
    ]
    return _rows_df(spark, rows, DRIVES_SCHEMA)


LISTS_SCHEMA = _schema(
    ("id", StringType()), ("name", StringType()), ("display_name", StringType()),
    ("description", StringType()), ("web_url", StringType()),
    ("created_at", TimestampType()), ("modified_at", TimestampType()),
)


def graph_show_lists(spark: SparkSession, client: GraphClient, site_id: str) -> DataFrame:
    items = client.get_paged_values(f"/sites/{site_id}/lists")
    rows = [
        (i.get("id"), i.get("name"), i.get("displayName"), i.get("description"),
         i.get("webUrl"), _ts(i.get("createdDateTime")), _ts(i.get("lastModifiedDateTime")))
        for i in items
    ]
    return _rows_df(spark, rows, LISTS_SCHEMA)


def sharepoint_column_type(col: dict):
    """Facet -> Spark type (graph_sharepoint_type_mapper.hpp:16-34)."""
    if "number" in col or "currency" in col:
        return DoubleType()
    if "boolean" in col:
        return BooleanType()
    if "dateTime" in col:
        return TimestampType()
    return StringType()


def graph_describe_list(
    spark: SparkSession, client: GraphClient, site_id: str, list_id: str
) -> DataFrame:
    cols = client.get_paged_values(f"/sites/{site_id}/lists/{list_id}/columns")
    schema = _schema(
        ("name", StringType()), ("display_name", StringType()),
        ("column_type", StringType()), ("description", StringType()),
        ("required", BooleanType()),
    )
    rows = [
        (c.get("name"), c.get("displayName"),
         sharepoint_column_type(c).simpleString(), c.get("description"),
         c.get("required"))
        for c in cols
    ]
    return _rows_df(spark, rows, schema)


def graph_list_items(
    spark: SparkSession, client: GraphClient, site_id: str, list_id: str
) -> DataFrame:
    """Typed list items: columns from facets, values from fields."""
    cols = client.get_paged_values(f"/sites/{site_id}/lists/{list_id}/columns")
    cols = [c for c in cols if not c.get("readOnly") or c.get("name") == "Title"]
    fields = [StructField("id", StringType(), True)] + [
        StructField(c["name"], sharepoint_column_type(c), True) for c in cols
    ]
    schema = StructType(fields)
    items = client.get_paged_values(f"/sites/{site_id}/lists/{list_id}/items?expand=fields")
    rows = []
    for it in items:
        f = it.get("fields", {})
        rows.append(
            (it.get("id"),)
            + tuple(decode_value(f.get(c["name"]), fl.dataType)
                    for c, fl in zip(cols, fields[1:]))
        )
    return _rows_df(spark, rows, schema)


def graph_sharepoint_create_item(
    client: GraphClient, site_id: str, list_id: str, fields: dict
) -> str:
    doc = client.request("POST", f"/sites/{site_id}/lists/{list_id}/items",
                         {"fields": fields})
    return doc.get("id")


def graph_sharepoint_update_item(
    client: GraphClient, site_id: str, list_id: str, item_id: str, fields: dict
) -> None:
    client.request("PATCH", f"/sites/{site_id}/lists/{list_id}/items/{item_id}/fields",
                   fields)


def graph_sharepoint_delete_item(
    client: GraphClient, site_id: str, list_id: str, item_id: str
) -> None:
    client.request("DELETE", f"/sites/{site_id}/lists/{list_id}/items/{item_id}")


def sharepoint_list_write(
    df: DataFrame,
    client_factory,
    site_id: str,
    list_id: str,
    batch_log: bool = False,
    batch_size: int = GRAPH_BATCH_MAX_REQUESTS,
    batch_max_bytes: int = GRAPH_BATCH_MAX_BYTES,
) -> int:
    """Bulk copy into a SharePoint list (B3 COPY TO analogue), executed
    on the executors via foreachPartition. Creates are coalesced into
    ``$batch`` envelopes (``graph_batch_execute``) under a dual budget
    of ``batch_size`` requests / ``batch_max_bytes`` serialized bytes
    per HTTP call; ``batch_size=1`` degrades to the reference's per-row
    POSTs (B3)."""
    cols = df.columns

    def write_partition(rows):
        client = client_factory()
        reqs = [
            {
                "method": "POST",
                "url": f"/sites/{site_id}/lists/{list_id}/items",
                "body": {"fields": {c: r[c] for c in cols if r[c] is not None}},
            }
            for r in rows
        ]
        if not reqs:
            return
        if batch_size <= 1:
            for r in reqs:
                client.request(r["method"], r["url"], r["body"])
        else:
            graph_batch_execute(
                client, reqs, max_requests=batch_size, max_bytes=batch_max_bytes
            )

    df.foreachPartition(write_partition)
    return len(cols)


def sharepoint_list_update(
    df: DataFrame,
    client_factory,
    site_id: str,
    list_id: str,
    id_col: str = "item_id",
    batch_size: int = GRAPH_BATCH_MAX_REQUESTS,
    batch_max_bytes: int = GRAPH_BATCH_MAX_BYTES,
) -> None:
    """Bulk field updates against a SharePoint list (B2 UPDATE as a
    distributed write): one PATCH per row, coalesced into ``$batch``
    envelopes exactly like ``sharepoint_list_write``; ``batch_size=1``
    degrades to the reference's per-item PATCH
    (sharepoint_functions.cpp update path).

    Unlike create, a None value is SENT as an explicit JSON null —
    PATCH semantics distinguish "clear this field" from "leave it
    alone" (omit the column from the DataFrame to leave it alone);
    silently dropping Nones would make null cells unclearable."""
    field_cols = [c for c in df.columns if c != id_col]

    def update_partition(rows):
        client = client_factory()
        reqs = [
            {
                "method": "PATCH",
                "url": f"/sites/{site_id}/lists/{list_id}/items/{r[id_col]}/fields",
                "body": {c: r[c] for c in field_cols},
            }
            for r in rows
        ]
        if not reqs:
            return
        if batch_size <= 1:
            for r in reqs:
                client.request(r["method"], r["url"], r["body"])
        else:
            graph_batch_execute(
                client, reqs, max_requests=batch_size, max_bytes=batch_max_bytes
            )

    df.foreachPartition(update_partition)


def sharepoint_list_delete(
    df: DataFrame,
    client_factory,
    site_id: str,
    list_id: str,
    id_col: str = "item_id",
    batch_size: int = GRAPH_BATCH_MAX_REQUESTS,
) -> None:
    """Bulk deletes against a SharePoint list (B2 DELETE as a
    distributed write): one DELETE per id, coalesced into ``$batch``
    envelopes; ``batch_size=1`` degrades to per-item DELETEs."""

    def delete_partition(rows):
        client = client_factory()
        reqs = [
            {
                "method": "DELETE",
                "url": f"/sites/{site_id}/lists/{list_id}/items/{r[id_col]}",
            }
            for r in rows
        ]
        if not reqs:
            return
        if batch_size <= 1:
            for r in reqs:
                client.request(r["method"], r["url"], None)
        else:
            graph_batch_execute(client, reqs, max_requests=batch_size)

    df.foreachPartition(delete_partition)


# -- Excel over Graph (A19, B4-B6) -----------------------------------------

FILES_SCHEMA = _schema(
    ("id", StringType()), ("name", StringType()), ("web_url", StringType()),
    ("size", StringType()), ("created_at", TimestampType()),
    ("modified_at", TimestampType()), ("mime_type", StringType()),
    ("is_folder", BooleanType()),
)


def graph_list_files(spark: SparkSession, client: GraphClient, path: str = "") -> DataFrame:
    route = f"/me/drive/root/children" if not path else f"/me/drive/root:/{path}:/children"
    items = client.get_paged_values(route)
    rows = [
        (i.get("id"), i.get("name"), i.get("webUrl"), str(i.get("size")),
         _ts(i.get("createdDateTime")), _ts(i.get("lastModifiedDateTime")),
         (i.get("file") or {}).get("mimeType"), "folder" in i)
        for i in items
    ]
    return _rows_df(spark, rows, FILES_SCHEMA)


def graph_excel_worksheets(spark: SparkSession, client: GraphClient, file_id: str) -> DataFrame:
    items = client.get_paged_values(f"/me/drive/items/{file_id}/workbook/worksheets")
    schema = _schema(("name", StringType()), ("id", StringType()),
                     ("position", StringType()), ("visibility", StringType()))
    rows = [(i.get("name"), i.get("id"), str(i.get("position")), i.get("visibility"))
            for i in items]
    return _rows_df(spark, rows, schema)


def graph_excel_tables(spark: SparkSession, client: GraphClient, file_id: str) -> DataFrame:
    items = client.get_paged_values(f"/me/drive/items/{file_id}/workbook/tables")
    schema = _schema(("name", StringType()), ("id", StringType()),
                     ("show_headers", BooleanType()), ("show_totals", BooleanType()))
    rows = [(i.get("name"), i.get("id"), i.get("showHeaders"), i.get("showTotals"))
            for i in items]
    return _rows_df(spark, rows, schema)


_DATE_FORMAT_HINTS = ("yy", "mm", "dd", "h:", "hh")


def _excel_grid_to_df(spark: SparkSession, doc: dict) -> DataFrame:
    """usedRange grid -> DataFrame: row 0 = headers, types inferred from
    valueTypes + numberFormat (dates detected via format string)."""
    values = doc.get("values") or []
    if not values:
        return spark.createDataFrame([], StructType([]))
    headers = [str(h) for h in values[0]]
    vtypes = doc.get("valueTypes") or []
    formats = doc.get("numberFormat") or []

    def col_type(ci: int):
        seen = {r[ci] for r in vtypes[1:] if ci < len(r)} if vtypes else set()
        fmt = ""
        if len(formats) > 1 and ci < len(formats[1]):
            fmt = str(formats[1][ci]).lower()
        if any(h in fmt for h in _DATE_FORMAT_HINTS) and "general" not in fmt:
            return TimestampType()
        if seen <= {"Double", "Integer"} and seen:
            return DoubleType()
        if seen == {"Boolean"}:
            return BooleanType()
        return StringType()

    types = [col_type(i) for i in range(len(headers))]
    schema = StructType(
        [StructField(h or f"col{i}", t, True) for i, (h, t) in enumerate(zip(headers, types))]
    )
    rows = []
    for r in values[1:]:
        rows.append(tuple(decode_value(v, t) for v, t in zip(r, types)))
    return spark.createDataFrame(rows, schema)


def graph_excel_table_data(
    spark: SparkSession, client: GraphClient, file_id: str, table: str
) -> DataFrame:
    doc = client.get_json(
        f"/me/drive/items/{file_id}/workbook/tables/{table}/range"
    )
    return _excel_grid_to_df(spark, doc)


def graph_excel_range(
    spark: SparkSession, client: GraphClient, file_id: str, sheet: str
) -> DataFrame:
    doc = client.get_json(
        f"/me/drive/items/{file_id}/workbook/worksheets/{sheet}/usedRange"
    )
    return _excel_grid_to_df(spark, doc)


def excel_table_append(
    client: GraphClient, file_id: str, table: str, rows: list[list], batch_size: int = 100
) -> int:
    """Bulk append via workbook session + rows/add batches (B4;
    graph_excel_client.cpp:103-111)."""
    sess = client.request("POST", f"/me/drive/items/{file_id}/workbook/createSession",
                          {"persistChanges": True})
    session_id = (sess or {}).get("id", "")
    n = 0
    try:
        for i in range(0, len(rows), batch_size):
            batch = rows[i:i + batch_size]
            client.request(
                "POST",
                f"/me/drive/items/{file_id}/workbook/tables/{table}/rows/add",
                {"values": batch, "sessionId": session_id},
            )
            n += len(batch)
    finally:
        client.request("POST", f"/me/drive/items/{file_id}/workbook/closeSession",
                       {"sessionId": session_id})
    return n


def graph_excel_delete_rows(
    client: GraphClient, file_id: str, table: str, col_index: int, col_value: str
) -> int:
    """Delete every table row whose ``col_index`` cell equals ``col_value``
    (string-compared, like the reference); returns the deleted count (B6;
    graph_excel_client.cpp:432-536). Runs inside a workbook session and
    deletes from the highest row index down so indices never shift."""
    sess = client.request("POST", f"/me/drive/items/{file_id}/workbook/createSession",
                          {"persistChanges": True})
    session_id = (sess or {}).get("id", "")
    base = f"/me/drive/items/{file_id}/workbook/tables/{table}"
    try:
        matching: list[int] = []
        for row in client.get_paged_values(f"{base}/rows"):
            values = row.get("values") or [[]]
            cells = values[0] if values else []
            if col_index >= len(cells):
                continue
            cell = cells[col_index]
            cell_str = f"{float(cell):.6f}" if isinstance(cell, (int, float)) and not isinstance(cell, bool) else str(cell)
            if cell_str == col_value:
                matching.append(int(row.get("index", -1)))
        for idx in sorted(matching, reverse=True):
            client.request(
                "POST", f"{base}/rows/itemAt(index={idx})/delete", {"sessionId": session_id}
            )
        return len(matching)
    finally:
        client.request("POST", f"/me/drive/items/{file_id}/workbook/closeSession",
                       {"sessionId": session_id})


def excel_table_write(df: DataFrame, client_factory, file_id: str, table: str) -> int:
    """``df.write``-style bulk append: collect per partition on executors,
    batch rows/add calls."""
    def write_partition(rows):
        client = client_factory()
        buf = [list(r) for r in rows]
        if buf:
            excel_table_append(client, file_id, table, buf)

    df.foreachPartition(write_partition)
    return len(df.columns)


# -- Teams (A20) ------------------------------------------------------------

def graph_my_teams(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/me/joinedTeams")
    schema = _schema(("id", StringType()), ("display_name", StringType()),
                     ("description", StringType()))
    return _rows_df(
        spark,
        [(i.get("id"), i.get("displayName"), i.get("description")) for i in items],
        schema,
    )


def graph_team_channels(spark: SparkSession, client: GraphClient, team_id: str) -> DataFrame:
    items = client.get_paged_values(f"/teams/{team_id}/channels")
    schema = _schema(("id", StringType()), ("display_name", StringType()),
                     ("description", StringType()), ("membership_type", StringType()))
    return _rows_df(
        spark,
        [(i.get("id"), i.get("displayName"), i.get("description"),
          i.get("membershipType")) for i in items],
        schema,
    )


def graph_team_members(spark: SparkSession, client: GraphClient, team_id: str) -> DataFrame:
    items = client.get_paged_values(f"/teams/{team_id}/members")
    schema = _schema(("id", StringType()), ("display_name", StringType()),
                     ("email", StringType()), ("roles", StringType()))
    return _rows_df(
        spark,
        [(i.get("id"), i.get("displayName"), i.get("email"),
          json.dumps(i.get("roles", []))) for i in items],
        schema,
    )


def graph_channel_messages(
    spark: SparkSession, client: GraphClient, team_id: str, channel_id: str
) -> DataFrame:
    items = client.get_paged_values(f"/teams/{team_id}/channels/{channel_id}/messages")
    schema = _schema(("id", StringType()), ("from_user", StringType()),
                     ("created_at", TimestampType()), ("content", StringType()))
    rows = [
        (i.get("id"),
         ((i.get("from") or {}).get("user") or {}).get("displayName"),
         _ts(i.get("createdDateTime")),
         (i.get("body") or {}).get("content"))
        for i in items
    ]
    return _rows_df(spark, rows, schema)


# -- Outlook (A21) ----------------------------------------------------------

def graph_calendars(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/me/calendars")
    schema = _schema(("id", StringType()), ("name", StringType()),
                     ("owner", StringType()), ("can_edit", BooleanType()))
    rows = [(i.get("id"), i.get("name"),
             (i.get("owner") or {}).get("address"), i.get("canEdit")) for i in items]
    return _rows_df(spark, rows, schema)


def graph_calendar_events(
    spark: SparkSession, client: GraphClient,
    start_date: str | None = None, end_date: str | None = None,
) -> DataFrame:
    if start_date and end_date:
        path = f"/me/calendarView?startDateTime={start_date}&endDateTime={end_date}"
    else:
        path = "/me/events"
    items = client.get_paged_values(path)
    schema = _schema(("id", StringType()), ("subject", StringType()),
                     ("start_at", TimestampType()), ("end_at", TimestampType()),
                     ("organizer", StringType()), ("location", StringType()))
    rows = [
        (i.get("id"), i.get("subject"),
         _ts((i.get("start") or {}).get("dateTime")),
         _ts((i.get("end") or {}).get("dateTime")),
         (((i.get("organizer") or {}).get("emailAddress")) or {}).get("address"),
         (i.get("location") or {}).get("displayName"))
        for i in items
    ]
    return _rows_df(spark, rows, schema)


def graph_contacts(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/me/contacts")
    schema = _schema(("id", StringType()), ("display_name", StringType()),
                     ("email", StringType()), ("company", StringType()))
    rows = [
        (i.get("id"), i.get("displayName"),
         (i.get("emailAddresses") or [{}])[0].get("address"),
         i.get("companyName"))
        for i in items
    ]
    return _rows_df(spark, rows, schema)


def graph_mail_folders(spark: SparkSession, client: GraphClient) -> DataFrame:
    items = client.get_paged_values("/me/mailFolders")
    schema = _schema(("id", StringType()), ("display_name", StringType()),
                     ("total_items", StringType()), ("unread_items", StringType()))
    rows = [(i.get("id"), i.get("displayName"), str(i.get("totalItemCount")),
             str(i.get("unreadItemCount"))) for i in items]
    return _rows_df(spark, rows, schema)


def graph_messages(
    spark: SparkSession, client: GraphClient, folder: str | None = None
) -> DataFrame:
    path = f"/me/mailFolders/{folder}/messages" if folder else "/me/messages"
    items = client.get_paged_values(path)
    schema = _schema(("id", StringType()), ("subject", StringType()),
                     ("from_address", StringType()), ("received_at", TimestampType()),
                     ("is_read", BooleanType()), ("body_preview", StringType()))
    rows = [
        (i.get("id"), i.get("subject"),
         (((i.get("from") or {}).get("emailAddress")) or {}).get("address"),
         _ts(i.get("receivedDateTime")), i.get("isRead"), i.get("bodyPreview"))
        for i in items
    ]
    return _rows_df(spark, rows, schema)


# -- Planner (A22, B1) ------------------------------------------------------

def graph_planner_plans(spark: SparkSession, client: GraphClient, group_id: str) -> DataFrame:
    items = client.get_paged_values(f"/groups/{group_id}/planner/plans")
    schema = _schema(("id", StringType()), ("title", StringType()),
                     ("owner_group_id", StringType()), ("created_at", TimestampType()))
    rows = [(i.get("id"), i.get("title"), i.get("owner"),
             _ts(i.get("createdDateTime"))) for i in items]
    return _rows_df(spark, rows, schema)


def graph_planner_buckets(spark: SparkSession, client: GraphClient, plan_id: str) -> DataFrame:
    items = client.get_paged_values(f"/planner/plans/{plan_id}/buckets")
    schema = _schema(("id", StringType()), ("name", StringType()),
                     ("plan_id", StringType()), ("order_hint", StringType()))
    rows = [(i.get("id"), i.get("name"), i.get("planId"), i.get("orderHint"))
            for i in items]
    return _rows_df(spark, rows, schema)


def graph_planner_tasks(spark: SparkSession, client: GraphClient, plan_id: str) -> DataFrame:
    items = client.get_paged_values(f"/planner/plans/{plan_id}/tasks")
    schema = _schema(("id", StringType()), ("title", StringType()),
                     ("bucket_id", StringType()), ("plan_id", StringType()),
                     ("percent_complete", StringType()), ("priority", StringType()),
                     ("due_at", TimestampType()))
    rows = [
        (i.get("id"), i.get("title"), i.get("bucketId"), i.get("planId"),
         str(i.get("percentComplete")), str(i.get("priority")),
         _ts(i.get("dueDateTime")))
        for i in items
    ]
    return _rows_df(spark, rows, schema)


def graph_planner_create_task(
    client: GraphClient, plan_id: str, title: str,
    bucket_id: str | None = None, due_date: str | None = None,
) -> tuple[str, str]:
    """One POST -> (task_id, task_url) (B1). Bulk creation over a
    DataFrame goes through http_call, the lateral-join idiom."""
    body: dict = {"planId": plan_id, "title": title}
    if bucket_id:
        body["bucketId"] = bucket_id
    if due_date:
        body["dueDateTime"] = due_date
    doc = client.request("POST", "/planner/tasks", body)
    task_id = doc.get("id", "")
    return task_id, f"{client.base_url}/planner/tasks/{task_id}"


def planner_create_tasks(
    df: DataFrame, client_factory, plan_id: str,
    title_col: str = "title", bucket_col: str | None = None,
    batch_size: int = GRAPH_BATCH_MAX_REQUESTS,
) -> "DataFrame":
    """Bulk task creation from a DataFrame — the reference's LATERAL-join
    bulk-write idiom (README.md:753-780) as a distributed map, with the
    per-row POSTs coalesced into ``$batch`` envelopes (up to
    ``batch_size`` creates per HTTP call; 1 degrades to per-row). One
    (title, task_id, task_url) result row comes back per input row, so
    failures are attributable, not silent. ``client_factory`` must close
    over serializable config only.
    """
    import pandas as pd

    spark_cols = [title_col] + ([bucket_col] if bucket_col else [])
    src = df.select(*spark_cols)

    def create(batches):
        client = client_factory()
        for pdf in batches:
            reqs = []
            for _, row in pdf.iterrows():
                body: dict = {"planId": plan_id, "title": str(row[title_col])}
                if bucket_col:
                    body["bucketId"] = str(row[bucket_col])
                reqs.append({"method": "POST", "url": "/planner/tasks", "body": body})
            if batch_size <= 1:
                docs = [client.request(r["method"], r["url"], r["body"]) for r in reqs]
            else:
                docs = [
                    resp.get("body") or {}
                    for resp in graph_batch_execute(client, reqs, max_requests=batch_size)
                ]
            ids = [d.get("id", "") for d in docs]
            urls = [f"{client.base_url}/planner/tasks/{i}" for i in ids]
            out = pd.DataFrame({"title": pdf[title_col].astype(str),
                                "task_id": ids, "task_url": urls})
            yield out

    return src.mapInPandas(create, "title string, task_id string, task_url string")


def _delta_sync(
    client: GraphClient, path: str, state_key: str, state_dir: str
) -> list[dict]:
    """Shared Graph /delta token machinery (mirrors sources/odp.py):
    walk @odata.nextLink pages, commit the @odata.deltaLink only after
    the last page, 410 on an expired token -> drop state and reload."""
    import json as _json
    import os

    os.makedirs(state_dir, exist_ok=True)
    state_path = os.path.join(state_dir, f"{state_key}.json")
    delta_link = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            delta_link = _json.load(f).get("delta_link")

    url = delta_link or (client.base_url + path)
    items: list[dict] = []
    new_delta = None
    pages = 0
    while url:
        resp = client.http.get(url, headers={"Accept": "application/json"})
        if resp.status == 410 and delta_link:
            os.remove(state_path)
            return _delta_sync(client, path, state_key, state_dir)
        if resp.status >= 400:
            raise RuntimeError(f"Graph delta HTTP {resp.status} from {url}")
        doc = resp.json()
        items.extend(doc.get("value", []))
        pages += 1
        # Capture this page's cursor BEFORE any cap check: losing it
        # would restart the walk from scratch next sync and never make
        # progress on directories larger than the page cap.
        nxt = doc.get("@odata.nextLink")
        new_delta = doc.get("@odata.deltaLink") or new_delta
        url = client.base_url + nxt if nxt and nxt.startswith("/") else nxt
        if pages >= MAX_GRAPH_PAGES and url:
            # Cap hit mid-walk: persist the nextLink as a resumable
            # cursor (Graph next links resume the same delta walk), so
            # the following sync continues instead of re-delivering.
            new_delta = url
            break

    if new_delta:
        if new_delta.startswith("/"):
            new_delta = client.base_url + new_delta
        with open(state_path, "w") as f:
            _json.dump({"delta_link": new_delta}, f)
    return items


def graph_users_delta(
    spark: SparkSession, client: GraphClient, state_dir: str
) -> DataFrame:
    """Incremental Entra users via Graph ``/users/delta`` — the Graph
    family's CDC surface (beyond the reference, which implements delta
    replication only for SAP ODP).

    First call returns the full directory (change_op 'U' per row);
    subsequent calls return only changes — updated rows as 'U', tombstones
    (``@removed`` markers) as 'D' with only the id populated. Feed the
    result straight into ``operators.cdc.apply_cdc_changes`` keyed on id
    to maintain a directory snapshot.
    """
    items = _delta_sync(client, "/users/delta", "graph_users_delta", state_dir)
    rows = [
        (i.get("id"), i.get("displayName"), i.get("userPrincipalName"),
         i.get("mail"), i.get("jobTitle"), i.get("department"),
         i.get("accountEnabled"), "D" if "@removed" in i else "U")
        for i in items
    ]
    schema = StructType(
        USERS_SCHEMA.fields + [StructField("change_op", StringType())]
    )
    return _rows_df(spark, rows, schema)


def graph_groups_delta(
    spark: SparkSession, client: GraphClient, state_dir: str
) -> DataFrame:
    """Incremental Entra groups via ``/groups/delta`` — same token
    machinery and change_op convention as ``graph_users_delta``."""
    items = _delta_sync(client, "/groups/delta", "graph_groups_delta", state_dir)
    rows = [
        (i.get("id"), i.get("displayName"), i.get("description"),
         i.get("mail"), i.get("mailEnabled"), i.get("securityEnabled"),
         "D" if "@removed" in i else "U")
        for i in items
    ]
    schema = StructType(
        GROUPS_SCHEMA.fields + [StructField("change_op", StringType())]
    )
    return _rows_df(spark, rows, schema)


def graph_list_items_delta(
    spark: SparkSession,
    client: GraphClient,
    site_id: str,
    list_id: str,
    state_dir: str,
) -> DataFrame:
    """Incremental SharePoint list rows via ``/items/delta`` — the third
    Graph delta surface (users, groups, list items), same token
    machinery and change_op convention. Columns type from the list's
    facets exactly as ``graph_list_items``; tombstones carry only the
    id. Feed ``operators.cdc.apply_cdc_changes`` keyed on id to
    maintain a list snapshot without re-reading the whole list."""
    cols = client.get_paged_values(f"/sites/{site_id}/lists/{list_id}/columns")
    cols = [c for c in cols if not c.get("readOnly") or c.get("name") == "Title"]
    fields = [StructField("id", StringType(), True)] + [
        StructField(c["name"], sharepoint_column_type(c), True) for c in cols
    ]
    items = _delta_sync(
        client,
        f"/sites/{site_id}/lists/{list_id}/items/delta?expand=fields",
        f"graph_list_items_delta_{site_id}_{list_id}",
        state_dir,
    )
    rows = []
    for it in items:
        removed = "@removed" in it
        f = it.get("fields", {})
        rows.append(
            (it.get("id"),)
            + tuple(
                None if removed else decode_value(f.get(c["name"]), fl.dataType)
                for c, fl in zip(cols, fields[1:])
            )
            + ("D" if removed else "U",)
        )
    schema = StructType(fields + [StructField("change_op", StringType())])
    return _rows_df(spark, rows, schema)
