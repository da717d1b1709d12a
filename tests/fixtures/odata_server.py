"""Local fixture HTTP server emulating OData v2/v4 services + misc HTTP
behaviors (redirects, retry statuses, charsets, binary) for tests.

Equivalent in role to the reference's checked-in EDMX fixtures and
sqllogictests against public services (SURVEY.md §5) — regenerated, not
copied. Records every request (path + parsed query) so tests can assert
pushdown reached the server ($filter/$select/$top observable in the log).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

PAGE_SIZE = 3

EDMX_V4 = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
  <edmx:DataServices>
    <Schema Namespace="Fixture" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      <EnumType Name="Segment">
        <Member Name="Retail" Value="0"/>
        <Member Name="Wholesale" Value="1"/>
      </EnumType>
      <ComplexType Name="Address">
        <Property Name="Street" Type="Edm.String"/>
        <Property Name="City" Type="Fixture.City"/>
      </ComplexType>
      <ComplexType Name="City">
        <Property Name="Name" Type="Edm.String"/>
        <Property Name="Country" Type="Edm.String"/>
      </ComplexType>
      <EntityType Name="Person">
        <Key><PropertyRef Name="UserName"/></Key>
        <Property Name="UserName" Type="Edm.String" Nullable="false"/>
        <Property Name="FirstName" Type="Edm.String" Nullable="false"/>
        <Property Name="Age" Type="Edm.Int64"/>
        <Property Name="Balance" Type="Edm.Decimal" Precision="19" Scale="4"/>
        <Property Name="Score" Type="Edm.Double"/>
        <Property Name="Active" Type="Edm.Boolean"/>
        <Property Name="Joined" Type="Edm.DateTimeOffset"/>
        <Property Name="Emails" Type="Collection(Edm.String)"/>
        <Property Name="HomeAddress" Type="Fixture.Address"/>
        <Property Name="Segment" Type="Fixture.Segment"/>
        <NavigationProperty Name="Orders" Type="Collection(Fixture.Order)"/>
      </EntityType>
      <EntityType Name="Order">
        <Key><PropertyRef Name="OrderID"/></Key>
        <Property Name="OrderID" Type="Edm.Int32" Nullable="false"/>
        <Property Name="UserName" Type="Edm.String"/>
        <Property Name="Amount" Type="Edm.Decimal" Precision="19" Scale="4"/>
        <Property Name="Placed" Type="Edm.DateTimeOffset"/>
      </EntityType>
      <EntityContainer Name="Container">
        <EntitySet Name="People" EntityType="Fixture.Person"/>
        <EntitySet Name="Orders" EntityType="Fixture.Order"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>
"""

EDMX_V2 = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="1.0" xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx">
  <edmx:DataServices m:DataServiceVersion="2.0"
      xmlns:m="http://schemas.microsoft.com/ado/2007/08/dataservices/metadata">
    <Schema Namespace="NW" xmlns="http://schemas.microsoft.com/ado/2009/11/edm">
      <EntityType Name="Customer">
        <Key><PropertyRef Name="CustomerID"/></Key>
        <Property Name="CustomerID" Type="Edm.String" Nullable="false" MaxLength="5"/>
        <Property Name="CompanyName" Type="Edm.String" Nullable="false" MaxLength="40"/>
        <Property Name="Country" Type="Edm.String" MaxLength="15"/>
        <Property Name="Founded" Type="Edm.DateTime"/>
        <NavigationProperty Name="Orders" Relationship="NW.FK_Orders_Customers"
            ToRole="Orders" FromRole="Customers"/>
      </EntityType>
      <EntityType Name="Order">
        <Key><PropertyRef Name="OrderID"/></Key>
        <Property Name="OrderID" Type="Edm.Int32" Nullable="false"/>
        <Property Name="CustomerID" Type="Edm.String" MaxLength="5"/>
        <Property Name="Freight" Type="Edm.Decimal" Precision="19" Scale="4"/>
      </EntityType>
      <Association Name="FK_Orders_Customers">
        <End Role="Customers" Type="NW.Customer" Multiplicity="1"/>
        <End Role="Orders" Type="NW.Order" Multiplicity="*"/>
      </Association>
      <EntityContainer Name="NWEntities" m:IsDefaultEntityContainer="true">
        <EntitySet Name="Customers" EntityType="NW.Customer"/>
        <EntitySet Name="Orders" EntityType="NW.Order"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>
"""

PEOPLE = [
    {
        "UserName": f"user{i}",
        "FirstName": ["Ana", "Ben", "Cleo", "Dee", "Eli", "Fay", "Gus", "Hana"][i % 8],
        "Age": 20 + i,
        "Balance": f"{100.5 + i}",
        "Score": 0.5 * i,
        "Active": i % 2 == 0,
        "Joined": f"2023-0{1 + i % 9}-15T10:30:00Z",
        "Emails": [f"user{i}@a.example", f"user{i}@b.example"],
        "HomeAddress": {
            "Street": f"{i} Main St",
            "City": {"Name": ["Berlin", "Paris", "Rome"][i % 3],
                     "Country": ["DE", "FR", "IT"][i % 3]},
        },
        "Segment": "Retail" if i % 2 == 0 else "Wholesale",
    }
    for i in range(10)
]

V4_ORDERS = [
    {"OrderID": 100 + i, "UserName": f"user{i % 5}", "Amount": f"{10.25 * (i + 1)}",
     "Placed": f"2024-01-{i + 1:02d}T08:00:00Z"}
    for i in range(12)
]

CUSTOMERS_V2 = [
    {
        "__metadata": {"uri": f"Customers('C{i:03d}')", "type": "NW.Customer"},
        "CustomerID": f"C{i:03d}",
        "CompanyName": f"Company {i} {'& Söhne' if i == 3 else ''}".strip(),
        "Country": ["Germany", "France", "Italy", "Germany", "Spain"][i % 5],
        "Founded": f"/Date({(1000000000 + i * 86400) * 1000})/",
        "Orders": {"__deferred": {"uri": f"Customers('C{i:03d}')/Orders"}},
    }
    for i in range(8)
]

_CMP = {"eq": "==", "ne": "!=", "gt": ">", "ge": ">=", "lt": "<", "le": "<="}
_FILTER_RE = re.compile(r"^(\w+) (eq|ne|gt|ge|lt|le) (.+)$")


def _parse_literal(s: str):
    s = s.strip()
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1].replace("''", "'")
    if s in ("true", "false"):
        return s == "true"
    if s == "null":
        return None
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _apply_filter(rows: list[dict], expr: str) -> list[dict]:
    """Evaluate 'Col op lit [and Col op lit ...]' — the subset tests use."""
    clauses = [c.strip() for c in expr.split(" and ")]
    out = rows
    for clause in clauses:
        m = _FILTER_RE.match(clause)
        if not m:
            continue
        col, op, lit = m.group(1), m.group(2), _parse_literal(m.group(3))
        def keep(r, col=col, op=op, lit=lit):
            v = r.get(col)
            if lit is None:
                return (v is None) if op == "eq" else (v is not None)
            if v is None:
                return False
            if isinstance(lit, (int, float)) and isinstance(v, str):
                try:
                    v = float(v)
                except ValueError:
                    return False
            try:
                return {
                    "eq": v == lit, "ne": v != lit, "gt": v > lit,
                    "ge": v >= lit, "lt": v < lit, "le": v <= lit,
                }[op]
            except TypeError:
                return False
        out = [r for r in out if keep(r)]
    return out


EDMX_ODP = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
  <edmx:DataServices>
    <Schema Namespace="ODP" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      <EntityType Name="Fact">
        <Key><PropertyRef Name="FactID"/></Key>
        <Property Name="FactID" Type="Edm.Int32" Nullable="false"/>
        <Property Name="CALMONTH" Type="Edm.String" MaxLength="6"/>
        <Property Name="Amount" Type="Edm.Decimal" Precision="33" Scale="2"/>
      </EntityType>
      <EntityContainer Name="C">
        <EntitySet Name="Facts" EntityType="ODP.Fact"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>
"""

ODP_INITIAL = [
    {"FactID": i, "CALMONTH": f"2024{(i % 3) + 1:02d}", "Amount": f"{100 + i}.25"}
    for i in range(7)
]
ODP_DELTAS = {
    "T1": [{"FactID": 100, "CALMONTH": "202404", "Amount": "999.99"},
            {"FactID": 101, "CALMONTH": "202404", "Amount": "888.88"}],
    "T2": [{"FactID": 102, "CALMONTH": "202405", "Amount": "777.77"}],
    "T3": [],
}
ODP_TOKEN_CHAIN = {"T1": "T2", "T2": "T3", "T3": "T3"}


class FixtureState:
    def __init__(self) -> None:
        self.log: list[dict] = []
        self.flaky_counts: dict[str, int] = {}
        # Delta Sharing: tests drop parquet files and register their URLs +
        # the table's Spark-schema JSON string here.
        self.delta_tables: dict[str, dict] = {}

    def requests_for(self, path_prefix: str) -> list[dict]:
        return [r for r in self.log if r["path"].startswith(path_prefix)]


def _make_handler(state: FixtureState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # silence
            pass

        def _send(self, status: int, body: bytes, content_type: str,
                  extra_headers: dict | None = None):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra_headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def _json(self, status: int, doc, extra_headers=None):
            self._send(status, json.dumps(doc).encode(), "application/json",
                       extra_headers)

        def do_GET(self):  # noqa: N802
            parts = urlsplit(self.path)
            q = dict(parse_qsl(parts.query, keep_blank_values=True))
            state.log.append({
                "method": self.command, "path": parts.path, "query": q,
                "headers": {k: v for k, v in self.headers.items()},
            })
            route = parts.path

            # ---- OData v4 -------------------------------------------------
            if route == "/v4/$metadata":
                return self._send(200, EDMX_V4.encode(), "application/xml")
            if route in ("/v4", "/v4/"):
                return self._json(200, {
                    "@odata.context": "/v4/$metadata",
                    "value": [
                        {"name": "People", "kind": "EntitySet", "url": "People"},
                        {"name": "Orders", "kind": "EntitySet", "url": "Orders"},
                    ],
                })
            if route in ("/v4/People", "/v4/Orders"):
                data = PEOPLE if route.endswith("People") else V4_ORDERS
                return self._serve_v4(route, data, q)

            # ---- OData v2 -------------------------------------------------
            if route == "/v2/$metadata":
                return self._send(200, EDMX_V2.encode(), "application/xml",
                                  {"DataServiceVersion": "2.0"})
            if route in ("/v2", "/v2/"):
                return self._json(200, {"d": {"EntitySets": ["Customers", "Orders"]}},
                                  {"DataServiceVersion": "2.0"})
            if route == "/v2/Customers":
                return self._serve_v2(route, CUSTOMERS_V2, q)

            # ---- generic HTTP behaviors ----------------------------------
            if route == "/http/echo":
                return self._json(200, {
                    "path": parts.path, "query": q,
                    "headers": {k: v for k, v in self.headers.items()},
                })
            if route.startswith("/http/redirect/"):
                n = int(route.rsplit("/", 1)[-1])
                target = "/http/echo" if n <= 1 else f"/http/redirect/{n - 1}"
                return self._send(302, b"", "text/plain", {"Location": target})
            if route == "/http/redirect-cross":
                # "cross-origin" simulated by a different host in Location
                return self._send(302, b"", "text/plain",
                                  {"Location": f"http://127.0.0.1:{self.server.server_port}/http/echo"})
            if route == "/http/flaky":
                c = state.flaky_counts.get(route, 0) + 1
                state.flaky_counts[route] = c
                if c <= 2:
                    return self._send(429, b"slow down", "text/plain")
                return self._json(200, {"ok": True, "attempts": c})
            if route == "/http/latin1":
                body = "Grüße, café".encode("iso-8859-1")
                return self._send(200, body, "text/plain; charset=iso-8859-1")
            if route == "/http/binary":
                return self._send(200, b"\x89PNG\r\n\x1a\n....", "image/png")
            if route == "/http/notfound":
                return self._send(404, b"nope", "text/plain")

            # ---- ODP CDC --------------------------------------------------
            if route == "/odp/$metadata":
                return self._send(200, EDMX_ODP.encode(), "application/xml")
            if route == "/odp/Facts":
                return self._serve_odp(q)

            # ---- Delta Sharing (REST catalog; GET parts) ------------------
            if route == "/delta/shares":
                return self._json(200, {"items": [{"name": "share1"}]})
            if route == "/delta/shares/share1/schemas":
                return self._json(200, {"items": [{"name": "default"}]})
            if route == "/delta/shares/share1/schemas/default/tables":
                return self._json(200, {
                    "items": [{"name": n} for n in sorted(state.delta_tables)]
                })

            return self._send(404, b"unknown route", "text/plain")

        do_HEAD = do_GET

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length) if length else b""
            parts = urlsplit(self.path)
            state.log.append({
                "method": "POST", "path": parts.path,
                "query": dict(parse_qsl(parts.query)), "body": body.decode("utf-8", "replace"),
                "headers": {k: v for k, v in self.headers.items()},
            })
            if parts.path == "/http/echo":
                return self._json(201, {"received": body.decode("utf-8", "replace")})
            # Delta Sharing query endpoint -> NDJSON (protocol, metaData, files)
            m = re.match(r"^/delta/shares/share1/schemas/default/tables/(\w+)/query$",
                         parts.path)
            if m:
                t = state.delta_tables.get(m.group(1))
                if t is None:
                    return self._send(404, b"no such table", "text/plain")
                lines = [
                    json.dumps({"protocol": {"minReaderVersion": 1}}),
                    json.dumps({"metaData": {"id": "m1", "schemaString": t["schema"],
                                              "format": {"provider": "parquet"}}}),
                ]
                for i, url in enumerate(t["files"]):
                    lines.append(json.dumps({"file": {"id": f"f{i}", "url": url,
                                                        "size": 1}}))
                return self._send(200, "\n".join(lines).encode(),
                                  "application/x-ndjson")
            return self._send(404, b"unknown route", "text/plain")

        do_PUT = do_POST
        do_PATCH = do_POST
        do_DELETE = do_POST

        def _serve_odp(self, q: dict):
            """ODP emulation: initial load (paged) with track-changes ->
            delta link on last page; delta fetches advance T1->T2->T3."""
            token = q.get("!deltatoken") or None
            # delta-URL style: /odp/Facts?!deltatoken='T1'
            for k in q:
                m = re.match(r"^!deltatoken$", k)
                if m:
                    token = q[k].strip("'")
            if token:
                if token not in ODP_DELTAS:
                    return self._send(410, b"token expired", "text/plain")
                nxt = ODP_TOKEN_CHAIN[token]
                doc = {
                    "@odata.context": "/odp/$metadata",
                    "value": ODP_DELTAS[token],
                    "@odata.deltaLink": f"/odp/Facts?!deltatoken='{nxt}'",
                }
                return self._json(200, doc, {"OData-Version": "4.0"})
            # initial load: page of 4 then rest + deltaLink
            prefer = self.headers.get("Prefer", "")
            skip = int(q.get("$skip", 0))
            page = ODP_INITIAL[skip:skip + 4]
            doc = {"@odata.context": "/odp/$metadata", "value": page}
            extra = {"OData-Version": "4.0"}
            if "track-changes" in prefer or skip > 0:
                extra["Preference-Applied"] = "odata.track-changes"
            if skip + 4 < len(ODP_INITIAL):
                doc["@odata.nextLink"] = f"/odp/Facts?$skip={skip + 4}"
            else:
                doc["@odata.deltaLink"] = "/odp/Facts?!deltatoken='T1'"
            return self._json(200, doc, extra)

        # -- OData serving helpers ------------------------------------------

        def _serve_v4(self, route: str, data: list[dict], q: dict):
            rows = list(data)
            if "$filter" in q:
                rows = _apply_filter(rows, q["$filter"])
            total = len(rows)
            skip = int(q.get("$skip", 0))
            rows = rows[skip:]
            if "$top" in q:
                rows = rows[: int(q["$top"])]
            # Pagination with nextLink over the (post-filter) window.
            page = rows[:PAGE_SIZE]
            rest = rows[PAGE_SIZE:]
            if "$select" in q:
                cols = [c.strip() for c in q["$select"].split(",")]
                page = [{k: r.get(k) for k in cols} for r in page]
            doc = {"@odata.context": "/v4/$metadata", "value": page}
            if q.get("$count") == "true":
                doc["@odata.count"] = total
            if rest:
                nq = dict(q)
                nq["$skip"] = str(skip + PAGE_SIZE)
                if "$top" in q:
                    nq["$top"] = str(int(q["$top"]) - PAGE_SIZE)
                from urllib.parse import urlencode

                doc["@odata.nextLink"] = f"{route}?{urlencode(nq)}"
            return self._json(200, doc, {"OData-Version": "4.0"})

        def _serve_v2(self, route: str, data: list[dict], q: dict):
            rows = list(data)
            if "$filter" in q:
                rows = _apply_filter(rows, q["$filter"])
            total = len(rows)
            skip = int(q.get("$skip", 0))
            rows = rows[skip:]
            if "$top" in q:
                rows = rows[: int(q["$top"])]
            page = rows[:PAGE_SIZE]
            rest = rows[PAGE_SIZE:]
            if "$select" in q:
                cols = [c.strip() for c in q["$select"].split(",")]
                page = [
                    {**{k: r.get(k) for k in cols}, "__metadata": r.get("__metadata")}
                    for r in page
                ]
            d: dict = {"results": page}
            if q.get("$inlinecount") == "allpages":
                d["__count"] = str(total)
            if rest:
                nq = dict(q)
                nq["$skip"] = str(skip + PAGE_SIZE)
                from urllib.parse import urlencode

                d["__next"] = f"{route}?{urlencode(nq)}"
            return self._json(200, {"d": d}, {"DataServiceVersion": "2.0"})

    return Handler


class FixtureServer:
    """threading OData/HTTP fixture server bound to an ephemeral port."""

    def __init__(self) -> None:
        self.state = FixtureState()
        self._server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(self.state))
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "FixtureServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def base_url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"
