"""Self-contained loopback OData v4 endpoint over a driver table.

`odata_apply_groupby` needs a live service so the $apply aggregation
pushdown (SURVEY.md §2.C13, beyond-reference) can be oracle-checked
end-to-end: the SERVER computes the aggregate, the engine only decodes
it, and DuckDB aggregates the same parquet — if the hashes match, the
compiled $apply expression and the typed decode of its result are both
right. This is a test stand-in for a real OData service (SAP gateway
etc.); at production scale the server is remote and the read path is
identical.

The server lives in the driver process on a daemon thread (Spark's
Python workers reach it over 127.0.0.1) and evaluates exactly the
restricted grammar the engine's query builder emits:
``groupby((c1,...),aggregate(col with fn as alias, ...))`` with
fn in sum|min|max|average|countdistinct plus ``$count as alias``,
``$top``, and the plain entity-set probe (version detection).
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlsplit

_AGG_RE = re.compile(r"^(\S+) with (sum|min|max|average|countdistinct) as (\w+)$")
_APPLY_RE = re.compile(r"^groupby\(\((?P<dims>[^)]*)\)(?:,aggregate\((?P<aggs>.*)\))?\)$")

_servers: dict[str, str] = {}
_lock = threading.Lock()


def _eval_apply(rows: list[dict], expr: str) -> list[dict]:
    expr = expr.strip()
    m = _APPLY_RE.match(expr)
    if not m:
        raise ValueError(f"unsupported $apply: {expr}")
    dims = [d.strip() for d in m.group("dims").split(",") if d.strip()]
    aggs = []
    if m.group("aggs"):
        for term in m.group("aggs").split(","):
            term = term.strip()
            if term.startswith("$count as "):
                aggs.append((None, "count", term[len("$count as "):].strip()))
                continue
            am = _AGG_RE.match(term)
            if not am:
                raise ValueError(f"unsupported aggregate term: {term}")
            aggs.append((am.group(1), am.group(2), am.group(3)))
    groups: dict[tuple, list[dict]] = {}
    for r in rows:
        groups.setdefault(tuple(r.get(d) for d in dims), []).append(r)
    out = []
    for key, members in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        row = dict(zip(dims, key))
        for col, fn, alias in aggs:
            vals = [m[col] for m in members if col is not None and m.get(col) is not None]
            if fn == "count":
                row[alias] = len(members)
            elif fn == "countdistinct":
                row[alias] = len(set(vals))
            elif fn == "sum":
                row[alias] = sum(vals)
            elif fn == "min":
                row[alias] = min(vals) if vals else None
            elif fn == "max":
                row[alias] = max(vals) if vals else None
            elif fn == "average":
                row[alias] = (sum(vals) / len(vals)) if vals else None
        out.append(row)
    return out


def _start(sf_dir: str, table: str, entity: str) -> str:
    import duckdb

    from erpl_web_spark.suite import duckdb_parquet_src

    src = duckdb_parquet_src(f"{sf_dir}/{table}.parquet")
    rel = duckdb.sql(f"SELECT * FROM {src}")
    cols = [d[0] for d in rel.description]
    data = [dict(zip(cols, row)) for row in rel.fetchall()]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parts = urlsplit(self.path)
            q = {k: unquote(v) for k, v in parse_qsl(parts.query)}
            if not parts.path.rstrip("/").endswith(entity):
                self.send_error(404)
                return
            rows = list(data)
            if "$apply" in q:
                rows = _eval_apply(rows, q["$apply"])
            if "$top" in q:
                rows = rows[: int(q["$top"])]
            body = json.dumps(
                {"@odata.context": f"/{entity}/$metadata", "value": rows},
                default=str,
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("OData-Version", "4.0")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}/{entity}"


def ensure_server(sf_dir: str, table: str = "customer", entity: str = "Customers") -> str:
    """Entity-set URL of a loopback v4 service for ``table`` (one per
    (sf_dir, table) per driver process; daemon thread, dies with it)."""
    key = f"{sf_dir}:{table}"
    with _lock:
        if key not in _servers:
            _servers[key] = _start(sf_dir, table, entity)
        return _servers[key]
