"""Read-only HTTP serving layer over the analytics surface.

Mirrors the reference backend's database endpoints
(backend/src/index.js:88-171) on the stdlib ``http.server`` — no web
framework, ~transport only; every query semantic lives in
analytics/achilles_lite (run_sql / table_page / list_tables):

    GET  /api/db/tables                       → ["omop_person", ...]
    GET  /api/db/data?table=T&limit=N&offset=K
         → {"data": [...], "total": n, "limit": N, "offset": K}
    POST /api/db/query   body {"sql": "SELECT ..."}
         → {"data": [...], "rowCount": n,
            "fields": [{"name": ..., "dataType": ...}]}
    GET  /api/health                          → {"status": "ok", ...}

Safety contract (the part the reference leaves implicit):
- READ-ONLY: /api/db/query admits a single SELECT/WITH/VALUES statement;
  DDL/DML and multi-statement payloads are rejected with 400 before any
  Spark call.
- ROW-CAPPED: every response collects at most ``max_rows`` rows on the
  driver, so a browse endpoint can never materialize an unbounded result
  (the same browse-not-bulk-export contract as table_page's docstring —
  bulk readers scan the parquet layers directly).

Spark job submission is thread-safe, so the ThreadingHTTPServer serves
concurrent requests by interleaving scheduler stages — the same pattern
the pipeline's concurrent writes use.
"""

from __future__ import annotations

import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession

from synthea2omop_etl_spark.analytics.achilles_lite import run_sql, table_page

_READONLY_RE = re.compile(r"^\s*(select|with|values)\b", re.IGNORECASE)
#: statement keywords that must not appear anywhere OUTSIDE string
#: literals — a `WITH cte AS (...) INSERT INTO ...` statement passes the
#: prefix check but is still a write (CTEs may precede DML in SQL)
_WRITE_KEYWORDS = re.compile(
    r"\b(insert|update|delete|drop|create|alter|merge|truncate|grant|"
    r"revoke|set|refresh|cache|uncache|msck|analyze|load)\b",
    re.IGNORECASE,
)


def _assert_readonly(sql: str) -> None:
    """Reject anything but one read-only SELECT/WITH/VALUES statement.
    Comments are stripped first so `/* */ DROP ...` can't hide behind
    them; string literals are blanked before the keyword scan so
    `WHERE text LIKE '%create%'` stays legal; interior semicolons
    (multi-statement payloads) are rejected outright."""
    stripped = re.sub(r"--[^\n]*", " ", sql)
    stripped = re.sub(r"/\*.*?\*/", " ", stripped, flags=re.DOTALL)
    body = stripped.strip().rstrip(";")
    if ";" in body:
        raise ValueError("multi-statement queries are not allowed")
    if not _READONLY_RE.match(body):
        raise ValueError(
            "read-only endpoint: only SELECT / WITH / VALUES queries"
        )
    # blank out '...'-quoted literals ('' escapes included), then scan
    no_strings = re.sub(r"'(?:[^']|'')*'", "''", body)
    hit = _WRITE_KEYWORDS.search(no_strings)
    if hit:
        raise ValueError(
            f"read-only endpoint: statement keyword {hit.group(0)!r} "
            "is not allowed"
        )


def _rows_json(df: DataFrame, max_rows: int) -> list[dict]:
    """Collect ≤ max_rows rows as JSON-safe dicts (dates/decimals/binary
    stringified — the endpoint is a display surface, not a data channel)."""
    return [
        {k: v for k, v in r.asDict(recursive=True).items()}
        for r in df.limit(max_rows).collect()
    ]


def _json_default(o):
    return str(o)


def create_server(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    host: str = "127.0.0.1",
    port: int = 0,
    max_rows: int = 1000,
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` binds an
    ephemeral port (read it back from ``server.server_address`` — the
    pytest path). Call ``serve_forever()`` to run."""

    class Handler(BaseHTTPRequestHandler):
        # silence the default stderr access log (pytest noise)
        def log_message(self, fmt, *args):  # noqa: ARG002
            pass

        def _send(self, code: int, payload: dict | list) -> None:
            body = json.dumps(payload, default=_json_default).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, message: str) -> None:
            self._send(code, {"error": message})

        def do_GET(self) -> None:  # noqa: N802 (stdlib contract)
            url = urlparse(self.path)
            try:
                if url.path == "/api/health":
                    self._send(200, {"status": "ok", "tables": len(tables)})
                elif url.path == "/api/db/tables":
                    self._send(200, sorted(tables))
                elif url.path == "/api/db/data":
                    q = parse_qs(url.query)
                    name = q.get("table", [None])[0]
                    if name not in tables:
                        self._error(404, f"unknown table: {name!r}")
                        return
                    limit = min(int(q.get("limit", ["10"])[0]), max_rows)
                    offset = int(q.get("offset", ["0"])[0])
                    df = tables[name]
                    self._send(
                        200,
                        {
                            "data": _rows_json(
                                table_page(df, limit=limit, offset=offset),
                                max_rows,
                            ),
                            "total": df.count(),
                            "limit": limit,
                            "offset": offset,
                        },
                    )
                else:
                    self._error(404, f"no such endpoint: {url.path}")
            except ValueError as exc:
                self._error(400, str(exc))
            except Exception as exc:  # surface Spark errors as 500 JSON
                self._error(500, str(exc))

        def do_POST(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/api/db/query":
                self._error(404, f"no such endpoint: {url.path}")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                sql = payload.get("sql")
                if not sql:
                    self._error(400, "missing 'sql' in request body")
                    return
                _assert_readonly(sql)
                out = run_sql(spark, sql, tables)
                rows = _rows_json(out, max_rows)
                self._send(
                    200,
                    {
                        "data": rows,
                        "rowCount": len(rows),
                        "fields": [
                            {
                                "name": f.name,
                                "dataType": f.dataType.simpleString(),
                            }
                            for f in out.schema.fields
                        ],
                    },
                )
            except (ValueError, json.JSONDecodeError) as exc:
                self._error(400, str(exc))
            except Exception as exc:
                self._error(500, str(exc))

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    host: str = "127.0.0.1",
    port: int = 8000,
    max_rows: int = 1000,
) -> None:
    """Blocking entry point for the CLI ``serve`` command."""
    server = create_server(spark, tables, host=host, port=port,
                           max_rows=max_rows)
    bound = server.server_address
    print(json.dumps({"listening": f"http://{bound[0]}:{bound[1]}"}))
    try:
        server.serve_forever()
    finally:
        server.server_close()
