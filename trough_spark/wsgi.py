"""Stdlib WSGI mounts for the HTTP surface — the reference is usable over
plain HTTP POST, so the engine is too.

Three callables mirror the reference's three services:
- ``segment_manager_app`` — the management endpoints
  (reference trough/wsgi/segment_manager.py:8-130): POST / (deprecated
  simple provision), POST /provision, POST /promote, GET /schema,
  GET|PUT /schema/<id>[/sql], DELETE /segment/<id>.
- ``read_app`` — POST body is a SQL query, ``?segment=`` (or the first
  HTTP_HOST label) selects the segment, rows return as JSON
  (reference trough/read.py:70-94).
- ``write_app`` — POST body is a SQL script, 200 → ``OK\\n``
  (reference trough/write.py:47-61).

All three are plain WSGI callables — mount under any server; ``serve``
runs one on ``wsgiref.simple_server`` for tests and local use.  No
framework dependency (the reference needs Flask + uwsgi; status/error
contracts are preserved by delegating to ``SegmentManagerAPI``).
"""

from __future__ import annotations

import json
import re
import urllib.parse

from trough_spark.api import JSON, TEXT, SegmentManagerAPI

_SCHEMA_RE = re.compile(r"^/schema/([^/]+)$")
_SCHEMA_SQL_RE = re.compile(r"^/schema/([^/]+)/sql$")
_SEGMENT_RE = re.compile(r"^/segment/([^/]+)$")

_REASONS = {200: "OK", 201: "Created", 204: "No Content", 400: "Bad Request",
            404: "Not Found", 405: "Method Not Allowed", 500: "Server Error"}


def _read_body(environ) -> str:
    try:
        length = int(environ.get("CONTENT_LENGTH") or 0)
    except ValueError:
        length = 0
    return environ["wsgi.input"].read(length).decode("utf-8") if length else ""


def _respond(start_response, status: int, body: str, mimetype: str):
    data = body.encode("utf-8")
    start_response(
        f"{status} {_REASONS.get(status, 'Unknown')}",
        [("Content-Type", mimetype), ("Content-Length", str(len(data)))],
    )
    return [data]


def _segment_from(environ) -> str:
    """``?segment=`` wins; otherwise the first HTTP_HOST label — the
    reference's routing rule (read.py:73-75, write.py:49-51)."""
    qs = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
    if "segment" in qs:
        return qs["segment"][0]
    return environ.get("HTTP_HOST", "").split(".")[0]


def segment_manager_app(api: SegmentManagerAPI):
    def app(environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/")
        try:
            if path == "/" and method == "POST":
                # deprecated api: body is the bare segment id; respond with
                # the write url as text (segment_manager.py:13-19)
                result = api.store.provision(_read_body(environ).strip())
                return _respond(start_response, 200, result["write_url"], TEXT)
            if path == "/provision" and method == "POST":
                return _respond(start_response, *api.provision(_read_body(environ)))
            if path == "/promote" and method == "POST":
                return _respond(start_response, *api.promote(_read_body(environ)))
            if path == "/schema" and method == "GET":
                return _respond(start_response, *api.list_schemas())
            m = _SCHEMA_SQL_RE.match(path)
            if m and method == "GET":
                return _respond(start_response, *api.get_schema_sql(m.group(1)))
            if m and method == "PUT":
                return _respond(
                    start_response, *api.put_schema_sql(m.group(1), _read_body(environ))
                )
            m = _SCHEMA_RE.match(path)
            if m and method == "GET":
                return _respond(start_response, *api.get_schema(m.group(1)))
            if m and method == "PUT":
                return _respond(
                    start_response, *api.put_schema(m.group(1), _read_body(environ))
                )
            m = _SEGMENT_RE.match(path)
            if m and method == "DELETE":
                return _respond(start_response, *api.delete_segment(m.group(1)))
            return _respond(start_response, 404, "", TEXT)
        except Exception as e:  # reference: 500 + text body (read.py:95-98)
            return _respond(start_response, 500, f"500 Server Error: {e}\n", TEXT)

    return app


def read_app(api: SegmentManagerAPI):
    def app(environ, start_response):
        if environ["REQUEST_METHOD"] != "POST":
            return _respond(start_response, 405, "", TEXT)
        try:
            status, body, mt = api.read(_segment_from(environ), _read_body(environ))
            return _respond(start_response, status, body, mt)
        except Exception as e:
            return _respond(start_response, 500, f"500 Server Error: {e}\n", TEXT)

    return app


def write_app(api: SegmentManagerAPI):
    def app(environ, start_response):
        if environ["REQUEST_METHOD"] != "POST":
            return _respond(start_response, 405, "", TEXT)
        try:
            status, body, mt = api.write(_segment_from(environ), _read_body(environ))
            if status == 200:
                body = "OK\n"  # reference write.py:44 returns b"OK\n"
            return _respond(start_response, status, body, mt)
        except Exception as e:
            return _respond(start_response, 500, f"500 Server Error: {e}\n", TEXT)

    return app


def serve(app, host: str = "127.0.0.1", port: int = 0):
    """Run a WSGI app on wsgiref; returns the live server (``server_port``
    tells you the bound port when ``port=0``).  Call ``shutdown()`` +
    ``server_close()`` to stop.  Single-threaded by design — the store is
    one Spark driver; concurrency belongs to Spark, not the HTTP layer."""
    from wsgiref.simple_server import WSGIRequestHandler, make_server

    class _QuietHandler(WSGIRequestHandler):
        def log_message(self, *args):  # no stderr noise in tests
            pass

    return make_server(host, port, app, handler_class=_QuietHandler)
