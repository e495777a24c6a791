"""HTTP ``_sql`` entry point — the reference's second front door.

Reference: ``rest/action/SqlHttpHandler.java:83`` →
``executeSimpleRequest:230`` → ``Session.quickExec``. Clients POST
``{"stmt": "...", "args": [...]}`` (or ``bulk_args``) to ``/_sql`` and
get ``{"cols": [...], "rows": [...], "rowcount": n, "duration": ms}``;
errors come back as ``{"error": {"message", "code"}}`` with the
reference's error-code families (4000 statement errors, 4043 unknown
relation, 5000 unhandled).

Implementation is stdlib-only (http.server) over :class:`CrateSession`
— the Spark driver is the coordinator node, exactly as the reference's
HTTP handler runs on whichever node receives the request. Row values
JSON-serialize the way the reference does: timestamps as epoch millis,
decimals as numbers, structs as objects.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _json_value(v):
    """CrateDB HTTP value mapping (SqlHttpHandler result serialization)."""
    if isinstance(v, datetime.datetime):
        return int(v.timestamp() * 1000)  # timestamps are epoch millis
    if isinstance(v, datetime.date):
        return int(
            datetime.datetime(v.year, v.month, v.day, tzinfo=datetime.timezone.utc).timestamp()
            * 1000
        )
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        return {k: _json_value(x) for k, x in v.asDict().items()}
    return v


def _error_code(exc: Exception) -> int:
    msg = str(exc)
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "unknown table" in msg:
        return 4041  # unknown relation (RelationUnknown)
    if isinstance(exc, ValueError) or "PARSE_SYNTAX_ERROR" in msg or "Analysis" in type(exc).__name__:
        return 4000  # statement invalid (SQLParseException family)
    return 5000  # unhandled server error


def execute_request(session, payload: dict) -> dict:
    """One ``/_sql`` request against a CrateSession — the
    ``executeSimpleRequest`` analog. Returns the response dict."""
    stmt = payload.get("stmt")
    if not stmt:
        return {"error": {"message": "missing statement", "code": 4000}}
    t0 = time.time()
    try:
        if payload.get("bulk_args"):
            results = []
            for row_args in payload["bulk_args"]:
                df = session.execute(stmt, params=list(row_args))
                n = len(df.collect()) if df is not None else 0
                results.append({"rowcount": n})
            return {"results": results, "duration": round((time.time() - t0) * 1000, 3)}
        df = session.execute(stmt, params=payload.get("args"))
        if df is None:
            return {"cols": [], "rows": [], "rowcount": 0,
                    "duration": round((time.time() - t0) * 1000, 3)}
        rows = [[_json_value(v) for v in r] for r in df.collect()]
        return {
            "cols": list(df.columns),
            "rows": rows,
            "rowcount": len(rows),
            "duration": round((time.time() - t0) * 1000, 3),
        }
    except Exception as e:  # error envelope, never a raw 500 body
        return {"error": {"message": str(e).split("\n")[0][:500], "code": _error_code(e)}}


class _Handler(BaseHTTPRequestHandler):
    session = None  # injected by serve()

    def _authed_user(self) -> str | None:
        """HTTP Basic auth against the role store (reference
        auth/HttpAuthUpstreamHandler): no header -> crate (trust);
        wrong password / unknown user -> None (401)."""
        header = self.headers.get("Authorization", "")
        if not header.startswith("Basic "):
            return "crate"
        try:
            user, _, pw = (
                base64.b64decode(header[6:]).decode().partition(":")
            )
        except Exception:
            return None
        role = self.session.roles.roles.get(user.lower())
        if role is None:
            return None
        if role.password is not None and pw != role.password:
            return None
        return role.name

    def do_POST(self):  # noqa: N802 (http.server API)
        if self.path.rstrip("/") not in ("/_sql", ""):
            self.send_error(404)
            return
        user = self._authed_user()
        if user is None:
            self.send_error(401, "password authentication failed")
            return
        length = int(self.headers.get("Content-Length", 0))
        try:
            payload = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            payload = {}
        prev = self.session.current_user
        self.session.current_user = user
        try:
            resp = execute_request(self.session, payload)
        finally:
            self.session.current_user = prev
        body = json.dumps(resp).encode()
        self.send_response(400 if "error" in resp else 200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # -- /_blobs/<table>/<digest> (general/blobs.rst HTTP surface) ------
    _BLOB_PATH = None  # compiled lazily

    def _blob_route(self):
        import re as _re

        m = _re.match(r"^/_blobs/(\w+)/([0-9a-fA-F]{40})$", self.path)
        return (m.group(1), m.group(2)) if m else None

    def do_PUT(self):  # noqa: N802
        route = self._blob_route()
        if not route:
            self.send_error(404)
            return
        table, digest = route
        length = int(self.headers.get("Content-Length", 0))
        content = self.rfile.read(length)
        try:
            existed = self.session.blob_exists(table, digest)
            self.session.put_blob(table, content, digest)
        except Exception as e:
            self.send_error(400, str(e).split("\n")[0])
            return
        # reference: 201 Created on new, 409 Conflict on re-upload
        self.send_response(409 if existed else 201)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):  # noqa: N802
        route = self._blob_route()
        if not route:
            self.send_error(404)
            return
        try:
            content = self.session.get_blob(*route)
        except Exception:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(content)))
        self.end_headers()
        self.wfile.write(content)

    def do_HEAD(self):  # noqa: N802
        route = self._blob_route()
        if not route:
            self.send_error(404)
            return
        try:
            ok = self.session.blob_exists(*route)
        except Exception:
            ok = False
        self.send_response(200 if ok else 404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_DELETE(self):  # noqa: N802
        route = self._blob_route()
        if not route:
            self.send_error(404)
            return
        try:
            ok = self.session.delete_blob(*route)
        except Exception:
            ok = False
        self.send_response(204 if ok else 404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *args):  # quiet test runs
        pass


def serve(session, host: str = "127.0.0.1", port: int = 4200) -> ThreadingHTTPServer:
    """Start the ``/_sql`` endpoint (reference default port 4200) on a
    daemon thread; returns the server (call ``.shutdown()`` to stop)."""
    handler = type("BoundHandler", (_Handler,), {"session": session})
    srv = ThreadingHTTPServer((host, port), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
