"""PostgreSQL wire-protocol entry point (v3, simple-query subset).

Reference: ``protocols/postgres/PostgresWireProtocol.java`` —
``handleStartupBody``, ``handleSimpleQuery:804`` → ``Session.quickExec``;
CrateDB listens on 5432 and identifies as a PG server. This is the
Spark-side analog: a stdlib socket server speaking enough of the v3
protocol for real clients — psql and psycopg2 use the *simple* query
flow for unparameterized statements, which is exactly the subset here:

- SSLRequest → 'N' (no TLS, like the reference with SSL off)
- StartupMessage → AuthenticationOk, ParameterStatus (server_version,
  encoding), BackendKeyData, ReadyForQuery
- 'Q' Query → RowDescription / DataRow* / CommandComplete /
  ReadyForQuery, or ErrorResponse (severity/code/message fields, the
  reference's SQLSTATE-bearing envelope) then ReadyForQuery
- 'X' Terminate

Values travel in text format (every type has a text rendering; psql
displays it directly): booleans as t/f, timestamps ISO, arrays in
PG-brace form, NULL as the -1 length marker.
"""

from __future__ import annotations

import datetime
import decimal
import socket
import socketserver
import struct
import threading

_SSL_REQUEST = 80877103

#: serializes statement execution across wire connections so the
#: per-connection user scoping on the shared CrateSession is race-free
_EXEC_LOCK = threading.Lock()
_CANCEL_REQUEST = 80877102

#: PG type OIDs for RowDescription (PGTypes.java mapping)
_OIDS = {
    "boolean": 16, "bigint": 20, "smallint": 21, "int": 23, "integer": 23,
    "double": 701, "float": 700, "string": 25, "timestamp": 1114,
    "date": 1082, "decimal": 1700, "binary": 17,
}


def _oid_of(spark_type: str) -> int:
    base = spark_type.split("(")[0]
    return _OIDS.get(base, 25)  # default: text


def _text(v) -> str | None:
    """PG text-format rendering."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "{" + ",".join("NULL" if x is None else _text(x) for x in v) + "}"
    if hasattr(v, "asDict"):
        d = v.asDict()
        return "{" + ",".join(f"{k}={_text(x)}" for k, x in d.items()) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    return str(v)


def _sqlstate_of(exc: Exception) -> str:
    """Exception -> PG SQLSTATE, the classes the reference's
    PostgresWireProtocol reports: 42P01 undefined table, 42501
    insufficient privilege, 23505 unique violation, 42601 syntax."""
    msg = str(exc)
    if type(exc).__name__ == "PermissionDenied" or "not authorized" in msg:
        return "42501"
    if "conflict with existing primary key" in msg:
        return "23505"
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "unknown table" in msg:
        return "42P01"
    return "42601"


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _PgHandler(socketserver.BaseRequestHandler):
    session = None  # injected

    def handle(self):
        sock: socket.socket = self.request
        if not self._startup(sock):
            return
        while True:
            head = self._read_exact(sock, 5)
            if head is None:
                return
            tag, length = head[0:1], struct.unpack("!I", head[1:5])[0]
            body = self._read_exact(sock, length - 4) or b""
            if tag == b"X":
                return
            if tag == b"Q":
                self._simple_query(sock, body.rstrip(b"\x00").decode())
            elif tag == b"P":
                self._parse(sock, body)
            elif tag == b"B":
                self._bind(sock, body)
            elif tag == b"D":
                sock.sendall(self._describe(body))
            elif tag == b"E":
                self._execute(sock, body)
            elif tag == b"C":
                sock.sendall(_msg(b"3", b""))  # CloseComplete
            elif tag == b"H":
                pass  # Flush: we always write eagerly
            elif tag == b"S":
                sock.sendall(_msg(b"Z", b"I"))  # Sync
            else:
                self._error(sock, "0A000", f"message type {tag!r} not supported")
                sock.sendall(_msg(b"Z", b"I"))

    # -- extended query protocol (Session.parse/bind/execute analogs) ----
    def setup(self):
        self._stmts: dict[str, str] = {}
        self._portals: dict[str, object] = {}
        self.user = "crate"

    def _exec(self, sql: str, params=None):
        """Run one statement AS the authenticated connection user.
        Statements serialize through a lock (the reference executes a
        session's statements serially too); Spark still parallelizes
        each job internally."""
        with _EXEC_LOCK:
            prev = self.session.current_user
            self.session.current_user = self.user
            try:
                return self.session.execute(sql, params=params)
            finally:
                self.session.current_user = prev

    def _parse(self, sock, body: bytes) -> None:
        """'P': named statement with $n placeholders (Session.parse)."""
        name, rest = body.split(b"\x00", 1)
        query, _rest = rest.split(b"\x00", 1)
        self._stmts[name.decode()] = query.decode()
        sock.sendall(_msg(b"1", b""))  # ParseComplete

    def _bind(self, sock, body: bytes) -> None:
        """'B': bind text-format params into a portal (Session.bind:403).
        The portal holds a LAZY DataFrame; rows materialize at Execute."""
        portal, rest = body.split(b"\x00", 1)
        stmt_name, rest = rest.split(b"\x00", 1)
        nfmt = struct.unpack("!H", rest[:2])[0]
        off = 2 + 2 * nfmt
        nparams = struct.unpack("!H", rest[off : off + 2])[0]
        off += 2
        params: list = []
        for _ in range(nparams):
            (ln,) = struct.unpack("!i", rest[off : off + 4])
            off += 4
            if ln == -1:
                params.append(None)
            else:
                params.append(rest[off : off + ln].decode())
                off += ln
        sql = self._stmts.get(stmt_name.decode(), "")
        try:
            df = self._exec(sql, params=params or None)
            self._portals[portal.decode()] = df
            sock.sendall(_msg(b"2", b""))  # BindComplete
        except Exception as e:
            self._error(sock, "42601", str(e).split("\n")[0][:400])

    def _describe(self, body: bytes) -> bytes:
        kind, name = body[0:1], body[1:].rstrip(b"\x00").decode()
        df = self._portals.get(name)
        if kind == b"S" or df is None:
            return _msg(b"n", b"")  # NoData for statement describes
        return _msg(b"T", self._row_description(df))

    def _execute(self, sock, body: bytes) -> None:
        portal = body.split(b"\x00", 1)[0].decode()
        df = self._portals.get(portal)
        if df is None:
            sock.sendall(_msg(b"C", _cstr("OK")))
            return
        try:
            rows = df.collect()
            self._send_rows(sock, df.schema.fields, rows, with_description=False)
            sock.sendall(_msg(b"C", _cstr(f"SELECT {len(rows)}")))
        except Exception as e:
            self._error(sock, "42601", str(e).split("\n")[0][:400])

    # -- protocol steps --------------------------------------------------
    def _startup(self, sock) -> bool:
        raw = self._read_exact(sock, 8)
        if raw is None:
            return False
        length, code = struct.unpack("!II", raw)
        if code == _SSL_REQUEST:
            sock.sendall(b"N")
            raw = self._read_exact(sock, 8)
            if raw is None:
                return False
            length, code = struct.unpack("!II", raw)
        if code == _CANCEL_REQUEST:
            return False
        params_raw = self._read_exact(sock, length - 8) or b""
        # startup params: key\0value\0 ... \0 — we need `user`
        # (auth/HostBasedAuthentication analog; password method when the
        # role has a password, trust otherwise)
        parts = params_raw.split(b"\x00")
        params = dict(zip(parts[0::2], parts[1::2]))
        self.user = (params.get(b"user", b"crate").decode() or "crate").lower()
        role = self.session.roles.roles.get(self.user)
        if role is None:
            self._error(sock, "28000", f'role "{self.user}" does not exist')
            return False
        if role.password is not None:
            # AuthenticationCleartextPassword (PasswordAuthenticationMethod)
            sock.sendall(_msg(b"R", struct.pack("!I", 3)))
            tag = self._read_exact(sock, 1)
            if tag != b"p":
                return False
            (plen,) = struct.unpack("!I", self._read_exact(sock, 4))
            pw = self._read_exact(sock, plen - 4) or b"\x00"
            if pw[:-1].decode(errors="replace") != role.password:
                self._error(sock, "28P01", f'password authentication failed for user "{self.user}"')
                return False
        sock.sendall(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
        for k, v in (
            ("server_version", "14.0"),
            ("server_encoding", "UTF8"),
            ("client_encoding", "UTF8"),
            ("crate_version", "5.x-spark"),
        ):
            sock.sendall(_msg(b"S", _cstr(k) + _cstr(v)))
        sock.sendall(_msg(b"K", struct.pack("!II", 0, 0)))  # BackendKeyData
        sock.sendall(_msg(b"Z", b"I"))  # ReadyForQuery (idle)
        return True

    def _simple_query(self, sock, sql: str) -> None:
        try:
            df = self._exec(sql)
            if df is None:
                sock.sendall(_msg(b"C", _cstr("OK")))
                sock.sendall(_msg(b"Z", b"I"))
                return
            rows = df.collect()
            self._send_rows(sock, df.schema.fields, rows, with_description=True)
            sock.sendall(_msg(b"C", _cstr(f"SELECT {len(rows)}")))
        except Exception as e:
            self._error(sock, _sqlstate_of(e), str(e).split("\n")[0][:400])
        sock.sendall(_msg(b"Z", b"I"))

    @staticmethod
    def _row_description(df) -> bytes:
        fields = df.schema.fields
        desc = struct.pack("!H", len(fields))
        for f in fields:
            # table oid, attnum, type oid, typlen -1 (variable),
            # typmod -1, format 0 (text)
            desc += _cstr(f.name) + struct.pack(
                "!IHIhih", 0, 0, _oid_of(f.dataType.simpleString()), -1, -1, 0
            )
        return desc

    def _send_rows(self, sock, fields, rows, *, with_description: bool) -> None:
        if with_description:
            desc = struct.pack("!H", len(fields))
            for f in fields:
                desc += _cstr(f.name) + struct.pack(
                    "!IHIhih", 0, 0, _oid_of(f.dataType.simpleString()), -1, -1, 0
                )
            sock.sendall(_msg(b"T", desc))
        self._data_rows(sock, fields, rows)

    @staticmethod
    def _data_rows(sock, fields, rows) -> None:
        for r in rows:
            payload = struct.pack("!H", len(fields))
            for v in r:
                t = _text(v)
                if t is None:
                    payload += struct.pack("!i", -1)
                else:
                    b = t.encode()
                    payload += struct.pack("!I", len(b)) + b
            sock.sendall(_msg(b"D", payload))

    def _error(self, sock, sqlstate: str, message: str) -> None:
        """ErrorResponse with severity/SQLSTATE/message fields — the
        envelope `SQLExceptions.createSQLActionException` fills."""
        payload = (
            b"S" + _cstr("ERROR") + b"C" + _cstr(sqlstate) + b"M" + _cstr(message) + b"\x00"
        )
        sock.sendall(_msg(b"E", payload))

    @staticmethod
    def _read_exact(sock, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf


def serve(session, host: str = "127.0.0.1", port: int = 5432):
    """Start the PG wire listener (reference default 5432) on a daemon
    thread; returns the server (``.shutdown()`` to stop)."""
    handler = type("BoundPg", (_PgHandler,), {"session": session})

    class _Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = _Srv((host, port), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
