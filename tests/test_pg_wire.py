"""PG wire-protocol tests: a raw-socket v3 client (the byte flow psql
emits) against the live listener — startup handshake, simple query,
error envelope (PostgresWireProtocol.java parity)."""

from __future__ import annotations

import socket
import struct

import pytest

from crate_spark.engine import CrateSession
from crate_spark.pg_wire import serve

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pg_server(spark):
    session = CrateSession(spark, SF_DIR)
    srv = serve(session, port=0)
    yield srv.server_address[1]
    srv.shutdown()


class MiniPgClient:
    """Just enough of the v3 protocol to act like psql's simple flow."""

    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port))
        # StartupMessage: protocol 3.0 + user param
        params = b"user\x00crate\x00database\x00doc\x00\x00"
        payload = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self._drain_until_ready()

    def _read_msg(self):
        head = self._exact(5)
        tag = head[0:1]
        length = struct.unpack("!I", head[1:5])[0]
        return tag, self._exact(length - 4)

    def _exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            assert chunk, "server closed early"
            buf += chunk
        return buf

    def _drain_until_ready(self):
        msgs = []
        while True:
            tag, body = self._read_msg()
            msgs.append((tag, body))
            if tag == b"Z":
                return msgs

    def query(self, sql):
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        cols, rows, err = [], [], None
        for tag, body in self._drain_until_ready():
            if tag == b"T":
                n = struct.unpack("!H", body[:2])[0]
                off = 2
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    cols.append(body[off:end].decode())
                    off = end + 1 + 18  # fixed field descriptor tail
            elif tag == b"D":
                nf = struct.unpack("!H", body[:2])[0]
                off, vals = 2, []
                for _ in range(nf):
                    (ln,) = struct.unpack("!i", body[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(body[off : off + ln].decode())
                        off += ln
                rows.append(vals)
            elif tag == b"E":
                fields = {}
                for part in body.split(b"\x00"):
                    if part:
                        fields[chr(part[0])] = part[1:].decode()
                err = fields
        return cols, rows, err

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


def test_pg_wire_handshake_and_query(pg_server):
    c = MiniPgClient(pg_server)
    try:
        cols, rows, err = c.query(
            "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 2"
        )
        assert err is None
        assert cols == ["n_nationkey", "n_name"]
        assert rows == [["0", "NATION_0"], ["1", "NATION_1"]]
    finally:
        c.close()


def test_pg_wire_crate_isms_and_types(pg_server):
    c = MiniPgClient(pg_server)
    try:
        cols, rows, err = c.query(
            "SELECT '5'::int + 1 AS six, TRUE AS yes, NULL AS nul, [1, 2] AS arr"
        )
        assert err is None
        assert rows == [["6", "t", None, "{1,2}"]]
    finally:
        c.close()


def test_pg_wire_error_envelope(pg_server):
    c = MiniPgClient(pg_server)
    try:
        _, _, err = c.query("SELECT * FROM not_a_table_at_all")
        assert err and err["S"] == "ERROR" and err["C"] == "42P01"
        # session stays usable after an error (ReadyForQuery resumed)
        cols, rows, err2 = c.query("SELECT 1 AS ok")
        assert err2 is None and rows == [["1"]]
    finally:
        c.close()


def test_pg_wire_extended_protocol(pg_server):
    """Parse/Bind/Describe/Execute/Sync — the flow psycopg3 and JDBC
    drive (Session.parse/bind:403/execute analogs), with $1 params."""
    c = MiniPgClient(pg_server)
    try:
        sql = b"SELECT n_name FROM nation WHERE n_nationkey = $1\x00"
        # Parse (unnamed stmt), no param-type OIDs
        body = b"\x00" + sql + struct.pack("!H", 0)
        c.sock.sendall(b"P" + struct.pack("!I", len(body) + 4) + body)
        # Bind (unnamed portal <- unnamed stmt), one text param "2"
        val = b"2"
        body = (
            b"\x00" + b"\x00" + struct.pack("!H", 0)
            + struct.pack("!H", 1) + struct.pack("!i", len(val)) + val
            + struct.pack("!H", 0)
        )
        c.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)
        # Describe portal, Execute, Sync
        body = b"P\x00"
        c.sock.sendall(b"D" + struct.pack("!I", len(body) + 4) + body)
        body = b"\x00" + struct.pack("!I", 0)
        c.sock.sendall(b"E" + struct.pack("!I", len(body) + 4) + body)
        c.sock.sendall(b"S" + struct.pack("!I", 4))
        tags = {}
        for tag, payload in c._drain_until_ready():
            tags.setdefault(tag, []).append(payload)
        assert b"1" in tags and b"2" in tags  # ParseComplete, BindComplete
        assert b"T" in tags and b"D" in tags  # description + data
        assert b"NATION_2" in tags[b"D"][0]
        assert tags[b"C"][0].startswith(b"SELECT 1")
    finally:
        c.close()


class AuthPgClient(MiniPgClient):
    """Startup as an arbitrary user, answering a cleartext password
    challenge (AuthenticationCleartextPassword, code 3)."""

    def __init__(self, port, user, password=None):
        self.sock = socket.create_connection(("127.0.0.1", port))
        params = f"user\x00{user}\x00database\x00doc\x00\x00".encode()
        payload = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self.auth_error = None
        while True:
            tag, body = self._read_msg()
            if tag == b"R":
                (code,) = struct.unpack("!I", body[:4])
                if code == 3:
                    pw = (password or "").encode() + b"\x00"
                    self.sock.sendall(b"p" + struct.pack("!I", len(pw) + 4) + pw)
                # code 0 = AuthenticationOk: keep draining to ReadyForQuery
            elif tag == b"E":
                fields = {}
                for f in body.split(b"\x00"):
                    if f:
                        fields[chr(f[0])] = f[1:].decode()
                self.auth_error = fields
                return
            elif tag == b"Z":
                return


def test_wire_auth_password_roundtrip(spark, pg_server):
    """Role-store-backed wire auth (auth/HostBasedAuthentication
    analog): password users get a cleartext challenge; statements run
    AS the authenticated user (privilege enforcement applies)."""
    # the module fixture's session is shared; fetch it via a control client
    ctl = MiniPgClient(pg_server)
    ctl.query("CREATE USER wired WITH (password = 'pw123')")
    ctl.query("GRANT DQL ON SCHEMA doc TO wired")

    good = AuthPgClient(pg_server, "wired", "pw123")
    assert good.auth_error is None
    cols, rows, err = good.query("SELECT count(*) AS n FROM region")
    assert err is None and rows[0][0] == "5"
    # DML not granted -> enforced at the wire surface too
    _c, _r, err = good.query("INSERT INTO region (r_regionkey) VALUES (99)")
    assert err is not None
    good.close()

    bad = AuthPgClient(pg_server, "wired", "wrong")
    assert bad.auth_error is not None and bad.auth_error.get("C") == "28P01"

    ghost = AuthPgClient(pg_server, "nosuchuser")
    assert ghost.auth_error is not None and ghost.auth_error.get("C") == "28000"

    # passwordless users connect without a challenge (trust)
    ctl.query("CREATE USER open_user")
    trusty = AuthPgClient(pg_server, "open_user")
    assert trusty.auth_error is None
    trusty.close()
    ctl.query("DROP USER open_user")
    ctl.query("DROP USER wired")
    ctl.close()


def test_sqlstate_mapping():
    """Error classes map to the PG SQLSTATEs the reference reports."""
    from crate_spark.pg_wire import _sqlstate_of
    from crate_spark.roles import PermissionDenied

    assert _sqlstate_of(PermissionDenied("x not authorized")) == "42501"
    assert _sqlstate_of(ValueError("1 row(s) conflict with existing primary keys")) == "23505"
    assert _sqlstate_of(ValueError("[TABLE_OR_VIEW_NOT_FOUND] nope")) == "42P01"
    assert _sqlstate_of(ValueError("syntax error")) == "42601"
