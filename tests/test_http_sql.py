"""HTTP ``_sql`` entry-point tests: a live stdlib server over
CrateSession answering reference-shaped requests (SqlHttpHandler.java:
stmt/args/bulk_args in, cols/rows/rowcount or error envelope out)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from crate_spark.engine import CrateSession
from crate_spark.http_sql import execute_request, serve

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def http_session(spark):
    return CrateSession(spark, SF_DIR)


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/_sql",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_sql_roundtrip(http_session):
    srv = serve(http_session, port=0)  # ephemeral port
    port = srv.server_address[1]
    try:
        status, resp = _post(port, {"stmt": "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 2"})
        assert status == 200
        assert resp["cols"] == ["n_nationkey", "n_name"]
        assert resp["rowcount"] == 2 and resp["rows"][0][0] == 0
        assert resp["duration"] > 0
        # parameterized
        status, resp = _post(port, {"stmt": "SELECT n_name FROM nation WHERE n_nationkey = $1", "args": [3]})
        assert status == 200 and resp["rowcount"] == 1
        # error envelope with reference-style code; unknown relation
        # answers 404 like the reference's HttpErrorStatus mapping
        status, resp = _post(port, {"stmt": "SELECT * FROM no_such_table_xyz"})
        assert status == 404 and resp["error"]["code"] == 4041
        # payload validation (SQLRequestParser semantics)
        status, resp = _post(port, {"foo": "bar"})
        assert status == 400 and "stmt" in resp["error"]["message"]
        status, resp = _post(
            port,
            {"stmt": "SELECT 1", "args": [1], "bulk_args": [[1]]},
        )
        assert status == 400 and "forbidden" in resp["error"]["message"]
        status, resp = _post(
            port, {"stmt": "SELECT $1 AS x", "bulk_args": []}
        )
        assert status == 200 and resp == {
            "cols": [], "results": [], "duration": 0.0
        }
        # root banner
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            banner = json.loads(r.read())
        assert banner["ok"] is True and banner["status"] == 200
        assert "cluster_name" in banner
    finally:
        srv.shutdown()


def test_http_sql_value_serialization(http_session):
    """Timestamps as epoch millis, arrays as JSON arrays — the
    reference's HTTP value mapping."""
    resp = execute_request(
        http_session,
        {"stmt": "SELECT ts, props FROM events WHERE event_id = 0"},
    )
    ts_ms = resp["rows"][0][0]
    assert isinstance(ts_ms, int) and 1_700_000_000_000 < ts_ms < 1_800_000_000_000
    resp2 = execute_request(http_session, {"stmt": "SELECT [1, 2, 3] AS arr"})
    assert resp2["rows"][0][0] == [1, 2, 3]


def test_http_sql_bulk_args(http_session, spark):
    resp = execute_request(
        http_session,
        {
            "stmt": "SELECT n_name FROM nation WHERE n_nationkey = $1",
            "bulk_args": [[0], [1], [99999]],
        },
    )
    assert [r["rowcount"] for r in resp["results"]] == [1, 1, 0]


def test_http_basic_auth(spark, tmp_path):
    """HTTP Basic auth against the role store
    (auth/HttpAuthUpstreamHandler analog): valid creds run AS that
    user; wrong password 401s; no header = trust as crate."""
    import base64
    import json
    import urllib.error
    import urllib.request

    from crate_spark.engine import CrateSession
    from crate_spark.http_sql import serve

    session = CrateSession(spark, "/root/testdata/sf0.001", storage_dir=str(tmp_path))
    session.execute("CREATE USER webuser WITH (password = 's3cret')")
    session.execute("GRANT DQL ON SCHEMA doc TO webuser")
    srv = serve(session, port=0)
    port = srv.server_address[1]

    def post(stmt, auth=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/_sql",
            data=json.dumps({"stmt": stmt}).encode(),
            headers={"Content-Type": "application/json"},
        )
        if auth:
            req.add_header(
                "Authorization", "Basic " + base64.b64encode(auth.encode()).decode()
            )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, None

    try:
        status, body = post("SELECT count(*) AS n FROM region", "webuser:s3cret")
        assert status == 200 and body["rows"][0][0] == 5
        # DML not granted -> MISSING_USER_PRIVILEGES 4011, HTTP 401
        # (HttpErrorStatus.java:60)
        status, body = post(
            "INSERT INTO region (r_regionkey) VALUES (9)", "webuser:s3cret"
        )
        assert status == 401
        assert post("SELECT 1", "webuser:wrong")[0] == 401
        assert post("SELECT 1", "ghost:x")[0] == 401
        # trust without header (superuser)
        assert post("SELECT 1 AS x")[0] == 200
    finally:
        srv.shutdown()


def test_http_bulk_duplicate_key_errors(spark, tmp_path):
    """Bulk runtime errors (http.rst "Bulk errors"): a failing arg row
    reports rowcount -2 + a DuplicateKeyException-family 4091 envelope
    while the other rows still apply; single-statement duplicates map
    to HTTP 409."""
    from crate_spark.engine import CrateSession
    from crate_spark.http_sql import execute_request

    s = CrateSession(spark, None, storage_dir=str(tmp_path))
    s.execute("CREATE TABLE dupk (id int PRIMARY KEY, v text)")
    s.execute("INSERT INTO dupk (id, v) VALUES (1, 'a')")
    resp = execute_request(
        s,
        {"stmt": "INSERT INTO dupk (id, v) VALUES (?, ?)",
         "bulk_args": [[2, "x"], [1, "y"], [3, "z"]]},
    )
    assert resp["cols"] == []
    rcs = [r["rowcount"] for r in resp["results"]]
    assert rcs == [1, -2, 1]
    assert resp["results"][1]["error"]["code"] == 4091
    assert s.execute("SELECT count(*) AS n FROM dupk").collect()[0]["n"] == 3
