"""Blob tables: content-addressed storage + SQL listing + HTTP.

Reference behavior pinned here (docs/general/blobs.rst,
create-blob-table.rst):
- PUT verifies the sha1 digest; re-upload conflicts; GET round-trips
- SELECT digest, last_modified FROM blob.<t> lists blobs
- DROP BLOB TABLE removes the data
- the HTTP surface: PUT 201 / re-PUT 409 / GET 200 / HEAD / DELETE
"""

from __future__ import annotations

import hashlib
import urllib.request

import pytest

from crate_spark.blobs import BlobError
from crate_spark.engine import CrateSession


@pytest.fixture()
def sess(spark, tmp_path):
    return CrateSession(spark, None, storage_dir=str(tmp_path))


def test_blob_put_get_roundtrip(sess):
    sess.execute("CREATE BLOB TABLE myblobs CLUSTERED INTO 3 SHARDS")
    content = b"contents"
    digest = sess.put_blob("myblobs", content)
    assert digest == hashlib.sha1(content).hexdigest()
    assert sess.get_blob("myblobs", digest) == content
    assert sess.blob_exists("myblobs", digest)
    # digest verification (the PUT contract)
    with pytest.raises(BlobError):
        sess.put_blob("myblobs", b"other", digest)


def test_blob_sql_listing(sess):
    sess.execute("CREATE BLOB TABLE listed")
    d1 = sess.put_blob("listed", b"a")
    d2 = sess.put_blob("listed", b"b")
    rows = sess.execute(
        "SELECT digest FROM blob.listed ORDER BY digest"
    ).collect()
    assert [r["digest"] for r in rows] == sorted([d1, d2])
    # last_modified is a real timestamp
    lm = sess.execute("SELECT last_modified FROM blob.listed LIMIT 1").collect()[0][0]
    assert lm is not None
    # upload visible without explicit refresh
    d3 = sess.put_blob("listed", b"c")
    n = sess.execute("SELECT count(*) AS n FROM blob.listed").collect()[0]["n"]
    assert n == 3
    sess.delete_blob("listed", d3)
    n = sess.execute("SELECT count(*) AS n FROM blob.listed").collect()[0]["n"]
    assert n == 2
    # information_schema shows the blob schema
    schemas = {
        tuple(r)
        for r in sess.execute(
            "SELECT table_name, table_schema FROM information_schema.tables "
            "WHERE table_schema = 'blob'"
        ).collect()
    }
    assert ("listed", "blob") in schemas


def test_blob_content_df_feeds_pipeline(sess):
    sess.execute("CREATE BLOB TABLE payloads")
    d = sess.put_blob("payloads", b"\x00\x01binary")
    df = sess.blobs.get("payloads").content_df(sess.spark)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["digest"] == d
    assert bytes(rows[0]["content"]) == b"\x00\x01binary"


def test_blob_drop_and_errors(sess):
    sess.execute("CREATE BLOB TABLE tmp")
    with pytest.raises(BlobError):
        sess.execute("CREATE BLOB TABLE tmp")
    sess.put_blob("tmp", b"x")
    sess.execute("DROP BLOB TABLE tmp")
    with pytest.raises(BlobError):
        sess.get_blob("tmp", "0" * 40)
    # IF EXISTS tolerates absence
    sess.execute("DROP BLOB TABLE IF EXISTS tmp")


def test_blob_http_surface(sess):
    from crate_spark.http_sql import serve

    sess.execute("CREATE BLOB TABLE web")
    srv = serve(sess, port=0)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}/_blobs/web"
    content = b"http-payload"
    digest = hashlib.sha1(content).hexdigest()

    def req(method, path, data=None):
        r = urllib.request.Request(f"{base}/{path}", data=data, method=method)
        try:
            with urllib.request.urlopen(r) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, b""

    try:
        assert req("PUT", digest, content)[0] == 201
        assert req("PUT", digest, content)[0] == 409  # re-upload conflicts
        assert req("HEAD", digest)[0] == 200
        status, body = req("GET", digest)
        assert status == 200 and body == content
        # digest mismatch rejected
        bad = "0" * 40
        assert req("PUT", bad, b"zzz")[0] == 400
        assert req("DELETE", digest)[0] == 204
        assert req("HEAD", digest)[0] == 404
        assert req("GET", digest)[0] == 404
    finally:
        srv.shutdown()


def test_alter_blob_table_unknown_raises_clean_error(sess):
    """ALTER BLOB TABLE on a nonexistent table raises BlobError (the
    reference's RelationUnknown), not an AttributeError."""
    with pytest.raises(BlobError, match="does not exist"):
        sess.execute("ALTER BLOB TABLE no_such_blob SET (number_of_replicas = 2)")
