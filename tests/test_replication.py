"""Logical replication: publications, subscriptions, change capture.

Reference behavior pinned here (docs/admin/logical-replication.rst):
- CREATE PUBLICATION FOR TABLE / FOR ALL TABLES; ALTER ADD/DROP
- CREATE SUBSCRIPTION receives the initial snapshot, then
  continuously receives newly-inserted rows (Structured Streaming
  file-source capture of the publisher's append part-files)
- subscribed tables are read-only on the subscriber; writable again
  after DROP SUBSCRIPTION
- pg_publication / pg_publication_tables / pg_subscription catalogs
"""

from __future__ import annotations

import pytest

from crate_spark.engine import CrateSession
from crate_spark.streaming.replication import ReplicationError


@pytest.fixture()
def publisher(spark, tmp_path):
    return CrateSession(spark, None, storage_dir=str(tmp_path / "pub"))


@pytest.fixture()
def subscriber(spark, tmp_path):
    return CrateSession(spark, None, storage_dir=str(tmp_path / "sub"))


def test_publication_catalog(publisher):
    publisher.execute("CREATE TABLE metrics (id int, v double)")
    publisher.execute("CREATE TABLE logs (id int, line text)")
    publisher.execute("CREATE PUBLICATION pub1 FOR TABLE metrics")
    publisher.execute("ALTER PUBLICATION pub1 ADD TABLE logs")
    rows = publisher.execute(
        "SELECT pubname, tablename FROM pg_catalog.pg_publication_tables ORDER BY tablename"
    ).collect()
    assert [tuple(r) for r in rows] == [("pub1", "logs"), ("pub1", "metrics")]
    publisher.execute("ALTER PUBLICATION pub1 DROP TABLE logs")
    rows = publisher.execute(
        "SELECT puballtables FROM pg_catalog.pg_publication WHERE pubname='pub1'"
    ).collect()
    assert rows[0][0] is False
    with pytest.raises(ReplicationError):
        publisher.execute("CREATE PUBLICATION pub1 FOR ALL TABLES")
    with pytest.raises(ReplicationError):
        publisher.execute("CREATE PUBLICATION nope FOR TABLE missing_table")
    publisher.execute("DROP PUBLICATION pub1")


def test_subscription_snapshot_and_stream(publisher, subscriber):
    publisher.execute("CREATE TABLE ticks (id int, sym text)")
    publisher.execute("INSERT INTO ticks (id, sym) VALUES (1, 'AAA'), (2, 'BBB')")
    publisher.execute("CREATE PUBLICATION tickpub FOR TABLE ticks")

    subscriber.execute(
        f"CREATE SUBSCRIPTION ticksub CONNECTION 'file://{publisher.storage_dir}' "
        "PUBLICATION tickpub"
    )
    subscriber.subscriptions.wait_for_sync("ticksub")
    rows = subscriber.execute("SELECT id, sym FROM ticks ORDER BY id").collect()
    assert [(r[0], r[1]) for r in rows] == [(1, "AAA"), (2, "BBB")]

    # continuous capture: a new INSERT on the publisher arrives
    publisher.execute("INSERT INTO ticks (id, sym) VALUES (3, 'CCC')")
    subscriber.subscriptions.wait_for_sync("ticksub")
    rows = subscriber.execute("SELECT id, sym FROM ticks ORDER BY id").collect()
    assert [(r[0], r[1]) for r in rows] == [(1, "AAA"), (2, "BBB"), (3, "CCC")]

    # read-only while subscribed
    with pytest.raises(Exception, match="logical replication"):
        subscriber.execute("INSERT INTO ticks (id, sym) VALUES (9, 'XXX')")

    # catalog row
    sub = subscriber.execute(
        "SELECT subname, subenabled, subpublications FROM pg_catalog.pg_subscription"
    ).collect()[0]
    assert sub["subname"] == "ticksub" and sub["subenabled"] is True
    assert list(sub["subpublications"]) == ["tickpub"]

    # dropping the subscription stops the stream and unlocks the table
    subscriber.execute("DROP SUBSCRIPTION ticksub")
    subscriber.execute("INSERT INTO ticks (id, sym) VALUES (4, 'DDD')")
    n = subscriber.execute("SELECT count(*) AS n FROM ticks").collect()[0]["n"]
    assert n == 4


def test_subscription_all_tables(publisher, subscriber):
    publisher.execute("CREATE TABLE a1 (id int)")
    publisher.execute("CREATE TABLE a2 (id int)")
    publisher.execute("INSERT INTO a1 (id) VALUES (1)")
    publisher.execute("INSERT INTO a2 (id) VALUES (2)")
    publisher.execute("CREATE PUBLICATION everything FOR ALL TABLES")
    subscriber.execute(
        f"CREATE SUBSCRIPTION repl CONNECTION 'file://{publisher.storage_dir}' "
        "PUBLICATION everything"
    )
    subscriber.subscriptions.wait_for_sync("repl")
    assert subscriber.execute("SELECT id FROM a1").collect()[0][0] == 1
    assert subscriber.execute("SELECT id FROM a2").collect()[0][0] == 2
    subscriber.execute("DROP SUBSCRIPTION repl")


def test_subscription_errors(subscriber, tmp_path):
    with pytest.raises(ReplicationError):
        subscriber.execute(
            "CREATE SUBSCRIPTION bad CONNECTION 'file:///nonexistent' PUBLICATION p"
        )
    with pytest.raises(ReplicationError):
        subscriber.execute(
            "CREATE SUBSCRIPTION bad CONNECTION 'crate://remote:4300' PUBLICATION p"
        )
    subscriber.execute("DROP SUBSCRIPTION IF EXISTS bad")
