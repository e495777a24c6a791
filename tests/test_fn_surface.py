"""The reference's documented builtin surface, end-to-end through the
SQL front door.

One probe per anchor in ``/root/reference/docs/general/builtins/*.rst``
(scalar-functions, aggregation, table-functions, array-comparisons,
bit-operators, subquery-expressions) — every documented function must
at least parse, plan, and execute via ``CrateSession.execute``. Value
semantics are pinned elsewhere (oracle registry, slt corpus); this
file pins the SURFACE so a regression in the dialect shim can't
silently drop a documented function.

Probes live in ``scripts/fn_sweep.py`` so the same list drives the
interactive sweep and CI.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from crate_spark.engine import CrateSession

from .conftest import SF_DIR

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from fn_sweep import PROBES  # noqa: E402


@pytest.fixture(scope="module")
def session(spark):
    return CrateSession(spark, SF_DIR)

# targeted value assertions for the probes added this round (the rest
# return booleans/constants the probe itself asserts via execution)
EXPECT = {
    "quote_ident": [("my col", '"my col"'), ("abc", "abc"), ('a"b', '"a""b"')],
    "parse_ident": [('"A".b.c', ["A", "b", "c"])],
    "format_type": None,  # checked below
}


def test_documented_surface(session):
    failed = {}
    for name, sql in PROBES.items():
        try:
            session.execute(sql).collect()
        except Exception as e:  # noqa: BLE001
            failed[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
    assert not failed, f"{len(failed)} documented probes broke: {failed}"


def test_quote_ident_values(session):
    rows = session.execute(
        "SELECT quote_ident('my col') AS a, quote_ident('abc') AS b, "
        "quote_ident('a\"b') AS c, quote_ident('Abc') AS d"
    ).collect()[0]
    assert list(rows) == ['"my col"', "abc", '"a""b"', '"Abc"']


def test_parse_ident_values(session):
    got = session.execute("SELECT parse_ident('\"A\".b.c') AS v").collect()[0][0]
    assert list(got) == ["A", "b", "c"]


def test_format_type_values(session):
    rows = session.execute(
        "SELECT format_type(20, NULL) AS a, format_type(1007, NULL) AS b, "
        "format_type(99999, NULL) AS c, format_type(NULL, NULL) AS d"
    ).collect()[0]
    assert list(rows) == ["bigint", "integer[]", "???", None]


def test_generate_series_tvf(session):
    got = [r[0] for r in session.execute(
        "SELECT * FROM generate_series(1, 4)"
    ).collect()]
    assert got == [1, 2, 3, 4]
    # column is named after the function (reference table-functions.rst)
    df = session.execute("SELECT generate_series FROM generate_series(2, 8, 3)")
    assert [r[0] for r in df.collect()] == [2, 5, 8]
    # PG empty-set semantics: start > stop with positive step
    assert session.execute("SELECT * FROM generate_series(4, 1)").count() == 0
    # descending with negative step
    got = [r[0] for r in session.execute(
        "SELECT * FROM generate_series(4, 1, -1)"
    ).collect()]
    assert got == [4, 3, 2, 1]
    # aliased form joins like any relation
    got = session.execute(
        "SELECT g.x + 1 AS y FROM generate_series(1, 3) AS g(x) ORDER BY y"
    ).collect()
    assert [r[0] for r in got] == [2, 3, 4]


def test_generate_series_timestamps(session):
    got = [str(r[0]) for r in session.execute(
        "SELECT * FROM generate_series('2026-01-01'::timestamp, "
        "'2026-01-03'::timestamp, '1 day'::interval)"
    ).collect()]
    assert len(got) == 3 and got[0].startswith("2026-01-01")


def test_generate_subscripts_tvf(session):
    got = [r[0] for r in session.execute(
        "SELECT * FROM generate_subscripts([10, 20, 30], 1)"
    ).collect()]
    assert got == [1, 2, 3]
    got = [r[0] for r in session.execute(
        "SELECT * FROM generate_subscripts([10, 20], 1, true)"
    ).collect()]
    assert got == [2, 1]


def test_regexp_matches_tvf(session):
    # no groups: whole match, first only without g
    got = session.execute(
        "SELECT groups FROM regexp_matches('a1b2', '[0-9]')"
    ).collect()
    assert [list(r[0]) for r in got] == [["1"]]
    # g flag: one row per match
    got = session.execute(
        "SELECT groups FROM regexp_matches('a1b2', '[0-9]', 'g')"
    ).collect()
    assert [list(r[0]) for r in got] == [["1"], ["2"]]
    # capture groups
    got = session.execute(
        "SELECT groups FROM regexp_matches('k=v', '(\\w+)=(\\w+)')"
    ).collect()
    assert [list(r[0]) for r in got] == [["k", "v"]]
    # no match -> zero rows
    assert session.execute(
        "SELECT * FROM regexp_matches('abc', '[0-9]')"
    ).count() == 0


def test_object_literal_subscript(session):
    rows = session.execute(
        "SELECT ({a=1, b='x'})['a'] AS a, ({o={i=2}})['o']['i'] AS i"
    ).collect()[0]
    assert list(rows) == [1, 2]


def test_null_or_empty_object_literal(session):
    rows = session.execute(
        "SELECT null_or_empty({}) AS e, null_or_empty({a=1}) AS f, "
        "null_or_empty([]) AS g, null_or_empty([1]) AS h"
    ).collect()[0]
    assert list(rows) == [True, False, True, False]


def test_reference_cast_spellings(session):
    rows = session.execute(
        "SELECT '6372'::bytea IS NOT NULL AS a, 1::int8 AS b, "
        "1.5::float4 AS c, '1.2.3.4'::ip AS d, "
        "[1.0, 2.0]::float_vector(2) AS e"
    ).collect()[0]
    assert rows["b"] == 1 and rows["d"] == "1.2.3.4" and list(rows["e"]) == [1.0, 2.0]


def test_search_path_setting(session):
    assert session.execute(
        "SELECT current_setting('search_path') AS v"
    ).collect()[0][0] == "doc"
