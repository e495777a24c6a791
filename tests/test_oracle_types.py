"""Oracle output-type lint (VERDICT r5 "What's wrong" #2).

The r5 driver marked six queries red whose VALUES were correct: each
had a DuckDB oracle output column typed HUGEINT (uncast integer SUM,
widened to int128) or DECIMAL, which the driver's canonical hash
renders differently from Spark's bigint/decimal even when the values
are equal.  The repo's own fetchall-based compare can't see the
difference (int128 -> Python int), so this lint DESCRIBEs every
registered oracle against DuckDB and asserts the output types stay in
the driver-stable set.  A HUGEINT/DECIMAL oracle can never re-enter
the registry without failing this test.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from crate_spark.queries import load_all
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings".split()
)

#: Types whose canonical rendering is identical between Spark's
#: collected rows and DuckDB's — anything else (HUGEINT, DECIMAL,
#: UHUGEINT, TIME, UUID, interval, enum...) has bitten the driver or
#: plausibly could.
_STABLE = re.compile(
    r"^("
    r"BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|UTINYINT|USMALLINT|UINTEGER"
    r"|FLOAT|DOUBLE|VARCHAR|DATE|TIMESTAMP|TIMESTAMP WITH TIME ZONE|BLOB"
    r")$"
)
# Nested types are stable iff every leaf is stable.
_NEST = re.compile(r"^(.*)\[\]$|^MAP\((.*)\)$|^STRUCT\((.*)\)$|^UNION\((.*)\)$")


def _leaf_ok(t: str) -> bool:
    t = t.strip()
    m = re.match(r"^(.*)\[\]$", t)
    if m:
        return _leaf_ok(m.group(1))
    m = re.match(r"^(STRUCT|MAP|UNION)\((.*)\)$", t)
    if m:
        # split on top-level commas
        inner, depth, parts, cur = m.group(2), 0, [], []
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        for p in parts:
            # field entries look like `name TYPE`; take the trailing type
            p = p.strip()
            fm = re.match(r'^(?:"[^"]*"|\S+)\s+(.*)$', p)
            typ = fm.group(1) if fm else p
            if not _leaf_ok(typ):
                return False
        return True
    return bool(_STABLE.match(t))


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracles():
    return [
        (name, spec.oracle)
        for name, spec in load_all().items()
        if spec.oracle is not None
    ]


@pytest.mark.parametrize("name,oracle", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_output_types_driver_stable(duck_views, name, oracle):
    desc = duck_views.execute(f"DESCRIBE {oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if not _leaf_ok(typ)
    ]
    assert not bad, (
        f"{name}: driver-unstable DuckDB output type(s) {bad} — cast "
        f"integer aggregates to BIGINT and fractional ones to DOUBLE "
        f"(round first) in the oracle SQL; never emit HUGEINT/DECIMAL."
    )
