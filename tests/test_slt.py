"""sqllogictest-style golden-file runner.

Mirrors the reference's SQL logic tests
(``server/src/testFixtures/java/io/crate/test/integration/SQLLogicParser.java:51``,
runner ``SQLLogicITest.java:47``, corpus
``server/src/test/resources/integtests/arithmetic.test``): each .test
file holds query/expected-row blocks; queries run through CrateSession
(dialect shim active) and rows compare canonically.
"""

from __future__ import annotations

import math
from pathlib import Path

import pytest

from crate_spark.engine import CrateSession

SLT_DIR = Path(__file__).parent / "slt"


def parse_slt(path: Path):
    cases = []
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("query "):
            sql = line[len("query "):]
            assert lines[i + 1].strip() == "----", f"missing ---- after {sql}"
            i += 2
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].rstrip("\n").split("\t"))
                i += 1
            cases.append((sql, expected))
        else:
            i += 1
    return cases


def canon(v) -> str:
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        s = str(v.normalize())
        return s if "E" not in s else f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return f"{v:.12g}"
    return str(v)


ALL_CASES = [
    (f.name, sql, expected)
    for f in sorted(SLT_DIR.glob("*.test"))
    for sql, expected in parse_slt(f)
]


@pytest.fixture(scope="module")
def session(spark):
    return CrateSession(spark)


@pytest.mark.parametrize(
    "fname,sql,expected", ALL_CASES, ids=[f"{f}:{s[:40]}" for f, s, _ in ALL_CASES]
)
def test_slt(session, fname, sql, expected):
    rows = session.execute(sql).collect()
    got = [[canon(v) for v in row] for row in rows]
    want = [[c for c in row] for row in expected]
    assert got == want, f"{sql}\n  got:  {got}\n  want: {want}"
