"""Oracle-checked inventory tests: every registered query with an oracle
must hash-match DuckDB at the test scale factor (sf0.001 by default —
the driver's own gate re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from crate_spark.queries import load_all
from tests.conftest import assert_matches_oracle

REGISTRY = load_all()
WITH_ORACLE = sorted(name for name, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    assert_matches_oracle(spark, duck, spec.fn, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    """Non-SQL-expressible ops: runs and yields a stable schema, >=0 rows."""
    spec = REGISTRY[name]
    df = spec.fn(spark, "/root/testdata/sf0.001")
    assert df.columns
    assert df.count() >= 0
