"""Property-based tests for the dialect shim (hypothesis).

The rewrite layer is pure text transformation guarded by literal
masking; these properties pin its invariants against the regex-edge
bugs unit examples can miss:

- string literals survive BYTE-EXACT end-to-end (mask -> rewrites ->
  unmask -> Spark parse -> value), whatever crate-ism syntax they
  contain;
- no internal mask token ever leaks into the emitted SQL;
- integer-literal division chains match Python // (Java semantics,
  ArithmeticFunctions.java);
- parentheses stay balanced through every rewrite.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crate_spark.dialect import rewrite

# text that exercises the masking: quotes doubled per SQL, plus the
# operator characters every rewrite pass matches on
_TRICKY = st.text(
    alphabet=st.sampled_from(
        list("abcZ09 _%\\~*#[]{}():=<>/.-+$'\"|^?!")
    ),
    min_size=0,
    max_size=24,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@settings(max_examples=200, deadline=None)
@given(_TRICKY)
def test_no_mask_token_leaks(s):
    out = rewrite(f"SELECT {_sql_quote(s)} AS v, 1 + 1 AS w FROM t")
    assert not re.search(r"__LIT_\d+__", out)
    assert "__OBJSTRUCT__" not in out


@settings(max_examples=200, deadline=None)
@given(_TRICKY, _TRICKY)
def test_parens_stay_balanced(a, b):
    sql = (
        f"SELECT x::int AS c, {_sql_quote(a)} AS v FROM t "
        f"WHERE y LIKE {_sql_quote(b)} AND arr[1] = 2"
    )
    out = rewrite(sql)
    outside = re.sub(r"'(?:[^']|'')*'", "", out)  # parens in literals don't count
    assert outside.count("(") == outside.count(")")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=999), min_size=2, max_size=4))
def test_int_division_chain_matches_java(terms):
    """1-literal division chains rewrite to Java integer division
    (left-assoc truncation), per ArithmeticFunctions.java:78-85."""
    sql = rewrite("SELECT " + "/".join(map(str, terms)) + " AS v")
    m = re.fullmatch(r"SELECT (div\(.*\)) AS v", sql)
    assert m, sql
    expect = terms[0]
    for t in terms[1:]:
        expect = int(expect / t)  # Java truncates toward zero
    py = m.group(1).replace("div(", "int.__floordiv__(")
    # evaluate the emitted div() tree with Python ints (positive
    # operands: floordiv == Java truncation)
    assert eval(py) == expect  # noqa: S307 - test-local arithmetic


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_TRICKY)
def test_literals_roundtrip_through_spark(spark, s):
    """The masked literal reaches Spark byte-exact: whatever operator
    soup it contains, the VALUE comes back unchanged."""
    df = spark.sql(rewrite(f"SELECT {_sql_quote(s)} AS v"))
    assert df.collect()[0][0] == s
