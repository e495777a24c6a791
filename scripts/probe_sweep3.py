"""Constant sweep #3 probe: candidate reference constants not yet
pinned — array family, bitwise, math corners, collection fns,
null_or_empty, _map, ignore3vl, interval arithmetic, age.
Prints MISMATCH/ERROR rows; OK rows are counted only."""
from crate_spark.session import get_spark
from crate_spark.engine import CrateSession

spark = get_spark()
sess = CrateSession(spark)

E = object()  # marker: expect an error

CASES = [
    # --- ArrayAppendFunctionTest / ArrayPrependFunctionTest
    ("array_append([1, 2], 3)", [1, 2, 3]),
    ("array_append([1, 2], null)", [1, 2, None]),
    ("array_append(null::int[], 1)", [1]),
    ("array_append(cast([] as array(integer)), 1)", [1]),
    ("array_prepend(3, [1, 2])", [3, 1, 2]),
    ("array_prepend(null, [1, 2])", [None, 1, 2]),
    ("array_prepend(1, null::int[])", [1]),
    # --- ArrayCatFunctionTest
    ("array_cat([1::integer], [1::long])", [1, 1]),
    ("array_cat([], [111, 222, 333])", [111, 222, 333]),
    ("array_cat([1, null, 2], [2, 3])", [1, None, 2, 2, 3]),
    # --- ArrayDifferenceFunctionTest
    ("array_difference([[1, 2], [1, 3]], [[1, 2]])", [[1, 3]]),
    ("array_difference([1::integer], [1::long])", []),
    ("array_difference([1, 2, 3], [2])", [1, 3]),
    ("array_difference([1, null, 2, null], [2])", [1, None, None]),
    # --- ArrayUniqueFunctionTest
    ("array_unique(['foo', 'bar', 'baz', 'baz'])", ["foo", "bar", "baz"]),
    ("array_unique([10, 20], [10.1, 20.0])", [10.0, 20.0, 10.1]),
    ("array_unique([1, null, 3], [null, 2, 3])", [1, None, 3, 2]),
    ("array_unique([], [111, 222, 333])", [111, 222, 333]),
    ("array_unique([[0, 0], [1, 1]], [[0, 0], [1, 1]])", [[0, 0], [1, 1]]),
    # --- ArraySetFunctionTest
    ("array_set([1,2,3], [3::long], [-1])", [1, 2, -1]),
    ("array_set([1,2,3], [4], [-1])", [1, 2, 3, -1]),
    ("array_set([1,2,3], [5], [-1])", [1, 2, 3, None, -1]),
    ("array_set([1,2,3], [], [])", [1, 2, 3]),
    ("array_set([1,2,3], null, null)", [1, 2, 3]),
    ("array_set([], [1], [1])", [1]),
    ("array_set([1,2,3], [1,1,1], [1,2,3])", [3, 2, 3]),
    ("array_set([1, 2, 3], 2, 10)", [1, 10, 3]),
    ("array_set(null, 2, 10)", None),
    ("array_set([1, 2, 3], null, 10)", None),
    ("array_set([1, 2, 3], 2, null)", [1, None, 3]),
    # --- ArrayToStringFunctionTest
    ("array_to_string(cast([] as array(integer)), ',')", ""),
    ("array_to_string([1, 2, 3], '')", "123"),
    ("array_to_string([1, null, 3], '', '2')", "123"),
    ("array_to_string([1, 2, 3], ', ')", "1, 2, 3"),
    ("array_to_string([1, null, 3], ', ')", "1, 3"),
    ("array_to_string(['', '', ''], ', ')", ", , "),
    ("array_to_string(cast([null, null, null] as array(integer)), ', ')", ""),
    ("array_to_string([1, null, 2], ', ', 'xyz')", "1, xyz, 2"),
    ("array_to_string(cast([null, null, null] as array(integer)), ', ', 'xyz')", "xyz, xyz, xyz"),
    ("array_to_string([1, null, 2], ', ', null)", "1, 2"),
    # --- ArrayMax/Min
    ("array_max([null, 1])", 1),
    ("array_max([3, 1, 2])", 3),
    ("array_min([null, 1])", 1),
    ("array_min([3, 1, 2])", 1),
    # --- ArrayLower/Upper/Length
    ("array_lower([4, 5], 1)", 1),
    ("array_lower([4, 5], 3)", None),
    ("array_lower([1], 0)", None),
    ("array_lower([1], -1)", None),
    ("array_lower([[1, 4], [3], []], 2)", None),
    ("array_lower([[1, 4], null, [1, 2]], 2)", None),
    ("array_lower([[1, 2, 3], [3, 4]], 2)", 1),
    ("array_lower(cast([] as array(integer)), 1)", None),
    ("array_upper([4, 5], 1)", 2),
    ("array_upper([4, 5], 3)", None),
    ("array_upper([[3, 4], [1, 2, 3]], 2)", 3),
    ("array_upper(cast([] as array(integer)), 1)", None),
    ("array_length([2, 3, 4], 1)", 3),
    ("array_length([1], 0)", None),
    ("array_length([1], -1)", None),
    # --- ArrayOverlap
    ("array_overlap([1, 2], [2, 3])", True),
    ("array_overlap([1, 2], [3, 4])", False),
    ("[1, 2] && [2, 3]", True),
    ("[1, 2] && [3, 4]", False),
    # --- CollectionCount / CollectionAvg (documented as array fns?)
    # --- NullOrEmpty
    ("null_or_empty(null::object)", True),
    ("null_or_empty({a = 10})", False),
    ("null_or_empty({})", True),
    ("null_or_empty(null::text[])", True),
    ("null_or_empty(['foo', 'bar'])", False),
    ("null_or_empty([])", True),
    # --- LengthFunctionTest
    ("octet_length('crate')", 5),
    ("octet_length('')", 0),
    ("bit_length('crate')", 40),
    ("bit_length('')", 0),
    ("char_length('crate')", 5),
    ("octet_length(null)", None),
    ("length('crate')", 5),
    # --- Bitwise (values derived from Java semantics) + bit strings
    ("5 & 3", 1),
    ("5 | 3", 7),
    ("5 # 3", 6),
    ("1 & null", None),
    ("null & 1", None),
    ("12::byte # 10::byte", 6),
    ("200::short & 236::short", 200),
    ("B'10001' & B'10101'", "10001"),
    ("B'10001' | B'00101'", "10101"),
    ("B'10001' # B'10101'", "00100"),
    # --- _map / ObjectMerge (concat on objects)
    ("_map(10, 2)", '{"10":2}'),
    ("_map('foo', 10)", '{"foo":10}'),
    ("_map('foo', 10, 'bar', 'some')", '{"foo":10,"bar":"some"}'),
    # --- ignore3vl
    ("ignore3vl(false)", False),
    ("ignore3vl(true)", True),
    ("ignore3vl(null)", False),
    # --- Interval arithmetic (IntervalFunctionTest) via EXTRACT/text
    ("EXTRACT(SECOND FROM (interval '1 second' + interval '1 second'))", 2),
    ("EXTRACT(SECOND FROM (interval '1000 millisecond' + interval '1 second'))", 2),
    ("EXTRACT(YEAR FROM (interval '1100 years' + interval '2000 years'))", 3100),
    ("EXTRACT(YEAR FROM (interval '-10 years' + interval '1 years'))", -9),
    ("EXTRACT(SECOND FROM (interval '2 second' - interval '1 second'))", 1),
    ("EXTRACT(YEAR FROM (interval '1 month' + interval '1 year'))", 1),
    ("EXTRACT(MONTH FROM (interval '1 month' + interval '1 year'))", 1),
    ("EXTRACT(YEAR FROM (2 * interval '2 years 1 month 10 days'))", 4),
    ("EXTRACT(MONTH FROM (2 * interval '2 years 1 month 10 days'))", 2),
    ("EXTRACT(DAY FROM (2 * interval '2 years 1 month 10 days'))", 20),
    ("EXTRACT(DAY FROM (-10 * interval '1 day'))", -10),
    ("EXTRACT(MINUTE FROM (900 * interval '1 second'))", 15),
    ("EXTRACT(MINUTE FROM (interval '1 millisecond' * 900000))", 15),
    ("EXTRACT(HOUR FROM (interval '1 hour' * 3.5))", 3),
    ("EXTRACT(HOUR FROM (3.5 * interval '1 hour'))", 3),
    # --- Age (Joda yearMonthDayTime normalization)
    ("age('2021-01-09T00:00:00'::timestamp, '2021-01-01T00:00:00'::timestamp)", "?"),
    ("EXTRACT(DAY FROM age('2021-01-09T00:00:00'::timestamp, '2021-01-01T00:00:00'::timestamp))", 8),
    ("EXTRACT(MONTH FROM age('2021-02-01T00:00:00'::timestamp, '2021-01-01T00:00:00'::timestamp))", 1),
    ("EXTRACT(YEAR FROM age('2021-01-01T00:00:00'::timestamp, '2019-10-28T19:54:53.993'::timestamp))", 1),
    ("EXTRACT(MONTH FROM age('2021-01-01T00:00:00'::timestamp, '2019-10-28T19:54:53.993'::timestamp))", 2),
    ("EXTRACT(DAY FROM age('2021-01-01T00:00:00'::timestamp, '2019-10-28T19:54:53.993'::timestamp))", 3),
    ("EXTRACT(HOUR FROM age('2021-01-01T00:00:00'::timestamp, '2019-10-28T19:54:53.993'::timestamp))", 4),
    ("age(null)", None),
    # --- Abs/Negate numeric
    ("abs(-2)", 2),
    ("abs(cast(-12.23 as numeric(4,2)))", 12.23),
    ("- 12.34::numeric", -12.34),
    ("- CAST(36 as REAL)", -36.0),
    # --- log/power corners
    ("log(10, 100)", 0.5),
    ("power(2,-3)", 0.125),
    ("sqrt(25)", 5.0),
]

import decimal
ok = bad = 0
for expr, want in CASES:
    try:
        got = sess.execute(f"SELECT {expr} AS v").collect()[0][0]
    except Exception as e:
        print(f"ERROR  {expr}\n    {type(e).__name__}: {str(e)[:160]}")
        bad += 1
        continue
    if want == "?":
        print(f"PROBE  {expr} -> {got!r}")
        continue
    g = got
    if isinstance(g, decimal.Decimal):
        g = float(g)
    if isinstance(g, float) and isinstance(want, (int, float)) and want is not None:
        match = abs(g - float(want)) < 1e-9
    else:
        match = g == want
    if match:
        ok += 1
    else:
        print(f"MISMATCH  {expr}\n    got {got!r} want {want!r}")
        bad += 1
print(f"\n{ok} ok, {bad} bad, {len(CASES)} total")
