"""Sweep the reference's documented scalar/aggregate surface through
the SQL front door, one invocation per function, and report failures.

Used interactively (not in CI) to find residual SQL-surface gaps vs
/root/reference/docs/general/builtins/*.rst.
"""

from __future__ import annotations

import sys
import traceback

from crate_spark.engine import CrateSession

# One plausible documented invocation per function anchor.
PROBES = {
    # strings
    "concat": "SELECT concat('a', 'b') AS v",
    "||": "SELECT 'a' || 'b' AS v",
    "concat_ws": "SELECT concat_ws('-', 'a', 'b', NULL, 'c') AS v",
    "format": "SELECT format('%s-%s', 'a', 1) AS v",
    "substr": "SELECT substr('crate.io', 3, 2) AS v",
    "substring_from_for": "SELECT substring('crate.io' FROM 3 FOR 2) AS v",
    "char_length": "SELECT char_length('crate') AS v",
    "length": "SELECT length('crate') AS v",
    "bit_length": "SELECT bit_length('crate') AS v",
    "octet_length": "SELECT octet_length('crate') AS v",
    "ascii": "SELECT ascii('a') AS v",
    "chr": "SELECT chr(65) AS v",
    "lower": "SELECT lower('ABC') AS v",
    "upper": "SELECT upper('abc') AS v",
    "initcap": "SELECT initcap('hello world') AS v",
    "sha1": "SELECT sha1('crate') AS v",
    "md5": "SELECT md5('crate') AS v",
    "replace": "SELECT replace('Hello World', 'l', 'x') AS v",
    "translate": "SELECT translate('Crate', 'Ct', 'Dk') AS v",
    "trim": "SELECT trim('  x  ') AS v",
    "trim_both_chars": "SELECT trim(BOTH 'ab' FROM 'abcba') AS v",
    "trim_leading": "SELECT trim(LEADING 'a' FROM 'aab') AS v",
    "ltrim": "SELECT ltrim('xxabc', 'x') AS v",
    "rtrim": "SELECT rtrim('abcxx', 'x') AS v",
    "btrim": "SELECT btrim('xxabcxx', 'x') AS v",
    "quote_ident": "SELECT quote_ident('my col') AS v",
    "parse_ident": "SELECT parse_ident('\"a\".b.c') AS v",
    "left": "SELECT left('crate.io', 5) AS v",
    "right": "SELECT right('crate.io', 2) AS v",
    "starts_with": "SELECT starts_with('crate', 'cra') AS v",
    "lpad": "SELECT lpad('x', 5, 'ab') AS v",
    "rpad": "SELECT rpad('x', 5, 'ab') AS v",
    "encode": "SELECT encode('crate'::bytea, 'hex') AS v",
    "decode_hex": "SELECT decode('6372617465', 'hex') AS v",
    "repeat": "SELECT repeat('ab', 3) AS v",
    "strpos": "SELECT strpos('crate', 'at') AS v",
    "position": "SELECT position('at' in 'crate') AS v",
    "reverse": "SELECT reverse('crate') AS v",
    "split_part": "SELECT split_part('a|b|c', '|', 2) AS v",
    "parse_uri": "SELECT parse_uri('https://u@h:1/p?q=1#f') AS v",
    "parse_url": "SELECT parse_url('https://u@h:1/p?q=1#f') AS v",
    # date/time
    "date_trunc": "SELECT date_trunc('hour', '2026-01-02T03:04:05'::timestamp) AS v",
    "extract_day": "SELECT extract(day FROM '2026-01-02'::timestamp) AS v",
    "current_time": "SELECT current_time IS NOT NULL AS v",
    "current_timestamp": "SELECT current_timestamp IS NOT NULL AS v",
    "curdate": "SELECT curdate() IS NOT NULL AS v",
    "current_date": "SELECT current_date IS NOT NULL AS v",
    "now": "SELECT now() IS NOT NULL AS v",
    "date_format": "SELECT date_format('%Y-%m', '2026-01-02T03:04:05'::timestamp) AS v",
    "timezone": "SELECT timezone('UTC', '2026-01-02T03:04:05'::timestamp) AS v",
    "to_char": "SELECT to_char('2026-01-02T03:04:05'::timestamp, 'YYYY-MM') AS v",
    "age": "SELECT age('2026-01-02'::timestamp, '2026-01-01'::timestamp) IS NOT NULL AS v",
    "date_bin": "SELECT date_bin('2 hours'::interval, '2026-01-02T03:04:05'::timestamp, '2026-01-01T00:00:00'::timestamp) AS v",
    # geo
    "distance": "SELECT distance('POINT(0 0)', 'POINT(1 1)') > 0 AS v",
    "within": "SELECT within('POINT(1 1)', 'POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS v",
    "intersects": "SELECT intersects('POINT(1 1)', 'POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS v",
    "latitude": "SELECT latitude('POINT(3 4)') AS v",
    "longitude": "SELECT longitude('POINT(3 4)') AS v",
    "geohash": "SELECT geohash('POINT(3 4)') AS v",
    "area": "SELECT area('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))') > 0 AS v",
    # math
    "abs": "SELECT abs(-3) AS v",
    "sign": "SELECT sign(-3) AS v",
    "ceil": "SELECT ceil(1.2) AS v",
    "ceiling": "SELECT ceiling(1.2) AS v",
    "degrees": "SELECT degrees(3.141592653589793) AS v",
    "exp": "SELECT exp(1.0) AS v",
    "floor": "SELECT floor(1.8) AS v",
    "ln": "SELECT ln(2.718281828) AS v",
    "log": "SELECT log(100) AS v",
    "log_base": "SELECT log(2, 8) AS v",
    "modulus": "SELECT modulus(5, 4) AS v",
    "mod": "SELECT mod(5, 4) AS v",
    "power": "SELECT power(2, 10) AS v",
    "radians": "SELECT radians(180.0) AS v",
    "random": "SELECT random() >= 0 AS v",
    "gen_random_text_uuid": "SELECT length(gen_random_text_uuid()) > 0 AS v",
    "round": "SELECT round(42.499) AS v",
    "trunc": "SELECT trunc(42.999) AS v",
    "trunc_digits": "SELECT trunc(42.999, 1) AS v",
    "sqrt": "SELECT sqrt(9.0) AS v",
    "sin": "SELECT sin(0.5) AS v",
    "asin": "SELECT asin(0.5) AS v",
    "cos": "SELECT cos(0.5) AS v",
    "acos": "SELECT acos(0.5) AS v",
    "tan": "SELECT tan(0.5) AS v",
    "cot": "SELECT cot(0.5) AS v",
    "atan": "SELECT atan(0.5) AS v",
    "atan2": "SELECT atan2(1, 1) AS v",
    "pi": "SELECT pi() AS v",
    # regexp
    "regexp_count": "SELECT regexp_count('a1b2', '[0-9]') AS v",
    "regexp_replace": "SELECT regexp_replace('a1b2', '[0-9]', 'x') AS v",
    "regexp_replace_g": "SELECT regexp_replace('a1b2', '[0-9]', 'x', 'g') AS v",
    "regexp_instr": "SELECT regexp_instr('a1b2', '[0-9]') AS v",
    "regexp_matches": "SELECT regexp_matches('a1b2', '[0-9]') AS v",
    # arrays
    "array_append": "SELECT array_append([1,2], 3) AS v",
    "array_cat": "SELECT array_cat([1,2], [3]) AS v",
    "array_unique": "SELECT array_unique([1,1,2]) AS v",
    "array_difference": "SELECT array_difference([1,2,3], [2]) AS v",
    "array_ctor": "SELECT array(1, 2, 3) AS v",
    "array_literal": "SELECT [1, 2, 3] AS v",
    "array_typed_literal": "SELECT ARRAY[1, 2, 3] AS v",
    "array_upper": "SELECT array_upper([1,2,3], 1) AS v",
    "array_length": "SELECT array_length([1,2,3], 1) AS v",
    "array_lower": "SELECT array_lower([1,2,3], 1) AS v",
    "array_overlap": "SELECT array_overlap([1,2], [2,3]) AS v",
    "array_set": "SELECT array_set([1,2,3], 1, 9) AS v",
    "array_slice": "SELECT array_slice([1,2,3,4], 2, 3) AS v",
    "array_subscript_slice": "SELECT ([1,2,3,4])[2:3] AS v",
    "array_to_string": "SELECT array_to_string([1,2,3], ',') AS v",
    "string_to_array": "SELECT string_to_array('a,b', ',') AS v",
    "string_to_array_nullstr": "SELECT string_to_array('a,b,z', ',', 'z') AS v",
    "array_min": "SELECT array_min([3,1,2]) AS v",
    "array_position": "SELECT array_position([1,2,3], 2) AS v",
    "array_prepend": "SELECT array_prepend(0, [1,2]) AS v",
    "array_max": "SELECT array_max([3,1,2]) AS v",
    "array_sum": "SELECT array_sum([1,2,3]) AS v",
    "array_avg": "SELECT array_avg([1,2,3]) AS v",
    "array_unnest": "SELECT array_unnest([[1,2],[3]]) AS v",
    "null_or_empty_array": "SELECT null_or_empty([]) AS v",
    # objects
    "object_keys": "SELECT object_keys({a=1, b=2}) AS v",
    "object_literal": "SELECT {a=1, b='x'} AS v",
    "concat_object": "SELECT concat({a=1}, {b=2}) AS v",
    "null_or_empty_object": "SELECT null_or_empty({}) AS v",
    "object_subscript": "SELECT ({a=1})['a'] AS v",
    # conditional
    "case": "SELECT CASE WHEN 1=1 THEN 'y' ELSE 'n' END AS v",
    "if": "SELECT if(1=1, 'y', 'n') AS v",
    "coalesce": "SELECT coalesce(NULL, 'x') AS v",
    "greatest": "SELECT greatest(1, 2, 3) AS v",
    "least": "SELECT least(1, 2, 3) AS v",
    "nullif": "SELECT nullif(1, 1) AS v",
    # sysinfo
    "current_schema": "SELECT current_schema AS v",
    "current_schemas": "SELECT current_schemas(true) AS v",
    "current_user": "SELECT current_user AS v",
    "current_role": "SELECT current_role AS v",
    "user": "SELECT user AS v",
    "session_user": "SELECT session_user AS v",
    "has_database_privilege": "SELECT has_database_privilege('crate', 'CONNECT') AS v",
    "has_schema_privilege": "SELECT has_schema_privilege('doc', 'USAGE') AS v",
    "has_table_privilege": "SELECT has_table_privilege('sys.summits', 'SELECT') AS v",
    "has_function_privilege": "SELECT has_function_privilege('f', 'EXECUTE') AS v",
    "pg_backend_pid": "SELECT pg_backend_pid() AS v",
    "pg_postmaster_start_time": "SELECT pg_postmaster_start_time() IS NOT NULL AS v",
    "pg_sleep": "SELECT pg_sleep(0.0) AS v",
    "current_catalog": "SELECT current_catalog AS v",
    "current_database": "SELECT current_database() AS v",
    "current_setting": "SELECT current_setting('search_path') AS v",
    "pg_get_expr": "SELECT pg_get_expr(NULL, 0) AS v",
    "pg_get_partkeydef": "SELECT pg_get_partkeydef(0) AS v",
    "pg_get_serial_sequence": "SELECT pg_get_serial_sequence('t', 'c') AS v",
    "pg_encoding_to_char": "SELECT pg_encoding_to_char(6) AS v",
    "pg_get_userbyid": "SELECT pg_get_userbyid(0) AS v",
    "pg_typeof": "SELECT pg_typeof(1) AS v",
    "pg_function_is_visible": "SELECT pg_function_is_visible(0) AS v",
    "pg_table_is_visible": "SELECT pg_table_is_visible(0) AS v",
    "pg_get_function_result": "SELECT pg_get_function_result(0) AS v",
    "pg_get_constraintdef": "SELECT pg_get_constraintdef(0) AS v",
    "version": "SELECT version() AS v",
    "col_description": "SELECT col_description(0, 0) AS v",
    "obj_description": "SELECT obj_description(0, 'pg_class') AS v",
    "format_type": "SELECT format_type(25, NULL) AS v",
    # special
    "ignore3vl": "SELECT ignore3vl(NULL) AS v",
    "vector_similarity": "SELECT vector_similarity([1.0, 0.0]::float_vector(2), [0.0, 1.0]::float_vector(2)) AS v",
    # bit operators
    "bit_and_op": "SELECT 5 & 3 AS v",
    "bit_or_op": "SELECT 5 | 3 AS v",
    "bit_xor_op": "SELECT 5 # 3 AS v",
    # aggregates (over a VALUES relation)
    "agg_arbitrary": "SELECT arbitrary(x) IS NOT NULL AS v FROM (VALUES (1), (2)) t(x)",
    "agg_any_value": "SELECT any_value(x) IS NOT NULL AS v FROM (VALUES (1), (2)) t(x)",
    "agg_array_agg": "SELECT array_agg(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_avg": "SELECT avg(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_avg_distinct": "SELECT avg(DISTINCT x) AS v FROM (VALUES (1), (2), (2)) t(x)",
    "agg_count": "SELECT count(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_count_distinct": "SELECT count(DISTINCT x) AS v FROM (VALUES (1), (2), (2)) t(x)",
    "agg_count_star": "SELECT count(*) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_geometric_mean": "SELECT geometric_mean(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_hyperloglog_distinct": "SELECT hyperloglog_distinct(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_mean": "SELECT mean(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_min": "SELECT min(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_max": "SELECT max(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_max_by": "SELECT max_by(x, y) AS v FROM (VALUES (1, 10), (2, 20)) t(x, y)",
    "agg_min_by": "SELECT min_by(x, y) AS v FROM (VALUES (1, 10), (2, 20)) t(x, y)",
    "agg_stddev": "SELECT stddev(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_stddev_pop": "SELECT stddev_pop(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_stddev_samp": "SELECT stddev_samp(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_string_agg": "SELECT string_agg(x, ',') AS v FROM (VALUES ('a'), ('b')) t(x)",
    "agg_percentile": "SELECT percentile(x, 0.5) AS v FROM (VALUES (1.0), (2.0), (3.0)) t(x)",
    "agg_percentile_arr": "SELECT percentile(x, [0.25, 0.75]) AS v FROM (VALUES (1.0), (2.0), (3.0)) t(x)",
    "agg_sum": "SELECT sum(x) AS v FROM (VALUES (1), (2)) t(x)",
    "agg_variance": "SELECT variance(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
    "agg_topk": "SELECT topk(x) IS NOT NULL AS v FROM (VALUES ('a'), ('a'), ('b')) t(x)",
    "agg_topk_k": "SELECT topk(x, 2) IS NOT NULL AS v FROM (VALUES ('a'), ('a'), ('b')) t(x)",
    # table functions
    "tf_unnest": "SELECT * FROM unnest([1, 2, 3])",
    "tf_generate_series": "SELECT * FROM generate_series(1, 3)",
    "tf_generate_series_step": "SELECT * FROM generate_series(1, 10, 3)",
    "tf_generate_series_ts": "SELECT * FROM generate_series('2026-01-01'::timestamp, '2026-01-03'::timestamp, '1 day'::interval)",
    "tf_generate_subscripts": "SELECT * FROM generate_subscripts([10,20], 1)",
    "tf_regexp_matches": "SELECT * FROM regexp_matches('a1b2', '[0-9]')",
    # window function grammar (window-functions.rst)
    "win_agg_filter": "SELECT x, sum(x) FILTER (WHERE x > 1) OVER () AS s FROM (VALUES (1),(2),(3)) t(x)",
    "win_count_star_filter": "SELECT count(*) FILTER (WHERE x > 1) OVER (ORDER BY x) AS n FROM (VALUES (1),(2),(3)) t(x)",
    "win_lag_ignore_nulls": "SELECT lag(y) IGNORE NULLS OVER (ORDER BY x) AS p FROM (VALUES (1, 10), (2, NULL), (3, 30)) t(x, y)",
    "win_first_ignore_nulls": "SELECT first_value(y) IGNORE NULLS OVER (ORDER BY x) AS p FROM (VALUES (1, NULL), (2, 20)) t(x, y)",
    "values_standalone": "VALUES (1, 'a'), (2, 'b')",
    # subquery expressions
    "in_subquery": "SELECT 1 IN (SELECT * FROM unnest([1,2])) AS v",
    "any_subquery": "SELECT 1 = ANY (SELECT * FROM unnest([1,2])) AS v",
    "gt_any_subquery": "SELECT 3 > ANY (SELECT * FROM unnest([1,2])) AS v",
    "all_subquery": "SELECT 3 > ALL (SELECT * FROM unnest([1,2])) AS v",
    "exists_subquery": "SELECT EXISTS (SELECT * FROM unnest([1])) AS v",
}


def main() -> int:
    from crate_spark.session import get_spark

    spark = get_spark("fn-sweep", cpus=8, shuffle_partitions=8)
    sess = CrateSession(spark, "/root/testdata/sf0.001")
    failed = {}
    for name, sql in PROBES.items():
        try:
            df = sess.execute(sql)
            df.collect()
        except Exception as e:  # noqa: BLE001
            failed[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    print(f"{len(PROBES) - len(failed)}/{len(PROBES)} pass")
    for name, err in failed.items():
        print(f"FAIL {name}: {err}")
        print(f"     {PROBES[name]}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
