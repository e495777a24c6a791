"""SQL DML/DDL statement routing for CrateSession.

The reference dispatches every statement kind from one planner
(``planner/Planner.java:273-500``: CreateTable, Insert, Update, Delete,
CopyFrom/CopyTo, DropTable; ``planner/operators/Insert.java:51``;
``docs/sql/statements/insert.rst:25-27`` for ON CONFLICT). This module
is the same dispatch for the SQL front door: conservative parsers for
the documented statement subset, each routed to the ``CrateTable``
storage layer (dml.py). Statements that don't match any DML/DDL shape
return None so the session falls through to ``spark.sql``.

Parsing philosophy matches dialect.py: string literals are masked
first, structure is found by depth-aware scanning (never by splitting
raw text), and anything outside the documented grammar raises a clear
error instead of guessing.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crate_spark.dialect import rewrite
from crate_spark.dml import CrateTable

#: CrateDB type spellings -> Spark DDL types
#: (reference ``types/DataTypes.java``; object columns are stored as
#: JSON strings per SURVEY.md §7 hard part (a))
_TYPE_MAP = {
    "text": "string",
    "ip": "string",
    "object": "string",
    "varchar": "string",
    "character varying": "string",
    "uuid": "string",
    "json": "string",
    "timestamp with time zone": "timestamp",
    "timestamp without time zone": "timestamp_ntz",
    "timestamptz": "timestamp",
    "byte": "tinyint",
    "short": "smallint",
    "integer": "int",
    "long": "bigint",
    "real": "float",
    "double precision": "double",
    "geo_point": "array<double>",
    # geo_shape stores as WKT text (general/ddl/data-types: shapes are
    # GeoJSON/WKT at the boundary; our geo scalars parse WKT)
    "geo_shape": "string",
    "float_vector": "array<float>",
    "boolean": "boolean",
    "bit": "string",  # bit strings render as '010...' text
    "char": "string",
    "character": "string",
    "regproc": "string",
    "regclass": "string",
    "oidvector": "array<int>",
    "time with time zone": "string",
    "timetz": "string",
    "interval": "struct<months:bigint,days:int,micros:bigint>",
}


def _map_type(t: str) -> str:
    # '"CHAR"' — PG's quoted internal one-byte char type spelling
    key = re.sub(r"\s+", " ", t.strip().strip('"').lower())
    if key in _TYPE_MAP:
        return _TYPE_MAP[key]
    # OBJECT with column policy and/or typed shape —
    # object(strict|dynamic|ignored) [as (...)]: stored as a JSON
    # string like bare object (SURVEY.md §7 hard part (a)); the
    # declared inner shape is not enforced at write (dynamic policy)
    if re.match(r"object(\s*\(\s*(strict|dynamic|ignored)\s*\))?(\s+as\s*\(.*\))?$", key):
        return "string"
    m = re.match(r"array\s*\(\s*(.+)\s*\)$", key)
    if m:  # CrateDB array(inner) spelling
        return f"array<{_map_type(m.group(1))}>"
    m = re.match(r"(.+?)\s*\[\s*\]$", key)
    if m:  # PG bracket spelling type[] (data-types.rst array aliases);
        # recursion handles real[][] etc.
        return f"array<{_map_type(m.group(1))}>"
    # parameterized spellings (data-types.rst): length args are
    # advisory on a string-typed store; numeric keeps precision/scale
    if re.match(r"(varchar|character varying|char|character|bit)\s*\(\s*\d+\s*\)$", key):
        return "string"
    m = re.match(r"numeric\s*(\(\s*\d+\s*(,\s*\d+\s*)?\))?$", key)
    if m:
        return f"decimal{re.sub(chr(32), '', m.group(1))}" if m.group(1) else "decimal(38,18)"
    m = re.match(r"float_vector\s*\(\s*\d+\s*\)$", key)
    if m:
        return "array<float>"
    return t.strip()


#: normalized crate spelling -> information_schema.columns data_type
#: (information-schema.rst:363-381 prints lowercase reference names)
_CRATE_NAME = {
    "string": "text", "text": "text", "varchar": "text",
    "character varying": "text", "char": "character",
    "character": "character", "int": "integer", "integer": "integer",
    "long": "bigint", "bigint": "bigint", "short": "smallint",
    "smallint": "smallint", "byte": "byte", "float": "real",
    "real": "real", "double": "double precision",
    "double precision": "double precision",
    "timestamp": "timestamp with time zone",
    "timestamptz": "timestamp with time zone",
    "timestamp with time zone": "timestamp with time zone",
    "timestamp without time zone": "timestamp without time zone",
    "boolean": "boolean", "ip": "ip", "geo_point": "geo_point",
    "geo_shape": "geo_shape", "interval": "interval", "bit": "bit",
    "date": "date",
}


def _crate_decl(raw: str) -> dict:
    """Parse one declared crate type into its information_schema form:
    {"type": <data_type spelling>} plus, for objects, the declared
    subcolumns as {"children": [{"name", ...decl}]} (recursive)."""
    key = re.sub(r"\s+", " ", raw.strip().lower()).rstrip()
    m = re.match(
        r"object(?:\s*\(\s*(strict|dynamic|ignored)\s*\))?"
        r"(?:\s+as\s*\((.*)\))?$",
        key,
        re.DOTALL,
    )
    if m:
        children = []
        for item in _split_top(m.group(2)) if m.group(2) else []:
            cm = re.match(r'("?[\w]+"?)\s+(.*)$', item, re.DOTALL)
            if cm:
                children.append(
                    {"name": cm.group(1).strip('"'), **_crate_decl(cm.group(2))}
                )
        out = {"type": "object", "children": children}
        if m.group(1):
            out["policy"] = m.group(1)
        return out
    m = re.match(r"array\s*\(\s*(.+)\s*\)$", key, re.DOTALL) or re.match(
        r"(.+?)\s*\[\s*\]$", key, re.DOTALL
    )
    if m:
        inner = _crate_decl(m.group(1))
        out = {"type": inner["type"] + "_array"}
        if inner.get("children"):
            out["children"] = inner["children"]
        return out
    m = re.match(r"(varchar|character varying|char|character|bit)\s*\(\s*(\d+)\s*\)$", key)
    if m:
        return {"type": _CRATE_NAME[m.group(1)], "length": int(m.group(2))}
    if re.match(r"numeric\b", key):
        return {"type": "numeric"}
    if re.match(r"float_vector\b", key):
        return {"type": "float_vector"}
    return {"type": _CRATE_NAME.get(key, key)}


def _spark_to_crate(simple: str) -> str:
    """Spark simpleString -> crate data_type name (fallback for tables
    without declared DDL — e.g. registered parquet sources)."""
    m = re.match(r"array<(.+)>$", simple)
    if m:
        return _spark_to_crate(m.group(1)) + "_array"
    if simple.startswith("decimal"):
        return "numeric"
    if simple.startswith("struct"):
        return "object"
    return {
        "string": "text", "int": "integer", "tinyint": "byte",
        "float": "real", "double": "double precision",
        "timestamp": "timestamp with time zone",
        "timestamp_ntz": "timestamp without time zone",
        "map<string,string>": "object",
        "binary": "text",
    }.get(simple, simple)


def _expand_occ_where(where: str) -> str:
    """Expand OCC system columns (``_seq_no``/``_primary_term``/
    ``_version``, occ.rst:60) referenced in an UPDATE/DELETE WHERE into
    their row-level expressions — every live row is at version 1 /
    seq 0 / term 1 here, so the optimistic-concurrency handshake
    matches exactly the rows the reference's would."""
    from crate_spark.dialect import rewrite_sys_columns

    where = re.sub(r'"(_id|_doc|_raw|_version|_seq_no|_primary_term)"', r"\1", where)
    return rewrite_sys_columns(where)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split at depth-0 separators (parens nest, literals are masked)."""
    items, buf, depth = [], "", 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            items.append(buf)
            buf = ""
        else:
            buf += ch
    if buf.strip():
        items.append(buf)
    return [i.strip() for i in items]


def _find_close(s: str, open_idx: int) -> int:
    """Index of the ')' matching s[open_idx] == '('."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parentheses in: {s[:80]}...")


_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def _sub(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"__LIT_{len(literals) - 1}__"

    return _LIT_RE.sub(_sub, sql), literals


def _unmask(s: str, literals: list[str]) -> str:
    for i, lit in enumerate(literals):
        s = s.replace(f"__LIT_{i}__", lit)
    return s


def _parse_returning(tail: str, literals: list[str]) -> tuple[str, list[str] | None]:
    """Strip a trailing RETURNING clause; [] means RETURNING *."""
    m = re.search(r"\bRETURNING\s+(.+)$", tail, re.IGNORECASE | re.DOTALL)
    if not m:
        return tail, None
    cols = _unmask(m.group(1).strip(), literals)
    tail = tail[: m.start()].strip()
    return tail, [] if cols == "*" else [c.strip() for c in _split_top(cols)]


class SqlDmlRouter:
    """Statement router bound to a CrateSession-like owner.

    The owner provides: ``spark``, ``storage_dir``, ``register(name,
    df)`` (refreshes catalog views), and ``tables`` (the view catalog).
    """

    def __init__(self, owner):
        self.owner = owner
        self.crate_tables: dict[str, CrateTable] = {}

    # -- helpers ---------------------------------------------------------
    @property
    def spark(self):
        return self.owner.spark

    def _table(self, name: str) -> CrateTable:
        name = name.split(".")[-1]  # doc.t == t (single-schema catalog)
        if name in getattr(self.owner, "subscribed_tables", ()):
            # logical-replication.rst: subscribed tables are read-only
            # until the subscription is dropped
            raise ValueError(
                f"The relation \"{name}\" doesn't allow INSERT/UPDATE/DELETE "
                "operations, because it is included in a logical replication "
                "subscription"
            )
        if name in self.crate_tables:
            return self.crate_tables[name]
        path = os.path.join(self.owner.storage_dir, name)
        if os.path.exists(os.path.join(path, "_crate_meta.json")):
            t = CrateTable.open(self.spark, path)
            self.crate_tables[name] = t
            return t
        raise ValueError(
            f"unknown DML target table '{name}' — CREATE TABLE it first "
            "(read-only driver tables are not DML targets)"
        )

    def _refresh(self, name: str) -> None:
        name = name.split(".")[-1]
        self.owner.register(name, self.crate_tables[name].read())

    def _coerce_ts_literals(self, table: CrateTable, where: str) -> str:
        """Reference semantics: a NUMERIC literal compared to a
        timestamp column is epoch MILLIS (its timestamp storage) —
        ``WHERE day = 1396915200000`` (partitioned-tables.rst:305).
        Spark refuses TIMESTAMP = BIGINT, so wrap such literals in
        timestamp_millis() for every timestamp column of the table."""
        ts_cols = [
            f.name
            for f in self.spark.createDataFrame([], table.schema_ddl).schema.fields
            if f.dataType.simpleString() in ("timestamp", "timestamp_ntz")
        ]
        for col in ts_cols:
            where = re.sub(
                rf'("?{re.escape(col)}"?\s*(?:=|!=|<>|<=|>=|<|>)\s*)(\d{{7,}})\b',
                r"\1timestamp_millis(\2)",
                where,
            )
            where = re.sub(
                rf'(?<![\w(])(\d{{7,}})(\s*(?:=|!=|<>|<=|>=|<|>)\s*"?{re.escape(col)}"?)',
                r"timestamp_millis(\1)\2",
                where,
            )
        return where

    def _count_df(self, n: int) -> DataFrame:
        return self.spark.createDataFrame([(n,)], "rowcount bigint")

    # -- dispatch --------------------------------------------------------
    def route(self, stmt: str) -> DataFrame | None:
        """Execute stmt if it is DML/DDL; None -> not a DML statement."""
        masked, literals = _mask_literals(stmt)
        head = masked.lstrip().split(None, 2)
        if not head:
            return None
        kw = head[0].upper()
        kw2 = head[1].upper() if len(head) > 1 else ""
        if kw == "CREATE" and kw2 == "TABLE":
            cm = re.match(
                r"\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.\"]+)\s+AS\s+(.+)$",
                masked,
                re.IGNORECASE | re.DOTALL,
            )
            if cm:
                return self._create_table_as(cm.group(1), cm.group(2), literals)
            return self._create_table(masked, literals)
        if kw == "DROP" and kw2 == "TABLE":
            return self._drop_table(masked)
        if kw == "ALTER" and kw2 == "TABLE":
            return self._alter_table(masked, literals)
        if kw == "INSERT":
            return self._insert(masked, literals)
        if kw == "UPDATE":
            return self._update(masked, literals)
        if kw == "DELETE":
            return self._delete(masked, literals)
        if kw == "COPY":
            return self._copy(masked, literals)
        return None

    def _record_schema(self, raw_name: str, table: str) -> None:
        """Remember the schema a SQL-created table belongs to
        (create-schema.rst: CREATE TABLE implicitly creates missing
        schemas; they are catalog metadata — storage stays one flat
        namespace)."""
        parts = [p.strip('"') for p in raw_name.strip().strip('"').split(".")]
        schema = parts[-2] if len(parts) > 1 else "doc"
        reg = getattr(self.owner, "_table_schema", None)
        if reg is not None:
            reg[table] = schema

    # -- CREATE / DROP TABLE --------------------------------------------
    def _create_table(self, masked: str, literals: list[str]) -> DataFrame:
        m = re.match(
            r"\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.\"]+)\s*\(",
            masked,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError("unsupported CREATE TABLE syntax")
        name = m.group(2).strip('"').split(".")[-1]
        if m.group(1) and name in self.crate_tables:
            return self._count_df(0)
        open_idx = m.end() - 1
        close_idx = _find_close(masked, open_idx)
        body = masked[open_idx + 1 : close_idx]
        tail = masked[close_idx + 1 :]

        # CREATE TABLE x (LIKE source [INCLUDING|EXCLUDING ...])
        # (create-table-like.rst): empty table, source's column DDL;
        # INCLUDING options are accepted (constraints/defaults copy by
        # default here, matching INCLUDING ALL)
        lm = re.match(
            r"\s*LIKE\s+([\w.\"]+)(\s+(?:INCLUDING|EXCLUDING)\s+\w+)*\s*$",
            body,
            re.IGNORECASE,
        )
        if lm:
            src = self._table(lm.group(1).strip('"'))
            path = os.path.join(self.owner.storage_dir, name)
            t = CrateTable.create(
                self.spark,
                path,
                src.schema_ddl,
                primary_key=list(src.primary_key),
                partitioned_by=list(src.partitioned_by),
                generated=dict(src.generated),
                generated_eval=dict(src.generated_eval),
                checks=list(src.checks),
                defaults=dict(src.defaults),
                settings=dict(src.settings),
                crate_columns=[dict(c) for c in src.crate_columns],
            )
            self.crate_tables[name] = t
            self._record_schema(m.group(2), name)
            self._refresh(name)
            return self._count_df(1)

        cols: list[str] = []
        crate_cols: list[dict] = []
        not_null: list[str] = []
        pk: list[str] = []
        checks: list[str] = []
        generated: dict[str, str] = {}
        defaults: dict[str, str] = {}
        ft_indexes: dict[str, list] = {}
        untyped_generated: list[str] = []
        for item in _split_top(body):
            up = item.upper()
            if up.startswith("PRIMARY KEY"):
                named = [
                    c.strip().strip('"')
                    for c in item[item.index("(") + 1 : item.rindex(")")].split(",")
                ]
                pk += named
                not_null += [c for c in named if c not in not_null]
                continue
            # table-level CHECK only — a COLUMN named check_sum also
            # starts with CHECK (dml.rst debit_card example)
            if re.match(r"CHECK\s*\(", up):
                checks.append(
                    _unmask(item[item.index("(") + 1 : item.rindex(")")], literals)
                )
                continue
            if up.startswith("CONSTRAINT "):
                # named table-level constraints (constraints.rst:
                # CONSTRAINT name CHECK (...) / PRIMARY KEY (...)) —
                # the name is metadata, the body routes as unnamed
                item = re.sub(
                    r'^\s*CONSTRAINT\s+"?[\w]+"?\s+', "", item, flags=re.IGNORECASE
                )
                up = item.upper()
                if up.startswith("PRIMARY KEY"):
                    named = [
                        c.strip().strip('"')
                        for c in item[item.index("(") + 1 : item.rindex(")")].split(",")
                    ]
                    pk += named
                    not_null += [c for c in named if c not in not_null]
                    continue
                if re.match(r"CHECK\s*\(", up):
                    checks.append(
                        _unmask(item[item.index("(") + 1 : item.rindex(")")], literals)
                    )
                    continue
            if up.startswith("INDEX "):
                # composite fulltext index (fulltext-indices.rst):
                # INDEX <name> USING FULLTEXT (col, ...) — MATCH can
                # target the index NAME, searching its source columns
                fim = re.match(
                    r'INDEX\s+"?(\w+)"?\s+USING\s+FULLTEXT\s*\(([^)]*)\)',
                    item,
                    re.IGNORECASE,
                )
                if fim:
                    ft_indexes[fim.group(1)] = [
                        c.strip().strip('"') for c in fim.group(2).split(",")
                    ]
                continue
            cm = re.match(r'("?[\w]+"?)\s+(.*)$', item, re.DOTALL)
            if not cm:
                raise ValueError(f"cannot parse column definition: {item!r}")
            cname = cm.group(1).strip('"')
            rest = cm.group(2)
            # named column constraints (constraints.rst): the name
            # tags whatever constraint clause follows it
            rest = re.sub(
                r'\bCONSTRAINT\s+"?[\w]+"?\s+', "", rest, flags=re.IGNORECASE
            )
            gm = re.search(
                r"GENERATED\s+ALWAYS\s+AS\s*\(", rest, re.IGNORECASE
            )
            if gm:
                gclose = _find_close(rest, gm.end() - 1)
                generated[cname] = _unmask(rest[gm.end() : gclose], literals)
                rest = rest[: gm.start()] + rest[gclose + 1 :]
            else:
                # paren-less form (create-table.rst: GENERATED ALWAYS
                # AS expr — parentheses optional): the expression runs
                # to the end of the column item
                gm2 = re.search(
                    r"GENERATED\s+ALWAYS\s+AS\s+(.+)$",
                    rest,
                    re.IGNORECASE | re.DOTALL,
                )
                if gm2:
                    generated[cname] = _unmask(gm2.group(1).strip(), literals)
                    rest = rest[: gm2.start()]
                else:
                    # bare `[data_type] AS expr` shorthand — GENERATED
                    # ALWAYS is optional in the reference grammar
                    # (create-table.rst base_column_definition; the
                    # lang-js integration tests use `x AS arr_max(xs)`).
                    # Only a top-level AS whose prefix is empty or a
                    # plain type spelling counts, so OBJECT AS (...)
                    # shapes and CAST(... AS ...) inside DEFAULT/CHECK
                    # never match.
                    for am in re.finditer(r"\bAS\b", rest, re.IGNORECASE):
                        pre = rest[: am.start()]
                        if pre.count("(") != pre.count(")"):
                            continue  # inside an expression
                        pres = pre.strip()
                        if pres and not re.match(
                            r'(?!object\b)[\w" ]+'
                            r"(\s*\(\s*\d+[\d\s,]*\))?(\s*\[\s*\])*$",
                            pres,
                            re.IGNORECASE,
                        ):
                            break  # prefix isn't a type spelling
                        expr = rest[am.end() :].strip()
                        if expr.startswith("("):
                            # parenthesized generation expression
                            popen = rest.index("(", am.end())
                            pclose = _find_close(rest, popen)
                            generated[cname] = _unmask(
                                rest[popen + 1 : pclose], literals
                            )
                            rest = pre + rest[pclose + 1 :]
                        else:
                            generated[cname] = _unmask(expr, literals)
                            rest = pre
                        break
            ckm = re.search(r"CHECK\s*\(", rest, re.IGNORECASE)
            if ckm:
                cclose = _find_close(rest, ckm.end() - 1)
                checks.append(_unmask(rest[ckm.end() : cclose], literals))
                rest = rest[: ckm.start()] + rest[cclose + 1 :]
            # column DEFAULT expression (reference metadata
            # Reference.defaultExpression; insert.rst) — applied when
            # INSERT omits the column. Only a DEFAULT at paren depth 0
            # belongs to this column: OBJECT AS (key TEXT DEFAULT '')
            # carries subcolumn defaults inside the shape
            # (sql/statements/create-table.rst)
            dm = next(
                (
                    c
                    for c in re.finditer(r"\bDEFAULT\s+", rest, re.IGNORECASE)
                    if rest[: c.start()].count("(")
                    == rest[: c.start()].count(")")
                ),
                None,
            )
            if dm:
                defaults[cname] = rewrite(
                    _unmask(rest[dm.end():].strip(), literals)
                )
                rest = rest[: dm.start()]
            else:
                # OBJECT AS (key TEXT DEFAULT '') — subcolumn defaults
                # materialize the whole object when INSERT omits the
                # column (sql/statements/create-table.rst:141-156)
                om = re.match(
                    r"object(?:\s*\(\s*\w+\s*\))?\s+as\s*\((.*)\)\s*$",
                    rest.strip(),
                    re.IGNORECASE | re.DOTALL,
                )
                if om:
                    obj_defaults = {}
                    for child in _split_top(om.group(1)):
                        cdm = re.match(
                            r'"?(\w+)"?\s+.*?\bDEFAULT\s+(.+?)\s*$',
                            child,
                            re.IGNORECASE | re.DOTALL,
                        )
                        if cdm:
                            raw = _unmask(cdm.group(2).strip(), literals)
                            obj_defaults[cdm.group(1)] = (
                                raw[1:-1].replace("''", "'")
                                if raw.startswith("'")
                                else json.loads(raw.lower())
                                if raw.lower() in ("true", "false")
                                else float(raw)
                                if "." in raw
                                else int(raw)
                            )
                    if obj_defaults:
                        defaults[cname] = (
                            "'"
                            + json.dumps(obj_defaults).replace("'", "''")
                            + "'"
                        )
            if re.search(r"\bPRIMARY\s+KEY\b", rest, re.IGNORECASE):
                pk.append(cname)
                not_null.append(cname)  # PK implies NOT NULL
                rest = re.sub(r"\bPRIMARY\s+KEY\b", "", rest, flags=re.IGNORECASE)
            if re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE):
                not_null.append(cname)
            rest = re.sub(r"\bNOT\s+NULL\b", "", rest, flags=re.IGNORECASE)
            # explicit nullable spelling `<col> <type> NULL`
            # (ddl/constraints.rst:72) — the default, drop the token
            # (DEFAULT/CHECK/GENERATED expressions holding real NULLs
            # were already extracted above)
            rest = re.sub(r"\bNULL\b", "", rest, flags=re.IGNORECASE)
            # column index clauses (create-table.rst): INDEX OFF,
            # INDEX USING fulltext/plain/geohash/quadtree/bkdtree
            # [WITH (...)] — storage/index details Parquet supersedes;
            # STORAGE WITH (columnstore = ...) likewise (storage.rst)
            rest = re.sub(
                r"\bSTORAGE\s+WITH\s*\([^)]*\)", "", rest, flags=re.IGNORECASE
            )
            rest = re.sub(
                r"\bINDEX\s+(OFF\b|(USING\s+)?\"?\w+\"?)?(\s+WITH\s*\(.*?\))?",
                "",
                rest,
                flags=re.IGNORECASE,
            )
            ctype = _map_type(rest)
            if not ctype:
                if cname in generated:
                    # typeless generated column (generated-columns.rst:
                    # "a data type is optional ... inferred from the
                    # expression"): resolved after the loop
                    untyped_generated.append(cname)
                    cols.append(cname)  # placeholder, patched below
                    crate_cols.append({"name": cname, "type": None})
                    continue
                raise ValueError(f"column '{cname}' needs an explicit type")
            cols.append(f"{cname} {ctype}")
            crate_cols.append({"name": cname, **_crate_decl(rest)})
        # evaluation form: UDF call sites resolved to their mangled
        # Spark registrations and crate-isms rewritten ONCE at CREATE —
        # `generated` keeps the user's spelling for SHOW CREATE TABLE
        resolve = getattr(self.owner, "_resolve_udf_calls", None) or (lambda x: x)
        generated_eval = {
            k: rewrite(resolve(v)) for k, v in generated.items()
        }
        for cname in untyped_generated:
            typed = ", ".join(c for c in cols if " " in c)
            probe = self.spark.createDataFrame([], typed or "__x int")
            dt = probe.selectExpr(
                f"({generated_eval[cname]}) AS __g"
            ).schema[0].dataType.simpleString()
            cols[cols.index(cname)] = f"{cname} {dt}"
            for cc in crate_cols:
                if cc["name"] == cname and cc["type"] is None:
                    cc["type"] = _spark_to_crate(dt)

        partitioned: list[str] = []
        pm = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", tail, re.IGNORECASE)
        if pm:
            partitioned = [c.strip().strip('"') for c in pm.group(1).split(",")]
        settings: dict[str, str] = {}
        wm = re.search(r"\bWITH\s*\(([^)]*)\)", tail, re.IGNORECASE)
        if wm:
            for kv in wm.group(1).split(","):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    settings[k.strip().strip('"')] = _unmask(v.strip(), literals).strip("'\"")

        # CLUSTERED [BY (col)] INTO n SHARDS (create-table.rst): the
        # MODULO routing key — writes hash-repartition on it so each
        # batch lands in exactly n routed files (see CrateTable)
        clustered_by: list[str] = []
        shards = None
        clm = re.search(
            r"CLUSTERED(?:\s+BY\s*\(([^)]*)\))?(?:\s+INTO\s+(\d+)\s+SHARDS)?",
            tail,
            re.IGNORECASE,
        )
        if clm:
            if clm.group(1):
                clustered_by = [c.strip().strip('"') for c in clm.group(1).split(",")]
            if clm.group(2):
                shards = int(clm.group(2))

        path = os.path.join(self.owner.storage_dir, name)
        t = CrateTable.create(
            self.spark,
            path,
            ", ".join(cols),
            primary_key=pk,
            partitioned_by=partitioned,
            generated=generated,
            generated_eval=generated_eval,
            checks=checks,
            defaults=defaults,
            settings=settings,
            clustered_by=clustered_by,
            shards=shards,
            ft_indexes=ft_indexes,
            crate_columns=crate_cols,
            not_null=not_null,
        )
        self.crate_tables[name] = t
        self._record_schema(m.group(2), name)
        self._refresh(name)
        return self._count_df(1)

    def _create_table_as(self, raw_name: str, query: str, literals: list[str]) -> DataFrame:
        """CREATE TABLE t AS <query> (reference ``CreateTableAsPlan``):
        materialize the query result as a new stored table."""
        name = raw_name.strip('"').split(".")[-1]
        src = self.spark.sql(rewrite(_unmask(query.strip(), literals), user_schemas=self.owner._user_schemas()))
        schema_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
        )
        path = os.path.join(self.owner.storage_dir, name)
        t = CrateTable.create(
            self.spark,
            path,
            schema_ddl,
            crate_columns=[
                {"name": f.name, "type": _spark_to_crate(f.dataType.simpleString())}
                for f in src.schema.fields
            ],
        )
        self.crate_tables[name] = t
        self._record_schema(raw_name, name)
        n = t.insert(src)
        self._refresh(name)
        return self._count_df(n)

    def _alter_table(self, masked: str, literals: list[str]) -> DataFrame:
        """ALTER TABLE ADD/DROP/RENAME COLUMN (reference
        ``planner/Planner.java`` AlterTable dispatch; add column mirrors
        the dynamic-mapping path). Data rewrites happen read-merge-write
        like every other mutation."""
        # ALTER TABLE t OPEN / CLOSE (alter-table.rst): a closed table
        # refuses queries — modeled by deregistering its view; OPEN
        # re-registers it. The closed flag persists in settings.
        ocm = re.match(
            r"\s*ALTER\s+TABLE\s+([\w.\"]+)(\s+PARTITION\s*\([^)]*\))?"
            r"\s+(OPEN|CLOSE)\s*$",
            masked,
            re.IGNORECASE,
        )
        if ocm:
            name = ocm.group(1).strip('"').split(".")[-1]
            table = self._table(ocm.group(1).strip('"'))
            if ocm.group(2):
                # partition-scoped OPEN/CLOSE (partitioned-tables.rst):
                # partition open-state isn't tracked on the flat
                # parquet store — accepted, table stays queryable
                return self._count_df(1)
            if ocm.group(3).upper() == "CLOSE":
                table.settings["closed"] = "true"
                table._save_meta()
                self.spark.catalog.dropTempView(name)
                self.owner.tables.pop(name, None)
            else:
                table.settings.pop("closed", None)
                table._save_meta()
                self._refresh(name)
            return self._count_df(1)

        # ALTER TABLE a RENAME TO b (alter-table.rst): directory move +
        # catalog/view swap — the table-level rename, distinct from
        # RENAME COLUMN below
        rnm = re.match(
            r"\s*ALTER\s+TABLE\s+([\w.\"]+)\s+RENAME\s+TO\s+([\w.\"]+)\s*$",
            masked,
            re.IGNORECASE,
        )
        if rnm:
            old = rnm.group(1).strip('"').split(".")[-1]
            new = rnm.group(2).strip('"').split(".")[-1]
            if new in self.crate_tables or new in self.owner.tables:
                raise ValueError(f"table '{new}' already exists")
            table = self._table(old)
            new_path = os.path.join(self.owner.storage_dir, new)
            os.rename(table.path, new_path)
            table.path = new_path
            del self.crate_tables[old]
            self.crate_tables[new] = table
            self.spark.catalog.dropTempView(old)
            self.owner.tables.pop(old, None)
            self._refresh(new)
            return self._count_df(1)

        # ALTER TABLE t [PARTITION (...)] SET (k = v, ...) / RESET (...)
        # — storage settings on the table metadata (alter-table.rst;
        # partitioned-tables.rst:436 applies them to one partition —
        # storage here is table-scoped, so partition settings land on
        # the table)
        sm = re.match(
            r"\s*ALTER\s+TABLE\s+(?:ONLY\s+)?([\w.\"]+)"
            r"(?:\s+PARTITION\s*\([^)]*\))?"
            r"\s+(SET|RESET)\s*\(([^)]*)\)\s*$",
            masked,
            re.IGNORECASE,
        )
        if sm:
            table = self._table(sm.group(1).strip('"'))
            if sm.group(2).upper() == "SET":
                for kv in sm.group(3).split(","):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        key = k.strip().strip('"')
                        val = _unmask(v.strip(), literals).strip("'\"")
                        table.settings[key] = val
                        if key == "number_of_shards" and val.isdigit():
                            # applies to future partitions/batches
                            # (alter-table.rst:75; sys.shards reflects it)
                            table.shards = int(val)
            else:
                for k in sm.group(3).split(","):
                    table.settings.pop(k.strip().strip('"'), None)
            table._save_meta()
            return self._count_df(1)

        m = re.match(
            r"\s*ALTER\s+TABLE\s+([\w.\"]+)\s+"
            r"(?:ADD\s+(?:COLUMN\s+)?(\S+)\s+(.+?)"
            r"|DROP\s+(?:COLUMN\s+)?(\w+)"
            r"|RENAME\s+(?:COLUMN\s+)?(\S+)\s+TO\s+(\S+))\s*$",
            masked,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("unsupported ALTER TABLE syntax")
        table = self._table(m.group(1).strip('"'))
        name = m.group(1).strip('"').split(".")[-1]

        def _subref(ref: str):
            """col['a']['b'] -> (col, ['a','b']); plain col -> (col, [])."""
            sm = re.match(r'"?(\w+)"?((?:\s*\[\s*\'[\w]+\'\s*\])*)\s*$', ref)
            if not sm:
                return None
            path = re.findall(r"\[\s*'([\w]+)'\s*\]", sm.group(2) or "")
            return sm.group(1), path

        def _decl_at(path_parent: list[str]) -> list[dict]:
            """children list of the object column at path_parent."""
            level = table.crate_columns
            for part in path_parent:
                node = next((c for c in level if c["name"] == part), None)
                if node is None or not node["type"].startswith("object"):
                    raise ValueError(f"unknown object column '{part}'")
                level = node.setdefault("children", [])
            return level

        if m.group(2):  # ADD COLUMN (top-level or obj['sub'] nested)
            ref = _unmask(m.group(2), literals)
            raw_type = _unmask(m.group(3), literals).strip()
            if re.search(r"\bPRIMARY\s+KEY\b", raw_type, re.IGNORECASE):
                table.primary_key = list(table.primary_key) + [ref]
            raw_type = re.sub(
                r"\b(NOT\s+NULL|PRIMARY\s+KEY)\b", "", raw_type,
                flags=re.IGNORECASE,
            ).strip()
            col, path = _subref(ref)
            if path:
                # nested add (alter-table.rst:148): object payloads are
                # JSON strings — the new subcolumn is catalog metadata
                _decl_at([col] + path[:-1]).append(
                    {"name": path[-1], **_crate_decl(raw_type)}
                )
                table._save_meta()
            else:
                table.schema_ddl = f"{table.schema_ddl}, {col} {_map_type(raw_type)}"
                table.crate_columns.append({"name": col, **_crate_decl(raw_type)})
                table._save_meta()
        elif m.group(4):  # DROP COLUMN
            col = m.group(4)
            fields = [
                f for f in self.spark.createDataFrame([], table.schema_ddl).schema.fields
                if f.name != col
            ]
            if table._has_data():
                table._overwrite(table.read().drop(col))
            table.schema_ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in fields
            )
            table.crate_columns = [
                c for c in table.crate_columns if c["name"] != col
            ]
            table._save_meta()
        else:  # RENAME COLUMN (top-level or nested object subcolumn)
            old_ref = _unmask(m.group(5), literals)
            new_ref = _unmask(m.group(6), literals)
            ocol, opath = _subref(old_ref)
            ncol, npath = _subref(new_ref)
            if opath:
                # nested rename (alter-table.rst:192): same parent path
                if ocol != ncol or opath[:-1] != npath[:-1]:
                    raise ValueError(
                        "RENAME COLUMN cannot move a column between objects"
                    )
                level = _decl_at([ocol] + opath[:-1])
                node = next(
                    (c for c in level if c["name"] == opath[-1]), None
                )
                if node is None:
                    raise ValueError(f"unknown column '{old_ref}'")
                node["name"] = npath[-1]
                table._save_meta()
                if table._has_data():
                    # JSON payloads key by field name — rewrite the key
                    # at this nesting depth
                    import json as _json

                    def _rekey(v, parts=tuple(opath), new_name=npath[-1]):
                        if v is None:
                            return None
                        try:
                            obj = _json.loads(v)
                        except Exception:
                            return v
                        node_ = obj
                        for p in parts[:-1]:
                            if not isinstance(node_, dict) or p not in node_:
                                return v
                            node_ = node_[p]
                        if isinstance(node_, dict) and parts[-1] in node_:
                            node_[new_name] = node_.pop(parts[-1])
                        return _json.dumps(obj)

                    rekey = F.udf(_rekey, "string")
                    table._overwrite(
                        table.read().withColumn(ocol, rekey(F.col(ocol)))
                    )
            else:
                old, new = ocol, ncol
                fields = self.spark.createDataFrame([], table.schema_ddl).schema.fields
                renamed = (
                    table.read().withColumnRenamed(old, new)
                    if table._has_data() else None
                )
                table.schema_ddl = ", ".join(
                    f"{new if f.name == old else f.name} {f.dataType.simpleString()}"
                    for f in fields
                )
                for c in table.crate_columns:
                    if c["name"] == old:
                        c["name"] = new
                table._save_meta()
                if renamed is not None:
                    table._overwrite(renamed)
        self._refresh(name)
        return self._count_df(1)

    def _drop_table(self, masked: str) -> DataFrame:
        m = re.match(
            r"\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.\"]+)\s*$", masked, re.IGNORECASE
        )
        if not m:
            raise ValueError("unsupported DROP TABLE syntax")
        name = m.group(2).strip('"').split(".")[-1]
        if name not in self.crate_tables:
            if m.group(1):
                return self._count_df(0)
            raise ValueError(f"unknown table '{name}'")
        t = self.crate_tables.pop(name)
        shutil.rmtree(t.path, ignore_errors=True)
        self.spark.catalog.dropTempView(name)
        self.owner.tables.pop(name, None)
        # implicit schemas vanish with their last object
        # (create-schema.rst) — schemata recomputes from this map
        getattr(self.owner, "_table_schema", {}).pop(name, None)
        self.owner._mark_sysviews_dirty()
        return self._count_df(1)

    # -- INSERT ----------------------------------------------------------
    def _insert(self, masked: str, literals: list[str]) -> DataFrame:
        m = re.match(
            r"\s*INSERT\s+INTO\s+([\w.\"]+)\s*(\(([^)]*)\))?\s*(.*)$",
            masked,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("unsupported INSERT syntax")
        name = m.group(1).strip('"').split(".")[-1]
        table = self._table(name)
        col_list = None
        body = m.group(4).strip()
        if m.group(3) is not None:
            # a paren group after the table name is a column list ONLY
            # if it isn't itself a query: `INSERT INTO t (SELECT ...)`
            if re.match(r"(?i)\s*(SELECT|VALUES|WITH)\b", m.group(3)):
                body = (m.group(2) + " " + body).strip()
            else:
                col_list = [c.strip().strip('"') for c in m.group(3).split(",")]

        body, returning = _parse_returning(body, literals)

        # ON CONFLICT clause (docs/sql/statements/insert.rst:25-27)
        conflict = None  # None | ("nothing",) | ("update", {col: expr})
        cm = re.search(
            r"\bON\s+CONFLICT\s*(\([^)]*\))?\s*DO\s+(NOTHING|UPDATE\s+SET\s+(.*))$",
            body,
            re.IGNORECASE | re.DOTALL,
        )
        declared = self.spark.createDataFrame([], table.schema_ddl).schema
        declared_types = {f.name: f.dataType.simpleString() for f in declared.fields}
        if cm:
            if cm.group(2).upper() == "NOTHING":
                conflict = ("nothing",)
            else:
                # unqualified columns in DO UPDATE SET refer to the
                # EXISTING row (PG/insert.rst: use excluded.<col> for
                # the incoming value). Qualify on the masked text so
                # literal contents can't be touched.
                colpat = re.compile(
                    r"(?<![\w.])("
                    + "|".join(re.escape(c) for c in declared_types)
                    + r")\b(?!\s*\()",
                    re.IGNORECASE,
                )
                set_exprs = {}
                for a in _split_top(cm.group(3)):
                    k, _, v = a.partition("=")
                    vq = colpat.sub(r"target.\1", v.strip())
                    set_exprs[k.strip().strip('"')] = rewrite(
                        _unmask(vq, literals)
                    )
                conflict = ("update", set_exprs)
            body = body[: cm.start()].strip()
        gen = set(table.generated)
        target_cols = col_list or [
            f.name for f in declared.fields if f.name not in gen
        ]

        if re.match(r"VALUES\b", body, re.IGNORECASE):
            values_sql = _unmask(body[len("VALUES") :].strip(), literals)
            src = self.spark.sql(f"SELECT * FROM VALUES {rewrite(values_sql)}")
        else:
            # `INSERT INTO t (SELECT ...)` — PG-style parenthesized query
            if body.startswith("(") and _find_close(body, 0) == len(body) - 1:
                body = body[1:-1].strip()
            src = self.spark.sql(rewrite(_unmask(body, literals), user_schemas=self.owner._user_schemas()))
        if len(src.columns) != len(target_cols):
            raise ValueError(
                f"INSERT has {len(src.columns)} expressions for "
                f"{len(target_cols)} target columns"
            )
        src = src.toDF(*target_cols)
        unknown = [c for c in target_cols if c not in declared_types]
        if unknown:
            # column-policy.rst: a dynamic table grows new top-level
            # columns on INSERT; strict (the default) rejects them
            policy = (table.settings.get("column_policy") or "strict").lower()
            if policy != "dynamic":
                raise ValueError(f"Column {unknown[0]} unknown")
            widen = {"int": "bigint", "smallint": "bigint", "tinyint": "bigint",
                     "float": "double", "void": "string"}
            src_types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
            for c in unknown:
                dt = src_types[c]
                dt = widen.get(dt, dt)
                table.schema_ddl += f", {c} {dt}"
            table._save_meta()
            declared = self.spark.createDataFrame([], table.schema_ddl).schema
            declared_types = {
                f.name: f.dataType.simpleString() for f in declared.fields
            }
        # cast to declared types (VALUES literals arrive as int/decimal);
        # geo_point columns additionally accept WKT 'POINT (x y)' text
        # (data-types.rst geo_point: "insert using the WKT syntax")
        src_types = {f.name: f.dataType.simpleString() for f in src.schema.fields}

        def _coerce(c):
            if (
                declared_types[c] == "array<double>"
                and src_types.get(c) == "string"
            ):
                return F.expr(
                    f"CASE WHEN {c} IS NULL THEN NULL ELSE array("
                    f"CAST(regexp_extract({c}, 'POINT\\\\s*\\\\(\\\\s*(-?[0-9.]+)', 1) AS DOUBLE), "
                    f"CAST(regexp_extract({c}, '\\\\s(-?[0-9.]+)\\\\s*\\\\)', 1) AS DOUBLE)) END"
                ).alias(c)
            return F.col(c).cast(declared_types[c]).alias(c)

        src = src.select(*[_coerce(c) for c in target_cols])
        # fill omitted (non-generated) columns with their DEFAULT
        # expression, else NULL (insert.rst default clause)
        for f in declared.fields:
            if f.name not in src.columns and f.name not in gen:
                if f.name in table.defaults:
                    src = src.withColumn(
                        f.name, F.expr(table.defaults[f.name]).cast(f.dataType)
                    )
                else:
                    src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
        src = src.select(*[f.name for f in declared.fields if f.name not in gen])

        if conflict is None:
            out = table.insert(src, returning=returning)
            self._refresh(name)
            return out if returning is not None else self._count_df(out)
        if conflict[0] == "nothing":
            stats = table.upsert(src, do_nothing=True)
        else:
            stats = table.upsert(src, set_exprs=conflict[1])
        self._refresh(name)
        return self._count_df(stats["inserted"] + stats["updated"])

    # -- UPDATE / DELETE -------------------------------------------------
    def _update(self, masked: str, literals: list[str]) -> DataFrame:
        m = re.match(
            r"\s*UPDATE\s+([\w.\"]+)\s+SET\s+(.*)$", masked, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError("unsupported UPDATE syntax")
        name = m.group(1).strip('"').split(".")[-1]
        table = self._table(name)
        body, returning = _parse_returning(m.group(2), literals)
        where = None
        wm = re.search(r"\bWHERE\s+(.*)$", body, re.IGNORECASE | re.DOTALL)
        if wm:
            where = self._coerce_ts_literals(
                table,
                rewrite(_expand_occ_where(_unmask(wm.group(1).strip(), literals))),
            )
            body = body[: wm.start()].strip()
        set_exprs = {}
        for a in _split_top(body):
            k, _, v = a.partition("=")
            set_exprs[k.strip().strip('"')] = rewrite(_unmask(v.strip(), literals))
        # partition columns are immutable — moving documents between
        # partitions is not atomic (partitioned-tables.rst:258-273,
        # reference ColumnValidationException); columns feeding a
        # generated partition column are equally frozen
        for col in set_exprs:
            if col in table.partitioned_by:
                raise ValueError(
                    f"Validation failed for {col}: Updating a "
                    "partitioned-by column is not supported"
                )
            for gcol, gexpr in table.generated.items():
                if gcol in table.partitioned_by and re.search(
                    rf"\b{re.escape(col)}\b", gexpr
                ):
                    raise ValueError(
                        f"Validation failed for {col}: Updating a column "
                        "which is referenced in a partitioned by "
                        "generated column expression is not supported"
                    )
        out = table.update(set_exprs, where=where, returning=returning)
        self._refresh(name)
        return out if returning is not None else self._count_df(out)

    def _delete(self, masked: str, literals: list[str]) -> DataFrame:
        m = re.match(
            r"\s*DELETE\s+FROM\s+([\w.\"]+)\s*(?:WHERE\s+(.*))?$",
            masked,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("unsupported DELETE syntax")
        name = m.group(1).strip('"').split(".")[-1]
        table = self._table(name)
        where = (
            self._coerce_ts_literals(
                table,
                rewrite(_expand_occ_where(_unmask(m.group(2).strip(), literals))),
            )
            if m.group(2) else None
        )
        n = table.delete(where)
        self._refresh(name)
        return self._count_df(n)

    # -- COPY ------------------------------------------------------------
    def _copy(self, masked: str, literals: list[str]) -> DataFrame:
        m = re.match(
            r"\s*COPY\s+([\w.\"]+)\s*(?:PARTITION\s*\([^)]*\)\s*)?"
            r"(\(([^)]*)\))?(?:\s+WHERE\s+(.+?))?\s+(FROM|TO)\s+(DIRECTORY\s+)?"
            r"(__LIT_\d+__)\s*(.*)$",
            masked,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("unsupported COPY syntax")
        name = m.group(1).strip('"').split(".")[-1]
        table = self._table(name)
        direction = m.group(5).upper()
        uri = _unmask(m.group(7), literals).strip("'")
        tail = m.group(8) or ""
        props: dict[str, str] = {}
        pm = re.search(r"WITH\s*\(([^)]*)\)", tail, re.IGNORECASE)
        if pm:
            for kv in _split_top(pm.group(1)):
                k, _, v = kv.partition("=")
                props[k.strip().lower()] = _unmask(v.strip(), literals).strip("'\"")
        where = None
        # copy-to.rst grammar puts WHERE before TO; accept a trailing
        # spelling too for compatibility with earlier statements
        where_src = m.group(4)
        wm = re.search(r"\bWHERE\s+(.+?)(?:WITH\s*\(|$)", tail, re.IGNORECASE | re.DOTALL)
        if where_src is None and wm:
            where_src = wm.group(1)
        if where_src:
            where = rewrite(_unmask(where_src.strip(), literals))

        if direction == "FROM":
            fmt = props.get("format", "csv" if not uri.endswith(".json") else "json")
            summary = table.copy_from(
                uri,
                format=fmt,
                header=props.get("header", "true").lower() != "false",
                delimiter=props.get("delimiter", ","),
            )
            self._refresh(name)
            return self.spark.createDataFrame(
                [(summary["loaded"], summary["errors"])],
                "loaded bigint, errors bigint",
            )
        cols = (
            [c.strip().strip('"') for c in m.group(3).split(",")] if m.group(3) else None
        )
        n = table.copy_to(
            uri,
            format=props.get("format", "json"),
            columns=cols,
            where=where,
            directory=bool(m.group(6)),
            compression=props.get("compression"),
        )
        return self._count_df(n)
