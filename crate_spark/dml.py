"""DML over Parquet-backed tables: CREATE TABLE, INSERT (VALUES /
SELECT / ON CONFLICT upsert), UPDATE, DELETE, COPY FROM/TO, RETURNING.

Reference parity (SURVEY.md §2.1):
- INSERT / upsert: ``planner/operators/Insert.java:51``,
  ``InsertFromValues``, ON CONFLICT DO UPDATE/NOTHING
  (``docs/sql/statements/insert.rst:25-27``)
- UPDATE/DELETE: query-then-write per shard
  (``execution/dsl/projection/UpdateProjection.java``,
  ``DeleteProjection.java``); whole-partition DELETE drops the
  partition (``planner/node/ddl/DeletePartitions.java``)
- COPY FROM/TO: ``planner/statement/CopyFromPlan.java`` /
  ``CopyToPlan.java``, formats csv/json, RETURN SUMMARY
  (``FileReadingIterator.java:82``), export formats
  ``WriterProjection.java:66`` (JSON_OBJECT/JSON_ARRAY)
- generated columns / PK / CHECK: ``metadata/doc/DocTableInfo.java:174-201``

Storage model: one directory per table; Hive-style subdirectories when
``partitioned_by`` is set; table attributes (PK, generated columns,
checks, partitioning) in ``_crate_meta.json``. Mutations are
read-merge-write with a staging directory and atomic swap — the
single-writer batch analog of the reference's per-shard write path.
At production scale the same API fronts a transactional table format
(Delta/Iceberg); the semantics here are what the tests pin down.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

META_FILE = "_crate_meta.json"


class CheckViolation(Exception):
    """A CHECK constraint rejected one or more rows."""


class DuplicateKeyError(Exception):
    """INSERT without ON CONFLICT hit an existing primary key."""


@dataclass
class CrateTable:
    """A Parquet-backed table with CrateDB-style write semantics."""

    spark: SparkSession
    path: str
    schema_ddl: str
    primary_key: list[str] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)
    generated: dict[str, str] = field(default_factory=dict)
    #: write-time form of each generated expression — dialect-rewritten
    #: and UDF-dispatch-resolved at CREATE so F.expr can evaluate it;
    #: ``generated`` keeps the user's spelling for SHOW CREATE TABLE
    generated_eval: dict[str, str] = field(default_factory=dict)
    checks: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)
    #: WITH (...) storage/replication settings (create-table.rst) —
    #: advisory metadata on Parquet (no replicas to configure), kept
    #: for ALTER TABLE SET/RESET and SHOW CREATE TABLE parity
    settings: dict[str, str] = field(default_factory=dict)
    #: CLUSTERED BY routing key + shard count (create-table.rst;
    #: DistributionType MODULO analog): writes hash-repartition on the
    #: key into `shards` routed files per batch
    clustered_by: list[str] = field(default_factory=list)
    shards: int | None = None
    #: named fulltext indexes: index name -> source columns
    #: (fulltext-indices.rst composite INDEX ... USING FULLTEXT(cols))
    ft_indexes: dict[str, list] = field(default_factory=dict)
    #: columns declared NOT NULL (explicitly or via PRIMARY KEY) —
    #: surfaced as {schema}_{table}_{col}_not_null CHECK rows in
    #: information_schema.table_constraints (information-schema.rst:600)
    not_null: list = field(default_factory=list)
    #: declared crate column types, in DDL order:
    #: [{"name", "type", "children": [...]}] — "type" is the
    #: reference's information_schema data_type spelling; object
    #: columns carry their declared subcolumns (recursively), which
    #: information_schema.columns expands into col['sub'] rows
    #: (information-schema.rst:363-381)
    crate_columns: list = field(default_factory=list)

    # -- catalog ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema_ddl: str,
        *,
        primary_key: list[str] | None = None,
        partitioned_by: list[str] | None = None,
        generated: dict[str, str] | None = None,
        generated_eval: dict[str, str] | None = None,
        checks: list[str] | None = None,
        defaults: dict[str, str] | None = None,
        settings: dict[str, str] | None = None,
        clustered_by: list[str] | None = None,
        shards: int | None = None,
        ft_indexes: dict[str, list] | None = None,
        crate_columns: list | None = None,
        not_null: list | None = None,
    ) -> "CrateTable":
        os.makedirs(path, exist_ok=True)
        t = cls(
            spark,
            path,
            schema_ddl,
            primary_key=primary_key or [],
            partitioned_by=partitioned_by or [],
            generated=generated or {},
            generated_eval=generated_eval or {},
            checks=checks or [],
            defaults=defaults or {},
            settings=settings or {},
            clustered_by=clustered_by or [],
            shards=shards,
            ft_indexes=ft_indexes or {},
            crate_columns=crate_columns or [],
            not_null=not_null or [],
        )
        t._save_meta()
        return t

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "CrateTable":
        with open(os.path.join(path, META_FILE)) as f:
            meta = json.load(f)
        return cls(spark, path, **meta)

    def _save_meta(self) -> None:
        meta = {
            "schema_ddl": self.schema_ddl,
            "primary_key": self.primary_key,
            "partitioned_by": self.partitioned_by,
            "generated": self.generated,
            "generated_eval": self.generated_eval,
            "checks": self.checks,
            "defaults": self.defaults,
            "settings": self.settings,
            "clustered_by": self.clustered_by,
            "shards": self.shards,
            "ft_indexes": self.ft_indexes,
            "crate_columns": self.crate_columns,
            "not_null": self.not_null,
        }
        with open(os.path.join(self.path, META_FILE), "w") as f:
            json.dump(meta, f, indent=2)

    # -- read ------------------------------------------------------------
    def _has_data(self) -> bool:
        for root, _dirs, files in os.walk(self.path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self) -> DataFrame:
        if not self._has_data():
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.schema(self.schema_ddl).parquet(self.path)

    # -- write plumbing --------------------------------------------------
    #
    # Mutation statistics (matched counts, PK clashes, CHECK
    # violations) ride the write itself via ``Dataset.observe``
    # (accumulator metrics collected while rows stream through the
    # write) — never a separate count job. Every write stages first,
    # so a constraint violation discovered in the metrics discards the
    # staging directory before anything becomes visible: the
    # single-writer batch analog of the reference's per-shard
    # write-then-ack path. One scan per mutation source.

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Apply generated columns and project to declared schema order
        (write-time evaluation, DocTableInfo.java:174 semantics).
        CHECK evaluation happens as an observed metric on the write —
        see _check_viol_col."""
        for col, expr in self.generated.items():
            df = df.withColumn(col, F.expr(self.generated_eval.get(col, expr)))
        # declared length enforcement (data-types.rst VARCHAR(n)/BIT(n)):
        # VARCHAR truncates all-space excess, errors otherwise; BIT
        # requires the exact declared length. raise_error keeps the
        # check on the write pass — no pre-scan.
        for decl in getattr(self, "crate_columns", []):
            n = decl.get("length")
            if not n or decl["name"] not in df.columns:
                continue
            col = decl["name"]
            if decl["type"] == "bit":
                df = df.withColumn(
                    col,
                    F.expr(
                        f"CASE WHEN {col} IS NULL OR length({col}) = {n} "
                        f"THEN {col} ELSE CAST(raise_error(concat("
                        f"'bit string length ', length({col}), "
                        f"' does not match type bit({n})')) AS STRING) END"
                    ),
                )
            else:
                df = df.withColumn(
                    col,
                    F.expr(
                        f"CASE WHEN {col} IS NULL OR length({col}) <= {n} "
                        f"THEN {col} "
                        f"WHEN length(rtrim({col})) <= {n} "
                        f"THEN substring({col}, 1, {n}) "
                        f"ELSE CAST(raise_error(concat(\"'\", {col}, "
                        f"\"' is too long for the text type of length: {n}\""
                        f")) AS STRING) END"
                    ),
                )
                if decl["type"] == "character":
                    # CHAR(n) is blank-PADDED to the declared length
                    df = df.withColumn(
                        col, F.expr(f"rpad({col}, {n}, ' ')")
                    )
        names = [f.name for f in self.spark.createDataFrame([], self.schema_ddl).schema.fields]
        return df.select(*names)

    def _check_viol_col(self):
        """0/1 violation flag for the table's CHECK constraints.
        PG/CrateDB semantics: a CHECK fails only on explicit FALSE;
        NULL passes (DocTableInfo.java:188)."""
        if not self.checks:
            return None
        cond = " AND ".join(f"({c})" for c in self.checks)
        return (F.expr(cond) == F.lit(False)).cast("int")

    def _raise_if_viol(self, got: dict) -> None:
        bad = int(got.get("viol") or 0)
        if bad:
            cond = " AND ".join(f"({c})" for c in self.checks)
            raise CheckViolation(
                f"{bad} row(s) violate CHECK ({cond}) on {self.path}"
            )

    def _write_staged(self, df: DataFrame, metrics: dict | None = None) -> tuple[str, dict]:
        """Write df to a fresh staging directory; return (path, observed
        metrics). The caller decides commit (swap/merge) vs abort."""
        staging = os.path.join(
            tempfile.gettempdir(), f"crate_stage_{uuid.uuid4().hex}"
        )
        got: dict = {}
        if metrics:
            obs = Observation()
            df = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
        helper = [c for c in df.columns if c.startswith("__")]
        if helper:
            df = df.drop(*helper)
        if self.clustered_by and self.shards:
            # MODULO routing: every batch hash-partitions on the
            # CLUSTERED BY key into exactly `shards` files — the same
            # key always lands in the same routed stream, and per-batch
            # file counts stay bounded
            df = df.repartition(self.shards, *self.clustered_by)
        writer = df.write.mode("overwrite")
        if self.partitioned_by:
            writer = writer.partitionBy(*self.partitioned_by)
        # AQE's empty-relation propagation replaces the plan past an
        # empty shuffle with a LocalRelation, dropping the caller's
        # upstream observe node — a mutation that empties a CLUSTERED
        # table then fails to report its observed count. Exclude the
        # rule for the staged write only.
        key = "spark.sql.adaptive.optimizer.excludedRules"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(
            key,
            (prev + "," if prev else "")
            + "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
        )
        try:
            writer.parquet(staging)
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)
        if metrics:
            got = obs.get
        return staging, got

    def _swap_in(self, staging: str) -> None:
        """Atomically replace table content with the staged write."""
        old = self.path + f".old-{uuid.uuid4().hex}"
        os.rename(self.path, old)
        os.rename(staging, self.path)
        self._save_meta()
        shutil.rmtree(old, ignore_errors=True)

    def _merge_in(self, staging: str) -> list[str]:
        """Append semantics: move staged part files (and partition
        subdirectories) into the table directory. Part file names are
        globally unique, so a move-merge never collides."""
        moved: list[str] = []
        for root, _dirs, files in os.walk(staging):
            rel = os.path.relpath(root, staging)
            dest = self.path if rel == "." else os.path.join(self.path, rel)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                os.makedirs(dest, exist_ok=True)
                target = os.path.join(dest, f)
                os.rename(os.path.join(root, f), target)
                moved.append(target)
        shutil.rmtree(staging, ignore_errors=True)
        return moved

    def _overwrite(self, df: DataFrame) -> None:
        """Write df as the table's new content via staging + swap."""
        staging, _ = self._write_staged(df)
        self._swap_in(staging)

    def _append(self, df: DataFrame) -> None:
        writer = df.write.mode("append")
        if self.partitioned_by:
            writer = writer.partitionBy(*self.partitioned_by)
        writer.parquet(self.path)

    # -- dynamic columns -------------------------------------------------
    def insert_dynamic(self, df: DataFrame, returning: list[str] | None = None):
        """INSERT with ``column_policy='dynamic'`` semantics
        (``execution/dml/DynamicIndexer.java``; SURVEY.md §7 hard part
        (a)): columns in the batch that the table does not yet have are
        ADDED to the table schema (existing rows read them as NULL via
        schema merge); declared columns missing from the batch are
        filled with NULL.
        """
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        declared_types = {f.name: f.dataType for f in declared.fields}
        # a dynamic batch may ADD columns but never change a type
        # (DynamicIndexer raises a mapper conflict in the reference)
        for f in df.schema.fields:
            if f.name in declared_types and f.dataType != declared_types[f.name]:
                raise ValueError(
                    f"dynamic insert type conflict on '{f.name}': table has "
                    f"{declared_types[f.name].simpleString()}, batch has "
                    f"{f.dataType.simpleString()}"
                )
        new_fields = [f for f in df.schema.fields if f.name not in declared_types]
        if new_fields:
            self.schema_ddl = ", ".join(
                [self.schema_ddl]
                + [f"{f.name} {f.dataType.simpleString()}" for f in new_fields]
            )
            self._save_meta()
        full = self.spark.createDataFrame([], self.schema_ddl).schema
        for f in full.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return self.insert(df.select(*[f.name for f in full.fields]), returning=returning)

    # -- INSERT ----------------------------------------------------------
    def insert(self, df: DataFrame, returning: list[str] | None = None):
        """INSERT ... SELECT/VALUES. With a PK, duplicate keys (against
        existing data or within the batch) raise DuplicateKeyError —
        use upsert() for ON CONFLICT behavior.

        Single-pass: batch-dup flags (count window over the PK),
        existing-PK clash flags (left join against current keys) and
        CHECK violations are observed metrics on the staged write —
        one job over the batch, then a file move-merge on success."""
        df = self._prepare(df)
        metrics: dict = {"n": F.count(F.lit(1))}
        viol = self._check_viol_col()
        if viol is not None:
            df = df.withColumn("__viol", viol)
            metrics["viol"] = F.sum("__viol")
        if self.primary_key:
            pk = self.primary_key
            w = Window.partitionBy(*pk)
            df = df.withColumn(
                "__dup", (F.count(F.lit(1)).over(w) > 1).cast("int")
            )
            metrics["dups"] = F.sum("__dup")
            if self._has_data():
                existing = self.read().select(*pk).withColumn("__exists", F.lit(1))
                df = df.join(existing, pk, "left")
                metrics["clash"] = F.sum("__exists")
        staging, got = self._write_staged(df, metrics)
        try:
            self._raise_if_viol(got)
            if int(got.get("dups") or 0):
                raise DuplicateKeyError(
                    f"{int(got['dups'])} row(s) share a duplicate key in batch"
                )
            if int(got.get("clash") or 0):
                raise DuplicateKeyError(
                    f"{int(got['clash'])} row(s) conflict with existing primary keys"
                )
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        moved = self._merge_in(staging)
        if returning is not None:
            out = (
                self.spark.read.schema(
                    self.spark.createDataFrame([], self.schema_ddl).schema
                )
                .option("basePath", self.path)
                .parquet(*moved)
                if moved
                else self.read().limit(0)
            )
            return out.select(*returning or out.columns)
        return int(got["n"])

    def insert_values(self, rows: list[tuple], returning: list[str] | None = None):
        """INSERT INTO ... VALUES — rows carry the non-generated columns
        in schema order."""
        gen = set(self.generated)
        names = [
            f.name
            for f in self.spark.createDataFrame([], self.schema_ddl).schema.fields
            if f.name not in gen
        ]
        base = self.spark.createDataFrame(rows, schema=", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in self.spark.createDataFrame([], self.schema_ddl).schema.fields
            if f.name not in gen
        ))
        return self.insert(base.toDF(*names), returning=returning)

    def upsert(self, df: DataFrame, *, do_nothing: bool = False,
               set_exprs: dict[str, str] | None = None) -> dict:
        """INSERT ... ON CONFLICT (pk) DO UPDATE SET ... / DO NOTHING.

        DO UPDATE defaults to replacing all non-PK columns with the
        excluded (incoming) row; ``set_exprs`` overrides specific
        columns with SQL over ``target.<col>`` / ``excluded.<col>``.
        Read-merge-write: one anti/inner join against current content.
        """
        if not self.primary_key:
            raise ValueError("upsert requires a primary key")
        df = self._prepare(df)
        viol = self._check_viol_col()
        if viol is not None:
            # batch rows carry their violation flag into the merge;
            # rows kept from current content observed as 0
            df = df.withColumn("__viol", viol)
        df = df.alias("excluded")
        current = self.read()
        if viol is not None:
            current = current.withColumn("__viol", F.lit(0))
        current = current.alias("target")
        pk = self.primary_key
        cols = [c for c in df.columns]

        def _src(frame: DataFrame, tag: str) -> DataFrame:
            return frame.withColumn("__src", F.lit(tag))

        if do_nothing:
            fresh = df.join(current, pk, "left_anti")
            merged = _src(current, "keep").unionByName(_src(fresh, "ins"))
        else:
            untouched = current.join(df, pk, "left_anti")
            if set_exprs:
                matched = current.join(df, pk, "inner")
                updated = matched.select(
                    *[F.col(f"target.{k}").alias(k) for k in pk],
                    *[
                        F.expr(set_exprs[c]).alias(c)
                        if c in set_exprs
                        # DO UPDATE SET only touches the LISTED columns;
                        # the rest KEEP the existing row's values
                        # (insert.rst ON CONFLICT semantics)
                        else F.col(f"target.{c}").alias(c)
                        for c in cols
                        if c not in pk and c != "__viol"
                    ],
                    *([F.col("excluded.__viol").alias("__viol")] if viol is not None else []),
                )
                fresh = df.join(current, pk, "left_anti")
                merged = (
                    _src(untouched, "keep")
                    .unionByName(_src(updated, "upd"))
                    .unionByName(_src(fresh, "ins"))
                )
            else:
                # default DO UPDATE: the whole excluded row replaces the
                # target row — mark each batch row by whether its key
                # already exists (one left join, no separate count)
                hits = current.select(
                    *[F.col(f"target.{k}").alias(k) for k in pk],
                    F.lit(1).alias("__hit"),
                )
                batch = df.join(hits, pk, "left").withColumn(
                    "__src", F.when(F.col("__hit").isNotNull(), "upd").otherwise("ins")
                ).drop("__hit")
                merged = _src(untouched, "keep").unionByName(batch)
        metrics = {
            "inserted": F.sum((F.col("__src") == "ins").cast("int")),
            "updated": F.sum((F.col("__src") == "upd").cast("int")),
        }
        if viol is not None:
            metrics["viol"] = F.sum("__viol")
        staging, got = self._write_staged(merged, metrics)
        try:
            self._raise_if_viol(got)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        self._swap_in(staging)
        return {"inserted": int(got["inserted"]), "updated": int(got["updated"])}

    # -- UPDATE / DELETE -------------------------------------------------
    def update(self, set_exprs: dict[str, str], where: str | None = None,
               returning: list[str] | None = None):
        """UPDATE ... SET col = expr [WHERE ...] — read-transform-write.

        Without RETURNING, returns the matched-row count. With
        RETURNING, returns a DataFrame backed by a staged parquet
        export of the updated rows — never a driver-side collect
        (``UPDATE ... RETURNING *`` over a 100 TB table must stream,
        not OOM the driver), and no separate count job: the export
        write IS the matched-row pass.
        """
        current = self.read()
        # matched is evaluated on the OLD values (PG semantics), before
        # any SET expression rewrites a column the predicate reads
        matched = F.coalesce(F.expr(where), F.lit(False)) if where else F.lit(True)
        updated = current.select(
            *[
                F.when(matched, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
                if c in set_exprs
                else F.col(c)
                for c in current.columns
            ],
            matched.cast("int").alias("__matched"),
        )
        if returning is not None:
            ret_path = os.path.join(
                tempfile.gettempdir(), f"crate_returning_{uuid.uuid4().hex}"
            )
            updated.filter("__matched = 1").select(
                *(returning or current.columns)
            ).write.parquet(ret_path)
            self._overwrite(updated)
            return self.spark.read.parquet(ret_path)
        # matched-row count rides the rewrite as an observed metric
        staging, got = self._write_staged(updated, {"n": F.sum("__matched")})
        self._swap_in(staging)
        return int(got["n"] or 0)

    def delete(self, where: str | None = None) -> int:
        """DELETE [WHERE ...]. A predicate that exactly selects whole
        partitions drops the directories (DeletePartitions fast path);
        otherwise read-filter-write with the deleted-row count observed
        on the same pass (no pre-count job). When nothing matched the
        staged rewrite is discarded and the table left untouched."""
        if where is None:
            n = self.read().count()
            self._overwrite(self.read().limit(0))
            return n
        current = self.read()
        flagged = current.withColumn(
            "__del", F.coalesce(F.expr(where), F.lit(False)).cast("int")
        )
        obs = Observation()
        kept = flagged.observe(
            obs, F.sum("__del").alias("n_del")
        ).filter("__del = 0")
        staging, _ = self._write_staged(kept)
        n = int(obs.get["n_del"] or 0)
        if n:
            self._swap_in(staging)
        else:
            shutil.rmtree(staging, ignore_errors=True)
        return n

    def drop_partition(self, **kv) -> bool:
        """DELETE of a whole partition == directory drop."""
        if list(kv) != self.partitioned_by[: len(kv)]:
            raise ValueError(f"partition keys must be a prefix of {self.partitioned_by}")
        sub = os.path.join(
            self.path, *[f"{k}={v}" for k, v in kv.items()]
        )
        if os.path.isdir(sub):
            shutil.rmtree(sub)
            return True
        return False

    # -- COPY ------------------------------------------------------------
    def copy_from(self, uri: str, *, format: str = "csv",
                  header: bool = True, delimiter: str = ",") -> dict:
        """COPY FROM with RETURN SUMMARY semantics: load good rows,
        count bad ones (PERMISSIVE + _corrupt_record).

        ``http(s)://`` URIs are fetched to a spool file first
        (copy-from.rst "Other schemes": JVM URL protocols, no wildcard
        expansion) — Spark's file sources don't speak http. The spool
        lives NEXT TO the table directory, i.e. on the same filesystem
        executors read the table from, so the pattern survives a real
        cluster where the driver's /tmp is invisible to executors;
        bulk lake imports use file:// / s3a:// paths directly."""
        if re.match(r"^https?://", uri, re.IGNORECASE):
            if "*" in uri:
                raise ValueError(
                    "wildcard expansion is not supported for http(s) URIs"
                )
            import urllib.request

            spool = os.path.join(
                os.path.dirname(self.path.rstrip("/")) or tempfile.gettempdir(),
                # no leading underscore: Hadoop file sources treat
                # _-prefixed paths as hidden and read zero rows
                f"copy-spool-{uuid.uuid4().hex}.{format}",
            )
            try:
                with urllib.request.urlopen(uri, timeout=60) as resp, open(  # noqa: S310
                    spool, "wb"
                ) as out:
                    while True:
                        chunk = resp.read(1 << 20)
                        if not chunk:
                            break
                        out.write(chunk)
                # recurse on the local spool (can't re-enter this
                # branch); the load fully materializes into the table
                # before returning, so the spool can be deleted after
                return self.copy_from(
                    spool, format=format, header=header, delimiter=delimiter
                )
            finally:
                try:
                    os.unlink(spool)
                except OSError:
                    pass
        target_schema = self.spark.createDataFrame([], self.schema_ddl).schema
        if format == "csv":
            raw = (
                self.spark.read.option("header", header)
                .option("delimiter", delimiter)
                .option("mode", "PERMISSIVE")
                .schema(target_schema)
                .csv(uri)
            )
            good = raw.dropna(how="all")
        elif format == "json":
            # crate JSON imports carry timestamps as epoch MILLIS
            # numbers (or ISO strings); Spark's JSON reader would read
            # a number into TimestampType as seconds. Read those
            # fields as strings and convert explicitly.
            from pyspark.sql import types as T

            # ... and scalar fields coerce leniently ("0" -> integer 0,
            # as the reference's type casts do): read scalars as
            # strings, cast after
            ts_cols = [
                f.name
                for f in target_schema.fields
                if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            ]
            scalar_cols = {
                f.name: f.dataType.simpleString()
                for f in target_schema.fields
                if isinstance(
                    f.dataType,
                    (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                     T.FloatType, T.DoubleType, T.BooleanType, T.DecimalType),
                )
            }
            read_schema = T.StructType(
                [
                    T.StructField(f.name, T.StringType(), f.nullable)
                    if f.name in ts_cols or f.name in scalar_cols
                    else f
                    for f in target_schema.fields
                ]
            )
            raw = (
                self.spark.read.option("mode", "PERMISSIVE")
                .schema(read_schema)
                .json(uri)
            )
            for c in ts_cols:
                raw = raw.withColumn(
                    c,
                    F.coalesce(
                        F.timestamp_millis(F.col(c).cast("long")),
                        F.to_timestamp(F.col(c)),
                    ),
                )
            for c, t in scalar_cols.items():
                raw = raw.withColumn(c, F.col(c).cast(t))
            good = raw.dropna(how="all")
        elif format in ("parquet", "orc"):
            # columnar imports carry their own schema; malformed files
            # fail the scan rather than producing bad rows
            raw = getattr(self.spark.read.schema(target_schema), format)(uri)
            good = raw
        else:
            raise ValueError(f"unsupported COPY format: {format}")
        # RETURN SUMMARY: a row is an error only if NOTHING parsed
        # (all-null after permissive parse); counting raw text lines is
        # wrong for multi-part exports (one header per part file).
        # Both counts + CHECK violations are observed on the load
        # write itself — a single pass over the import source.
        if good is raw:
            flagged = raw.withColumn("__bad", F.lit(0))
        else:
            all_null = F.lit(True)
            for c in raw.columns:
                all_null = all_null & F.col(c).isNull()
            flagged = raw.withColumn("__bad", all_null.cast("int"))
        obs_in = Observation()
        good = flagged.observe(
            obs_in,
            F.count(F.lit(1)).alias("n_total"),
            F.sum("__bad").alias("n_bad"),
        ).filter("__bad = 0").drop("__bad")
        df = self._prepare(good)
        metrics: dict = {}
        viol = self._check_viol_col()
        if viol is not None:
            df = df.withColumn("__viol", viol)
            metrics["viol"] = F.sum("__viol")
        staging, got = self._write_staged(df, metrics or None)
        try:
            self._raise_if_viol(got)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        self._merge_in(staging)
        loaded = int(obs_in.get["n_total"] or 0) - int(obs_in.get["n_bad"] or 0)
        return {"loaded": loaded, "errors": int(obs_in.get["n_bad"] or 0)}

    def optimize(self, *, max_num_segments: int | None = None,
                 partition: dict | None = None) -> dict:
        """OPTIMIZE TABLE — the Lucene segment-merge analog
        (``OptimizeTablePlan.java``; optimize.rst): compact the
        table's parquet part files. Streaming/append ingest and
        per-statement INSERTs accumulate small files; at scale a
        100k-file table pays one task + one open per file on every
        scan, so periodic compaction is a real operation here, not a
        no-op.

        Layout contract is preserved: CLUSTERED tables re-route
        through their MODULO hash partitioning (``shards`` files),
        PARTITIONED BY tables keep their directory layout (compaction
        runs within partitions; the ``partition`` arg restricts the
        rewrite to one partition, per the PARTITION clause), flat
        tables coalesce to ``max_num_segments`` (WITH
        (max_num_segments=N); default one file per 128 MB). The
        rewrite stages and swaps like every other mutation — readers
        never observe a partial table.
        """
        n_before = files_before = 0
        bytes_total = 0
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                if f.endswith(".parquet"):
                    files_before += 1
                    bytes_total += os.path.getsize(os.path.join(root, f))
        if files_before == 0:
            return {"files_before": 0, "files_after": 0}
        df = self.read()
        if partition:
            cond = " AND ".join(f"{k} = {v!r}" for k, v in partition.items())
            keep = df.filter(f"NOT ({cond})")
            df = df.filter(cond)
        if not (self.clustered_by and self.shards):
            target = max_num_segments or max(1, bytes_total // (128 << 20))
            df = df.coalesce(int(target))
        if partition:
            df = df.unionByName(keep)
        # _write_staged applies MODULO routing / partitionBy itself
        staging, _ = self._write_staged(df)
        self._swap_in(staging)
        files_after = sum(
            1
            for root, _dirs, files in os.walk(self.path)
            for f in files
            if f.endswith(".parquet")
        )
        return {"files_before": files_before, "files_after": files_after}

    def copy_to(self, uri: str, *, format: str = "json",
                columns: list[str] | None = None, where: str | None = None,
                directory: bool = False, compression: str | None = None) -> int:
        """COPY TO: parallel export (json-lines / csv / parquet),
        optional column subset + WHERE (WriterProjection.java:66).

        ``TO DIRECTORY`` (copy-to.rst:175) writes named export files
        INTO an existing directory — it must never be replaced (the
        docs export into /tmp/), so the write lands in a scratch dir
        and the part files are MOVED in as ``<table>_<i>.<ext>[.gz]``,
        the reference's shard-file naming."""
        df = self.read()
        if where:
            df = df.filter(F.expr(where))
        if columns:
            df = df.select(*columns)
        # row count observed ON the export write — one scan over the
        # (possibly huge) filtered input, same pattern as copy_from /
        # delete; a separate df.count() would scan it twice
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        target = uri
        if directory:
            import tempfile

            target = tempfile.mkdtemp(prefix="crate_copy_to_") + "/out"
        writer = df.write.mode("overwrite")
        if compression:
            writer = writer.option("compression", compression)
        if format == "json":
            writer.json(target)
        elif format == "csv":
            writer.option("header", True).csv(target)
        elif format == "parquet":
            writer.parquet(target)
        elif format == "orc":
            writer.orc(target)
        else:
            raise ValueError(f"unsupported COPY format: {format}")
        if directory:
            import glob as _glob
            import os as _os
            import shutil as _shutil

            tname = _os.path.basename(self.path.rstrip("/")) or "export"
            _os.makedirs(uri, exist_ok=True)
            for i, part in enumerate(
                sorted(_glob.glob(_os.path.join(target, "part-*")))
            ):
                ext = _os.path.basename(part).split(".", 1)[1]
                _shutil.move(part, _os.path.join(uri, f"{tname}_{i}.{ext}"))
            _shutil.rmtree(_os.path.dirname(target), ignore_errors=True)
        return int(obs.get["n_rows"] or 0)
