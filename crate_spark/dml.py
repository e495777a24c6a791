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
import shutil
import tempfile
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    checks: list[str] = field(default_factory=list)

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
        checks: list[str] | None = None,
    ) -> "CrateTable":
        os.makedirs(path, exist_ok=True)
        t = cls(
            spark,
            path,
            schema_ddl,
            primary_key=primary_key or [],
            partitioned_by=partitioned_by or [],
            generated=generated or {},
            checks=checks or [],
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
            "checks": self.checks,
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
    def _prepare(self, df: DataFrame) -> DataFrame:
        """Apply generated columns and CHECK constraints
        (write-time evaluation, DocTableInfo.java:174/188 semantics)."""
        for col, expr in self.generated.items():
            df = df.withColumn(col, F.expr(expr))
        # project to declared schema order
        names = [f.name for f in self.spark.createDataFrame([], self.schema_ddl).schema.fields]
        df = df.select(*names)
        if self.checks:
            # PG/CrateDB semantics: a CHECK fails only on explicit FALSE;
            # NULL passes (DocTableInfo.java:188 check constraints).
            cond = " AND ".join(f"({c})" for c in self.checks)
            bad = df.filter(F.expr(cond) == F.lit(False)).count()
            if bad:
                raise CheckViolation(
                    f"{bad} row(s) violate CHECK ({cond}) on {self.path}"
                )
        return df

    def _overwrite(self, df: DataFrame) -> None:
        """Write df as the table's new content via staging + swap."""
        staging = os.path.join(
            tempfile.gettempdir(), f"crate_stage_{uuid.uuid4().hex}"
        )
        writer = df.write.mode("overwrite")
        if self.partitioned_by:
            writer = writer.partitionBy(*self.partitioned_by)
        writer.parquet(staging)
        old = self.path + f".old-{uuid.uuid4().hex}"
        os.rename(self.path, old)
        os.rename(staging, self.path)
        self._save_meta()
        shutil.rmtree(old, ignore_errors=True)

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
        use upsert() for ON CONFLICT behavior."""
        df = self._prepare(df)
        if self.primary_key:
            batch_dups = (
                df.groupBy(*self.primary_key).count().filter(F.col("count") > 1).count()
            )
            if batch_dups:
                raise DuplicateKeyError(f"{batch_dups} duplicate key(s) in batch")
            if self._has_data():
                existing = self.read().select(*self.primary_key)
                clash = df.join(existing, self.primary_key, "left_semi").count()
                if clash:
                    raise DuplicateKeyError(
                        f"{clash} row(s) conflict with existing primary keys"
                    )
        self._append(df)
        if returning is not None:
            return df.select(*returning or df.columns)
        return df.count()

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
        df = self._prepare(df).alias("excluded")
        current = self.read().alias("target")
        pk = self.primary_key

        if do_nothing:
            fresh = df.join(current, pk, "left_anti")
            merged = current.unionByName(fresh)
            stats = {"inserted": fresh.count(), "updated": 0}
        else:
            untouched = current.join(df, pk, "left_anti")
            if set_exprs:
                matched = current.join(df, pk, "inner")
                updated = matched.select(
                    *[F.col(f"target.{k}").alias(k) for k in pk],
                    *[
                        F.expr(set_exprs[c]).alias(c)
                        if c in set_exprs
                        else F.col(f"excluded.{c}").alias(c)
                        for c in df.columns
                        if c not in pk
                    ],
                )
                n_updated = updated.count()
                fresh = df.join(current, pk, "left_anti")
                merged = untouched.unionByName(updated).unionByName(fresh)
            else:
                n_updated = current.join(df, pk, "left_semi").count()
                fresh = df
                merged = untouched.unionByName(df)
            stats = {"inserted": fresh.count() - n_updated if not set_exprs else fresh.count(),
                     "updated": n_updated}
        self._overwrite(merged)
        return stats

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
            matched.alias("__matched"),
        )
        if returning is not None:
            ret_path = os.path.join(
                tempfile.gettempdir(), f"crate_returning_{uuid.uuid4().hex}"
            )
            updated.filter("__matched").select(
                *(returning or current.columns)
            ).write.parquet(ret_path)
            self._overwrite(updated.drop("__matched"))
            return self.spark.read.parquet(ret_path)
        n = current.filter(matched).count()
        self._overwrite(updated.drop("__matched"))
        return n

    def delete(self, where: str | None = None) -> int:
        """DELETE [WHERE ...]. A predicate that exactly selects whole
        partitions drops the directories (DeletePartitions fast path);
        otherwise read-filter-write."""
        if where is None:
            n = self.read().count()
            self._overwrite(self.read().limit(0))
            return n
        current = self.read()
        n = current.filter(F.expr(where)).count()
        if n:
            self._overwrite(current.filter(~F.coalesce(F.expr(where), F.lit(False))))
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
        count bad ones (PERMISSIVE + _corrupt_record)."""
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
            raw = (
                self.spark.read.option("mode", "PERMISSIVE")
                .schema(target_schema)
                .json(uri)
            )
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
        n_total = raw.count()
        n_good = good.count()
        self._append(self._prepare(good))
        return {"loaded": n_good, "errors": max(n_total - n_good, 0)}

    def copy_to(self, uri: str, *, format: str = "json",
                columns: list[str] | None = None, where: str | None = None) -> int:
        """COPY TO: parallel export (json-lines / csv / parquet),
        optional column subset + WHERE (WriterProjection.java:66)."""
        df = self.read()
        if where:
            df = df.filter(F.expr(where))
        if columns:
            df = df.select(*columns)
        n = df.count()
        if format == "json":
            df.write.mode("overwrite").json(uri)
        elif format == "csv":
            df.write.mode("overwrite").option("header", True).csv(uri)
        elif format == "parquet":
            df.write.mode("overwrite").parquet(uri)
        elif format == "orc":
            df.write.mode("overwrite").orc(uri)
        else:
            raise ValueError(f"unsupported COPY format: {format}")
        return n
