"""Repositories and snapshots — backup/restore of table state.

Reference parity:
- ``docs/sql/statements/create-repository.rst`` (TYPE fs WITH
  (location=...)), ``alter-repository.rst``, ``drop-repository.rst``
- ``docs/sql/statements/create-snapshot.rst``: ``CREATE SNAPSHOT
  repo.snap [TABLE t1, t2 | ALL] [WITH (...)]`` — a snapshot is a
  point-in-time copy of the named tables inside the repository
- ``restore-snapshot.rst``: ``RESTORE SNAPSHOT repo.snap [TABLE t |
  ALL]``; ``drop-snapshot.rst``
- sys tables: ``metadata/sys/SysRepositoriesTableInfo.java`` (name,
  type, settings), ``SysSnapshotsTableInfo.java`` (id, name,
  repository, tables, started, finished, version, state)

Spark-first: the snapshot copy is a distributed parquet write
(``df.write.parquet``), not a driver-side file copy — at 100 TB the
executors stream table partitions straight into the repository
location. Only the per-table ``_crate_meta.json`` sidecar (PK /
checks / generated columns, a few hundred bytes) moves through the
driver.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone


class SnapshotError(Exception):
    """Repository/snapshot management failure."""


SNAP_META = "_snapshot.json"
TABLE_META = "_crate_meta.json"


@dataclass
class Repository:
    name: str
    type: str
    #: settings as the user supplied them (sys.repositories renders
    #: these verbatim — a relative location displays unresolved)
    settings: dict = field(default_factory=dict)
    #: physical directory (relative locations resolved to base_dir)
    resolved_location: str = ""

    @property
    def location(self) -> str:
        return self.resolved_location or self.settings["location"]


class SnapshotStore:
    """Filesystem-repository snapshot catalog.

    Layout: ``{repo.location}/{snapshot}/{table}/part-*.parquet``
    plus ``{repo.location}/{snapshot}/_snapshot.json`` metadata.
    """

    def __init__(self, base_dir: str | None = None) -> None:
        self.repositories: dict[str, Repository] = {}
        #: root for RELATIVE fs locations (create-repository.rst uses
        #: bare names like 'repo_path') — session-scoped so repeated
        #: doc runs start clean and never litter the caller's cwd
        self.base_dir = base_dir

    # -- repositories ----------------------------------------------------
    def create_repository(self, name: str, type_: str, settings: dict) -> None:
        key = name.lower()
        if key in self.repositories:
            raise SnapshotError(f"Repository '{name}' already exists")
        type_ = type_.lower()
        if type_ not in ("fs", "s3", "azure", "gcs", "url"):
            raise SnapshotError(f"Unsupported repository type '{type_}'")
        resolved = ""
        if type_ == "fs":
            if "location" not in settings:
                raise SnapshotError(
                    "fs repository requires WITH (location='...')"
                )
            resolved = settings["location"]
            if self.base_dir and not os.path.isabs(resolved):
                resolved = os.path.join(self.base_dir, "_repositories", resolved)
            os.makedirs(resolved, exist_ok=True)
        # non-fs types (create-repository.rst: s3/azure/gcs/url) are
        # cloud-credential bound: the registration and its settings are
        # real catalog state (sys.repositories, ALTER/DROP), but
        # snapshot I/O against them raises (no cloud access here)
        self.repositories[key] = Repository(key, type_, dict(settings), resolved)

    def alter_repository(self, name: str, settings: dict) -> None:
        repo = self._repo(name)
        repo.settings.update(settings)

    def reset_repository_settings(self, name: str, props: list[str]) -> None:
        """ALTER REPOSITORY ... RESET prop[, ...] — drop optional
        settings back to their defaults (alter-repository.rst:72-77;
        required ones like fs `location` stay)."""
        repo = self._repo(name)
        for p in props:
            if p == "location" and repo.type == "fs":
                raise SnapshotError("'location' is required for fs repositories")
            repo.settings.pop(p, None)

    def drop_repository(self, name: str) -> None:
        key = name.lower()
        if key not in self.repositories:
            raise SnapshotError(f"Repository '{name}' does not exist")
        # drop-repository.rst: de-registers only; snapshot data stays
        del self.repositories[key]

    def _repo(self, name: str) -> Repository:
        key = name.lower()
        if key not in self.repositories:
            raise SnapshotError(f"Repository '{name}' does not exist")
        return self.repositories[key]

    # -- snapshots -------------------------------------------------------
    def _snap_dir(self, repo: Repository, snapshot: str) -> str:
        if repo.type != "fs":
            raise SnapshotError(
                f"Repository '{repo.name}' is of type '{repo.type}'; "
                "snapshot I/O requires cloud credentials (only fs "
                "repositories are operable here)"
            )
        return os.path.join(repo.location, snapshot.lower())

    def create_snapshot(
        self,
        repo_name: str,
        snapshot: str,
        tables: dict[str, "object"],
        table_meta: dict[str, dict] | None = None,
    ) -> dict:
        """Write each table's DataFrame into the repository.

        ``tables``: name -> DataFrame (already the committed state).
        ``table_meta``: name -> _crate_meta dict for SQL-created
        tables, restored verbatim.
        """
        repo = self._repo(repo_name)
        snap_dir = self._snap_dir(repo, snapshot)
        if os.path.exists(os.path.join(snap_dir, SNAP_META)):
            raise SnapshotError(
                f"Snapshot '{repo.name}.{snapshot}' already exists"
            )
        started = datetime.now(timezone.utc).isoformat()
        os.makedirs(snap_dir, exist_ok=True)
        compress = str(repo.settings.get("compress", "true")).lower() != "false"
        for name, df in tables.items():
            (
                df.write.mode("overwrite")
                .option("compression", "snappy" if compress else "none")
                .parquet(os.path.join(snap_dir, name))
            )
            meta = (table_meta or {}).get(name)
            if meta is not None:
                with open(os.path.join(snap_dir, name, TABLE_META), "w") as f:
                    json.dump(meta, f)
        meta = {
            "id": str(uuid.uuid4()),
            "name": snapshot.lower(),
            "repository": repo.name,
            "tables": sorted(tables),
            "started": started,
            "finished": datetime.now(timezone.utc).isoformat(),
            "version": "1",
            "state": "SUCCESS",
        }
        with open(os.path.join(snap_dir, SNAP_META), "w") as f:
            json.dump(meta, f, indent=2)
        return meta

    def list_snapshots(self, repo_name: str | None = None) -> list[dict]:
        out = []
        repos = (
            [self._repo(repo_name)] if repo_name else list(self.repositories.values())
        )
        for repo in repos:
            if repo.type != "fs" or not os.path.isdir(repo.location):
                continue
            for entry in sorted(os.listdir(repo.location)):
                meta_path = os.path.join(repo.location, entry, SNAP_META)
                if os.path.isfile(meta_path):
                    with open(meta_path) as f:
                        out.append(json.load(f))
        return out

    def get_snapshot(self, repo_name: str, snapshot: str) -> tuple[Repository, dict]:
        repo = self._repo(repo_name)
        meta_path = os.path.join(self._snap_dir(repo, snapshot), SNAP_META)
        if not os.path.isfile(meta_path):
            raise SnapshotError(f"Snapshot '{repo_name}.{snapshot}' does not exist")
        with open(meta_path) as f:
            return repo, json.load(f)

    def drop_snapshot(self, repo_name: str, snapshot: str) -> None:
        repo, _meta = self.get_snapshot(repo_name, snapshot)
        shutil.rmtree(self._snap_dir(repo, snapshot))

    def restore_tables(
        self, repo_name: str, snapshot: str, only: list[str] | None = None
    ) -> list[tuple[str, str, dict | None]]:
        """Resolve restore sources: [(table, parquet_dir, meta|None)].

        The caller (CrateSession) turns each into a registered table;
        the read itself is a normal distributed parquet scan.
        """
        repo, meta = self.get_snapshot(repo_name, snapshot)
        names = meta["tables"] if only is None else only
        out = []
        for name in names:
            src = os.path.join(self._snap_dir(repo, snapshot), name)
            if not os.path.isdir(src):
                raise SnapshotError(
                    f"Table '{name}' is not in snapshot '{repo_name}.{snapshot}'"
                )
            tmeta = None
            tmeta_path = os.path.join(src, TABLE_META)
            if os.path.isfile(tmeta_path):
                with open(tmeta_path) as f:
                    tmeta = json.load(f)
            out.append((name, src, tmeta))
        return out

    # -- sys rows --------------------------------------------------------
    def sys_repositories_rows(self) -> list[tuple]:
        # settings render with every value as its text form, like the
        # reference's flat setting strings ({"compress": "true", ...})
        return [
            (r.name, r.type, json.dumps(
                {k: (str(v).lower() if isinstance(v, bool) else str(v))
                 for k, v in r.settings.items()},
                sort_keys=True,
            ))
            for r in sorted(self.repositories.values(), key=lambda x: x.name)
        ]

    def sys_snapshots_rows(self) -> list[tuple]:
        """SysSnapshotsTableInfo shape; concrete_indices is the
        reference's per-index (≈ per-table) name list
        (admin/snapshots.rst sys.snapshots example)."""
        return [
            (
                m["id"],
                m["name"],
                m["repository"],
                m["tables"],
                [f"doc.{t}" for t in m["tables"]],
                m["started"],
                m["finished"],
                m["version"],
                m["state"],
            )
            for m in self.list_snapshots()
        ]
