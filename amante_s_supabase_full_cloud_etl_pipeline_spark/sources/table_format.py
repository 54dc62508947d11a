"""Minimal snapshot-isolated table format (Delta/Iceberg-style commit
protocol over plain parquet — no table-format libraries in this
container, so the engine carries its own).

Why ``parquet_merge_write``'s directory swap is not enough at scale:
a reader that planned against the target directory can lose files
mid-query when the swap replaces them. Real lakehouse formats fix
this with IMMUTABLE data files + a versioned metadata pointer; this
module implements exactly that core:

Layout::

    table/
      data/<uuid>/part-*.parquet   -- immutable once committed
      _manifests/v00000001.json    -- {version, data_dirs, batch_id}
      _latest                      -- current version (atomic os.replace)

Commit protocol (optimistic concurrency):

1. write new data directory(ies) — invisible until referenced;
2. create ``_manifests/v{N+1}.json`` with O_EXCL — two racing
   writers cannot both win the same version (CommitConflict for the
   loser, who retries against the new snapshot);
3. atomically repoint ``_latest`` (``os.replace``).

A crash at any step leaves ``_latest`` on the previous manifest —
readers never observe a partial commit. Readers resolve the file
list ONCE at plan time from an immutable manifest, so a concurrent
commit (even a full-rewrite MERGE) cannot pull files out from under
a running query; old versions stay readable (time travel) until
``vacuum``.

Streaming exactly-once: ``foreachBatch`` is at-least-once, so
``merge``/``append`` accept a ``batch_id`` that is recorded in the
manifest; re-committing the same batch_id is a no-op, making the
sink idempotent per micro-batch.

At 100 TB the only piece to swap is the pointer store: local-FS
rename → a CAS on an object-store/catalog entry (S3 conditional put,
Hive/Glue lock). Data-file immutability, manifest versioning, and
optimistic concurrency carry over unchanged. A production MERGE
would also rewrite only the files whose key ranges intersect the
batch (file-level pruning via manifest min/max stats) instead of the
full table; the commit semantics are identical.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import dedup_latest, merge_upsert
from .sinks import prepare_for_load


class CommitConflict(Exception):
    """Another writer committed this version first — reload the
    snapshot and retry."""


def _local(path: str) -> str:
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return path[len(prefix) :]
    return path


class ParquetTable:
    """A snapshot-isolated parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = _local(path)
        self._manifests = os.path.join(self.path, "_manifests")
        self._latest = os.path.join(self.path, "_latest")
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        os.makedirs(self._manifests, exist_ok=True)

    # -- snapshot resolution ------------------------------------------------

    def current_version(self) -> int:
        """0 = empty table (no commit yet)."""
        try:
            with open(self._latest) as f:
                return int(f.read().strip().lstrip("v"))
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"v{version:08d}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "data_dirs": [], "batch_id": None}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def read(self, version: int | None = None) -> DataFrame:
        """Plan against an immutable snapshot (time travel via
        ``version``). The file list is pinned at plan time."""
        m = self.manifest(version)
        if not m["data_dirs"]:
            raise ValueError(f"table {self.path} is empty at version {m['version']}")
        return self.spark.read.parquet(*[os.path.join(self.path, d) for d in m["data_dirs"]])

    # -- commit protocol ----------------------------------------------------

    def _write_data_dir(self, df: DataFrame) -> str:
        rel = os.path.join("data", uuid.uuid4().hex)
        df.write.parquet(os.path.join(self.path, rel))
        return rel

    def _commit(self, data_dirs: list[str], batch_id: int | None, parent: int) -> int:
        version = parent + 1
        manifest = {"version": version, "parent": parent, "data_dirs": data_dirs,
                    "batch_id": batch_id}
        target = self._manifest_path(version)
        try:
            # O_EXCL: exactly one writer wins version N+1
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} of {self.path} already committed"
            ) from exc
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        # atomic pointer swap — readers see old or new, never partial
        tmp = f"{self._latest}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(f"v{version}")
        os.replace(tmp, self._latest)
        return version

    def _already_applied(self, batch_id: int | None, parent: int) -> bool:
        return (
            batch_id is not None
            and parent > 0
            and self.manifest(parent)["batch_id"] == batch_id
        )

    def append(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Add rows as a new immutable data dir (no rewrite)."""
        parent = self.current_version()
        if self._already_applied(batch_id, parent):
            return parent
        rel = self._write_data_dir(prepare_for_load(df))
        return self._commit(self.manifest(parent)["data_dirs"] + [rel], batch_id, parent)

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        order_by: Sequence[str],
        batch_id: int | None = None,
    ) -> int:
        """Keyed MERGE (upsert): anti-join + union against the pinned
        snapshot, rewritten into a fresh data dir. The snapshot's own
        files are never touched — concurrent readers keep their
        version; a crash mid-rewrite leaves the table on the parent
        manifest."""
        parent = self.current_version()
        if self._already_applied(batch_id, parent):
            return parent
        batch = dedup_latest(prepare_for_load(batch), keys, order_by)
        if parent == 0:
            merged = batch
        else:
            merged = merge_upsert(self.read(parent), batch, keys)
        rel = self._write_data_dir(merged)
        return self._commit([rel], batch_id, parent)

    def merge_writer(self, keys: Sequence[str], order_by: Sequence[str]):
        """``foreachBatch`` handler: exactly-once keyed MERGE per
        micro-batch (idempotent under replay via batch_id)."""

        def handle(batch: DataFrame, batch_id: int) -> None:
            self.merge(batch, keys, order_by, batch_id=batch_id)

        return handle

    # -- maintenance --------------------------------------------------------

    def _live_files(self, version: int) -> list[str]:
        """Absolute paths of the parquet files referenced by a
        manifest (local-FS walk; at 100 TB the manifest itself carries
        per-file size/min/max stats and no listing happens)."""
        out = []
        for d in self.manifest(version)["data_dirs"]:
            root = os.path.join(self.path, d)
            for name in sorted(os.listdir(root)):
                if name.startswith("part-") and name.endswith(".parquet"):
                    out.append(os.path.join(root, name))
        return out

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: Sequence[str] | None = None,
        min_files: int = 2,
    ) -> int:
        """Rewrite the live file set into ~``target_file_bytes`` files
        as a NEW snapshot — same rows, better layout. This is the
        maintenance op every streaming sink needs: per-micro-batch
        appends accumulate thousands of small files, and at 100 TB an
        uncompacted table pays per-file open cost and loses column-
        chunk compression on every scan.

        - Row-identical by construction (a pure repartition of the
          pinned snapshot), so it commits with no ``batch_id``.
        - ``sort_by`` additionally range-sorts files on those columns
          (repartitionByRange + sortWithinPartitions), so parquet
          min/max footers become selective — readers with predicates
          on the sort key skip whole files (poor man's Z-order, same
          lever as Delta OPTIMIZE ZORDER BY for one key family).
        - Without ``sort_by`` the rewrite uses ``coalesce`` — no
          shuffle, just fewer, larger files.
        - Concurrency: the commit targets ``parent+1``; a racing
          append/merge wins or loses atomically (CommitConflict — the
          compaction retries against the new snapshot; data is never
          at risk because losers write nothing visible).
        - Old small files stay readable for time travel until
          ``vacuum`` — compaction never deletes.

        Returns the committed version (``parent`` unchanged when the
        table is already compact)."""
        parent = self.current_version()
        files = self._live_files(parent)
        if len(files) < min_files:
            return parent
        total = sum(os.path.getsize(f) for f in files)
        n = max(1, -(-total // target_file_bytes))  # ceil
        if n >= len(files) and sort_by is None:
            return parent  # already at-or-below target granularity
        df = self.read(parent)
        if sort_by:
            cols = list(sort_by)
            df = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
        else:
            df = df.coalesce(n)
        rel = self._write_data_dir(df)
        return self._commit([rel], None, parent)

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data dirs unreferenced by the newest ``keep_versions``
        manifests (bounds time travel; run well behind active readers
        — same contract as Delta VACUUM). Returns removed dirs."""
        latest = self.current_version()
        keep = range(max(1, latest - keep_versions + 1), latest + 1)
        referenced = {d for v in keep for d in self.manifest(v)["data_dirs"]}
        removed = []
        data_root = os.path.join(self.path, "data")
        for name in os.listdir(data_root):
            rel = os.path.join("data", name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
                removed.append(rel)
        return removed
