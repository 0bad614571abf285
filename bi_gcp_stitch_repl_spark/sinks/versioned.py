"""VersionedTable: a Delta-style commit-log table on plain parquet.

``ParquetTable`` (merge.py) commits by atomic directory swap — correct,
but every commit rewrites the whole table, and there is no history. This
class adds the lakehouse layer on top of the same parquet files:

* a ``_log/`` directory of numbered JSON commits, each a list of
  add/remove file actions; the **exclusive create** of the next-numbered
  log file is the commit point (O_EXCL — atomic on POSIX, the same
  single-writer-wins primitive Delta uses via object-store
  put-if-absent);
* **O(1) append**: new part files + an add-only commit — no rewrite of
  existing data, unlike ParquetTable.append's directory-level model;
* **snapshot isolation + time travel**: a reader resolves the file list
  at a version and is immune to concurrent commits; ``read(version=N)``
  reproduces any historical state until vacuumed;
* **optimistic concurrency**: two writers racing for version N — one
  wins, the loser sees EEXIST, re-reads the log and retries on top of
  N (or aborts for non-commutative ops).

On an object store the exclusive-create becomes the store's
put-if-absent / a commit service; the log format is unchanged. File
paths in the log are relative, so the table directory is relocatable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_log"


class CommitConflict(Exception):
    """Another writer committed the version this transaction targeted."""


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_path = os.path.join(path, _LOG_DIR)

    # -- log primitives ------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_path):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_path)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _commit(self, version: int, actions: list[dict]) -> None:
        """Atomically publish ``actions`` as ``version``; raise
        CommitConflict if that version already exists (lost the race)."""
        os.makedirs(self.log_path, exist_ok=True)
        entry = {"version": version, "ts": time.time(), "actions": actions}
        target = os.path.join(self.log_path, f"{version:012d}.json")
        try:
            with open(target, "x") as f:  # O_EXCL: the commit point
                json.dump(entry, f)
        except FileExistsError as e:
            raise CommitConflict(version) from e
        self.spark.catalog.refreshByPath(self.path)

    def files_at(self, version: int | None = None) -> list[str]:
        """Relative part-file paths live at ``version`` (default: latest)."""
        live: set[str] = set()
        for v in self._versions():
            if version is not None and v > version:
                break
            with open(os.path.join(self.log_path, f"{v:012d}.json")) as f:
                for action in json.load(f)["actions"]:
                    if "add" in action:
                        live.add(action["add"])
                    elif "remove" in action:
                        live.discard(action["remove"])
        return sorted(live)

    # -- data movement -------------------------------------------------------

    def _write_parts(self, df: DataFrame) -> list[str]:
        """Materialize ``df`` as uniquely-named part files inside the table
        dir (written to a scratch dir, then hard-renamed in — renames are
        metadata-only). Returns the relative file names."""
        scratch = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(scratch)
        names = []
        for fname in os.listdir(scratch):
            if not fname.endswith(".parquet"):
                continue
            new = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(scratch, fname), os.path.join(self.path, new))
            names.append(new)
        shutil.rmtree(scratch, ignore_errors=True)
        return names

    def read(self, version: int | None = None) -> DataFrame:
        files = self.files_at(version)
        if not files:
            raise FileNotFoundError(f"no committed data in {self.path}")
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def exists(self) -> bool:
        return self.latest_version() is not None

    # -- transactions --------------------------------------------------------

    def _next_version(self) -> int:
        latest = self.latest_version()
        return 0 if latest is None else latest + 1

    def append(self, df: DataFrame, max_retries: int = 5) -> int:
        """O(1) append: new files + an add-only commit. Appends commute, so
        a lost race is resolved by re-committing the same adds at the next
        version."""
        os.makedirs(self.path, exist_ok=True)
        adds = [{"add": f} for f in self._write_parts(df)]
        for _ in range(max_retries):
            try:
                v = self._next_version()
                self._commit(v, adds)
                return v
            except CommitConflict:
                continue
        raise CommitConflict("append retries exhausted")

    def overwrite(self, df: DataFrame) -> int:
        """Truncate-refresh as one commit: add the new files, remove every
        file of the snapshot this transaction read. NOT auto-retried: the
        remove set was decided against that snapshot, so a conflict must
        re-read (read-modify-write is not commutative)."""
        os.makedirs(self.path, exist_ok=True)
        base = self.latest_version()
        removes = [{"remove": f} for f in (self.files_at(base) if base is not None else [])]
        adds = [{"add": f} for f in self._write_parts(df)]
        self._commit(self._next_version(), adds + removes)
        return self._versions()[-1]

    def merge_upsert(self, batch: DataFrame, keys: list[str]) -> int:
        """K1 upsert with snapshot semantics: survivors of the anti-join
        (against the version this transaction read) plus the batch, as one
        add+remove commit. Readers at older versions still see their
        snapshot; time travel preserves the pre-merge state."""
        if not self.exists():
            return self.overwrite(batch)
        base = self.latest_version()
        existing = self.read(base)
        survivors = existing.join(
            F.broadcast(batch.select(*keys).distinct()), on=keys, how="left_anti"
        )
        merged = survivors.unionByName(batch)
        removes = [{"remove": f} for f in self.files_at(base)]
        adds = [{"add": f} for f in self._write_parts(merged)]
        self._commit(self._next_version(), adds + removes)
        return self._versions()[-1]

    # -- maintenance ---------------------------------------------------------

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Delete part files unreferenced by the ``retain_versions`` most
        recent snapshots (older time travel stops working — the trade every
        lakehouse vacuum makes). Returns the deleted file names."""
        vs = self._versions()
        if not vs:
            return []
        keep: set[str] = set()
        for v in vs[-retain_versions:]:
            keep.update(self.files_at(v))
        deleted = []
        for fname in os.listdir(self.path):
            if fname.endswith(".parquet") and fname not in keep:
                os.remove(os.path.join(self.path, fname))
                deleted.append(fname)
        return sorted(deleted)
