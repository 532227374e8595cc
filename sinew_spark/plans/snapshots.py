"""SnapshotTable — Iceberg-style snapshot-versioned parquet tables.

The reference persists every response to an append-only disk cache whose
contents ARE the crawl's durable state (/root/reference/lib/sinew/base.rb:
217-222, README.md:114-118). The engine's durable state lives in
snapshot-versioned tables: every commit produces a new immutable snapshot
(manifest listing data files), giving

- atomic per-round commits (the resumability points),
- time travel (read any snapshot id — used by resume + replay tests),
- row-level delete via copy-on-write rewrite (sinew's `uncache`),
- lineage: each snapshot records the operation + round that produced it.

This is the Iceberg table model implemented over plain parquet + a JSON
manifest, because the sandbox has no Iceberg runtime jars. The API is
format-agnostic; on a real cluster, swap `SnapshotTable` for Iceberg DDL
(`CREATE TABLE ... USING iceberg`) — the Crawler only calls
append/overwrite/read/current_snapshot.

Commit protocol: write data files to a new immutable directory, then
atomically swap the manifest (write temp + rename). Single-writer (the
crawl driver), matching Iceberg's optimistic single-committer fast path.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # --- manifest ------------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def current_snapshot(self) -> int | None:
        return self._read_manifest()["current"]

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    # --- writes ---------------------------------------------------------------

    def _write_data(self, df: DataFrame) -> str:
        d = os.path.join(self.path, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(d)
        return d

    def _new_snapshot(self, dirs: list[str], op: str, meta: dict | None) -> None:
        m = self._read_manifest()
        # max over history, not current: after a rollback, current < max id
        sid = max((s["id"] for s in m["snapshots"]), default=0) + 1
        m["snapshots"].append(
            {
                "id": sid,
                "dirs": dirs,
                "op": op,
                "ts": time.time(),
                "meta": meta or {},
            }
        )
        m["current"] = sid
        self._commit(m)

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        """Append rows as a new snapshot (atomic)."""
        d = self._write_data(df.select([f.name for f in self.schema.fields]))
        cur = self._dirs()
        self._new_snapshot(cur + [d], "append", meta)
        return self.current_snapshot()

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        d = self._write_data(df.select([f.name for f in self.schema.fields]))
        self._new_snapshot([d], "overwrite", meta)
        return self.current_snapshot()

    def delete_where(self, condition, meta: dict | None = None) -> int:
        """Row-level delete via copy-on-write rewrite (sinew's uncache,
        /root/reference/lib/sinew/base.rb:101-105)."""
        kept = self.read().where(~condition)
        return self.overwrite(kept, {**(meta or {}), "delete": True})

    # --- reads ----------------------------------------------------------------

    def _dirs(self, snapshot_id: int | None = None) -> list[str]:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return []
        for s in m["snapshots"]:
            if s["id"] == sid:
                return s["dirs"]
        raise KeyError(f"snapshot {sid} not found in {self.path}")

    def read_delta(self, snapshot_id: int) -> DataFrame:
        """Read only the files ADDED by the given snapshot (incremental read
        — Iceberg's incremental scan). O(delta), not O(table)."""
        m = self._read_manifest()
        target = prev = None
        for s in m["snapshots"]:
            if s["id"] == snapshot_id:
                target = s
                break
            prev = s
        if target is None:
            raise KeyError(f"snapshot {snapshot_id} not found in {self.path}")
        prev_dirs = set(prev["dirs"]) if prev and target["op"] == "append" else set()
        new_dirs = [d for d in target["dirs"] if d not in prev_dirs]
        if not new_dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*new_dirs)

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Read the table at a snapshot (default: current). Parquet scans get
        full Catalyst pushdown/pruning."""
        dirs = self._dirs(snapshot_id)
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*dirs)

    def rollback_to(self, snapshot_id: int) -> None:
        """Point current at an older snapshot (resume-from-checkpoint)."""
        m = self._read_manifest()
        if not any(s["id"] == snapshot_id for s in m["snapshots"]):
            raise KeyError(f"snapshot {snapshot_id} not found")
        m["current"] = snapshot_id
        self._commit(m)

    def compact(self) -> int:
        """Rewrite all live data as one snapshot (maintenance)."""
        return self.overwrite(self.read(), {"compaction": True})

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
