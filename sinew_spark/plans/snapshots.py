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


def _arrow_type(dt: T.DataType):
    import pyarrow as pa

    return {
        "int": pa.int32(),
        "bigint": pa.int64(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
    }[dt.simpleString()]


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

    @staticmethod
    def _file_stats(dirs: list[str]) -> list[dict]:
        """Per-partition lineage: one entry per data file (= one write task)
        with row count (parquet footer, no data read) and bytes — the
        Iceberg manifest-file model (north rule: per-partition lineage)."""
        import pyarrow.parquet as pq

        out = []
        for d in dirs:
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(d, name)
                out.append(
                    {
                        "file": full,
                        "rows": pq.ParquetFile(full).metadata.num_rows,
                        "bytes": os.path.getsize(full),
                    }
                )
        return out

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
        self._new_snapshot(cur + [d], "append", {**(meta or {}), "files": self._file_stats([d])})
        return self.current_snapshot()

    def append_rows(self, rows: list[tuple], meta: dict | None = None) -> int:
        """Driver-side append for small tables (metrics, lineage): writes
        one parquet file via pyarrow directly — no Spark job, no task
        scheduling. Readable by read()/read_delta() like any snapshot."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(self.path, "data", uuid.uuid4().hex)
        os.makedirs(d, exist_ok=True)
        names = [f.name for f in self.schema.fields]
        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in self.schema.fields]
        )
        cols = {n: [r[i] for r in rows] for i, n in enumerate(names)}
        pq.write_table(pa.table(cols, schema=arrow_schema), os.path.join(d, "part-0.parquet"))
        cur = self._dirs()
        self._new_snapshot(cur + [d], "append", {**(meta or {}), "files": self._file_stats([d])})
        return self.current_snapshot()

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        d = self._write_data(df.select([f.name for f in self.schema.fields]))
        self._new_snapshot([d], "overwrite", {**(meta or {}), "files": self._file_stats([d])})
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

    def approx_rows(self, snapshot_id: int | None = None) -> int:
        """Row count of a snapshot from manifest file stats — no Spark job,
        no file reads. Used for plan selection (e.g. seen-filter strategy:
        broadcast anti-join while small, shard probe at scale)."""
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return 0
        dir_rows: dict[str, int] = {}
        for s in m["snapshots"]:
            for f in s["meta"].get("files", []):
                d = os.path.dirname(f["file"])
                dir_rows[d] = dir_rows.get(d, 0) + f["rows"]
        dirs = self._dirs(sid)
        if not all(d in dir_rows for d in dirs):  # stats missing: count once
            return self.read(sid).count()
        return sum(dir_rows[d] for d in dirs)

    def read_delta(self, snapshot_id: int, target_partitions: int | None = None) -> DataFrame:
        """Read only the files ADDED by the given snapshot (incremental read
        — Iceberg's incremental scan). O(delta), not O(table).

        target_partitions: size the scan's file splits so the delta fans out
        into ~this many partitions (see _tune_splits). Use when the next
        stage is CPU-heavy per row (parse UDF): the default 128 MB splits
        would coalesce a small compressed delta into 1-2 partitions and
        serialize the work regardless of cluster size."""
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
        if target_partitions:
            self._tune_splits(target["meta"].get("files") or self._file_stats(new_dirs), target_partitions)
        return self.spark.read.schema(self.schema).parquet(*new_dirs)

    def _tune_splits(self, files: list[dict], target_partitions: int) -> None:
        """Set spark.sql.files.maxPartitionBytes so `files` split into about
        target_partitions scan partitions. The session conf is read at scan
        *planning* (first action on the DataFrame), so setting it just
        before building the read is effective; the crawler is the session's
        single driver, so the narrowed window is safe. On a 1000-executor
        cluster the same math holds — splits track delta size / cores, never
        the 128 MB default that under-parallelizes compressed crawl deltas."""
        total = sum(f["bytes"] for f in files)
        if not total:
            return
        size = max(1 << 20, min(128 << 20, total // target_partitions + 1))
        self.spark.conf.set("spark.sql.files.maxPartitionBytes", str(size))
        # small files would otherwise still coalesce via openCostInBytes padding
        self.spark.conf.set("spark.sql.files.openCostInBytes", str(min(4 << 20, size // 4)))

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
