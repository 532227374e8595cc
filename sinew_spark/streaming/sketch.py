"""Streaming cardinality: incremental HyperLogLog over crawl commits.

The frontier's distinct-URL count is the number every dashboard and
scheduler wants continuously, and HLL registers are the ideal
streaming state: the aggregate is a bounded 2^p-cell MAX (state size
independent of crawl size), the merge is idempotent and commutative
(late/replayed files can only re-max), and the result is
deterministic — the same register table whether computed in one batch
or across any sequence of incremental passes. That batch==streaming
equivalence is test-gated and lets the SQL oracle check a STREAMING
query value-exactly (streaming_rollup's windowed state is checked
rows-only; registers have no such limitation).

Mechanics mirror streaming/rollup.py: an ``availableNow`` pass drains
exactly the snapshot-table files not yet in the checkpoint, folds them
into the register state (streaming partial MAX -> state store), and
``foreachBatch`` overwrites the tiny register-table parquet (complete
output of at most 2^p rows)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from sinew_spark.operators.sketch import hll_registers

# seen-table columns the sketch needs (source-level schema pruning)
_INPUT = T.StructType([T.StructField("url", T.StringType())])


def run_hll_available_now(
    spark: SparkSession,
    table_path: str,
    out_dir: str,
    checkpoint_dir: str,
    col: str = "url",
    p: int = 8,
) -> None:
    """One incremental sketch pass: drain the snapshot table's new data
    files, merge them into the checkpointed register state, overwrite
    ``out_dir`` with the current 2^p-row register table. Idempotent and
    resumable: rerunning with no new files rewrites the same registers;
    a crash between passes resumes from the checkpoint's file log."""
    from pyspark.sql import functions as F

    # part-*.parquet matches exactly the Spark-written data files; the
    # glob must EXCLUDE equality-delete files (delete-*.parquet, written
    # by SnapshotTable.delete_keys with a key-only schema — read through
    # the url schema they'd surface as null rows and skew hll_estimate's
    # linear-counting branch). Compaction-rewritten dirs are still read
    # alongside the originals — wasted IO but value-exact under max-merge.
    stream = (
        spark.readStream.schema(_INPUT)
        .option("pathGlobFilter", "part-*.parquet")
        .parquet(os.path.join(table_path, "data", "*"))
    )
    regs = hll_registers(stream.where(F.col(col).isNotNull()), col, p=p)

    def sink(batch_df, _batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        regs.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
