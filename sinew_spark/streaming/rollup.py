"""Structured Streaming rollup over the crawl's snapshot tables.

The reference's only "streaming" is the per-row CSV flush + the blocking
rate limiter (/root/reference/lib/sinew/csv.rb:45-46, lib/sinew/base.rb:
224-226). The engine's streaming story (SURVEY.md §2.6) is Structured
Streaming with ``Trigger.AvailableNow``: each invocation drains exactly the
files committed since the last checkpoint, so crawl-round metrics roll up
incrementally and the job is resumable/idempotent by construction.

Scale notes: the file stream source lists only NEW files per batch (state in
the checkpoint's file log, O(delta) per round); the windowed aggregation is
a streaming partial-agg with watermark-bounded state, so state size is
O(active hosts x open windows), independent of total crawl size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fetched-table columns the rollup needs (schema pruned at the source: the
# stream reads 4 columns, not the body-laden full row)
_ROLLUP_INPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("n_attempts", T.IntegerType()),
        T.StructField("fetched_at", T.DoubleType()),
    ]
)


def read_fetched_stream(spark: SparkSession, fetched_table_path: str) -> DataFrame:
    """Stream the `fetched` SnapshotTable's data files. Each crawl-round
    commit adds one immutable directory under ``data/``; the glob makes the
    file source discover them as they appear."""
    return (
        spark.readStream.schema(_ROLLUP_INPUT)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(fetched_table_path, "data", "*"))
    )


def host_window_rollup(fetched_stream: DataFrame, window: str = "1 minute",
                       watermark: str = "5 minutes") -> DataFrame:
    """Per-host, per-time-window fetch metrics with late-data handling.

    Watermark bounds streaming state: windows older than max(event_time) -
    watermark are finalized and evicted. Counts are map-side partial aggs
    (streaming partial + state-store merge), one shuffle on (host, window).
    """
    ts = F.timestamp_seconds(F.col("fetched_at"))
    return (
        fetched_stream.withColumn("event_time", ts)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum((F.col("status") >= 400).cast("long")).alias("errors"),
            F.sum("n_attempts").alias("attempts"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "fetches",
            "errors",
            "attempts",
        )
    )


def run_rollup_available_now(
    spark: SparkSession,
    fetched_table_path: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> None:
    """One incremental rollup pass: drain all files not yet in the
    checkpoint, append finalized windows to ``out_dir``, stop. Calling this
    after every crawl round gives exactly-once metrics rollup across
    restarts (the checkpoint IS the resume point)."""
    stream = read_fetched_stream(spark, fetched_table_path)
    rolled = host_window_rollup(stream, window=window, watermark=watermark)
    q = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
