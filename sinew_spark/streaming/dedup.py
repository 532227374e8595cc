"""Streaming dedup: first-occurrence-only emission with bounded state.

The batch frontier enforces exactly-once with the seen-key shard store
(operators/bloom.py); an unbounded streaming ingest (a live crawl feed,
a document firehose) needs the same guarantee without accumulating
state forever. ``dropDuplicatesWithinWatermark`` keeps exactly one row
per key among arrivals within the watermark horizon, and the state
store evicts keys older than the watermark — state is O(keys per
horizon), independent of total stream length, which is what makes it
10^10-safe where a plain ``dropDuplicates`` (state = every key ever)
is not. The trade: a duplicate arriving later than the watermark
re-emits; size the watermark to the source's real out-of-orderness
(for crawl feeds, the politeness-window bound).

Plan shape: one shuffle on the key into the state store, partial
dedup map-side first. Checkpointed ``Trigger.AvailableNow`` runs drain
exactly the new files per invocation and resume idempotently —
the same incremental contract as streaming/rollup.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per ``key_cols`` within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_dedup_available_now(
    spark: SparkSession,
    src_path: str,
    schema,
    key_cols: Sequence[str],
    out_path: str,
    checkpoint: str,
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> None:
    """Drain all currently-committed files through the dedup once
    (AvailableNow), writing survivors to ``out_path``; re-invocations
    resume from the checkpoint and process only new files."""
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(src_path)
    )
    q = (
        dedup_stream(stream, key_cols, ts_col=ts_col, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
