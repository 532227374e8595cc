"""Streaming WARC archival — crawl output flows into the archive as it
commits.

The batch sink (sinks/warc.py write_warc) archives a finished DataFrame;
at crawl scale the natural producer is the `fetched` SnapshotTable, which
grows by one immutable directory per round. This module streams those
files (same AvailableNow file-source discipline as streaming/rollup.py —
the checkpoint's file log remembers what was archived, O(delta) per
invocation) and lands each micro-batch as its own WARC epoch directory:

    out_dir/epoch=NNN/part-*.warc.gz  + the CDX index rows appended to
    out_dir/_cdx (parquet)

Exactly-once: foreachBatch gives at-least-once per epoch on retry, but an
epoch directory is rewritten whole (same input files -> same bytes, the
write is deterministic) and the CDX append is keyed by epoch, so a replay
overwrites rather than duplicates — idempotent by construction, matching
the snapshot tables' resume story (BASELINE.json north_rule:
"resumable from checkpoint").

Scale: each epoch archives only the new files (file-source delta); the
write itself is the shuffle-free per-partition member writer. Nothing
accumulates driver-side; CDX lives as parquet for the same
file-parallel scan+point-read path as the batch index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ARCHIVE_INPUT = T.StructType(
    [
        T.StructField("canonical_url", T.StringType()),
        T.StructField("resp_body", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("fetched_at", T.DoubleType()),
    ]
)


def read_fetched_pages_stream(spark: SparkSession, fetched_table_path: str) -> DataFrame:
    """Stream the fetched table's page columns (pruned: 5 columns, never
    spans/links)."""
    return (
        spark.readStream.schema(_ARCHIVE_INPUT)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(fetched_table_path, "data", "*"))
    )


def stream_warc_archive(
    pages: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partitions: int = 4,
):
    """Run an AvailableNow streaming query that archives every new fetched
    page as WARC. Returns the StreamingQuery (call .awaitTermination()).

    Each micro-batch lands in ``out_dir/epoch=N`` with a canonical layout
    (repartition by url + sort within partitions — deterministic bytes for
    a given batch), and its CDX index rows append to ``out_dir/_cdx`` as
    parquet with the epoch recorded, so a point read is: filter _cdx,
    read_warc_record(out_dir/epoch=N, filename, offset, length)."""
    from sinew_spark.sinks.warc import write_warc

    os.makedirs(out_dir, exist_ok=True)

    def archive_batch(batch: DataFrame, epoch: int) -> None:
        src = (
            batch.where(F.col("resp_body").isNotNull())
            .select(
                F.col("canonical_url").alias("url"),
                F.col("resp_body").alias("body"),
                F.date_format(
                    F.timestamp_seconds(F.col("fetched_at")),
                    "yyyy-MM-dd'T'HH:mm:ss'Z'",
                ).alias("date"),
                "status",
                "content_type",
            )
            .repartition(partitions, "url")
            .sortWithinPartitions("url")
        )
        epoch_dir = os.path.join(out_dir, f"epoch={epoch}")
        idx = write_warc(src, epoch_dir)
        (
            idx.withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")  # replayed epoch overwrites, not dups
            .parquet(os.path.join(out_dir, "_cdx", f"epoch={epoch}"))
        )

    return (
        pages.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(archive_batch)
        .start()
    )


def read_stream_cdx(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated CDX index across all archived epochs."""
    return spark.read.option("basePath", os.path.join(out_dir, "_cdx")).parquet(
        os.path.join(out_dir, "_cdx", "epoch=*")
    )
