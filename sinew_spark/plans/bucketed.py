"""Bucketed table layout: co-located joins with zero runtime shuffle.

At the 10^10-row design point the expensive stages are the repeated
wide joins against big, stable tables (the seen set, the documents
corpus, a link graph). Spark's native bucketing pre-shuffles ONCE at
write time: a table written with ``bucketBy(N, keys)`` stores rows
hash-partitioned into N bucket files (optionally sorted within each),
and Catalyst then plans joins/aggregations between tables bucketed the
same way with NO Exchange — and with ``sortBy`` no Sort either, a
straight zipped SortMergeJoin over pre-sorted bucket files. The shuffle
is paid once per write instead of once per query.

This is the declared scale path for repeated co-keyed joins the LSM
shard stores don't cover (ad-hoc analytics over the committed corpus,
fact-fact joins); the crawl round loop itself uses the shard stores
(operators/bloom.py, plans/snapshots.py), which subsume bucketing for
the seen probe.

Bucketed tables must be saved through a catalog (``saveAsTable`` — the
bucket metadata lives there, plain ``parquet(path)`` loses it), but
``path=...`` keeps the data external, so the in-memory/derby catalog
carries only metadata. Readers everywhere: ``spark.table(name)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: Optional[str] = None,
    sort: bool = True,
    mode: str = "overwrite",
    one_file_per_bucket: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and by default sorted) parquet table.

    ``keys`` are the future join/group keys; ``n_buckets`` should match
    on every table you intend to co-join (unequal counts fall back to a
    shuffle on one side). ``path`` makes the table external (data at
    ``path``, only metadata in the catalog).

    ``one_file_per_bucket`` repartitions by the bucket hash before the
    write (``repartition(n_buckets, keys)`` — the same Murmur3
    HashPartitioning bucketing uses), so every bucket lands in exactly
    one file. Together with
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
    default since Spark 3.0; safe exactly when buckets are single-file)
    that lets Catalyst also elide the runtime Sort on a sorted bucketed
    scan — a bare SortMergeJoin over pre-sorted files. With several
    files per bucket only the Exchange is removed; each side still
    re-sorts. Disable it when one bucket's rows exceed a comfortable
    task (then keep the sort).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    keys = list(keys)
    if one_file_per_bucket:
        df = df.repartition(n_buckets, *[df[k] for k in keys])
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``;
    reading the parquet path directly would discard the layout and
    reintroduce the shuffle)."""
    return spark.table(table)
