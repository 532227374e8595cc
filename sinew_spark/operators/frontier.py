"""Frontier relational core — dedup, politeness caps, priority, robots.

The declarative (Catalyst-optimized) half of the crawl engine. Everything
here is stock DataFrame ops — anti-joins, windows, broadcast joins — so
predicate pushdown, AQE skew handling, and broadcast selection are free.

Semantics from the reference:
- exactly-once fetch: each (method, canonical url, body) identity fetched
  once ever, errors included (/root/reference/README.md:114-116)
- TTL expiry: entries older than `expires` are re-fetched
  (test_base.rb:13-20); force / force_errors bypass the seen check
  (base.rb:38-39, test_main.rb:28-36)
- per-host politeness caps + priority ordering generalize the reference's
  single-threaded program-order fetch (main.rb:24) to a distributed,
  replayable total order (priority, seq)
- robots.txt gating is NEW (the reference explicitly lacks it,
  README.md:199; required by the north rule)
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from sinew_spark.functions.urls import host_expr, path_expr, request_key_expr

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("host", T.StringType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("fetched_at", T.DoubleType()),
        T.StructField("hop_of", T.StringType()),
        T.StructField("round", T.IntegerType()),
    ]
)


def prepare_frontier(df: DataFrame, canonicalize_udf) -> DataFrame:
    """Canonicalize + derive identity key and host. Input needs url, method,
    body, priority, depth, seq, attempt."""
    out = df.withColumn("canonical_url", canonicalize_udf(F.col("url")))
    out = out.withColumn(
        "key", request_key_expr(F.col("method"), F.col("canonical_url"), F.col("body"))
    ).withColumn("host", host_expr(F.col("canonical_url")))
    return out.select([f.name for f in FRONTIER_SCHEMA.fields])


def dedup_within_round(frontier: DataFrame) -> DataFrame:
    """Keep the first (lowest seq) row per identity key within a round —
    deterministic, unlike dropDuplicates."""
    return (
        frontier.groupBy("key")
        .agg(F.min_by(F.struct(*[f.name for f in FRONTIER_SCHEMA.fields]), F.col("seq")).alias("r"))
        .select("r.*")
    )


def bloom_prefilter(frontier: DataFrame, bloom_bytes, spark) -> DataFrame:
    """Probabilistic pre-reject of already-seen keys BEFORE the anti-join
    shuffle. No false negatives: a key the bloom rejects is definitely seen.
    Keys that pass still go through the exact anti-join (false positives are
    only wasted join rows). Vectorized numpy probe inside a pandas UDF."""
    if bloom_bytes is None:
        return frontier
    b = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(T.BooleanType())
    def maybe_new(keys: pd.Series) -> pd.Series:
        from sinew_spark.operators.bloom import BloomShards

        bloom = BloomShards.from_bytes(b.value)
        return pd.Series(~bloom.might_contain(keys.to_numpy()))

    return frontier.where(maybe_new(F.col("key")))


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame,
    expires: float | None = None,
    force: bool = False,
    force_errors: bool = False,
    now: float | None = None,
) -> DataFrame:
    """Exact exactly-once filter: left-anti join on identity key against the
    live portion of the seen set.

    - expires: seen entries older than `expires` seconds don't block a
      refetch (TTL as miss, test_base.rb:13-20)
    - force: all seen entries ignored (test_main.rb:28-36)
    - force_errors: seen entries with status>=400 ignored (base.rb:39)
    """
    if force:
        return frontier
    live = seen
    if expires is not None:
        now = time.time() if now is None else now
        live = live.where(F.col("fetched_at") >= F.lit(now - expires))
    if force_errors:
        live = live.where(F.col("status") < 400)
    return frontier.join(live.select("key"), "key", "left_anti")


def per_host_cap(frontier: DataFrame, cap: int) -> DataFrame:
    """Politeness/skew guard: at most `cap` URLs per host per round, chosen
    by (priority, seq). A host with 20% of the frontier gets the same
    per-round budget as any other — the rest waits, keeping fetch-task skew
    bounded at cap rows."""
    w = F.row_number().over(Window.partitionBy("host").orderBy("priority", "seq"))
    return frontier.withColumn("_rn", w).where(F.col("_rn") <= cap).drop("_rn")


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop frontier rows whose path falls under a disallowed prefix for the
    host. `robots` is (host, disallow_prefix) — tiny, so broadcast; the probe
    is a prefix match, no shuffle on the frontier side.

    The reference does NOT implement robots (README.md:199) — this is the
    north-rule addition."""
    r = F.broadcast(robots.select(F.col("host").alias("r_host"), F.col("disallow_prefix")))
    joined = frontier.join(
        r,
        (F.col("host") == F.col("r_host"))
        & path_expr(F.col("canonical_url")).startswith(F.col("disallow_prefix")),
        "left_outer",
    )
    return joined.where(F.col("r_host").isNull()).drop("r_host", "disallow_prefix")


def take_round_budget(frontier: DataFrame, budget: int | None) -> DataFrame:
    """Global round budget by (priority, seq). At scale this is a top-k, not
    a full sort: Spark's TakeOrderedAndProject handles limit+orderBy without
    a total shuffle sort."""
    if budget is None:
        return frontier
    return frontier.orderBy("priority", "seq").limit(budget)
