"""Deterministic synthetic data generators for benchmarks.

Seed crawls at parameterized scale: N URLs over H hosts with a hot-host
skew (one host owns `hot_frac` of all URLs — the adversarial case for
per-host politeness) and a duplicate fraction (exercises the dedup path).
Everything is a pure function of (i, seed): generation is distributed
(spark.range -> expressions), no driver-side lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gen_frontier_seeds(
    spark: SparkSession,
    n: int,
    n_hosts: int = 1000,
    hot_frac: float = 0.2,
    dup_frac: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Distributed seed generator: url, method, body, priority, depth, seq,
    attempt. Deterministic; hot host = host0; dups reference earlier seqs."""
    df = spark.range(n).withColumnRenamed("id", "seq")
    h = F.xxhash64(F.col("seq"), F.lit(seed))
    # dup_frac of rows duplicate the URL of seq % (n * (1-dup_frac))
    base_n = int(n * (1 - dup_frac))
    eff = F.when(
        (F.pmod(h, 100) < int(dup_frac * 100)) & (F.col("seq") >= base_n),
        F.pmod(F.col("seq"), F.lit(max(base_n, 1))),
    ).otherwise(F.col("seq"))
    hh = F.pmod(F.xxhash64(eff, F.lit(seed + 1)), 100)
    host_id = F.when(hh < int(hot_frac * 100), F.lit(0)).otherwise(
        F.pmod(F.xxhash64(eff, F.lit(seed + 2)), F.lit(n_hosts - 1)) + 1
    )
    url = F.concat(
        F.lit("http://host"),
        host_id.cast("string"),
        F.lit(".test/p/"),
        eff.cast("string"),
    )
    return df.select(
        url.alias("url"),
        F.lit("GET").alias("method"),
        F.lit("").alias("body"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.col("seq").cast("long").alias("seq"),
        F.lit(0).alias("attempt"),
    )
