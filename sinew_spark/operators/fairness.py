"""Crawl allocation fairness: concentration metrics over per-host load.

A polite frontier is supposed to SPREAD fetches; the failure mode at
10^10-URL scale is silent concentration — one mega-host (or one
misbehaving recipe) absorbing the crawl budget while the long tail
starves.  The politeness machinery bounds the per-round *rate*
(operators/frontier.py per-host caps), but nothing reports the
realized *allocation*.  This module computes the standard
concentration measures over the fetch ledger:

  - max_share   — largest single host's fraction of all fetches;
  - HHI         — Herfindahl–Hirschman index, sum of squared shares
                  (1/n for a perfectly even crawl, 1.0 for a
                  single-host capture);
  - Gini        — rank-weighted inequality, 0 = even, ->1 = captured;
                  G = (2*sum(rank_i * x_i) - (n+1)*sum(x)) / (n*sum(x))
                  with hosts ranked ascending by (count, host).

All three are emitted as *_x integers scaled by 1e6 (this engine's
integer-exactness doctrine: float math is not bit-stable across
engines, scaled-integer floor division is).  Aggregate intermediates
run in decimal(38,0) — sum(rank*x) and sum(x^2) overflow int64 around
10^9 hosts x 10^9 fetches but fit 38 digits — and the final floor
divisions happen on the DRIVER in arbitrary-precision Python ints
over the 1-row aggregate (see host_fairness for why a decimal-column
division path cannot be made exact at this envelope).

Scale shape: one groupBy(host) count (the only shuffle proportional
to the ledger), then ranking over the (much smaller) host-count table
via range repartition + per-partition row_number + broadcast partition
offsets — the classic two-phase rank, no global single-partition
window.  Final metrics are a 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,0)"


def two_phase_rank(
    counts: DataFrame,
    order_cols: list,
    partitions: int = 256,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense global row_number over ``order_cols`` without a global
    single-partition window: range-repartition on the order key,
    rank within partitions, then broadcast per-partition row totals
    as base offsets (the per-partition total table has at most
    ``partitions`` rows)."""
    t = counts.repartitionByRange(partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    within = Window.partitionBy("_pid").orderBy(*order_cols)
    t = t.withColumn("_r", F.row_number().over(within))
    sizes = t.groupBy("_pid").agg(F.count("*").alias("_n"))
    base_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = sizes.select(
        "_pid", F.coalesce(F.sum("_n").over(base_w), F.lit(0)).alias("_base")
    )
    return (
        t.join(F.broadcast(bases), "_pid")
        .withColumn(rank_col, (F.col("_base") + F.col("_r")).cast("long"))
        .drop("_pid", "_r", "_base")
    )


def host_fairness(
    fetches: DataFrame,
    host_col: str = "host",
    scale: int = 1_000_000,
    partitions: int = 256,
) -> DataFrame:
    """Concentration report over the fetch ledger: ONE row
    (n_hosts, total_fetches, max_share_x, hhi_x, gini_x), the *_x
    metrics floor-scaled by ``scale`` (default 1e6).

    The distributed work (the ledger groupBy, the two-phase rank, the
    decimal(38,0) sums — sumsq <= tot^2 <= 1e36 and rankdot <= n*tot
    both fit) stays in the plan; the FINAL ratios are computed on the
    driver in arbitrary-precision Python ints from the 1-row
    aggregate.  Doing them in decimal columns looked exact but was
    not at the module's own envelope: ``sumsq * scale`` needs ~44
    digits (> decimal(38,0), overflows to NULL exactly in the
    single-host-capture case the metric exists to flag), and the
    +-1 floor-correction products overflow past tot ~ 3e15, silently
    re-enabling HALF_UP drift.  One driver row of Python int math has
    no such cliff.

    Empty input returns zero counts with NULL metrics (no meaningful
    shares over zero fetches).
    """
    counts = fetches.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("cnt")
    )
    ranked = two_phase_rank(counts, ["cnt", "host"], partitions=partitions)
    d = lambda c: c.cast(_DEC)  # noqa: E731
    row = ranked.agg(
        F.count("*").alias("n_hosts"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total_fetches"),
        F.max("cnt").cast(_DEC).alias("_max"),
        F.sum(d(F.col("cnt")) * d(F.col("cnt"))).alias("_sumsq"),
        F.sum(d(F.col("rank")) * d(F.col("cnt"))).alias("_rankdot"),
    ).first()
    n, tot = int(row["n_hosts"]), int(row["total_fetches"])
    if tot > 0:
        mx, sumsq, rankdot = (
            int(row["_max"]),
            int(row["_sumsq"]),
            int(row["_rankdot"]),
        )
        metrics = (
            mx * scale // tot,
            sumsq * scale // (tot * tot),
            (2 * rankdot - (n + 1) * tot) * scale // (n * tot),
        )
    else:
        metrics = (None, None, None)
    spark = fetches.sparkSession
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_hosts", T.LongType(), False),
            T.StructField("total_fetches", T.LongType(), False),
            T.StructField("max_share_x", T.LongType(), True),
            T.StructField("hhi_x", T.LongType(), True),
            T.StructField("gini_x", T.LongType(), True),
        ]
    )
    return spark.createDataFrame([(n, tot, *metrics)], schema)
