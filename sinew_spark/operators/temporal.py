"""Temporal joins Spark lacks natively: as-of join and interval join.

Neither exists in the reference (/root/reference is a single-node
scraper); they are engine relational-surface additions (SURVEY.md §2.6)
in the same spirit as operators/skew.py — joins a 100 TB crawl/event
pipeline needs (latest host state as of a fetch, events within
politeness/maintenance windows) expressed so the plan survives scale:

- ``asof_join`` is the union+window formulation: tag both inputs, union,
  and carry the last (or first) non-null right value over a window
  partitioned by the join key. ONE shuffle by the key, a per-key sort,
  no range/inequality join and no per-left-row probe — the classic
  distributed as-of shape (Spark has no ASOF JOIN; a naive
  ``left.join(right, right.ts <= left.ts)`` is a BroadcastNestedLoop or
  cartesian blow-up).
- ``interval_join`` buckets time: each interval is replicated to every
  fixed-width bucket it overlaps (``explode(sequence(...))``), points
  join their single bucket with a plain equi-join, and the exact
  containment predicate filters after. Replication factor is
  ``len/bucket_width + 1`` per interval — pick ``bucket_width`` near the
  typical interval length so it stays O(1). Each (point, interval) pair
  meets in exactly one bucket (the point's), so no dedup pass is needed.

Both are DuckDB-replayable (ASOF JOIN / BETWEEN join) so their
``queries()`` entries carry full value-hash oracles.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    value_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[float] = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with the
    largest ``ts_col`` <= left's (direction="backward", inclusive — the
    DuckDB/pandas ``merge_asof`` convention) or smallest >= left's
    ("forward"), within the same ``by`` key.

    Returns every left row + ``{ts_col}{suffix}`` (the matched right
    timestamp, null when nothing matches) + each of ``value_cols``
    (renamed ``{col}{suffix}`` on name clash with a left column).
    ``tolerance`` (in the units of ``ts_col`` cast to double — seconds
    for timestamps) nulls out matches farther than that from the left
    timestamp. ``value_cols`` defaults to every right column except the
    key and timestamp.

    ``by`` is required: the window partitions on it, so the only wide
    stage is one hash shuffle by key (a key-less global as-of would need
    a single-partition sort — range-partition the timestamp yourself and
    pass the range id as ``by`` if you truly need it). Right rows should
    be unique per (by, ts): among exact (key, timestamp) ties the kept
    row is tie-broken arbitrarily — pre-aggregate the right side.
    Skewed keys cost a bigger per-key sort, not a blow-up: rows per task
    stay O(rows-with-that-key), never O(left x right).
    """
    if by is None:
        raise ValueError("asof_join requires a `by` key (see docstring)")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(keys) | {ts_col}]
    out_names = {c: (c + suffix if c in lcols else c) for c in value_cols}
    matched_ts = ts_col + suffix

    from pyspark.sql import types as T

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    lrow_t = F.struct(*[F.col(c) for c in lcols])
    # the right row travels as ONE struct so the window pick below is
    # atomic: the matched timestamp and every value column come from the
    # SAME right row, even when that row has nulls in some value columns
    # (per-column last(ignorenulls) would backfill those from older rows,
    # diverging from pandas merge_asof / DuckDB ASOF JOIN row semantics)
    rrow_type = T.StructType(
        [T.StructField("_rts", rtypes[ts_col])]
        + [T.StructField("_v_" + c, rtypes[c]) for c in value_cols]
    )
    l_u = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        lrow_t.alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
        F.lit(1).alias("_side"),
    )
    r_u = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast(l_u.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(
            F.col(ts_col).alias("_rts"),
            *[F.col(c).alias("_v_" + c) for c in value_cols],
        ).alias("_rrow"),
        F.lit(0).alias("_side"),
    )
    u = l_u.unionByName(r_u)

    if direction == "backward":
        # right rows (side 0) sort before left at equal ts => inclusive
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)
    else:
        # left rows first at equal ts so the frame [current, following]
        # still contains the equal-ts right row => inclusive
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", F.desc("_side"))
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)

    matched = u.withColumn("_m", pick("_rrow")).where(F.col("_side") == 1)

    ok = F.col("_m._rts").isNotNull()  # also excludes degenerate null-ts right rows
    if tolerance is not None:
        gap = F.col("_ts").cast("double") - F.col("_m._rts").cast("double")
        if direction == "forward":
            gap = -gap
        ok = ok & (gap <= F.lit(float(tolerance)))
    return matched.select(
        *[F.col("_lrow." + c).alias(c) for c in lcols],
        F.when(ok, F.col("_m._rts")).alias(matched_ts),
        *[F.when(ok, F.col("_m._v_" + c)).alias(out_names[c]) for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Union[str, Sequence[str], None] = None,
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner join of points to every interval containing them:
    ``start <= ts <= end`` (inclusive both ends — SQL BETWEEN), optionally
    also matching on ``by`` key(s).

    Timestamps are compared after a cast to double (epoch seconds for
    timestamps; native units for numerics), and ``bucket_width`` is in
    those units. Intervals with ``end < start`` are dropped (``sequence``
    would otherwise step backward). Output = all point columns + all
    interval columns (names must not collide — rename beforehand).

    Scale shape: intervals explode to one row per overlapping bucket
    (``len/bucket_width + 1`` each), points compute one bucket, and the
    join is a plain equi-join on (by, bucket) that Catalyst/AQE plans as
    broadcast or shuffled hash — never BroadcastNestedLoopJoin, which is
    what a raw inequality join degenerates to. A pair meets in exactly
    one bucket, so there is no post-join dedup.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"column name collision: {sorted(clash)}")
    bw = float(bucket_width)
    if bw <= 0:
        raise ValueError("bucket_width must be positive")

    p = points.withColumn(
        "_bkt", F.floor(F.col(ts_col).cast("double") / F.lit(bw)).cast("bigint")
    )
    i = (
        intervals.where(F.col(end_col).cast("double") >= F.col(start_col).cast("double"))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col).cast("double") / F.lit(bw)).cast("bigint"),
                    F.floor(F.col(end_col).cast("double") / F.lit(bw)).cast("bigint"),
                )
            ),
        )
    )
    on = keys + ["_bkt"]
    return (
        p.join(i, on=on)
        .where(
            F.col(ts_col).cast("double").between(
                F.col(start_col).cast("double"), F.col(end_col).cast("double")
            )
        )
        .drop("_bkt")
    )
