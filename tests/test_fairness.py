"""host_fairness: integer-exact concentration metrics."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.fairness import host_fairness, two_phase_rank


def _ref(counts, scale=1_000_000):
    """Straight-line replay of the documented metric definitions."""
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    tot = sum(v for _, v in xs)
    rankdot = sum((i + 1) * v for i, (_, v) in enumerate(xs))
    sumsq = sum(v * v for _, v in xs)
    return {
        "n_hosts": n,
        "total_fetches": tot,
        "max_share_x": max(v for _, v in xs) * scale // tot,
        "hhi_x": sumsq * scale // (tot * tot),
        "gini_x": (2 * rankdot - (n + 1) * tot) * scale // (n * tot),
    }


def _run(spark, rows):
    df = spark.createDataFrame([(h,) for h in rows], ["host"])
    return host_fairness(df).collect()[0].asDict()


def test_uniform_allocation(spark):
    rows = [f"h{i}" for i in range(10) for _ in range(5)]
    got = _run(spark, rows)
    counts = {f"h{i}": 5 for i in range(10)}
    assert got == _ref(counts)
    assert got["gini_x"] == 0
    assert got["hhi_x"] == 100_000  # 1/10 scaled


def test_single_host_capture(spark):
    got = _run(spark, ["solo"] * 7)
    assert got["max_share_x"] == 1_000_000
    assert got["hhi_x"] == 1_000_000
    assert got["gini_x"] == 0  # one host: no inequality among hosts


def test_skewed_matches_reference_formula(spark):
    counts = {"a": 1, "b": 2, "c": 3, "d": 94, "e": 10, "f": 1}
    rows = [h for h, c in counts.items() for _ in range(c)]
    assert _run(spark, rows) == _ref(counts)


def test_empty_input(spark):
    df = spark.createDataFrame([], "host string")
    row = host_fairness(df).collect()[0].asDict()
    assert row["n_hosts"] == 0 and row["total_fetches"] == 0
    assert row["max_share_x"] is None
    assert row["gini_x"] is None


def test_partitioning_invariance(spark):
    rows = [f"h{i % 13}" for i in range(200)]
    df = spark.createDataFrame([(h,) for h in rows], ["host"])
    a = host_fairness(df.repartition(1)).collect()[0].asDict()
    b = host_fairness(df.repartition(11), partitions=3).collect()[0].asDict()
    assert a == b


def test_two_phase_rank_is_dense_global_rank(spark):
    import random

    rng = random.Random(7)
    vals = [(f"k{i}", rng.randrange(100)) for i in range(500)]
    df = spark.createDataFrame(vals, ["host", "cnt"])
    got = {
        r["host"]: r["rank"]
        for r in two_phase_rank(df, ["cnt", "host"], partitions=7).collect()
    }
    expect = {
        h: i + 1
        for i, (h, _) in enumerate(sorted(vals, key=lambda kv: (kv[1], kv[0])))
    }
    assert got == expect


def test_floor_division_exactness_near_boundary(spark):
    # 3 hosts with counts that make gini a near-integer rational:
    # regression guard for decimal HALF_UP rounding vs true floor.
    counts = {"a": 1, "b": 1, "c": 999_998}
    rows = [(h, c) for h, c in counts.items()]
    df = spark.createDataFrame(rows, ["host", "n"]).select(
        "host", F.explode(F.array_repeat(F.lit(1), 1)).alias("x")
    )
    # Too big to materialize row-per-fetch; feed pre-aggregated counts
    # through the rank+metric tail by calling the internals directly.
    from sinew_spark.operators.fairness import _floor_div_exact

    probe = spark.range(1).select(
        _floor_div_exact(
            F.lit(Decimal(10) ** 20 - 1).cast("decimal(38,0)"),
            F.lit(Decimal(10) ** 10).cast("decimal(38,0)"),
        ).alias("q")
    )
    assert probe.collect()[0]["q"] == (10**20 - 1) // 10**10
