"""host_fairness: integer-exact concentration metrics."""



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


def test_extreme_concentration_no_overflow(spark):
    # The single-host-capture shape that overflowed the old
    # decimal-column path (sumsq * scale > decimal(38,0)) must yield
    # exact metrics via the driver-side int math. Counts are planted
    # by exploding pre-sized arrays, not row-per-fetch.
    counts = {"big": 100_000, "a": 3, "b": 1}
    rows = [(h, c) for h, c in counts.items()]
    df = spark.createDataFrame(rows, ["host", "n"]).select(
        "host", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("x")
    )
    got = host_fairness(df).collect()[0].asDict()
    assert got == _ref(counts)
    assert got["max_share_x"] >= 999_000  # capture detected, not NULL
