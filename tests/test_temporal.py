"""As-of and interval joins (operators/temporal.py): brute-force
equivalence, tolerance/direction semantics, and plan shape (one key
shuffle, never a nested-loop/cartesian join)."""

import random

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.temporal import asof_join, interval_join


def _brute_asof(points, quotes, direction="backward", tolerance=None):
    """points: [(key, ts, pid)], quotes: [(key, ts, val)] -> pid -> (mts, val)"""
    out = {}
    for k, t, pid in points:
        cands = [
            (qt, v)
            for qk, qt, v in quotes
            if qk == k and (qt <= t if direction == "backward" else qt >= t)
        ]
        if not cands:
            out[pid] = (None, None)
            continue
        mt, mv = (max if direction == "backward" else min)(cands, key=lambda c: c[0])
        if tolerance is not None and abs(mt - t) > tolerance:
            out[pid] = (None, None)
        else:
            out[pid] = (mt, mv)
    return out


def _mk(spark, seed=7, n_points=400, n_quotes=150, n_keys=12):
    rng = random.Random(seed)
    # unique (key, ts) per quote side — the documented contract
    qset = {(rng.randrange(n_keys), rng.randrange(0, 5000)) for _ in range(n_quotes)}
    quotes = [(k, t, float(k * 10_000 + t)) for k, t in sorted(qset)]
    points = [
        (rng.randrange(n_keys), rng.randrange(0, 5000), pid) for pid in range(n_points)
    ]
    pdf = spark.createDataFrame(points, "key long, ts long, pid long").repartition(8)
    qdf = spark.createDataFrame(quotes, "key long, ts long, val double").repartition(5)
    return points, quotes, pdf, qdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [11, 13, 97])
def test_asof_join_matches_brute_force(spark, direction, seed):
    points, quotes, pdf, qdf = _mk(spark, seed=seed)
    got = {
        r.pid: (r.ts_asof, r.val)
        for r in asof_join(pdf, qdf, ts_col="ts", by="key", direction=direction).collect()
    }
    want = _brute_asof(points, quotes, direction)
    assert got == want
    assert len(got) == len(points)  # every left row survives (left join)


def test_asof_join_composite_key(spark):
    pdf = spark.createDataFrame(
        [(1, "a", 10, 0), (1, "b", 10, 1), (2, "a", 10, 2)],
        "k1 long, k2 string, ts long, pid long",
    )
    qdf = spark.createDataFrame(
        [(1, "a", 5, 1.0), (1, "b", 7, 2.0), (2, "b", 1, 3.0)],
        "k1 long, k2 string, ts long, val double",
    )
    got = {
        r.pid: r.val
        for r in asof_join(pdf, qdf, ts_col="ts", by=["k1", "k2"]).collect()
    }
    assert got == {0: 1.0, 1: 2.0, 2: None}  # (2,'a') never matches (2,'b')


def test_asof_join_tolerance_and_equal_ts_inclusive(spark):
    pdf = spark.createDataFrame(
        [(1, 100, 0), (1, 150, 1), (1, 1000, 2), (2, 50, 3)],
        "key long, ts long, pid long",
    )
    qdf = spark.createDataFrame(
        [(1, 100, 1.0), (1, 140, 2.0)], "key long, ts long, val double"
    )
    got = {
        r.pid: (r.ts_asof, r.val)
        for r in asof_join(pdf, qdf, ts_col="ts", by="key", tolerance=60).collect()
    }
    assert got[0] == (100, 1.0)  # equal timestamp matches (inclusive)
    assert got[1] == (140, 2.0)
    assert got[2] == (None, None)  # 860 > tolerance
    assert got[3] == (None, None)  # no quote for key 2


def test_asof_join_value_rename_on_clash_and_key_required(spark):
    pdf = spark.createDataFrame([(1, 10, 9.0)], "key long, ts long, val double")
    qdf = spark.createDataFrame([(1, 5, 1.5)], "key long, ts long, val double")
    out = asof_join(pdf, qdf, ts_col="ts", by="key")
    assert set(out.columns) == {"key", "ts", "val", "ts_asof", "val_asof"}
    r = out.collect()[0]
    assert (r.val, r.val_asof) == (9.0, 1.5)
    with pytest.raises(ValueError):
        asof_join(pdf, qdf, ts_col="ts")


def test_asof_join_plan_one_key_shuffle_no_nested_loop(spark):
    _, _, pdf, qdf = _mk(spark)
    plan = (
        asof_join(pdf, qdf, ts_col="ts", by="key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("hashpartitioning(key") == 1  # union shuffles once, by key


def test_interval_join_matches_brute_force(spark):
    rng = random.Random(3)
    pts = [(rng.randrange(0, 10_000), pid) for pid in range(500)]
    ivs = [
        (s := rng.randrange(0, 10_000), s + rng.randrange(0, 900), iid)
        for iid in range(60)
    ]
    pdf = spark.createDataFrame(pts, "ts long, pid long").repartition(8)
    idf = spark.createDataFrame(ivs, "start long, end long, iid long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, ts_col="ts", bucket_width=300).collect()
    }
    want = {(pid, iid) for t, pid in pts for s, e, iid in ivs if s <= t <= e}
    assert got == want
    # bucket width must not change the answer
    got2 = {
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, ts_col="ts", bucket_width=7.0).collect()
    }
    assert got2 == want


def test_interval_join_negative_timestamps(spark):
    """floor() bucketing must stay consistent for negative domains (e.g.
    offsets relative to an epoch midpoint)."""
    pts = [(t, i) for i, t in enumerate(range(-50, 50, 3))]
    ivs = [(-30, -10, 0), (-5, 20, 1), (-100, 100, 2)]
    pdf = spark.createDataFrame(pts, "ts long, pid long")
    idf = spark.createDataFrame(ivs, "start long, end long, iid long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, ts_col="ts", bucket_width=7).collect()
    }
    want = {(pid, iid) for t, pid in pts for s, e, iid in ivs if s <= t <= e}
    assert got == want


def test_interval_join_by_key_and_guards(spark):
    pdf = spark.createDataFrame(
        [(1, 5, 0), (2, 5, 1)], "key long, ts long, pid long"
    )
    idf = spark.createDataFrame(
        [(1, 0, 10, 100), (1, 9, 3, 101)], "key long, start long, end long, iid long"
    )
    rows = interval_join(
        pdf, idf, ts_col="ts", by="key", bucket_width=4
    ).collect()
    assert [(r.pid, r.iid) for r in rows] == [(0, 100)]  # key match; inverted interval dropped
    with pytest.raises(ValueError):
        interval_join(pdf.withColumnRenamed("pid", "iid"), idf, by="key")
    with pytest.raises(ValueError):
        interval_join(pdf, idf, by="key", bucket_width=0)


def test_interval_join_plan_is_equi_join(spark):
    pdf = spark.range(1000).select(F.col("id").alias("ts"), F.col("id").alias("pid"))
    idf = spark.range(50).select(
        (F.col("id") * 20).alias("start"),
        (F.col("id") * 20 + 30).alias("end"),
        F.col("id").alias("iid"),
    )
    plan = (
        interval_join(pdf, idf, ts_col="ts", bucket_width=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled hash — an equi-join
