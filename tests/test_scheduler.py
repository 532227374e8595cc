"""Recrawl scheduling (operators/scheduler.py): brute-force estimator
equivalence, edge cases, and plan shape (single shuffle)."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.scheduler import recrawl_priority


def _brute(history, current_round):
    byk = {}
    for k, r, fp in history:
        byk.setdefault(k, []).append((r, fp))
    out = {}
    for k, rows in byk.items():
        rows.sort()
        obs = len(rows)
        changes = sum(
            1 for (_, a), (_, b) in zip(rows, rows[1:]) if a != b
        )
        rate = round(changes / max(obs - 1, 1), 6)
        stale = current_round - rows[-1][0]
        out[k] = (obs, changes, rate, stale, round(rate * stale, 6))
    return out


HIST = [
    # url A: flips every observation
    ("a", 0, "x"), ("a", 2, "y"), ("a", 4, "x"), ("a", 6, "y"),
    # url B: never changes, observed late
    ("b", 1, "s"), ("b", 7, "s"),
    # url C: single observation
    ("c", 3, "q"),
    # url D: one flip among four observations, stale since round 3
    ("d", 0, "m"), ("d", 1, "m"), ("d", 2, "n"), ("d", 3, "n"),
]


def test_recrawl_priority_matches_bruteforce(spark):
    df = spark.createDataFrame(HIST, "key string, round long, fingerprint string")
    got = {
        r.key: (r.obs, r.changes, r.change_rate, r.staleness, r.priority)
        for r in recrawl_priority(df.repartition(5), current_round=10).collect()
    }
    assert got == _brute(HIST, 10)
    # semantic spot checks: always-changing beats never-changing
    assert got["a"][4] > got["b"][4] == 0.0
    # single observation -> zero estimated rate, zero priority
    assert got["c"] == (1, 0, 0.0, 7, 0.0)
    assert got["d"][2] == round(1 / 3, 6)


def test_recrawl_priority_unordered_input(spark):
    df = spark.createDataFrame(list(reversed(HIST)), "key string, round long, fingerprint string")
    got = {r.key: r.priority for r in recrawl_priority(df, current_round=10).collect()}
    assert got == {k: v[4] for k, v in _brute(HIST, 10).items()}


def test_recrawl_priority_single_shuffle(spark):
    df = spark.createDataFrame(HIST, "key string, round long, fingerprint string")
    plan = recrawl_priority(df, current_round=10)._jdf.queryExecution().executedPlan().toString()
    # the LAG window and the groupBy reuse one hash partitioning on key
    assert plan.count("Exchange hashpartitioning") == 1


def test_recrawl_priority_rejects_negative_round(spark):
    df = spark.createDataFrame(HIST, "key string, round long, fingerprint string")
    with pytest.raises(ValueError):
        recrawl_priority(df, current_round=-1)


def test_recrawl_priority_custom_columns(spark):
    df = spark.createDataFrame(
        [("u", 0, "f1"), ("u", 1, "f2")], "u string, r long, fp string"
    )
    got = recrawl_priority(
        df, current_round=2, key="u", round_col="r", fingerprint="fp"
    ).collect()
    assert len(got) == 1 and got[0].changes == 1 and got[0].priority == 1.0
