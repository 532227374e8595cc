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


def _brute_opic(edges, iters, scale):
    from collections import Counter

    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(verts)
    deg = Counter(s for s, _ in edges)
    cash = {v: scale // n for v in verts}
    hist = {v: 0 for v in verts}
    pot = 0
    for _ in range(iters):
        share = pot // n
        cur = {v: cash[v] + share for v in verts}
        inc = {v: 0 for v in verts}
        for s, d in edges:
            inc[d] += cur[s] // deg[s]
        pot = sum(cur[v] for v in verts if deg.get(v, 0) == 0)
        nxt = {}
        for v in verts:
            r = cur[v] - deg[v] * (cur[v] // deg[v]) if deg.get(v, 0) else 0
            nxt[v] = inc[v] + r
            hist[v] += cur[v]
        cash = nxt
    return {v: (cash[v], hist[v], cash[v] + hist[v]) for v in verts}


OPIC_EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (3, 1),
    # 4 is dangling; 5 appears only as a source into the dangling node
    (5, 4),
]


def test_opic_matches_bruteforce(spark):
    from sinew_spark.operators.scheduler import opic

    df = spark.createDataFrame(OPIC_EDGES, "src long, dst long")
    got = {
        r.v: (r.cash, r.history, r.importance)
        for r in opic(df, iters=4).collect()
    }
    assert got == _brute_opic(OPIC_EDGES, 4, 10**12)
    # mass accounting: conserved up to the documented DIV losses
    total = sum(c for c, _h, _i in got.values())
    assert 0 < total <= 10**12


def test_opic_bit_identical_across_partitionings(spark):
    from sinew_spark.operators.scheduler import opic

    df1 = spark.createDataFrame(OPIC_EDGES, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(OPIC_EDGES, "src long, dst long").repartition(7, "dst")
    a = sorted(map(tuple, opic(df1, iters=3).collect()))
    b = sorted(map(tuple, opic(df7, iters=3).collect()))
    assert a == b


def test_opic_rejects_bad_iters(spark):
    from sinew_spark.operators.scheduler import opic

    df = spark.createDataFrame(OPIC_EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        opic(df, iters=0)


def test_allocate_host_budget_exact_conservation(spark):
    import random

    from sinew_spark.operators.scheduler import allocate_host_budget

    random.seed(7)
    rows = [(f"h{i:03d}", random.randrange(0, 50)) for i in range(200)]
    hv = spark.createDataFrame(rows, "host string, value long")
    for budget in (0, 1, 17, 999, 12345):
        out = allocate_host_budget(hv, budget, buckets=8)
        got = {r.host: r.alloc for r in out.collect()}
        assert sum(got.values()) == budget, budget
        # matches a single-threaded Hamilton reference exactly
        t = sum(v for _, v in rows)
        base = {h: v * budget // t for h, v in rows}
        rem = {h: (v * budget) % t for h, v in rows}
        leftover = budget - sum(base.values())
        order = sorted(rows, key=lambda hv_: (-rem[hv_[0]], hv_[0]))
        expect = dict(base)
        for h, _ in order[:leftover]:
            expect[h] += 1
        assert got == expect, budget


def test_allocate_host_budget_zero_value_host_gets_nothing(spark):
    from sinew_spark.operators.scheduler import allocate_host_budget

    hv = spark.createDataFrame(
        [("a", 3), ("b", 0), ("c", 4)], "host string, value long"
    )
    got = {r.host: r.alloc for r in allocate_host_budget(hv, 10).collect()}
    assert got["b"] == 0 and sum(got.values()) == 10


def test_allocate_host_budget_all_zero_uniform(spark):
    from sinew_spark.operators.scheduler import allocate_host_budget

    hv = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "host string, value long"
    )
    got = {r.host: r.alloc for r in allocate_host_budget(hv, 7).collect()}
    # 7 = 3*2 + 1 crumb; crumb goes to lexicographically first host
    assert got == {"a": 3, "b": 2, "c": 2}


def test_allocate_host_budget_partitioning_invariant(spark):
    import random

    from sinew_spark.operators.scheduler import allocate_host_budget

    random.seed(13)
    rows = [(f"x{i}", random.randrange(0, 1000)) for i in range(300)]
    hv = spark.createDataFrame(rows, "host string, value long")
    a = sorted(
        tuple(r) for r in allocate_host_budget(hv.repartition(1), 5000, buckets=4).collect()
    )
    b = sorted(
        tuple(r) for r in allocate_host_budget(hv.repartition(17), 5000, buckets=64).collect()
    )
    assert a == b


def test_allocate_host_budget_validation(spark):
    import pytest as _pytest

    from sinew_spark.operators.scheduler import allocate_host_budget

    hv = spark.createDataFrame([("a", -1)], "host string, value long")
    with _pytest.raises(ValueError):
        allocate_host_budget(hv, 5)
    hv2 = spark.createDataFrame([("a", 1)], "host string, value long")
    with _pytest.raises(ValueError):
        allocate_host_budget(hv2, -1)


def test_adaptive_host_delay_hand_computed(spark):
    from sinew_spark.operators.scheduler import adaptive_host_delay

    log = spark.createDataFrame(
        [
            # slow healthy host: avg 1500 -> 2x -> 3000ms
            ("slow", 1000, 200), ("slow", 2000, 200),
            # fast healthy host: avg 10 -> 20ms -> floor 250
            ("fast", 10, 200), ("fast", 10, 304),
            # throttled host: avg 100 -> 200 -> err 50% >= 10% -> x4 -> 800
            ("throttled", 100, 200), ("throttled", 100, 429),
            # erroring host: huge latency -> cap 30000
            ("dying", 60000, 503),
        ],
        ["host", "latency_ms", "status"],
    )
    out = {r.host: r for r in adaptive_host_delay(log).collect()}
    assert out["slow"].delay_ms == 3000 and out["slow"].err_x1000 == 0
    assert out["fast"].delay_ms == 250
    assert out["throttled"].delay_ms == 800 and out["throttled"].err_x1000 == 500
    assert out["dying"].delay_ms == 30000
    assert out["slow"].avg_latency_ms == 1500


def test_adaptive_host_delay_robots_floor_and_validation(spark):
    import pytest as _pytest

    from sinew_spark.operators.scheduler import adaptive_host_delay

    log = spark.createDataFrame(
        [("h", 10, 200, 5), ("h", 10, 200, None)],
        "host string, latency_ms int, status int, crawl_delay_s int",
    )
    out = adaptive_host_delay(log, robots_delay_col="crawl_delay_s").collect()
    # robots Crawl-delay 5s outranks both the latency rule and min_delay
    assert out[0].delay_ms == 5000
    with _pytest.raises(ValueError):
        adaptive_host_delay(log, min_delay_ms=10, max_delay_ms=5)
    with _pytest.raises(ValueError):
        adaptive_host_delay(log, backoff_x1000=500)


def test_adaptive_host_delay_robots_floor_fractional_and_above_max(spark):
    """Fractional Crawl-delay survives (0.5s -> 500ms, not truncated to
    0), and a robots ask LONGER than max_delay_ms is honored — the max
    clamp bounds the engine's own backoff, never a robots mandate."""
    from sinew_spark.operators.scheduler import adaptive_host_delay

    log = spark.createDataFrame(
        [("frac", 10, 200, 0.5), ("mandate", 10, 200, 60.0)],
        "host string, latency_ms int, status int, crawl_delay_s double",
    )
    out = {r.host: r.delay_ms for r in adaptive_host_delay(
        log, robots_delay_col="crawl_delay_s", max_delay_ms=30_000
    ).collect()}
    assert out["frac"] == 500
    assert out["mandate"] == 60_000
