"""Neighborhood function: HLL ball propagation vs straight-line BFS."""

import hashlib

import pytest

from sinew_spark.operators.anf import neighborhood_function

P = 5
W_BITS = 60 - P
R_MAX = W_BITS + 1


def _h60(s):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _rho(v):
    w = _h60(v) & ((1 << W_BITS) - 1)
    return W_BITS + 1 if w == 0 else W_BITS - w.bit_length() + 1


def _reg(v):
    return _h60(v) >> W_BITS


def _ref(edges, rounds):
    """Exact BFS balls -> register table -> (nonzero, denom)."""
    adj = {}
    verts = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        verts.update((a, b))
    out = {}
    for v in verts:
        ball = {v}
        for d in range(1, rounds + 1):
            ball = ball | {w for u in ball for w in adj.get(u, ())}
            regs = {}
            for u in ball:
                r = _reg(u)
                regs[r] = max(regs.get(r, 0), _rho(u))
            denom = sum(
                1 << (R_MAX - regs.get(r, 0)) for r in range(1 << P)
            )
            out[(v, d)] = (len(regs), denom)
    return out


def _run(spark, edges, rounds):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = neighborhood_function(df, rounds=rounds, p=P).collect()
    return {
        (r["v"], r["d"]): (r["nonzero_registers"], r["denom"]) for r in rows
    }


def test_chain_balls_match_bfs(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(10)]
    assert _run(spark, edges, 3) == _ref(edges, 3)


def test_star_and_sink(spark):
    # hub reaches everything in 1 hop; leaves (no out-edges) stay {v}.
    edges = [("hub", f"leaf{i}") for i in range(20)]
    got = _run(spark, edges, 2)
    assert got == _ref(edges, 2)
    # a leaf's ball never grows: denom identical at d=1 and d=2
    assert got[("leaf3", 1)] == got[("leaf3", 2)]
    # the hub's ball is strictly larger than any leaf's (smaller denom)
    assert got[("hub", 1)][1] < got[("leaf3", 1)][1]


def test_denom_monotone_nonincreasing_in_d(spark):
    edges = [(f"v{i}", f"v{(i * 3 + 1) % 17}") for i in range(17)]
    got = _run(spark, edges, 4)
    for v in {f"v{i}" for i in range(17)}:
        for d in range(1, 4):
            assert got[(v, d + 1)][1] <= got[(v, d)][1]
    assert got == _ref(edges, 4)


def test_partitioning_invariance(spark):
    from pyspark.sql import functions as F

    edges = [(f"a{i}", f"a{(i * 5 + 2) % 23}") for i in range(23)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = {
        (r["v"], r["d"]): (r["nonzero_registers"], r["denom"])
        for r in neighborhood_function(df.repartition(1), 2, p=P).collect()
    }
    many = {
        (r["v"], r["d"]): (r["nonzero_registers"], r["denom"])
        for r in neighborhood_function(
            df.repartition(7, F.col("dst")), 2, p=P
        ).collect()
    }
    assert one == many


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        neighborhood_function(df, rounds=0)
    with pytest.raises(ValueError):
        neighborhood_function(df, rounds=1, p=3)
    with pytest.raises(ValueError):
        neighborhood_function(df, rounds=1, p=17)


def test_higher_precision_p_within_int64(spark):
    # denom fits int64 at ANY p (m * 2^R == 2^61): p=10 must work and
    # still agree with the straight-line reference at that precision.
    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = neighborhood_function(df, rounds=2, p=10).collect()
    w_bits = 60 - 10
    r_max = w_bits + 1
    ref = {}
    adj = {a: {b} for a, b in edges}
    verts = {v for e in edges for v in e}
    for v in verts:
        ball = {v}
        for d in (1, 2):
            ball = ball | {w for u in ball for w in adj.get(u, ())}
            regs = {}
            for u in ball:
                h = _h60(u)
                r = h >> w_bits
                wv = h & ((1 << w_bits) - 1)
                rho = w_bits + 1 if wv == 0 else w_bits - wv.bit_length() + 1
                regs[r] = max(regs.get(r, 0), rho)
            denom = sum(
                1 << (r_max - regs.get(r, 0)) for r in range(1 << 10)
            )
            ref[(v, d)] = (len(regs), denom)
    got = {
        (r["v"], r["d"]): (r["nonzero_registers"], r["denom"]) for r in rows
    }
    assert got == ref
