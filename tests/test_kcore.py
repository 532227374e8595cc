"""k-core decomposition: peel parity vs a straight-line reference."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.kcore import kcore_vertices


def _ref_kcore(edges, k):
    """Simultaneous peel, straight-line."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        nes = {(a, b) for a, b in es if a in keep and b in keep}
        if nes == es:
            return {v: d for v, d in deg.items() if d >= k}
        es = nes


def _run(spark, edges, k, shuffle=None):
    df = spark.createDataFrame(edges, ["src", "dst"])
    if shuffle:
        df = df.repartition(shuffle, F.col("dst"))
    return {r["v"]: r["degree"] for r in kcore_vertices(df, k).collect()}


def _clique(pre, n):
    return [(f"{pre}{i}", f"{pre}{j}") for i in range(n) for j in range(i + 1, n)]


def test_clique_with_pendant_chain(spark):
    # K5 is a 4-core; the pendant chain peels away for any k >= 2.
    edges = _clique("c", 5) + [("c0", "p0"), ("p0", "p1"), ("p1", "p2")]
    for k in (1, 2, 3, 4):
        assert _run(spark, edges, k) == _ref_kcore(edges, k)
    core4 = _run(spark, edges, 4)
    assert set(core4) == {f"c{i}" for i in range(5)}
    assert all(d == 4 for d in core4.values())


def test_cascading_peel(spark):
    # Triangle + a tail whose removal cascades: peel depth > 1.
    edges = _clique("t", 3) + [("t0", "x0"), ("x0", "x1"), ("x0", "x2"), ("x1", "x2")]
    for k in (2, 3):
        assert _run(spark, edges, k) == _ref_kcore(edges, k)


def test_no_kcore_returns_empty(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]  # path: no 2-core
    assert _run(spark, edges, 2) == {}


def test_self_loops_and_duplicates_ignored(spark):
    edges = _clique("c", 4) + [("c0", "c0"), ("c1", "c2"), ("c2", "c1")]
    assert _run(spark, edges, 3) == _ref_kcore(edges, 3)
    assert set(_run(spark, edges, 3)) == {"c0", "c1", "c2", "c3"}


def test_partitioning_invariance(spark):
    edges = _clique("a", 4) + _clique("b", 5) + [("a0", "b0"), ("z", "a1")]
    assert _run(spark, edges, 3) == _run(spark, edges, 3, shuffle=7)
    assert _run(spark, edges, 3) == _ref_kcore(edges, 3)


def test_validation_and_round_cap(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        kcore_vertices(df, 0)
    # long path peels one shell per round from the ends: cap must trip
    path = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(12)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore_vertices(path, 2, max_rounds=2)


def test_empty_core_at_round_cap_is_answer_not_error(spark):
    # The path empties exactly on the LAST allowed round (round 1 peels
    # the endpoints, round 2 empties the middle edge with removed > 0):
    # the empty 2-core is a determined answer, not "still progressing".
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    assert kcore_vertices(path, 2, max_rounds=2).count() == 0
