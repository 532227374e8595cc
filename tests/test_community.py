"""Synchronous label propagation: determinism + spec conformance."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.community import label_propagation


def _ref_lpa(edges, rounds):
    """Straight-line replay of the documented synchronous spec."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            cnt = Counter(labels[w] for w in nbrs)
            # highest count, then smallest label
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


def _run(spark, edges, rounds, shuffle=None):
    df = spark.createDataFrame(edges, ["src", "dst"])
    if shuffle:
        df = df.repartition(shuffle, F.col("dst"))
    return {
        r["v"]: r["label"]
        for r in label_propagation(df, rounds=rounds).collect()
    }


def test_two_cliques_with_bridge(spark):
    cliq = lambda pre, n: [  # noqa: E731
        (f"{pre}{i}", f"{pre}{j}") for i in range(n) for j in range(i + 1, n)
    ]
    edges = cliq("a", 4) + cliq("b", 4) + [("a0", "b0")]
    for rounds in (1, 2, 3, 5):
        assert _run(spark, edges, rounds) == _ref_lpa(edges, rounds)
    got = _run(spark, edges, 5)
    # Cliques resolve to separate communities labelled by min member.
    assert len({got[f"a{i}"] for i in range(4)}) == 1
    assert len({got[f"b{i}"] for i in range(1, 4)}) == 1


def test_star_and_path(spark):
    edges = [("hub", f"leaf{i}") for i in range(6)] + [
        (f"p{i}", f"p{i+1}") for i in range(5)
    ]
    for rounds in (1, 2, 4):
        assert _run(spark, edges, rounds) == _ref_lpa(edges, rounds)


def test_multi_edges_weight_votes(spark):
    # Duplicate edges count as repeated votes (spec: most frequent
    # neighbor label over the multiset).
    edges = [("x", "a"), ("x", "a"), ("x", "b")]
    assert _run(spark, edges, 1) == _ref_lpa(edges, 1)


def test_partitioning_invariance(spark):
    edges = [(f"v{i}", f"v{(i * 7 + 1) % 30}") for i in range(30)]
    base = _run(spark, edges, 3)
    assert base == _run(spark, edges, 3, shuffle=7)
    assert base == _ref_lpa(edges, 3)


def test_rounds_validation(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


def test_duplicate_and_loop_edges_do_not_skew_votes(spark):
    """An edge list that already carries both (a,b) and (b,a), duplicate
    rows, and self-loops must relabel exactly like the clean simple
    graph (ADVICE r4): the symmetrized list is distinct'd and loops
    dropped, so no neighbor label is double-counted and no vertex votes
    for its own label."""
    clean = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    noisy = clean + [("b", "a"), ("b", "c"), ("d", "d"), ("a", "a"), ("c", "b")]
    want = _ref_lpa(clean, 3)
    got = {
        r.v: r.label
        for r in label_propagation(
            spark.createDataFrame(noisy, ["src", "dst"]), rounds=3
        ).collect()
    }
    assert got == want


def test_self_loop_only_vertex_keeps_own_label(spark):
    """A vertex whose ONLY edges are self-loops is still an endpoint:
    it must appear in the output with its own label ("every distinct
    endpoint"), not vanish because the simple-graph preamble dropped
    its rows (self-canonical links are common on the web)."""
    got = {
        r.v: r.label
        for r in label_propagation(
            spark.createDataFrame([("a", "b"), ("c", "c")], ["src", "dst"]),
            rounds=2,
        ).collect()
    }
    assert got["c"] == "c"
    assert set(got) == {"a", "b", "c"}
