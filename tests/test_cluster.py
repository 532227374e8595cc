"""Integer fixed-point k-means (operators/cluster.py): brute-force
equivalence, partition invariance, cluster recovery, and edge cases."""

import math
import random

import pytest

from sinew_spark.operators.cluster import _trunc_div, kmeans_fixedpoint


def _brute(vecs, k, iters, scale=10**6):
    q = {i: [math.floor(float(x) * scale) for x in v] for i, v in vecs}
    cents = [list(q[i]) for i in sorted(q)[:k]]

    def d(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def best(v):
        return min(range(k), key=lambda c: (d(v, cents[c]), c))

    for _ in range(iters):
        asg = {i: best(q[i]) for i in q}
        for c in range(k):
            mem = [q[i] for i in q if asg[i] == c]
            if mem:
                cents[c] = [_trunc_div(sum(col), len(mem)) for col in zip(*mem)]
    return {i: (best(q[i]), min(d(q[i], cents[c]) for c in range(k))) for i in q}


def _blob_data(n=40, dim=6, seed=3):
    rng = random.Random(seed)
    vecs = []
    for i in range(n):
        center = [(-1.0 if i % 3 == 0 else (0.0 if i % 3 == 1 else 1.0))] * dim
        vecs.append((i, [c + rng.uniform(-0.2, 0.2) for c in center]))
    return vecs


def test_trunc_div_matches_sql_semantics():
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # Python // would say -4
    assert _trunc_div(0, 5) == 0


def test_kmeans_matches_bruteforce(spark):
    vecs = _blob_data()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r.id: (r.cluster, r.dist)
        for r in kmeans_fixedpoint(df.repartition(7), k=3, iters=3).collect()
    }
    # brute force quantizes from the same float32 values Spark reads
    f32 = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in df.orderBy("vec_id").collect()
    ]
    assert got == _brute(f32, k=3, iters=3)


def test_kmeans_bit_identical_across_partitionings(spark):
    vecs = _blob_data(seed=9)
    a = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(2)
    b = spark.createDataFrame(
        list(reversed(vecs)), "vec_id long, embedding array<float>"
    ).repartition(11)
    ra = sorted((r.id, r.cluster, r.dist) for r in kmeans_fixedpoint(a, k=3, iters=3).collect())
    rb = sorted((r.id, r.cluster, r.dist) for r in kmeans_fixedpoint(b, k=3, iters=3).collect())
    assert ra == rb


def test_kmeans_recovers_separated_blobs(spark):
    # three tight blobs far apart -> every blob lands in one cluster
    vecs = _blob_data(n=30, seed=5)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r.id: r.cluster for r in kmeans_fixedpoint(df, k=3, iters=4).collect()}
    for mod in range(3):
        labels = {got[i] for i in got if i % 3 == mod}
        assert len(labels) == 1, f"blob {mod} split across {labels}"


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        kmeans_fixedpoint(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fixedpoint(df, k=5, iters=1)


def test_kmeans_udf_path_bit_identical_to_literal_plan(spark):
    # force the Arrow argmin path (max_literal_terms=1) on the same data
    # the literal plan handles: every (id, cluster, dist) must match bit
    # for bit across all iterations' interacting assignments
    vecs = _blob_data(n=45, dim=5, seed=21)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    lit = sorted(
        (r.id, r.cluster, r.dist)
        for r in kmeans_fixedpoint(df.repartition(4), k=4, iters=3).collect()
    )
    udf = sorted(
        (r.id, r.cluster, r.dist)
        for r in kmeans_fixedpoint(
            df.repartition(9), k=4, iters=3, max_literal_terms=1
        ).collect()
    )
    assert lit == udf


def test_kmeans_large_k_smoke(spark):
    # k=256, d=32 -> k*d = 8192 > default threshold: auto-selects the
    # Arrow path; the literal plan at this size would blow codegen limits
    rng = random.Random(33)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(300)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = kmeans_fixedpoint(df, k=256, iters=2).collect()
    assert len(out) == 300
    assert len({r.cluster for r in out}) > 64
    assert all(0 <= r.cluster < 256 and r.dist >= 0 for r in out)
