"""Similarity search tests: brute-force cosine top-k, IVF, cosine LSH."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    cosine_lsh_pairs,
    ivf_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    q = X[0]
    cos = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    # numpy top-5 with (cosine desc, id asc) tie-break to match the operator
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:5]
    expect = [int(ids[i]) for i in order]

    got = brute_force_topk(emb, q.tolist(), k=5).collect()
    assert [r.vec_id for r in got] == expect
    assert got[0].cosine == pytest.approx(1.0)


def test_ivf_recall(spark, emb):
    rows = emb.limit(1).collect()
    q = rows[0].embedding
    cent = train_ivf_centroids(emb, n_cells=8, sample=500)
    cells = assign_cells(emb, cent).persist()
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(cells, cent, q, k=10, n_probe=4).collect()}
    # probing half the cells must recover most of the true top-k
    assert len(exact & approx) >= 6
    # full probe == exact
    full = {r.vec_id for r in ivf_topk(cells, cent, q, k=10, n_probe=8).collect()}
    assert full == exact


def test_ivf_centroids_deterministic_across_partitionings(spark, emb):
    """Replay determinism: training reads the orderBy(vec_id)-lowest sample,
    so repartitioning the input must not change the centroids (a bare
    limit() without order would)."""
    c1 = train_ivf_centroids(emb, n_cells=8, sample=200)
    c2 = train_ivf_centroids(emb.repartition(7, "vec_id"), n_cells=8, sample=200)
    c3 = train_ivf_centroids(emb.coalesce(1), n_cells=8, sample=200)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1, c3)


def test_cosine_lsh_pairs(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (1, base.tolist()),
        (2, (base + rng.standard_normal(16) * 0.01).tolist()),  # near-dup
        (3, rng.standard_normal(16).tolist()),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = cosine_lsh_pairs(df, dim=16, threshold=0.95, n_planes=8, n_tables=6).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (1, 2) in got
    assert not any({a, b} == {1, 3} for a, b in got)


def test_cosine_lsh_pairs_narrow_shuffle_plan(spark):
    """Scale pin (r2 VERDICT 'what's wrong' #2): the bucket self-join and
    the candidate distinct must carry only (id, tbl, bucket) — the
    vectors join back once per side AFTER dedup. The distinct's
    HashAggregate grouping on vectors is the regression signature (it
    meant n_tables copies of every embedding crossed the shuffle and
    distinct compared arrays)."""
    rng = np.random.default_rng(0)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = cosine_lsh_pairs(df, dim=16, threshold=0.5, n_planes=4, n_tables=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "HashAggregate" in line:
            assert "va" not in line and "vb" not in line and "embedding" not in line, line


def test_ivf_recall_curve_pinned(spark, emb):
    """Recall@10-vs-brute-force harness over n_probe = 1,2,4,8 on the
    driver-generated embeddings: recall must be monotone non-decreasing
    in n_probe, reach 1.0 at full probe, and the multi-probe ratio
    extension must never probe fewer cells or lose recall vs its fixed
    baseline. Averaged over 5 query vectors for stability (everything
    is deterministic — seeds, sample, tie-breaks)."""
    from sinew_spark.operators.similarity import ivf_probe_cells

    n_cells, k = 8, 10
    cent = train_ivf_centroids(emb, n_cells=n_cells, sample=500)
    cells = assign_cells(emb, cent).persist()
    queries = [r.embedding for r in emb.orderBy("vec_id").limit(5).collect()]
    recalls = {}
    for n_probe in (1, 2, 4, 8):
        hits = 0
        for q in queries:
            exact = {r.vec_id for r in brute_force_topk(emb, q, k=k).collect()}
            approx = {
                r.vec_id
                for r in ivf_topk(cells, cent, q, k=k, n_probe=n_probe).collect()
            }
            hits += len(exact & approx)
        recalls[n_probe] = hits / (k * len(queries))
    assert recalls[1] <= recalls[2] <= recalls[4] <= recalls[8]
    assert recalls[8] == 1.0  # full probe == exact
    assert recalls[4] >= 0.6  # half the cells: the useful operating point

    # adaptive multi-probe: ratio extension is a superset of the fixed
    # probe set and can only help recall
    for q in queries:
        fixed = ivf_probe_cells(cent, q, n_probe=2)
        multi = ivf_probe_cells(cent, q, n_probe=2, probe_ratio=1.2)
        assert set(fixed) <= set(multi)
    q = queries[0]
    r_fixed = {r.vec_id for r in ivf_topk(cells, cent, q, k=k, n_probe=2).collect()}
    r_multi = {
        r.vec_id
        for r in ivf_topk(cells, cent, q, k=k, n_probe=2, probe_ratio=1.5).collect()
    }
    exact = {r.vec_id for r in brute_force_topk(emb, q, k=k).collect()}
    assert len(exact & r_multi) >= len(exact & r_fixed)


def test_ivf_probe_cells_validation_and_boundary(spark):
    """A query equidistant from two centroids must probe both under any
    probe_ratio > 1 even with n_probe=1 (the boundary case fixed
    n_probe misses); ratio < 1 rejected."""
    from sinew_spark.operators.similarity import ivf_probe_cells

    cent = np.array([[0.0, 0.0], [2.0, 0.0], [10.0, 10.0]])
    q = [1.0, 0.0]  # exactly on the 0/1 boundary
    assert ivf_probe_cells(cent, q, n_probe=1, probe_ratio=1.01) == [0, 1]
    assert len(ivf_probe_cells(cent, q, n_probe=1)) == 1
    with pytest.raises(ValueError):
        ivf_probe_cells(cent, q, n_probe=1, probe_ratio=0.5)


def test_semdedup_drops_planted_clones_keeps_originals(spark, emb):
    from sinew_spark.operators.similarity import semdedup

    base = emb.select("vec_id", "embedding")
    planted = base.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(planted)
    cent = np.array(
        [r.embedding for r in emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    out = semdedup(corpus, cent, threshold=0.95)
    rows = {r.vec_id: r for r in out.collect()}
    n_planted = planted.count()
    assert len(rows) == base.count() + n_planted
    dropped = {v for v, r in rows.items() if not r.kept}
    # exactly the planted clones drop (only pairs >= 0.95 in this data),
    # every original survives as the min-id representative
    assert dropped == {r.vec_id for r in planted.select("vec_id").collect()}
    # a clone's cell equals its original's (identical vector)
    for v in dropped:
        assert rows[v].cell == rows[v - 100000].cell


def test_semdedup_partitioning_invariant(spark, emb):
    from sinew_spark.operators.similarity import semdedup

    cent = np.array(
        [r.embedding for r in emb.where(F.col("vec_id") < 4).orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    sub = emb.select("vec_id", "embedding").where(F.col("vec_id") < 120)
    a = sorted(semdedup(sub, cent, threshold=0.3).collect())
    b = sorted(semdedup(sub.repartition(13, "vec_id"), cent, threshold=0.3).collect())
    assert a == b


def test_semdedup_threshold_monotone(spark, emb):
    """Lowering the threshold can only drop MORE rows (the duplicate
    relation grows), and kept minima stay kept: the smallest id of any
    cell can never be dropped."""
    from sinew_spark.operators.similarity import semdedup

    cent = np.array(
        [r.embedding for r in emb.where(F.col("vec_id") < 4).orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    sub = emb.select("vec_id", "embedding").where(F.col("vec_id") < 200)
    hi = {r.vec_id for r in semdedup(sub, cent, threshold=0.5).collect() if not r.kept}
    lo_rows = semdedup(sub, cent, threshold=0.2).collect()
    lo = {r.vec_id for r in lo_rows if not r.kept}
    assert hi <= lo
    per_cell_min = {}
    for r in lo_rows:
        per_cell_min[r.cell] = min(per_cell_min.get(r.cell, 1 << 60), r.vec_id)
    for r in lo_rows:
        if r.vec_id == per_cell_min[r.cell]:
            assert r.kept
