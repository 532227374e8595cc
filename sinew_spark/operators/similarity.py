"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. The query vector is a
  literal folded into the plan; the scan is a single pass with a JVM-side
  aggregate expression (F.aggregate/zip_with — no Python), then a top-k
  (TakeOrderedAndProject, no full sort).
- IVF (inverted-file) variant: the scale path. k-means-ish centroid
  assignment (deterministic seeded centroids trained via sampled numpy on
  the driver), probe only the nearest n_probe cells -> candidate set is
  |cells probed| / |cells| of the data. Same final scoring code path.
- random-hyperplane LSH bucketing for cosine near-dup pairs of embeddings.

All distances are computed by Catalyst expressions (zip_with + aggregate)
so whole-stage codegen applies; numpy appears only in centroid training
(driver, sampled) and never per-row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject. Returns
    (vec_id, cosine) sorted desc."""
    q = _query_lit(query_vec)
    scored = emb.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


# --- IVF ------------------------------------------------------------------------


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side k-means on a bounded sample (Lloyd's, deterministic seed).
    At 100 TB the sample is still `sample` rows — constant driver memory.
    The sample is the `sample` lowest ids (orderBy+limit = TakeOrdered, no
    full sort) so training is replay-identical across repartitionings —
    a bare limit() without order is not."""
    rows = emb.select(F.col(id_col), F.col(vec_col)).orderBy(id_col).limit(sample).collect()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(0)
    return cent


def assign_cells(emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per row — computed JVM-side: distance to each
    centroid is an unrolled expression over the (small) centroid list."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    return emb.withColumn("cell", F.array_position(dists, F.array_min(dists)) - 1)


def ivf_probe_cells(
    centroids: np.ndarray,
    query_vec,
    n_probe: int = 4,
    probe_ratio: float | None = None,
) -> list[int]:
    """Deterministic probe set for a query: the ``n_probe`` nearest
    cells, optionally EXTENDED by adaptive multi-probe — every cell
    whose centroid distance is within ``probe_ratio`` x the nearest
    centroid's distance also probes (Multi-probe LSH, Lv et al.
    VLDB'07, transplanted to IVF: a query near a Voronoi boundary has
    its true neighbors split across the boundary cells, and the
    distance RATIO detects exactly that case — fixed n_probe can't).

    Driver-side on the (n_cells x dim) centroid array only — O(cells),
    never touches the data."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(1)
    order = np.argsort(d2, kind="stable")
    probe = set(order[:n_probe].tolist())
    if probe_ratio is not None:
        if probe_ratio < 1.0:
            raise ValueError("probe_ratio must be >= 1.0")
        near = float(d2[order[0]])
        # squared-distance space: ratio r on distances = r^2 on d2
        probe |= set(np.nonzero(d2 <= near * probe_ratio * probe_ratio)[0].tolist())
    return sorted(probe)


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    probe_ratio: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows in the probed cells (the
    ``n_probe`` nearest, plus — when ``probe_ratio`` is set — every
    cell within that distance ratio of the nearest: adaptive
    multi-probe for boundary queries). With cell-partitioned storage
    this is partition pruning — the scan touches |probe|/n_cells of
    the data. Recall@k against brute force is pinned per n_probe in
    tests/test_similarity.py's recall harness."""
    cells = ivf_probe_cells(centroids, query_vec, n_probe, probe_ratio)
    cand = emb_with_cells.where(F.col("cell").isin(cells))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


# --- random hyperplane LSH (cosine near-dup pairs) ------------------------------


def cosine_lsh_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs: n_tables independent sign-bucket
    hashes of n_planes random hyperplanes; pairs sharing a bucket in any
    table are candidates; exact cosine verifies. Join is on the bucket key
    — no cross join.

    Shuffle discipline: the bucket join and the candidate distinct carry
    ONLY (id, tbl, bucket) — never the vectors. Shipping `v` through the
    n_tables-way self-join would move n_tables copies of every embedding
    (~6 KB/row at d=768) and make distinct() compare arrays, all for
    columns that are pure functions of the ids. Vectors are joined back
    exactly once per side onto the deduplicated (a, b) pairs — candidate
    pairs are a tiny fraction of n_tables x rows at any real threshold."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    tables = []
    for t in range(n_tables):
        bits = [
            F.when(dot_expr(v, F.array(*[F.lit(float(x)) for x in planes[t, p]])) >= 0, 1).otherwise(0)
            for p in range(n_planes)
        ]
        bucket = F.lit(0)
        for b in bits:
            bucket = F.shiftleft(bucket, 1) + b
        tables.append(
            emb.select(F.col(id_col), F.lit(t).alias("tbl"), bucket.alias("bucket"))
        )
    banded = tables[0]
    for tdf in tables[1:]:
        banded = banded.unionByName(tdf)
    left = banded.select(F.col(id_col).alias("a"), "tbl", "bucket")
    right = banded.select(F.col(id_col).alias("b"), "tbl", "bucket")
    pairs = (
        left.join(right, ["tbl", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    vecs = emb.select(F.col(id_col), v.alias("_vv"))
    return (
        pairs.join(vecs.select(F.col(id_col).alias("a"), F.col("_vv").alias("va")), "a")
        .join(vecs.select(F.col(id_col).alias("b"), F.col("_vv").alias("vb")), "b")
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# --- SemDeDup: cluster-scoped semantic deduplication -----------------------------


def semdedup(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): embeddings are partitioned into k-means cells,
    and WITHIN each cell any pair with cosine >= ``threshold`` is a
    semantic duplicate — of every duplicate set, only the smallest-id
    member survives. The paper drops all-but-one of each high-similarity
    group inside a cluster (its tie-break is distance-to-centroid; the
    min-id rule used here is the deterministic equivalent the oracle can
    replay: a row is dropped iff SOME smaller-id row in its cell matches
    it, so exactly the id-minima of the duplicate relation survive).

    Returns one row per input: (id, cell, kept) — ``kept=false`` rows
    are the semantic duplicates a training pipeline would discard.
    Pair with a join back onto the document table to materialize the
    pruned corpus.

    Scale shape: the candidate join is cell-scoped — both sides hash-
    shuffle on ``cell`` and pairs form only within a cell (the whole
    point of SemDeDup: k is chosen so cells are ~|corpus|/k rows and the
    quadratic term is bounded per cell; at the 100 TB design point k is
    ~1e5 so cells are ~1e5 rows of a 1e10 corpus). The pair join carries
    (cell, id, vector-on-one-side) and the cosine gate applies inside
    the join's projection — survivors ship ids only. Nothing is ever
    all-pairs across cells, and the final membership join is a
    broadcast-able anti-set of dropped ids when duplicates are sparse.

    Determinism: the cosine is rounded to ``round_digits`` BEFORE the
    threshold compare (both engines round-half-away-from-zero on
    doubles), the same convention as ``cosine_lsh_pairs``' oracle; cell
    assignment ties break to the first (lowest-index) centroid in both
    engines.
    """
    cells = assign_cells(emb, centroids, vec_col)
    v = F.col(vec_col).cast("array<double>")
    # normalize ONCE per row (O(rows) folds), so the O(pairs) join
    # predicate is a single dot fold instead of dot + two norms — the
    # norm is materialized as a column BEFORE the transform lambda uses
    # it (a free norm_expr inside the lambda would re-evaluate the whole
    # norm fold per element). The oracle replays the identical
    # unit-vector formula so round()ed cosines stay bit-equal.
    unit = cells.select(
        "cell", F.col(id_col), v.alias("_v"), norm_expr(v).alias("_n")
    ).select(
        "cell",
        F.col(id_col),
        F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias("_u"),
    )
    left = unit.select(F.col("cell"), F.col(id_col).alias("_a"), F.col("_u").alias("_ua"))
    right = unit.select(F.col("cell"), F.col(id_col).alias("_b"), F.col("_u").alias("_ub"))
    dropped = (
        left.join(right, "cell")
        .where(F.col("_b") < F.col("_a"))
        .where(
            F.round(dot_expr(F.col("_ua"), F.col("_ub")), round_digits)
            >= F.lit(threshold)
        )
        .select(F.col("_a").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        cells.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )
