"""Corpus clustering: distributed k-means in exact integer arithmetic.

Training-data pipelines bucket a corpus by embedding similarity
(topic-balanced sampling, domain mixing, dedup-aware curriculum
construction). Float k-means is shuffle-order-dependent — FP addition
isn't associative, so the same job on a different partitioning drifts
in the low bits and cluster boundaries flicker. Like
``graph.pagerank_fixedpoint``, this implementation quantizes to
integers (``floor(x * scale)`` per dimension) so every distance and
centroid is a BIGINT computed with order-independent exact sums:
bit-identical across partitionings, cluster sizes, and reruns, and
exactly replayable by an independent SQL engine.

Lloyd iterations, all deterministic:

- init: the ``k`` rows with the smallest ids (no RNG)
- assign: squared L2 distance over quantized coordinates; ties break
  to the lowest centroid index
- update: per-cluster elementwise integer mean, TRUNCATED toward zero
  (matching SQL ``//`` semantics); a cluster that loses all members
  keeps its previous centroid

Scale shape per iteration: ONE groupBy(cluster) shuffle whose
aggregate row is (count, d elementwise sums) — map-side partial agg,
k rows out; assignment is a pure projection against centroid
LITERALS baked into the plan (k*d longs — bytes, not a join). The
only driver traffic per iteration is those k aggregate rows; the
O(rows * d) work is all executors. d is fixed per corpus and small
(embedding width), so the 64-sum aggregate stays comfortably inside
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _trunc_div(s: int, n: int) -> int:
    """Integer division truncating toward zero (SQL semantics; Python's
    // floors, which disagrees on negative sums)."""
    return s // n if (s >= 0) == (n >= 0) else -((-s) // n)


def _sqdist(q: Column, centroid: list[int]) -> Column:
    c = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _make_argmin_udf(centroids: list[list[int]]):
    """Arrow-batched assignment for the large-k path: centroids ship as a
    broadcast numpy matrix in the UDF closure (k*d longs — KBs to MBs),
    distances via the integer expansion ||x-c||² = x·x - 2 x·C^T + c·c so
    the per-batch intermediate is the n×k distance matrix, never n×k×d.
    All arithmetic is int64 — identical to the literal plan's BIGINT math
    (both overflow-free for quantized unit-scale embeddings); np.argmin
    takes the first minimum, matching the literal path's
    lowest-centroid-index tie-break."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.int64)  # (k, d)
    c_sq = (C * C).sum(axis=1)  # (k,)

    @F.pandas_udf("struct<cluster:int, dist:bigint>")
    def argmin(q):
        Q = np.array(q.tolist(), dtype=np.int64)  # (n, d)
        d2 = (Q * Q).sum(axis=1, keepdims=True) - 2 * (Q @ C.T) + c_sq[None, :]
        idx = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype("int32"), "dist": d2[np.arange(len(idx)), idx]}
        )

    return argmin


def kmeans_fixedpoint(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    max_literal_terms: int = 4096,
) -> DataFrame:
    """Cluster ``vectors`` into ``k`` groups with ``iters`` Lloyd
    rounds of exact integer k-means.

    Returns (id, cluster, dist): the final assignment and the squared
    quantized L2 distance to the assigned centroid. ``cluster`` is the
    0-based index of the centroid seeded by the (cluster+1)-th
    smallest id.

    Assignment has two plans with identical integer results:

    - small k*d (≤ ``max_literal_terms``): centroids baked into the plan
      as literals — pure whole-stage-codegen projection, zero Python.
    - large k*d: the literal expression tree is k*d terms and blows past
      codegen's method-size limits (and plan-build time) around k in the
      hundreds; assignment switches to one Arrow-batched pandas UDF
      whose closure broadcasts the (k, d) int64 centroid matrix and
      computes the n×k distance matrix per batch via the dot-product
      expansion — still zero extra exchange per iteration (a broadcast
      JOIN against a centroid table would re-shuffle all rows through a
      groupBy(id) argmin every round).

    Either way the per-iteration scale shape is unchanged: ONE
    groupBy(cluster) shuffle carrying k aggregate rows to the driver.
    """
    if k <= 0 or iters <= 0:
        raise ValueError("k and iters must be positive")
    qv = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("q"),
    ).persist()
    seed_rows = qv.orderBy("id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    centroids = [list(r.q) for r in seed_rows]
    dim = len(centroids[0])
    use_udf = k * dim > max_literal_terms

    def assign(df: DataFrame) -> DataFrame:
        if use_udf:
            a = _make_argmin_udf(centroids)(F.col("q"))
            return df.select(
                "id", "q", a["cluster"].alias("cluster"), a["dist"].alias("dist")
            )
        dists = F.array(*[_sqdist(F.col("q"), c) for c in centroids])
        return df.select(
            "id",
            "q",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min(dists).alias("dist"),
        )

    for _ in range(iters):
        sums = (
            assign(qv)
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        for row in sums:
            centroids[row["cluster"]] = [
                _trunc_div(int(row[f"s{i}"]), int(row["n"])) for i in range(dim)
            ]
        # clusters with no members keep their previous centroid
    out = assign(qv).select("id", "cluster", "dist")
    qv.unpersist()
    return out
