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


def kmeans_fixedpoint(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Cluster ``vectors`` into ``k`` groups with ``iters`` Lloyd
    rounds of exact integer k-means.

    Returns (id, cluster, dist): the final assignment and the squared
    quantized L2 distance to the assigned centroid. ``cluster`` is the
    0-based index of the centroid seeded by the (cluster+1)-th
    smallest id.
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

    def assign(df: DataFrame) -> DataFrame:
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
