"""k-core decomposition: iterative degree peeling.

The k-core of a graph is the maximal subgraph in which every vertex
has degree >= k (Seidman 1983).  On web graphs it separates the
densely cross-linked heart of a topic neighborhood (or a link farm —
k-cores are a standard spam-mass feature alongside TrustRank and
reciprocity) from pendant chains and one-shot pages; cores also give
a cheap curriculum signal for corpus selection: pages in deep cores
are structurally corroborated, degree alone is spoofable by a single
hub.

Algorithm: simultaneous peeling.  Each round removes EVERY vertex
whose current degree is < k; removal lowers neighbors' degrees, so
peeling cascades; the fixpoint (a round that removes nothing) leaves
exactly the k-core.  Simultaneous (not sequential) removal keeps the
result a pure function of the edge set — replayable, partitioning-
independent — and is how the classic distributed formulation runs
(Montresor et al., "Distributed k-core decomposition", PODC'11).

Scale shape per round: one combinable groupBy(vertex) degree count +
one semi-join of the edge list against surviving vertices (hash-keyed
both ways, AQE-coalesced, no skew beyond hot vertices that only ever
sit on the build side).  `localCheckpoint` truncates lineage; the
convergence probe is a 1-row count.  Rounds = peel depth of the graph
(small for web graphs: bounded by max core number shells), hard-capped
by ``max_rounds`` with a loud failure rather than a silently partial
core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_vertices(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """Vertices of the k-core of the undirected simple graph ``edges``:
    returns (v, degree) with each survivor's degree INSIDE the core.

    Edges are deduplicated and self-loops dropped (a self-loop
    corroborates nothing).  May return an empty DataFrame — many
    graphs have no k-core for k above their densest shell.  Raises
    RuntimeError if ``max_rounds`` rounds still make progress (peel
    depth exceeded the cap; a partial peel is NOT a k-core, so no
    partial result is returned).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # canonical undirected simple edges: a < b, loops dropped
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    simple = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = simple.count()
    for _ in range(max_rounds):
        deg = (
            simple.select(F.col("a").alias("v"))
            .union(simple.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("v")
        pruned = (
            simple.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_pruned = pruned.count()
        removed, n_edges = n_edges - n_pruned, n_pruned
        simple = pruned
        if removed == 0:
            return deg.where(F.col("degree") >= k)
    if n_edges == 0:
        # the final round emptied the edge set: the k-core is provably
        # empty (k >= 1 needs edges) — a determined answer, not a
        # partial peel, even though `removed > 0` on the last round
        return simple.select(
            F.col("a").alias("v"), F.lit(0).cast("long").alias("degree")
        )
    raise RuntimeError(
        f"k-core peeling still progressing after {max_rounds} rounds; "
        "raise max_rounds (a partial peel is not a k-core)"
    )
