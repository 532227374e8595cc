"""Community detection: synchronous label propagation (LPA).

Connected components (operators/graph.py) answers "which pages are
reachable from each other"; community structure answers the finer
question "which pages CLUSTER" — link farms, forum neighborhoods,
mirror constellations — inside one giant connected web component.
Raghavan et al. 2007's label propagation is the standard near-linear
algorithm; at crawl scale it doubles as a cheap spam-neighborhood
expander around TrustRank seeds.

The textbook algorithm is asynchronous with random tie-breaks — both
banned here (this engine's replay doctrine: every operator must be
bit-identical across partitionings and re-runs).  This implementation
is the SYNCHRONOUS variant with a total deterministic order:

  - round k: every vertex adopts the label that is most frequent
    among its neighbors' round-(k-1) labels; ties break to the
    SMALLEST label; vertices with no neighbors keep their label;
  - labels start as the vertex id itself;
  - a fixed round count (caller-chosen) rather than
    convergence-detection — synchronous LPA can 2-cycle on bipartite
    structures, so "run R rounds" is the honest, replayable contract.

Scale shape per round: one shuffle join (labels onto the symmetrized
edge list keyed by neighbor) + one groupBy(v, label) count + one
groupBy(v) arg-min — all hash-keyed on vertex id, map-side
combinable, AQE-coalesced; `localCheckpoint` keeps the plan O(1)
deep.  The deterministic argmax is `min_by(label, struct(-count,
label))`: minimizing (-count, label) picks the highest count and the
smallest label in one exact aggregate, no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Run ``rounds`` synchronous LPA rounds over the undirected graph
    ``edges``; returns (v, label) for every distinct endpoint.

    Labels are vertex ids (orderable: numeric or string).  The result
    is a pure function of (edge set, rounds) — partitioning- and
    schedule-independent, so crawl replays relabel identically.
    """
    if rounds <= 0:
        raise ValueError("rounds must be positive")
    # canonical simple-graph preamble (matching kcore_vertices): distinct
    # the symmetrized list and drop self-loops — an edge list that already
    # carries both (a,b) and (b,a), duplicate rows, or loops would
    # otherwise double-count neighbor label frequencies and let a vertex
    # vote for its own label, deviating from synchronous-LPA semantics.
    sym = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("v"), F.col(src).alias("w")))
        .where(F.col("v") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # vertex set from the PRE-filter endpoints: a vertex whose only edges
    # are self-loops has no one to vote with but is still an endpoint —
    # it must appear in the output with its own label ("every distinct
    # endpoint"), not vanish because the loop filter emptied its rows
    labels = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
        .select("v", F.col("v").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        freq = (
            sym.join(
                labels.select(
                    F.col("v").alias("w"), F.col("label").alias("wl")
                ),
                "w",
            )
            .groupBy("v", "wl")
            .agg(F.count("*").alias("c"))
        )
        pick = freq.groupBy("v").agg(
            F.min_by("wl", F.struct((-F.col("c")).alias("nc"), F.col("wl"))).alias(
                "nlabel"
            )
        )
        labels = (
            labels.join(pick, "v", "left")
            .select(
                "v", F.coalesce(F.col("nlabel"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels
