"""Approximate neighborhood function (ANF / HyperANF).

N(v, d) = |{w : dist(v, w) <= d}| — the per-vertex ball size — is the
primitive behind a web graph's distance profile: effective diameter,
reachability mass, "how far does influence travel from this seed",
how fast the crawl's frontier saturates a component.  Exact
computation is all-pairs; Palmer et al. KDD'02 (ANF) and Boldi &
Vigna WWW'11 (HyperANF) replace each vertex's reachable SET with a
mergeable cardinality sketch and propagate it along edges:

    B_0(v) = sketch({v})
    B_t(v) = B_{t-1}(v)  merged-with  union over out-neighbors w of
             B_{t-1}(w)

After t rounds B_t(v) sketches the out-ball of radius t.  Sketches
here are the engine's deterministic md5-keyed HyperLogLog registers
(operators/sketch.py doctrine: an independent SQL engine reproduces
every register bit-for-bit), held SPARSE as (v, register, max_rho)
rows — at most 2^p rows per vertex.

Integer-exactness: per-vertex cardinality ESTIMATES need the harmonic
mean alpha*m^2 / sum_j 2^(-rho_j) — a float.  Instead the exported
row carries ``denom`` = sum over ALL m registers of 2^(R - rho_j)
(absent registers count rho=0), with R = 60 - p + 1 the maximum
possible rho.  That integer determines the estimate exactly
(estimate = alpha * m^2 * 2^R / denom) while itself being
order-independent, SQL-replayable, and always inside int64: the worst
case m * 2^R = 2^p * 2^(61-p) = 2^61 < 2^63 for EVERY p.

Scale shape per round: ONE shuffle join (neighbor registers onto the
edge list, keyed by the neighbor) + one combinable
groupBy(v, register) MAX — the same plan silhouette as label
propagation; rows carry (vertex, register, rho) triples, never sets.
`localCheckpoint` truncates lineage; rounds = the max distance being
profiled (tiny: web effective diameters are ~6-20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import HASH_BITS, register_rho_exprs


def neighborhood_function(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    p: int = 5,
) -> DataFrame:
    """Per-vertex out-ball sketches for every radius 1..``rounds`` over
    the directed graph ``edges``.

    Returns (v, d, nonzero_registers, denom):
      - ``nonzero_registers`` — registers hit by at least one ball
        member (monotone in the true ball size; equals it while the
        ball is smaller than ~2^p);
      - ``denom`` — the exact int64 HLL denominator described in the
        module docstring; smaller denom = larger ball.

    Direction is ``src -> dst`` out-reachability (symmetrize the edge
    list first for undirected balls).  Vertices with no out-edges
    still appear (ball = {v}).  ``p`` follows hll_registers' [4, 16]
    range; ``denom`` fits int64 at any p (m * 2^R == 2^61 always).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    w_bits = HASH_BITS - p
    r_max = w_bits + 1
    verts = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
    )
    # shared register math — sketch.py register_rho_exprs is the single
    # source of truth for the SQL-replayable (register, rho) derivation
    reg, rho = register_rho_exprs(F.col("v").cast("string"), p)
    state = verts.select(
        "v",
        reg.cast("int").alias("register"),
        rho.alias("max_rho"),
    ).localCheckpoint(eager=True)

    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
    out_parts = []
    for d in range(1, rounds + 1):
        nbr = e.join(
            state.select(
                F.col("v").alias("w"), "register", "max_rho"
            ),
            "w",
        ).select("v", "register", "max_rho")
        state = (
            state.unionByName(nbr)
            .groupBy("v", "register")
            .agg(F.max("max_rho").alias("max_rho"))
            .localCheckpoint(eager=True)
        )
        m = 1 << p
        # denom over ALL m registers: absent ones contribute 2^r_max
        # (rho = 0); present ones 2^(r_max - rho)
        present = state.groupBy("v").agg(
            F.count("*").alias("nonzero_registers"),
            # shiftleft's DSL form takes a literal bit count; the SQL
            # form accepts an expression
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - max_rho)")
            ).alias("_present_denom"),
        )
        out_parts.append(
            present.select(
                "v",
                F.lit(d).cast("int").alias("d"),
                F.col("nonzero_registers").cast("long").alias(
                    "nonzero_registers"
                ),
                (
                    F.col("_present_denom")
                    + (F.lit(m).cast("long") - F.col("nonzero_registers"))
                    * F.lit(1 << r_max).cast("long")
                ).alias("denom"),
            )
        )
    out = out_parts[0]
    for part in out_parts[1:]:
        out = out.unionByName(part)
    return out
