"""Redirect-chain collapse: distributed pointer doubling.

A web-scale crawl accumulates a redirect MAP (url -> target) in the
fetched table (reference keeps the hop list per response —
/root/reference/lib/sinew/response.rb exposes the final uri; at sinew's
single-process scale every GET walks its own chain).  At frontier
scale the map itself is a first-class table — hundreds of millions of
edges — and consumers (canonicalization, dedup, link-graph
construction) need every url resolved to its FINAL landing target
without re-walking chains per-row.

Algorithm: pointer doubling (a.k.a. path doubling / pointer jumping —
the classic PRAM list-ranking technique, see Jaja "An Introduction to
Parallel Algorithms" ch. 3).  Round k maps f_{k+1}(v) = f_k(f_k(v)):
every row's `next` pointer jumps over the node it points at, so a
chain of length L resolves in ceil(log2(L)) self-joins instead of L
sequential lookups.  Each round is ONE hash equi-join of the mapping
with itself keyed on `next` — shuffle-partitioned by url hash, AQE
coalesces, no skew beyond hot redirect *targets* (which only ever sit
on the build side of the join).

Cycle handling: an acyclic row strictly decreases the "next still in
the domain" predicate; a redirect loop never leaves it.  When a round
makes no progress on that count the remaining unresolved rows are
exactly the rows on (or leading into) a cycle — they are reported
with ``cyclic = true`` and a NULL final hop count rather than looping
forever.

Scale shape: O(log L) rounds x one self-join each; `localCheckpoint`
truncates lineage per round; the convergence probe is a 1-row count
aggregate, never a collect of keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirect_chains(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 32,
) -> DataFrame:
    """Collapse the redirect mapping ``redirects`` (one out-edge per
    ``src``) to final landing targets.

    Returns one row per distinct ``src``:
      (src, final_url, hops, cyclic)
    where ``final_url`` is the first reached url that is NOT itself a
    redirect source (for cyclic rows: the url the walk was parked at
    when the cycle was detected), ``hops`` is the number of redirect
    edges traversed (NULL for cyclic rows — the true count is
    infinite), and ``cyclic`` marks rows on or leading into a redirect
    loop.

    ``max_rounds`` bounds the doubling rounds; chains up to length
    2**max_rounds resolve.  Duplicate ``src`` rows are rejected —
    a redirect map is a function.
    """
    if max_rounds <= 0:
        raise ValueError("max_rounds must be positive")
    m = redirects.select(F.col(src).alias("src"), F.col(dst).alias("next"))
    # A mapping with duplicate sources is ambiguous — fail loudly
    # rather than silently picking one edge.  One count aggregate.
    total, distinct = m.agg(
        F.count("*").alias("n"), F.count_distinct("src").alias("d")
    ).first()
    if total != distinct:
        raise ValueError(
            f"redirect map has {total - distinct} duplicate source url(s); "
            "a redirect map must be a function (one out-edge per src)"
        )

    state = m.select("src", "next", F.lit(1).cast("long").alias("hops"))
    state = state.localCheckpoint(eager=True)
    # An acyclic chain has at most `total` edges, so ceil(log2(total))
    # doubling rounds resolve every acyclic row; anything still
    # pointing into the domain after that many rounds is on (or leads
    # into) a cycle.  A plateau heuristic would misfire — equal-length
    # chains keep the unresolved count constant for several rounds —
    # so the bound is the detector.
    rounds = 1
    while (1 << rounds) < max(int(total), 1):
        rounds += 1
    rounds = min(rounds + 1, max_rounds)
    unresolved = int(total)
    for _ in range(rounds):
        # Jump: rows whose `next` is itself a source take that row's
        # `next` and add its accumulated hop count (doubling).  Rows
        # whose `next` left the domain are final and pass through.
        jumped = (
            state.alias("a")
            .join(
                state.select(
                    F.col("src").alias("j_src"),
                    F.col("next").alias("j_next"),
                    F.col("hops").alias("j_hops"),
                ).alias("b"),
                F.col("a.next") == F.col("b.j_src"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.j_next"), F.col("a.next")).alias("next"),
                F.when(
                    F.col("b.j_src").isNotNull(),
                    F.col("a.hops") + F.col("b.j_hops"),
                )
                .otherwise(F.col("a.hops"))
                .alias("hops"),
                F.col("b.j_src").isNotNull().alias("_jumped"),
            )
            .localCheckpoint(eager=True)
        )
        unresolved = jumped.filter(F.col("_jumped")).count()
        state = jumped.drop("_jumped")
        if unresolved == 0:
            break
    cyclic = unresolved > 0

    domain = state.select(F.col("src").alias("d_src")).distinct()
    out = state.join(
        domain, state["next"] == domain["d_src"], "left"
    ).select(
        "src",
        F.col("next").alias("final_url"),
        F.when(F.col("d_src").isNull(), F.col("hops")).alias("hops"),
        F.col("d_src").isNotNull().alias("cyclic"),
    )
    if not cyclic:
        # Fast path: the fixpoint proved no `next` remains in the
        # domain, so the flag join is constant-false — but keep the
        # same schema/contract.
        out = state.select(
            "src",
            F.col("next").alias("final_url"),
            F.col("hops").alias("hops"),
            F.lit(False).alias("cyclic"),
        )
    return out
