"""Dedup-cluster formation: distributed connected components.

Near-dup detection (operators/dedup.py MinHash/SimHash/embedding LSH)
emits verified PAIRS; a training pipeline needs CLUSTERS — one
representative kept per group of mutually-similar documents, where
similarity is transitive through chains (A~B, B~C puts A and C in one
cluster even if A!~C). That closure is connected components over the
pair graph.

Algorithm: iterative min-label propagation. Every vertex starts
labelled with itself; each round every vertex takes the min of its own
label and its neighbors' labels; fixpoint = every vertex labelled with
the smallest vertex id in its component (so the cluster id doubles as
the canonical representative — deterministic, replayable). Rounds
needed = graph diameter, and near-dup graphs are dense clumps with
tiny diameters (2-4); for adversarial long-path graphs swap in the
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same per-round plan
shape, O(log n) rounds.

Scale shape per round: ONE shuffle join (labels onto the symmetrized
edge list, keyed by neighbor) + one groupBy(v) min — both hash-keyed
on vertex id, so AQE coalesces and skew only costs a hot reduce key.
`localCheckpoint` truncates the lineage each round so the plan stays
O(1) deep instead of O(rounds); the convergence probe is a
`limit(1).count()` (early-exits on the first changed row), never a
full-table collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id in its connected component.

    Returns (v, cluster) with one row per distinct endpoint; vertex ids
    must be orderable (numeric or string). For near-dup graphs (dense
    clumps, tiny diameter) min-label propagation reaches fixpoint in a
    handful of rounds; if ``max_iters`` rounds pass without convergence
    the graph has a long path and the computation auto-degrades to
    large-star/small-star contraction (O(log n) rounds, same per-round
    join+agg shape, same min-id cluster contract) instead of raising.
    """
    if max_iters <= 0:
        raise ValueError("max_iters must be positive")
    sym = edges.select(F.col(src).alias("v"), F.col(dst).alias("w")).union(
        edges.select(F.col(dst).alias("v"), F.col(src).alias("w"))
    )
    labels = sym.select("v").distinct().select("v", F.col("v").alias("cluster"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr = (
            sym.join(
                labels.select(F.col("v").alias("w"), F.col("cluster").alias("wc")), "w"
            )
            .groupBy("v")
            .agg(F.min("wc").alias("nmin"))
        )
        new = (
            labels.join(nbr, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nmin"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    return connected_components_star(edges, src=src, dst=dst)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. SoCC'14): every node u connects
    each strictly LARGER neighbor to min(N(u) ∪ {u}). One groupBy-min +
    one join, both keyed on u."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges big→small; every node u connects
    its smaller neighbors AND itself to min(N_smaller(u))."""
    o = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 80,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction — O(log n) rounds on ANY graph shape (adversarial paths
    included), vs diameter rounds for label propagation.

    Each round is one groupBy-min + one self-join + distinct, all
    hash-keyed on vertex id — the same scale shape as a propagation
    round, just fewer of them. Fixpoint: every component is a star whose
    center is its minimum vertex id; labels read directly off the final
    edge set. Same (v, cluster) contract as connected_components.
    """
    verts = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        same_size = new.count() == e.count()
        if same_size and new.exceptAll(e).limit(1).count() == 0:
            e = new
            break
        e = new
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # stars point child -> root; roots (and isolated endpoints) label
    # themselves
    children = e.select(F.col("u").alias("v"), F.col("v").alias("cluster"))
    roots = verts.join(children.select("v"), "v", "left_anti").select(
        "v", F.col("v").alias("cluster")
    )
    return children.union(roots)


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed multigraph, computed in
    EXACT integer fixed-point arithmetic — frontier prioritization by
    link importance (the classic crawl-ordering signal; reference scope:
    sinew orders its frontier FIFO per recipe, lib/sinew/base.rb `get`
    sequencing — this is the scale-path upgrade).

    Why integers: float PageRank is shuffle-order-dependent (FP addition
    isn't associative), so two runs of the same job on different
    partitionings disagree in the low bits — unacceptable under the
    replay-identity rule this engine targets. Here every quantity is a
    BIGINT: total mass ``scale`` (default 10^12) is split evenly
    (``scale DIV n``), each vertex ships ``rank DIV out_degree`` along
    every out-edge, and the damped update is

        rank'(v) = ((den-num) * (scale DIV n)) DIV den
                 + (num * sum_in(contrib)) DIV den

    Integer sums are exactly associative/commutative, so the result is
    bit-identical across any partitioning, AQE re-plan, or cluster size
    — and an independent SQL engine replays it exactly (the
    ``pagerank`` oracle query does). Rounding loss from the DIVs only
    leaks mass (ranks are a deterministic lower bound of the rational
    fixpoint); ordering fidelity at 10^12 scale is far below any
    real-world tie.

    Scale shape per iteration: one hash join of ranks onto the edge
    list keyed by ``src`` (both sides partitioned by the same key after
    round 1, so the exchange on the edge side is reused from the
    persisted symmetrized list) + one groupBy(``dst``) SUM with
    map-side partial aggregation. ``localCheckpoint`` truncates lineage
    so the plan stays O(1) deep over any iteration count.

    Dangling vertices (no out-edges) leak their damped mass by default —
    the standard simplification. Web crawl graphs have HEAVY sinks
    (every not-yet-fetched frontier page is one), so
    ``redistribute_dangling=True`` adds the textbook uniform term in the
    same integer arithmetic: each iteration the dangling vertices' total
    rank D is split as ``share = D div n`` and every vertex's incoming
    sum becomes ``s + share`` before damping. D is a single-row
    aggregate per iteration (a driver scalar, like kmeans' k-row
    centroid collect — never an O(rows) pull), so the result stays
    bit-identical across partitionings and SQL-replayable.

    Returns (v, rank: long) with one row per distinct endpoint.
    """
    if iters <= 0:
        raise ValueError("iters must be positive")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.select("v", F.lit(0).cast("long").alias("rank"))
    unit = scale // n
    base = ((damping_den - damping_num) * unit) // damping_den
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-edges annotated with out-degree, persisted once: every
    # iteration's join re-reads this exchange instead of re-shuffling.
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    dangling = None
    if redistribute_dangling:
        dangling = verts.join(
            deg.select(F.col("src").alias("v")), "v", "left_anti"
        ).localCheckpoint(eager=True)
    ranks = verts.select("v", F.lit(unit).cast("long").alias("rank"))
    for _ in range(iters):
        share = 0
        if dangling is not None:
            dmass = ranks.join(dangling, "v").agg(F.sum("rank")).first()[0]
            share = int(dmass or 0) // n
        contrib = (
            ed.join(ranks.select(F.col("v").alias("src"), "rank"), "src")
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            verts.join(contrib.select(F.col("dst").alias("v"), "s"), "v", "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(s, 0L) + {share})) "
                        f"div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def aggregate_anchor_text(
    edges: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
) -> DataFrame:
    """Inbound anchor-text aggregation: the classic query-independent
    document signal (how the web describes a page). For every link
    target, compute in-link count, distinct anchor phrases, and the
    dominant phrase with its frequency.

    Ties on frequency break by ascending phrase text, so the result is
    deterministic and replayable. Scale shape: partial-agg groupBy on
    (dst, anchor) collapses duplicate phrases map-side (anchor text is
    heavily repeated — 'click here' etc.), then a window rank over the
    collapsed per-phrase counts keyed by dst; the groupBy-(dst) rollup
    reuses the window's dst partitioning. No collect, no explode of raw
    in-links past the first partial agg.

    Returns (dst, n_inlinks, n_anchors, top_anchor, top_count).
    """
    from pyspark.sql.window import Window

    per = (
        edges.select(F.col(dst).alias("dst"), F.col(anchor).alias("anchor"))
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    ranked = per.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("dst")
        .agg(
            F.sum("cnt").alias("n_inlinks"),
            F.count(F.lit(1)).alias("n_anchors"),
            F.max(F.when(F.col("rk") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("rk") == 1, F.col("cnt"))).alias("top_count"),
        )
    )


def cluster_representatives(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Apply near-dup clustering to a corpus: every document gains a
    ``cluster`` column (its component's min id; singletons cluster with
    themselves) and a ``is_representative`` flag (true on the one kept
    copy per cluster — the min id, the same deterministic argmin rule
    as drop_duplicate_paragraphs). Filter on the flag to dedup."""
    comp = connected_components(edges, src=src, dst=dst, max_iters=max_iters)
    out = docs.join(
        comp.select(F.col("v").alias(id_col), "cluster"), id_col, "left"
    ).withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
    return out.withColumn("is_representative", F.col("cluster") == F.col(id_col))


def hits_fixedpoint(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**9,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM'99) in EXACT integer
    arithmetic — the complement of PageRank for crawl link analysis:
    authorities are the pages good hubs point AT (fetch-priority
    candidates), hubs are the link pages worth re-parsing for discovery.

    Integer doctrine (same as pagerank_fixedpoint / opic): both vectors
    start at ``scale DIV n``; each iteration

        auth'(v) = sum over in-edges  of hub(u)
        then L1-renormalize: auth''(v) = auth'(v) * scale DIV sum(auth')
        hub'(v)  = sum over out-edges of auth''(w), renormalized the same

    Sums and DIVs are order-independent, so results are bit-identical
    across partitionings and SQL-replayable (the ``hits_scores``
    oracle). ``scale`` defaults to 10^9 (not 10^12) because the
    renormalization multiplies a partial sum (bounded by scale *
    max-degree) by ``scale`` before the DIV — at 10^9 the product stays
    under int64 for degrees up to ~9e18/1e18; keep scale^2 * maxdeg
    within int64 if you raise it. The normalization total is a 1-row
    aggregate per half-iteration that stays in the dataflow (broadcast
    crossJoin — never a driver collect, never an O(rows) pull).

    Scale shape per iteration: two hash joins (hub->in-edges,
    auth->out-edges) + two groupBy-sums with map-side partials + two
    broadcast 1-row aggs; ``localCheckpoint`` keeps the plan O(1) deep.

    Returns (v, auth: long, hub: long).
    """
    if iters <= 0:
        raise ValueError("iters must be positive")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.select(
            "v",
            F.lit(0).cast("long").alias("auth"),
            F.lit(0).cast("long").alias("hub"),
        )
    ed = e.localCheckpoint(eager=True)
    unit = int(scale) // n
    state = verts.select(
        "v",
        F.lit(unit).cast("long").alias("auth"),
        F.lit(unit).cast("long").alias("hub"),
    ).localCheckpoint(eager=True)

    def _spread(vec: DataFrame, val: str, edge_key: str, out_key: str) -> DataFrame:
        """sum vec[val] over edges grouped by the other endpoint, then
        L1-renormalize to total ``scale`` (x * scale div total).

        The normalization total stays IN the dataflow: a 1-row aggregate
        broadcast back via crossJoin — no driver action, so each
        half-iteration is as lazy as pagerank's update and the eager
        localCheckpoint on the caller's side remains the only
        materialization point (two fewer jobs per iteration than the
        collect() formulation)."""
        raw = (
            vec.select(F.col("v").alias(edge_key), F.col(val))
            .join(ed, edge_key)
            .groupBy(F.col(out_key).alias("v"))
            .agg(F.sum(val).alias("_s"))
        )
        total = raw.agg(F.coalesce(F.sum("_s"), F.lit(0)).alias("_t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "v",
            F.when(F.col("_t") == 0, F.lit(0))
            .otherwise(F.expr(f"_s * {int(scale)}L div _t"))
            .cast("long")
            .alias(val),
        )

    for _ in range(iters):
        new_auth = _spread(state.select("v", "hub"), "hub", "src", "dst") \
            .withColumnRenamed("hub", "auth")
        state = (
            verts.join(new_auth, "v", "left")
            .select("v", F.coalesce(F.col("auth"), F.lit(0)).alias("auth"))
            .localCheckpoint(eager=True)
        )
        new_hub = _spread(state.select("v", "auth"), "auth", "dst", "src") \
            .withColumnRenamed("auth", "hub")
        state = (
            state.join(new_hub, "v", "left")
            .select(
                "v", "auth", F.coalesce(F.col("hub"), F.lit(0)).alias("hub")
            )
            .localCheckpoint(eager=True)
        )
    return state.select("v", "auth", "hub")


def trustrank_fixedpoint(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "v",
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """TrustRank (Gyongyi/Garcia-Molina/Pedersen, VLDB'04): PageRank
    with the teleport vector restricted to a trusted seed set — the
    standard spam-demotion signal for crawl frontier ordering (spam
    farms inflate plain PageRank; trust only flows OUT of
    human-vetted seeds, so unreachable link farms score 0).

    Same exact-integer doctrine as pagerank_fixedpoint: seed mass
    ``scale DIV s`` (s = seed vertices present in the graph), update

        trust'(v) = [v in seeds] * ((den-num) * (scale DIV s)) DIV den
                  + (num * sum_in(trust DIV out_degree)) DIV den

    — all BIGINT, order-independent, bit-identical across
    partitionings and replayed exactly by the ``trustrank`` SQL
    oracle. Non-seed vertices with no in-path from a seed stay exactly
    0 (the spam-isolation property the float formulation only
    approaches asymptotically).

    Scale shape per iteration: identical to pagerank (one ranks->edges
    hash join + one combinable groupBy-sum); the seed base term is a
    pre-joined column on the persisted vertex list, so it adds no
    per-iteration shuffle. Dangling mass leaks (standard).

    Returns (v, trust: long) with one row per distinct endpoint.
    """
    if iters <= 0:
        raise ValueError("iters must be positive")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sd = (
        seeds.select(F.col(seed_col).alias("v"))
        .distinct()
        .join(verts, "v")
        .localCheckpoint(eager=True)
    )
    s = sd.count()
    if s == 0:
        raise ValueError("no seed vertices present in the graph")
    unit = scale // s
    sbase = ((damping_den - damping_num) * unit) // damping_den
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    # vertex list with the per-vertex teleport base folded in once —
    # iterations never re-join the seed set
    vb = (
        verts.join(sd.select("v", F.lit(True).alias("_sd")), "v", "left")
        .select(
            "v",
            F.when(F.col("_sd"), F.lit(sbase))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("tbase"),
            F.when(F.col("_sd"), F.lit(unit))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("t0"),
        )
        .localCheckpoint(eager=True)
    )
    trust = vb.select("v", F.col("t0").alias("trust"))
    for _ in range(iters):
        contrib = (
            ed.join(trust.select(F.col("v").alias("src"), "trust"), "src")
            .select("dst", F.expr("trust div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        trust = (
            vb.join(contrib.select(F.col("dst").alias("v"), "s"), "v", "left")
            .select(
                "v",
                (
                    F.col("tbase")
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                    )
                ).cast("long").alias("trust"),
            )
            .localCheckpoint(eager=True)
        )
    return trust.select("v", "trust")


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "v",
    group_col: str = "group",
    drop_self_loops: bool = True,
    broadcast_mapping: bool = True,
) -> DataFrame:
    """Contract a vertex graph onto groups (page graph -> HOST graph,
    the standard domain-authority projection: inter-site links carry
    the trust signal, intra-site links are navigation noise).

    Multi-edges are PRESERVED (one output row per surviving input
    edge), so feeding the result to pagerank_fixedpoint /
    trustrank_fixedpoint yields the naturally link-count-weighted
    group-level rank with no weighted-update variant needed.

    Scale shape: two equi-joins of the edge list against the mapping —
    broadcast by default (the group map is #vertices rows but tiny per
    partition after projection; at web scale host maps are ~1e7 rows,
    still broadcastable at ~100 MB, else flip ``broadcast_mapping``)
    — plus an optional self-loop filter. Map-side only when broadcast:
    zero shuffle.

    Returns (src, dst) in group space.
    """
    m = mapping.select(F.col(vertex_col).alias("_mv"), F.col(group_col).alias("_mg"))
    if broadcast_mapping:
        m = F.broadcast(m)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    out = (
        e.join(m, e["src"] == m["_mv"], "inner")
        .select(F.col("_mg").alias("gsrc"), "dst")
        .join(m, F.col("dst") == m["_mv"], "inner")
        .select(F.col("gsrc").alias("src"), F.col("_mg").alias("dst"))
    )
    if drop_self_loops:
        out = out.where(F.col("src") != F.col("dst"))
    return out


def link_reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-vertex link reciprocity: what fraction of a vertex's
    distinct out-links point at vertices that link straight back.

    Reciprocity is the classic link-exchange signal (Gyongyi &
    Garcia-Molina, "Web Spam Taxonomy", AIRWeb 2005 — link farms are
    near-cliques, so their reciprocity saturates; editorial linking on
    the open web is overwhelmingly one-directional). Output columns:
    ``v, out_deg, reciprocated, recip_x`` where ``recip_x`` is the
    fraction in exact ``scale`` fixed point (truncating div — no float,
    replayable and partition-order-independent).

    Scale shape: distinct directed pairs (one partial-agg shuffle),
    then ONE self equi-join on the reversed key — both sides share the
    same (src,dst)-hash partitioning profile, no broadcast needed and
    no skew beyond the graph's own degree skew (cap with a prior
    per-host out-degree limit if a vertex's degree explodes) — then a
    combinable groupBy(src). Never O(V^2): only existing edges join.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct()
    rev = e.select(F.col("dst").alias("r_src"), F.col("src").alias("r_dst"))
    back = (
        e.join(rev, (e["src"] == rev["r_src"]) & (e["dst"] == rev["r_dst"]), "left")
        .select("src", "dst", F.col("r_src").isNotNull().alias("_has_back"))
    )
    agg = back.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("out_deg"),
        F.sum(F.col("_has_back").cast("long")).alias("reciprocated"),
    )
    return agg.select(
        "v",
        "out_deg",
        "reciprocated",
        F.expr(f"(reciprocated * {scale}) div out_deg").alias("recip_x"),
    )


def detect_link_farms(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_out_deg: int = 3,
    min_recip_x: int = 800_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Flag link-farm candidates: vertices with at least
    ``min_out_deg`` distinct out-links whose reciprocity clears
    ``min_recip_x`` (fixed-point on ``scale``; default 0.8). Thresholds
    are integer compares on `link_reciprocity`'s exact output — the
    flag set is deterministic and SQL-replayable. Downstream, feed the
    flagged set to trustrank_fixedpoint as a demotion list (the two
    signals are independent: TrustRank needs a seed whitelist,
    reciprocity needs none).
    """
    if min_out_deg < 1:
        raise ValueError("min_out_deg must be >= 1")
    if not (0 <= min_recip_x <= scale):
        raise ValueError("min_recip_x must be within [0, scale]")
    r = link_reciprocity(edges, src=src, dst=dst, scale=scale)
    return r.where(
        (F.col("out_deg") >= min_out_deg) & (F.col("recip_x") >= min_recip_x)
    )


def cocitation_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_out_degree: int = 100,
    min_common: int = 2,
) -> DataFrame:
    """Co-citation related-page discovery: pages (a, b) are related
    with strength = the number of distinct documents that link to BOTH
    (Small 1973; the classic link-based "related pages" signal, dual
    of bibliographic coupling). Returns ``a, b, common`` with a < b
    (canonical pair order) and ``common >= min_common``.

    Scale shape: pair generation is a self equi-join on the CITING
    document, which is quadratic in each citer's out-degree — so
    citers with more than ``max_out_degree`` distinct out-links are
    dropped first (the standard mitigation: a mega-hub citing 10k
    pages asserts ~5*10^7 near-meaningless pairs and would dominate
    both the shuffle and the semantics; degree-capping is a semantic
    choice, documented, not just an optimization). After the cap the
    join output is bounded by sum(deg^2) <= citers * max_out_degree^2,
    then ONE combinable groupBy on the (a, b) pair.
    """
    if max_out_degree < 2:
        raise ValueError("max_out_degree must be >= 2")
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    kept = e.join(
        deg.where(F.col("_deg") <= max_out_degree).select("src"), "src"
    )
    r = kept.select(F.col("src"), F.col("dst").alias("_dst2"))
    pairs = kept.join(r, "src").where(F.col("dst") < F.col("_dst2"))
    return (
        pairs.groupBy(F.col("dst").alias("a"), F.col("_dst2").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
