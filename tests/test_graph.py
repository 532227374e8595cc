"""Connected components / dedup clusters (operators/graph.py):
brute-force union-find equivalence, convergence behavior, and the
representative rule."""

import random

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.graph import (
    cluster_representatives,
    connected_components,
    connected_components_star,
    pagerank_fixedpoint,
)


def _uf_components(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    rng = random.Random(5)
    edges = list({(rng.randrange(200), rng.randrange(200)) for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    got = {r.v: r.cluster for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_connected_components_chain_and_ring(spark):
    # a 10-chain, a 6-ring, and an isolated pair — all collapse to min id
    chain = [(i, i + 1) for i in range(10)]
    ring = [(100 + i, 100 + (i + 1) % 6) for i in range(6)]
    pair = [(500, 501)]
    df = spark.createDataFrame(chain + ring + pair, "src long, dst long")
    got = {r.v: r.cluster for r in connected_components(df).collect()}
    assert all(got[v] == 0 for v in range(11))
    assert all(got[100 + i] == 100 for i in range(6))
    assert got[500] == got[501] == 500


def test_connected_components_cap_degrades_to_star(spark):
    # a 30-path needs 30 propagation rounds; capping at 2 must auto-switch
    # to star contraction and still produce the exact min-id labelling
    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "src long, dst long")
    got = {r.v: r.cluster for r in connected_components(df, max_iters=2).collect()}
    assert got == {v: 0 for v in range(31)}
    with pytest.raises(ValueError):
        connected_components(df, max_iters=0)


def test_star_contraction_matches_union_find(spark):
    rng = random.Random(29)
    edges = list({(rng.randrange(120), rng.randrange(120)) for _ in range(90)})
    df = spark.createDataFrame(edges, "src long, dst long").repartition(6)
    got = {r.v: r.cluster for r in connected_components_star(df).collect()}
    assert got == _uf_components(edges)


def test_star_contraction_adversarial_path(spark):
    # 200-node path: diameter 200, star contraction must land in O(log n)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    ).repartition(8)
    got = {r.v: r.cluster for r in connected_components_star(df).collect()}
    assert got == {v: 0 for v in range(201)}


def _pagerank_bruteforce(
    edges, iters, num=85, den=100, scale=10**12, redistribute=False
):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    unit = scale // n
    base = ((den - num) * unit) // den
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    # Spark's `div` truncates toward zero; Python // floors. Ranks stay
    # non-negative here so the two agree, but keep the guard explicit.
    ranks = {v: unit for v in verts}
    for _ in range(iters):
        share = 0
        if redistribute:
            share = sum(r for v, r in ranks.items() if v not in deg) // n
        s = {v: 0 for v in verts}
        for a, b in edges:
            assert ranks[a] >= 0
            s[b] += ranks[a] // deg[a]
        ranks = {v: base + (num * (s[v] + share)) // den for v in verts}
    return ranks


def test_pagerank_matches_bruteforce_exactly(spark):
    rng = random.Random(11)
    # multigraph with self-loops and dangling vertices (in-only nodes)
    edges = [(rng.randrange(60), rng.randrange(80)) for _ in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    got = {r.v: r.rank for r in pagerank_fixedpoint(df, iters=4).collect()}
    assert got == _pagerank_bruteforce(edges, 4)


def test_pagerank_bit_identical_across_partitionings(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    a = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    b = spark.createDataFrame(list(reversed(edges)), "src long, dst long").repartition(17)
    ra = sorted((r.v, r.rank) for r in pagerank_fixedpoint(a, iters=5).collect())
    rb = sorted((r.v, r.rank) for r in pagerank_fixedpoint(b, iters=5).collect())
    assert ra == rb


def test_pagerank_hub_ranks_highest(spark):
    # star: every spoke points at vertex 0 -> 0 collects all damped mass
    edges = [(i, 0) for i in range(1, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.v: r.rank for r in pagerank_fixedpoint(df, iters=3).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 10 * ranks[1]
    # mass never exceeds the scale budget (DIVs only leak downward)
    assert sum(ranks.values()) <= 10**12


def test_pagerank_dangling_redistribution_exact(spark):
    rng = random.Random(17)
    # heavy sinks: only src < 30 emit links, dst range 0..89 -> ~2/3 dangling
    edges = [(rng.randrange(30), rng.randrange(90)) for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    got = {
        r.v: r.rank
        for r in pagerank_fixedpoint(df, iters=4, redistribute_dangling=True).collect()
    }
    assert got == _pagerank_bruteforce(edges, 4, redistribute=True)
    # redistribution keeps strictly more mass in play than the leaky default
    leaky = pagerank_fixedpoint(df, iters=4).collect()
    assert sum(got.values()) > sum(r.rank for r in leaky)
    assert sum(got.values()) <= 10**12


def test_pagerank_dangling_bit_identical_across_partitionings(spark):
    rng = random.Random(19)
    edges = [(rng.randrange(25), rng.randrange(60)) for _ in range(120)]
    a = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    b = spark.createDataFrame(
        list(reversed(edges)), "src long, dst long"
    ).repartition(13)
    ra = sorted(
        (r.v, r.rank)
        for r in pagerank_fixedpoint(a, iters=5, redistribute_dangling=True).collect()
    )
    rb = sorted(
        (r.v, r.rank)
        for r in pagerank_fixedpoint(b, iters=5, redistribute_dangling=True).collect()
    )
    assert ra == rb


def test_pagerank_no_dangling_flag_is_noop(spark):
    # every vertex has out-edges -> flag must not change a single bit
    edges = [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 5) % 12) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ra = sorted((r.v, r.rank) for r in pagerank_fixedpoint(df, iters=3).collect())
    rb = sorted(
        (r.v, r.rank)
        for r in pagerank_fixedpoint(df, iters=3, redistribute_dangling=True).collect()
    )
    assert ra == rb


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixedpoint(df, iters=0)
    with pytest.raises(ValueError):
        pagerank_fixedpoint(df, damping_num=100, damping_den=100)


def test_cluster_representatives(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([(1, 3), (3, 5), (7, 8)], "a long, b long")
    out = {
        r.doc_id: (r.cluster, r.is_representative)
        for r in cluster_representatives(docs, edges).collect()
    }
    assert out[1] == (1, True) and out[3] == (1, False) and out[5] == (1, False)
    assert out[7] == (7, True) and out[8] == (7, False)
    # singletons are their own representative
    assert out[0] == (0, True) and out[9] == (9, True)
    kept = [d for d, (_, rep) in out.items() if rep]
    assert sorted(kept) == [0, 1, 2, 4, 6, 7, 9]


def _brute_hits(edges, iters, scale):
    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(verts)
    auth = {v: scale // n for v in verts}
    hub = {v: scale // n for v in verts}
    for _ in range(iters):
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[d] += hub[s]
        t = sum(raw.values())
        auth = {v: (raw[v] * scale // t if t else 0) for v in verts}
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[s] += auth[d]
        t = sum(raw.values())
        hub = {v: (raw[v] * scale // t if t else 0) for v in verts}
    return {v: (auth[v], hub[v]) for v in verts}


HITS_EDGES = [
    (0, 2), (1, 2), (3, 2),  # 2 is the authority
    (0, 4), (1, 4),
    (2, 5),                   # authority also links out
    (6, 0),                   # 0 receives too
]


def test_hits_matches_bruteforce(spark):
    from sinew_spark.operators.graph import hits_fixedpoint

    df = spark.createDataFrame(HITS_EDGES, "src long, dst long")
    got = {r.v: (r.auth, r.hub) for r in hits_fixedpoint(df, iters=3).collect()}
    assert got == _brute_hits(HITS_EDGES, 3, 10**9)
    # the heavily-pointed-at node is the top authority
    assert got[2][0] == max(a for a, _h in got.values())


def test_hits_bit_identical_across_partitionings(spark):
    from sinew_spark.operators.graph import hits_fixedpoint

    a = sorted(map(tuple, hits_fixedpoint(
        spark.createDataFrame(HITS_EDGES, "src long, dst long").repartition(1),
        iters=2).collect()))
    b = sorted(map(tuple, hits_fixedpoint(
        spark.createDataFrame(HITS_EDGES, "src long, dst long").repartition(5, "src"),
        iters=2).collect()))
    assert a == b


def _brute_trustrank(edges, seeds, iters, scale=10**12, num=85, den=100):
    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    sd = sorted(set(seeds) & set(verts))
    unit = scale // len(sd)
    sbase = (den - num) * unit // den
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    trust = {v: (unit if v in sd else 0) for v in verts}
    for _ in range(iters):
        inc = {v: 0 for v in verts}
        for s, d in edges:
            inc[d] += trust[s] // deg[s]
        trust = {
            v: (sbase if v in sd else 0) + num * inc[v] // den for v in verts
        }
    return trust


TRUST_EDGES = [
    (0, 1), (1, 2), (2, 0),   # trusted triangle (0 is the seed)
    (0, 3),                    # seed endorses 3
    (4, 5), (5, 4), (4, 3),   # spam farm 4<->5 pointing at 3
    (6, 6),                    # self-loop island
]


def test_trustrank_matches_bruteforce(spark):
    from sinew_spark.operators.graph import trustrank_fixedpoint

    df = spark.createDataFrame(TRUST_EDGES, "src long, dst long")
    sd = spark.createDataFrame([(0,)], "v long")
    got = {r.v: r.trust for r in trustrank_fixedpoint(df, sd, iters=4).collect()}
    assert got == _brute_trustrank(TRUST_EDGES, [0], 4)
    # spam farm unreachable from the seed scores exactly 0
    assert got[4] == 0 and got[5] == 0 and got[6] == 0
    # trust flowed out of the seed
    assert got[1] > 0 and got[3] > 0


def test_trustrank_bit_identical_across_partitionings(spark):
    from sinew_spark.operators.graph import trustrank_fixedpoint

    sd = spark.createDataFrame([(0,), (4,)], "v long")
    a = sorted(map(tuple, trustrank_fixedpoint(
        spark.createDataFrame(TRUST_EDGES, "src long, dst long").repartition(1),
        sd, iters=3).collect()))
    b = sorted(map(tuple, trustrank_fixedpoint(
        spark.createDataFrame(TRUST_EDGES, "src long, dst long").repartition(7, "dst"),
        sd, iters=3).collect()))
    assert a == b


def test_trustrank_seed_outside_graph_rejected(spark):
    import pytest as _pytest
    from sinew_spark.operators.graph import trustrank_fixedpoint

    df = spark.createDataFrame(TRUST_EDGES, "src long, dst long")
    with _pytest.raises(ValueError):
        trustrank_fixedpoint(df, spark.createDataFrame([(99,)], "v long"))


def test_contract_graph_host_projection(spark):
    from sinew_spark.operators.graph import contract_graph

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (2, 0)],
        "src long, dst long",
    )
    # groups: {0,1} -> 10, {2,3} -> 20
    mapping = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "v long, group long"
    )
    got = sorted(map(tuple, contract_graph(edges, mapping).collect()))
    # (0,1) intra-group dropped; (1,3) and (2,0)/(3,0) cross; multi-edges kept
    assert got == [(10, 20), (10, 20), (20, 10), (20, 10)]
    kept = contract_graph(edges, mapping, drop_self_loops=False)
    assert kept.count() == 6


def test_link_reciprocity_basic(spark):
    from sinew_spark.operators.graph import link_reciprocity

    # farm: a<->b, a<->c; editorial: a->x (no back); self-loop dropped;
    # duplicate edge counted once
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),
            ("a", "c"), ("c", "a"),
            ("a", "x"),
            ("a", "a"),
            ("a", "b"),  # dup
        ],
        "src string, dst string",
    )
    r = {row.v: (row.out_deg, row.reciprocated, row.recip_x)
         for row in link_reciprocity(edges).collect()}
    assert r["a"] == (3, 2, 666_666)  # truncating div, not rounded
    assert r["b"] == (1, 1, 1_000_000)
    assert r["c"] == (1, 1, 1_000_000)
    assert "x" not in r  # no out-links


def test_detect_link_farms_thresholds(spark):
    from sinew_spark.operators.graph import detect_link_farms

    # f1,f2,f3 form a reciprocal triangle (farm); e has 3 one-way links
    rows = []
    farm = ["f1", "f2", "f3"]
    for i in farm:
        for j in farm:
            if i != j:
                rows.append((i, j))
    rows += [("e", "p1"), ("e", "p2"), ("e", "p3"), ("p1", "q")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    flagged = {r.v for r in detect_link_farms(edges, min_out_deg=2).collect()}
    assert flagged == set(farm)
    # raise min_out_deg above farm degree -> nothing flagged
    assert detect_link_farms(edges, min_out_deg=5).count() == 0


def test_link_reciprocity_partitioning_invariant(spark):
    from sinew_spark.operators.graph import link_reciprocity

    random.seed(11)
    rows = [(f"v{random.randrange(20)}", f"v{random.randrange(20)}")
            for _ in range(200)]
    e = spark.createDataFrame(rows, "src string, dst string")
    a = sorted(tuple(r) for r in link_reciprocity(e.repartition(1)).collect())
    b = sorted(tuple(r) for r in link_reciprocity(e.repartition(13)).collect())
    assert a == b


def test_detect_link_farms_validation(spark):
    from sinew_spark.operators.graph import detect_link_farms

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        detect_link_farms(e, min_out_deg=0)
    with pytest.raises(ValueError):
        detect_link_farms(e, min_recip_x=2_000_000)


def test_cocitation_matches_bruteforce(spark):
    import itertools

    from sinew_spark.operators.graph import cocitation_pairs

    random.seed(5)
    rows = list({(f"s{random.randrange(12)}", f"t{random.randrange(8)}")
                 for _ in range(60)})
    e = spark.createDataFrame(rows, "src string, dst string")
    got = {(r.a, r.b): r.common
           for r in cocitation_pairs(e, min_common=1).collect()}
    # brute force
    outs = {}
    for s, d in rows:
        outs.setdefault(s, set()).add(d)
    expect = {}
    for s, ds in outs.items():
        for a, b in itertools.combinations(sorted(ds), 2):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    assert got == expect


def test_cocitation_degree_cap_drops_hub(spark):
    from sinew_spark.operators.graph import cocitation_pairs

    rows = [("hub", f"t{i}") for i in range(10)]
    rows += [("x", "t0"), ("x", "t1"), ("y", "t0"), ("y", "t1")]
    e = spark.createDataFrame(rows, "src string, dst string")
    got = {(r.a, r.b): r.common
           for r in cocitation_pairs(e, max_out_degree=5, min_common=1).collect()}
    # hub excluded: only x and y contribute
    assert got == {("t0", "t1"): 2}


def test_cocitation_min_common_and_canonical_order(spark):
    from sinew_spark.operators.graph import cocitation_pairs

    rows = [("s1", "b"), ("s1", "a"), ("s2", "a"), ("s2", "b"), ("s3", "a"),
            ("s3", "c")]
    e = spark.createDataFrame(rows, "src string, dst string")
    out = cocitation_pairs(e, min_common=2).collect()
    assert [(r.a, r.b, r.common) for r in out] == [("a", "b", 2)]
