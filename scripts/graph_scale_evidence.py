"""Scale-curve evidence for the iterative graph family (VERDICT r4 #3).

Claim under test: every iterative graph operator here is one equi-join +
one combinable aggregate per round with localCheckpoint lineage
truncation — so the MARGINAL cost of round k is flat in k (no lineage
blow-up, no state growth), and total wall scales ~linearly in edges.

Method: synthetic deterministic graphs at --edges (default 20M);
per-round marginals measured by differencing full runs at increasing
round counts (t(k) - t(k-1) — honest, includes everything); plus a
quarter-size leg for the edges-scaling ratio.

Run:  python scripts/graph_scale_evidence.py [--edges 20000000]
Emits one JSON line per measurement and a summary table on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_spark(cpus: int) -> SparkSession:
    # deliberately NOT sinew_spark.session.get_spark: this measurement
    # pins its own driver heap (48g — the 20M-edge register state) and
    # must stay insulated from library session-default changes so old
    # and new evidence runs remain comparable
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("graph-scale-evidence")
        .getOrCreate()
    )


def steal_sec() -> float:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def make_edges(spark, n_edges: int):
    """Deterministic uniform-ish digraph with a mild popular-set skew:
    90% uniform over V = E/4 vertices, 10% into a 1k hot set."""
    v = max(n_edges // 4, 1000)
    e = (
        spark.range(n_edges)
        .select(
            (F.xxhash64(F.col("id"), F.lit(1)) % v).alias("src"),
            F.when(
                F.col("id") % 10 == 0, F.xxhash64(F.col("id"), F.lit(2)) % 1000
            )
            .otherwise(F.xxhash64(F.col("id"), F.lit(3)) % v)
            .alias("dst"),
        )
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
    )
    return e.localCheckpoint(eager=True)


def make_chains(spark, n_rows: int, chain_len: int = 16):
    """Redirect map: disjoint chains of length `chain_len`; the last hop
    exits the domain (negative id)."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("src"),
            F.when((F.col("id") + 1) % chain_len != 0, F.col("id") + 1)
            .otherwise(-(F.col("id") + 1))
            .alias("dst"),
        )
        .localCheckpoint(eager=True)
    )


def timed(fn) -> tuple[float, float, int]:
    s0, t0 = steal_sec(), time.time()
    n = fn()
    return time.time() - t0, steal_sec() - s0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--ops", default="pagerank,hits,trustrank,lpa,anf,kcore,chains")
    ap.add_argument(
        "--one", action="store_true",
        help="run the given --ops/--edges in THIS process (child mode)",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    if not args.one:
        # orchestrator: one subprocess per (op, size) — localCheckpoint
        # blocks from one measurement can never pressure the next (py4j
        # refs pin them until a Python GC, which OOM'd a single-session
        # run of the full matrix at 20M edges)
        import subprocess

        lines = []
        for n_edges in (args.edges // 4, args.edges):
            for op in args.ops.split(","):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one",
                     "--ops", op, "--edges", str(n_edges), "--cpus", str(args.cpus)],
                    capture_output=True, text=True,
                    env={**os.environ, "PYTHONPATH": REPO},
                )
                for ln in p.stdout.splitlines():
                    if ln.startswith("{"):
                        print(ln, flush=True)
                        lines.append(json.loads(ln))
                if p.returncode != 0:
                    print(json.dumps({"op": op, "edges": n_edges,
                                      "error": p.stderr.strip()[-400:]}), flush=True)
        _summary(lines)
        return

    spark = get_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from sinew_spark.operators.anf import neighborhood_function
    from sinew_spark.operators.chains import resolve_redirect_chains
    from sinew_spark.operators.community import label_propagation
    from sinew_spark.operators.graph import (
        hits_fixedpoint,
        pagerank_fixedpoint,
        trustrank_fixedpoint,
    )
    from sinew_spark.operators.kcore import kcore_vertices

    results = []

    def record(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    for n_edges in (args.edges,):
        e = make_edges(spark, n_edges)
        e_cnt = e.count()
        seeds = (
            e.select(F.col("src").alias("v")).where(F.col("v") % 1000 == 0).distinct()
            .localCheckpoint(eager=True)
        )

        def curve(op, fn, ks):
            walls = {}
            for k in ks:
                w, st, n = timed(lambda k=k: fn(k).count())
                walls[k] = w
                record(op=op, edges=e_cnt, rounds=k, wall_s=round(w, 2),
                       steal_s=round(st, 1), rows=n)
            ks_sorted = sorted(ks)
            marg = [
                round(walls[b] - walls[a], 2)
                for a, b in zip(ks_sorted, ks_sorted[1:])
            ]
            record(op=op, edges=e_cnt, marginal_per_round_s=marg)

        if "pagerank" in ops:
            curve("pagerank", lambda k: pagerank_fixedpoint(e, iters=k), (1, 2, 3, 4))
        if "hits" in ops:
            curve("hits", lambda k: hits_fixedpoint(e, iters=k), (1, 2, 3))
        if "trustrank" in ops:
            curve("trustrank", lambda k: trustrank_fixedpoint(e, seeds, iters=k), (1, 2, 3, 4))
        if "lpa" in ops:
            curve("lpa", lambda k: label_propagation(e, rounds=k), (1, 2, 3))
        if "anf" in ops:
            # p=4 (16 registers): the per-radius sketch state is
            # #vertices x m rows — p=5 at 20M edges held ~3 radii of
            # 160M-row checkpoints live in one session and OOM'd 48g
            curve("anf", lambda k: neighborhood_function(e, rounds=k, p=4), (1, 2, 3))
        if "kcore" in ops:
            w, st, n = timed(lambda: kcore_vertices(e, k=3).count())
            record(op="kcore", edges=e_cnt, wall_s=round(w, 2), steal_s=round(st, 1),
                   core_rows=n)
        if "chains" in ops:
            c = make_chains(spark, n_edges // 2)
            c_cnt = c.count()
            w, st, n = timed(lambda: resolve_redirect_chains(c).count())
            record(op="redirect_chains", edges=c_cnt, wall_s=round(w, 2),
                   steal_s=round(st, 1), rows=n,
                   note="chain len 16 -> resolves in ~5 doubling rounds (early break)")
        e.unpersist()


def _summary(results: list) -> None:
    """Edges-scaling ratio per op (small -> large leg)."""
    print("\n== edges-scaling (wall ratio at 4x edges; flat per-edge cost == ~4) ==")
    by_op: dict = {}
    for r in results:
        if "wall_s" in r:
            key = (r["op"], r.get("rounds"))
            by_op.setdefault(key, []).append((r["edges"], r["wall_s"]))
    for (op, rounds), legs in sorted(by_op.items(), key=lambda x: (x[0][0], x[0][1] or 0)):
        if len(legs) == 2:
            (e1, w1), (e2, w2) = sorted(legs)
            print(f"{op:16s} rounds={rounds}  {e1}e {w1:.1f}s -> {e2}e {w2:.1f}s  "
                  f"ratio {w2 / w1:.2f} (edges x{e2 / e1:.1f})")


if __name__ == "__main__":
    main()
