"""Snapshot-expiry disk evidence: bounded checkpoint history.

Every crawl round commits one immutable snapshot per state table
(frontier/seen/fetched/metrics/host_state/host_counts); without GC the
workdir grows with the FULL history — at the design point one frontier
copy per round forever. `Crawler.expire_history(retain_last=2)` keeps
the live state plus one resume point and collects everything else.

This script runs the same multi-round synthetic crawl twice — once
without expiry, once expiring after every round — and records the
workdir's on-disk bytes per round. Bytes are contention-immune, so the
run is valid in any host window. Expected shape: the no-GC curve grows
superlinearly in rounds (each frontier overwrite strands the previous
copy); the GC curve tracks the LIVE table size (seen/fetched grow —
they accumulate real state — but stranded history does not).

Usage:  PYTHONPATH=/root/repo python scripts/expiry_disk_evidence.py \
            [--rounds 8] [--per-round 100000] [--cpus 16]
Emits one JSON line per (mode, round) and a summary; paste into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def du_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def run(mode: str, rounds: int, per_round: int, cpus: int) -> list[dict]:
    from pyspark.sql import functions as F

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.datagen import gen_frontier_seeds
    from sinew_spark.operators.frontier import prepare_frontier
    from sinew_spark.session import get_spark
    from sinew_spark.sources.fetch import FixtureFetcher

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"sinew-expiry-evidence-{mode}",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "12g"},
    )
    workdir = tempfile.mkdtemp(prefix=f"sinew_expiry_{mode}_")
    out = []
    try:
        opts = CrawlOptions(
            rate_limit=0.0,
            retries=0,
            per_host_cap=None,
            max_rounds=1,
            bloom_capacity=max(per_round * (rounds + 1), 2_000_000),
        )
        fetcher = FixtureFetcher(
            seed=42, synthetic=True, synthetic_links=0, synthetic_hosts=500
        )
        c = Crawler(spark, workdir, fetcher, opts)
        for rnd in range(rounds):
            seeds = gen_frontier_seeds(
                spark, per_round, n_hosts=500, hot_frac=0.2, dup_frac=0.0
            ).withColumn(
                "url", F.concat(F.col("url"), F.lit(f"&r={rnd}"))
            )
            c.frontier_t.overwrite(
                prepare_frontier(seeds, c.canonicalize), {"op": f"seed{rnd}"}
            )
            t0 = time.time()
            c.run_round()
            sec = round(time.time() - t0, 2)
            if mode == "gc":
                c.expire_history(retain_last=2)
            rec = {
                "mode": mode,
                "round": rnd,
                "sec": sec,
                "workdir_mb": round(du_bytes(workdir) / 1e6, 1),
                "fetched_total": c.fetched_t.approx_rows(),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        # GC'd history must still resume: re-seed 1k dups -> 0 selected
        dup = gen_frontier_seeds(
            spark, 1000, n_hosts=500, hot_frac=0.2, dup_frac=0.0
        ).withColumn("url", F.concat(F.col("url"), F.lit("&r=0")))
        c.frontier_t.overwrite(
            prepare_frontier(dup, c.canonicalize), {"op": "dupcheck"}
        )
        stats = c.run_round()
        print(
            json.dumps(
                {"mode": mode, "exactly_once_dup_selected": stats["selected"]}
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--per-round", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()
    nogc = run("nogc", args.rounds, args.per_round, args.cpus)
    gc = run("gc", args.rounds, args.per_round, args.cpus)
    print(
        json.dumps(
            {
                "summary": "final workdir MB",
                "rounds": args.rounds,
                "per_round": args.per_round,
                "nogc_mb": nogc[-1]["workdir_mb"],
                "gc_mb": gc[-1]["workdir_mb"],
                "ratio": round(nogc[-1]["workdir_mb"] / gc[-1]["workdir_mb"], 2)
                if gc[-1]["workdir_mb"]
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
