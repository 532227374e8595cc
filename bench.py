#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "frontier_urls_per_sec": ..., "crawl_urls": ...}

--crawl-only N   : run only the crawl throughput benchmark with N seed URLs
                   (used by --scaling subprocesses)
--scaling        : run the crawl benchmark at local[8] and local[32] in
                   separate JVMs (same input), print both throughputs +
                   scaling efficiency, and update BENCH.md
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_N = int(os.environ.get("SINEW_BENCH_CRAWL_N", "100000"))


def get_spark(cpus: int):
    os.environ.setdefault("PYTHONPATH", REPO)
    from sinew_spark.session import get_spark as gs

    return gs(
        master=f"local[{cpus}]",
        app_name="sinew-bench",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "16g", "spark.sql.files.maxPartitionBytes": "64m"},
    )


def crawl_benchmark(spark, n_urls: int) -> dict:
    """Frontier throughput: URLs fetched+deduped+parsed+committed per second
    on the synthetic seed crawl (BASELINE.json metric). Includes the full
    round pipeline: canonicalize, key, round-dedup, bloom+anti-join, per-host
    cap, per-host fetch groups, span parse, snapshot commits."""
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.datagen import gen_frontier_seeds
    from sinew_spark.operators.frontier import prepare_frontier
    from sinew_spark.sources.fetch import FixtureFetcher

    workdir = tempfile.mkdtemp(prefix="sinew_bench_")
    try:
        opts = CrawlOptions(
            rate_limit=0.0,
            retries=0,
            per_host_cap=10_000_000,
            max_rounds=1,
            bloom_capacity=max(n_urls * 2, 1_000_000),
        )
        fetcher = FixtureFetcher(seed=42, synthetic=True, synthetic_links=6, synthetic_hosts=1000)
        c = Crawler(spark, workdir, fetcher, opts)
        seeds = gen_frontier_seeds(spark, n_urls, n_hosts=1000, hot_frac=0.2, dup_frac=0.2)
        prepared = prepare_frontier(seeds, c.canonicalize)
        t0 = time.time()
        c.frontier_t.overwrite(prepared, {"op": "seed", "n": n_urls})
        stats = c.run_round()
        elapsed = time.time() - t0
        return {
            "crawl_urls": n_urls,
            "crawl_fetched": stats["fetched"],
            "crawl_sec": round(elapsed, 3),
            "frontier_urls_per_sec": round(n_urls / elapsed, 1),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def headline_queries(spark) -> dict:
    import __spark_entry__ as em

    qs = em.queries()
    names = [
        "canonicalize_urls",
        "request_identity",
        "seen_antijoin",
        "per_host_cap",
        "robots_gate",
        "normalize_ascii",
        "token_count",
        "quality_score",
        "lang_id",
        "fingerprint",
        "dedup_exact",
        "dedup_minhash",
        "dedup_simhash",
        "ann_cosine_topk",
        "embedding_neardup",
        "pricing_summary",
        "top_orders_per_customer",
        "events_hourly",
        "join_star",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def main():
    if "--crawl-only" in sys.argv:
        n = int(sys.argv[sys.argv.index("--crawl-only") + 1])
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv else CPUS
        spark = get_spark(cpus)
        crawl_benchmark(spark, max(n // 10, 1000))  # warmup: JVM/codegen/page cache
        res = crawl_benchmark(spark, n)
        res["cpus"] = cpus
        print(json.dumps(res))
        spark.stop()
        return

    if "--scaling" in sys.argv:
        n = CRAWL_N
        results = {}
        for cpus in (8, 32):
            p = subprocess.run(
                [sys.executable, __file__, "--crawl-only", str(n), "--cpus", str(cpus)],
                capture_output=True,
                text=True,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        t8 = results[8]["frontier_urls_per_sec"]
        t32 = results[32]["frontier_urls_per_sec"]
        eff = t32 / (4 * t8)
        report = {
            "crawl_urls": n,
            "throughput_local8": t8,
            "throughput_local32": t32,
            "sec_local8": results[8]["crawl_sec"],
            "sec_local32": results[32]["crawl_sec"],
            "scaling_efficiency_8_to_32": round(eff, 3),
        }
        print(json.dumps(report))
        _write_bench_md(report)
        return

    spark = get_spark(CPUS)
    queries = headline_queries(spark)
    crawl = crawl_benchmark(spark, CRAWL_N)
    total = round(sum(queries.values()) + crawl["crawl_sec"], 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline suite wall time (crawl throughput + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": {**queries, "crawl_100k": crawl["crawl_sec"]},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **crawl,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


def _write_bench_md(report: dict) -> None:
    path = os.path.join(REPO, "BENCH.md")
    lines = [
        "# BENCH — two-parallelism scaling evidence",
        "",
        "Same job, same input, only parallelism varies (the in-sandbox stand-in",
        "for N vs 4N executors; see BASELINE.md). Crawl benchmark: synthetic",
        f"seed crawl of {report['crawl_urls']} URLs over 1000 hosts (20% hot-host",
        "skew, 20% duplicate URLs), full round pipeline: canonicalize -> key ->",
        "dedup -> bloom+anti-join -> per-host cap -> fetch groups -> span parse",
        "-> snapshot commits.",
        "",
        "| parallelism | wall sec | URLs/sec |",
        "|---|---|---|",
        f"| local[8] (N) | {report['sec_local8']} | {report['throughput_local8']} |",
        f"| local[32] (4N) | {report['sec_local32']} | {report['throughput_local32']} |",
        "",
        f"**Scaling efficiency (N -> 4N): {report['scaling_efficiency_8_to_32']}**",
        "(target >= 0.8 per BASELINE.json north_rule)",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
