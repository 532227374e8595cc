#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north rule: launched via
``spark-submit --py-files sinew_spark.zip`` on multi-executor clusters).

Build the artifact and submit:

    python -c "from sinew_spark.session import package_zip; print(package_zip('.'))"
    spark-submit --master local[8] --py-files sinew_spark.zip \
        scripts/submit_crawl.py --workdir /tmp/crawl --seeds 10000 --rounds 1

On a real cluster, replace ``--master`` with the cluster master and size
``--shuffle-partitions`` to ~2-3x total executor cores. The job is
idempotent/resumable: re-submitting with the same --workdir continues from
the last committed snapshot (the frontier/seen tables ARE the checkpoint).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True, help="crawl state dir (shared fs / object store)")
    ap.add_argument("--seeds", type=int, default=10_000, help="synthetic seed count (0 = resume only)")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--hosts", type=int, default=1000)
    ap.add_argument("--per-host-cap", type=int, default=10_000_000)
    ap.add_argument("--rate-limit", type=float, default=0.0)
    ap.add_argument("--follow-links", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    b = (
        SparkSession.builder.appName("sinew-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.datagen import gen_frontier_seeds
    from sinew_spark.operators.frontier import prepare_frontier
    from sinew_spark.sources.fetch import FixtureFetcher

    opts = CrawlOptions(
        rate_limit=args.rate_limit,
        retries=0,
        per_host_cap=args.per_host_cap,
        max_rounds=args.rounds,
        follow_links=args.follow_links,
        bloom_capacity=max(args.seeds * 4, 1_000_000),
    )
    fetcher = FixtureFetcher(seed=42, synthetic=True, synthetic_links=6, synthetic_hosts=args.hosts)
    c = Crawler(spark, args.workdir, fetcher, opts)

    if args.seeds and c.frontier_t.current_snapshot() is None:
        seeds = gen_frontier_seeds(spark, args.seeds, n_hosts=args.hosts, hot_frac=0.2, dup_frac=0.2)
        c.frontier_t.overwrite(prepare_frontier(seeds, c.canonicalize), {"op": "seed", "n": args.seeds})

    stats = c.run(max_rounds=args.rounds)
    print(json.dumps({"rounds": stats}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
