"""Crawl-trap detection (operators/traps.py) and anchor-text
aggregation (operators/graph.py): signal-by-signal behavior, pruning,
and plan shape."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.graph import aggregate_anchor_text
from sinew_spark.operators.traps import (
    detect_crawl_traps,
    prune_traps,
    url_template_expr,
)


def _f(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


CALENDAR = [f"http://trap.test/cal/2020/{m}/{d}" for m in range(1, 4) for d in range(1, 4)]
CYCLE = ["http://loop.test/a/b/a/b/a/b"]
DEEP = ["http://deep.test/" + "/".join(f"s{i}" for i in range(12))]
GOOD = [f"http://ok.test/article/{i}" for i in range(3)] + ["http://ok.test/about"]


def test_url_template_expr(spark):
    got = [
        r[0]
        for r in _f(spark, ["http://a.test/cal/2020/7/14?x=1", "http://a.test/p"])
        .select(url_template_expr(F.col("url")))
        .collect()
    ]
    assert got == ["a.test|/cal/N/N/N", "a.test|/p"]


def test_detect_signals_separately(spark):
    df = _f(spark, CALENDAR + CYCLE + DEEP + GOOD)
    stats = {
        r.template: (r.n_urls, r.max_depth, r.max_repeats, r.is_trap)
        for r in detect_crawl_traps(
            df, max_urls_per_template=5, max_depth=8, max_repeated_segments=3
        ).collect()
    }
    # explosion: 9 calendar URLs -> one template (max_repeats 1 from
    # same-digit dates like /2020/2/2)
    assert stats["trap.test|/cal/N/N/N"] == (9, 4, 1, True)
    # cycle: /a/b/a/b/a/b has 6 segments, 2 distinct -> 4 repeats
    assert stats["loop.test|/a/b/a/b/a/b"][3] is True
    assert stats["loop.test|/a/b/a/b/a/b"][2] == 4
    # depth: 12 segments > 8
    assert [v for k, v in stats.items() if k.startswith("deep.test")][0][3] is True
    # benign templates survive all three signals
    assert stats["ok.test|/article/N"] == (3, 2, 0, False)
    assert stats["ok.test|/about"][3] is False


def test_prune_traps_keeps_good_urls(spark):
    df = _f(spark, CALENDAR + CYCLE + GOOD)
    traps = detect_crawl_traps(df, max_urls_per_template=5)
    kept = sorted(r.url for r in prune_traps(df, traps).collect())
    assert kept == sorted(GOOD)


def test_prune_traps_broadcasts(spark):
    df = _f(spark, CALENDAR + GOOD)
    traps = detect_crawl_traps(df, max_urls_per_template=5)
    plan = prune_traps(df, traps)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_detect_rejects_bad_thresholds(spark):
    with pytest.raises(ValueError):
        detect_crawl_traps(_f(spark, GOOD), max_depth=0)


def test_aggregate_anchor_text(spark):
    edges = spark.createDataFrame(
        [
            ("s1", "t1", "click here"),
            ("s2", "t1", "click here"),
            ("s3", "t1", "official docs"),
            ("s4", "t2", "b phrase"),
            ("s5", "t2", "a phrase"),  # tie on count -> ascending text wins
            ("s1", "t3", "only"),
        ],
        "src string, dst string, anchor string",
    )
    got = {
        r.dst: (r.n_inlinks, r.n_anchors, r.top_anchor, r.top_count)
        for r in aggregate_anchor_text(edges).collect()
    }
    assert got["t1"] == (3, 2, "click here", 2)
    assert got["t2"] == (2, 2, "a phrase", 1)
    assert got["t3"] == (1, 1, "only", 1)


def test_aggregate_anchor_text_single_wide_shuffle(spark):
    edges = spark.createDataFrame(
        [("s", "t", "a")], "src string, dst string, anchor string"
    )
    plan = (
        aggregate_anchor_text(edges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # (dst, anchor) partial agg, then the window's dst exchange; the final
    # rollup reuses the window partitioning -> exactly two exchanges
    assert plan.count("Exchange hashpartitioning") == 2


def test_trap_guard_in_crawl_loop(spark, tmpdir_path):
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sources.fetch import FixtureFetcher

    def run(trap):
        c = Crawler(
            spark,
            tmpdir_path + f"/trap_{trap}",
            FixtureFetcher(seed=42, synthetic=True, synthetic_links=4, synthetic_hosts=5),
            CrawlOptions(
                retries=0, max_rounds=2, follow_links=True, trap_max_urls=trap
            ),
        )
        c.seed([f"http://h{i % 5}.synth.test/p/{i}" for i in range(10)])
        c.run()
        return c.seen_t.read().count()

    full = run(None)
    guarded = run(2)
    # every synthetic link shares the /p/N template, so a per-round
    # fan-out cap of 2 prunes the round-1 explosion; seeds still fetch
    assert 10 <= guarded < full
