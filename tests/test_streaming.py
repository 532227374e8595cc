"""Structured Streaming: incremental rollup, stateful sessions, sessionize.

Models the reference's per-row-flush durability (lib/sinew/csv.rb:45-46) as
checkpointed availableNow micro-batches: each pass drains exactly the new
files, restarts resume from the checkpoint.
"""

import os
import time

import pandas as pd
import pytest

from sinew_spark.plans.snapshots import SnapshotTable
from sinew_spark.streaming.rollup import (
    _ROLLUP_INPUT,
    host_window_rollup,
    read_fetched_stream,
    run_rollup_available_now,
)
from sinew_spark.streaming.sessions import host_session_stream, sessionize_events


def _mk_fetched_table(spark, path):
    return SnapshotTable(spark, path, _ROLLUP_INPUT)


def _rows(host, n, t0, status=200, step=1.0):
    return [(host, status, 1, t0 + i * step) for i in range(n)]


def test_rollup_incremental_available_now(spark, tmpdir_path):
    """Two snapshot commits, two rollup passes: the second pass reads ONLY
    the delta (checkpointed file log), and round-1 windows finalize once the
    watermark passes them."""
    tbl = _mk_fetched_table(spark, os.path.join(tmpdir_path, "fetched"))
    out = os.path.join(tmpdir_path, "rollup_out")
    ckpt = os.path.join(tmpdir_path, "rollup_ckpt")

    t0 = 1_700_000_000.0
    tbl.append(spark.createDataFrame(_rows("a.test", 5, t0) + _rows("b.test", 3, t0), _ROLLUP_INPUT))
    run_rollup_available_now(spark, tbl.path, out, ckpt, window="1 minute", watermark="1 minute")

    # second round far enough in event time to close round-1 windows
    tbl.append(spark.createDataFrame(_rows("a.test", 2, t0 + 600, status=500), _ROLLUP_INPUT))
    run_rollup_available_now(spark, tbl.path, out, ckpt, window="1 minute", watermark="1 minute")

    got = spark.read.parquet(out)
    rows = {(r.host, r.window_start.isoformat()): r for r in got.collect()}
    a = [r for (h, _), r in rows.items() if h == "a.test"]
    b = [r for (h, _), r in rows.items() if h == "b.test"]
    assert sum(r.fetches for r in a) == 5  # round-1 'a' window finalized
    assert sum(r.fetches for r in b) == 3
    assert all(r.errors == 0 for r in a + b)


def test_rollup_resume_is_exactly_once(spark, tmpdir_path):
    """Re-running with the same checkpoint and no new files emits nothing new
    (idempotent restart)."""
    tbl = _mk_fetched_table(spark, os.path.join(tmpdir_path, "fetched"))
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    t0 = 1_700_000_000.0
    tbl.append(spark.createDataFrame(_rows("a.test", 4, t0), _ROLLUP_INPUT))
    run_rollup_available_now(spark, tbl.path, out, ckpt)
    tbl.append(spark.createDataFrame(_rows("a.test", 1, t0 + 3600), _ROLLUP_INPUT))
    run_rollup_available_now(spark, tbl.path, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_rollup_available_now(spark, tbl.path, out, ckpt)  # no new data
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 1  # only the finalized t0 window, emitted once


def test_host_session_state_survives_restart(spark, tmpdir_path):
    """applyInPandasWithState: totals accumulate across two availableNow
    invocations through the checkpointed state store."""
    tbl = _mk_fetched_table(spark, os.path.join(tmpdir_path, "fetched"))
    ckpt = os.path.join(tmpdir_path, "sess_ckpt")
    outdir = os.path.join(tmpdir_path, "sess_out")
    t0 = 1_700_000_000.0

    def run_pass():
        stream = read_fetched_stream(spark, tbl.path)
        sessions = host_session_stream(stream)
        q = (
            sessions.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # latest update per host = the running total
        rows = spark.read.parquet(outdir).collect()
        out = {}
        for r in rows:
            if r.host not in out or r.total_fetches > out[r.host].total_fetches:
                out[r.host] = r
        return out

    tbl.append(spark.createDataFrame(_rows("a.test", 3, t0) + _rows("b.test", 1, t0, status=503), _ROLLUP_INPUT))
    got = run_pass()
    assert got["a.test"].total_fetches == 3
    assert got["b.test"].total_errors == 1

    tbl.append(spark.createDataFrame(_rows("a.test", 2, t0 + 100), _ROLLUP_INPUT))
    got = run_pass()
    assert got["a.test"].total_fetches == 5  # state persisted across restart
    assert got["a.test"].last_fetch_at == t0 + 101.0


def test_sessionize_events_vs_duckdb(spark, sf_dir):
    """Batch gaps-and-islands sessionization matches an independent DuckDB
    oracle on the driver-provided events table."""
    import duckdb

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (
        sessionize_events(events, gap_seconds=1800)
        .orderBy("user_id", "session_id")
        .toPandas()
    )
    oracle = duckdb.sql(
        f"""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM '{sf_dir}/events.parquet'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert len(got) == len(oracle)
    pd.testing.assert_series_equal(
        got["n_events"].astype("int64"), oracle["n_events"].astype("int64"), check_names=False
    )
    assert (
        pd.to_datetime(got["session_start"]).values == oracle["session_start"].values
    ).all()


def test_streaming_dedup_emits_once_and_resumes_idempotently(spark, tmpdir_path):
    """dropDuplicatesWithinWatermark keeps one row per planted duplicate
    key; a second availableNow run over the same checkpoint sees no new
    files and emits nothing."""
    from pyspark.sql import functions as F

    from sinew_spark.streaming.dedup import run_dedup_available_now

    src = spark.range(0, 300).select(
        (F.col("id") % 100).alias("key"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 100).alias("event_time"),
    )
    src.write.mode("overwrite").parquet(f"{tmpdir_path}/src")
    args = (
        spark,
        f"{tmpdir_path}/src",
        "key bigint, event_time timestamp",
        ["key"],
        f"{tmpdir_path}/out",
        f"{tmpdir_path}/ckpt",
    )
    run_dedup_available_now(*args, watermark="1 hour")
    out = spark.read.parquet(f"{tmpdir_path}/out")
    assert out.count() == 100
    assert out.select("key").distinct().count() == 100

    run_dedup_available_now(*args, watermark="1 hour")  # resume: no new files
    assert spark.read.parquet(f"{tmpdir_path}/out").count() == 100


def test_streaming_hll_equals_batch_and_is_idempotent(spark, tmpdir_path):
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.operators.sketch import hll_registers
    from sinew_spark.sources.fetch import FixtureFetcher
    from sinew_spark.streaming.sketch import run_hll_available_now

    c = Crawler(
        spark,
        tmpdir_path + "/shll",
        FixtureFetcher(seed=42, synthetic=True, synthetic_links=0, synthetic_hosts=4),
        CrawlOptions(rate_limit=0.0, retries=0, max_rounds=2),
    )
    out, ckpt = tmpdir_path + "/out", tmpdir_path + "/ckpt"
    seen_path = tmpdir_path + "/shll/seen"

    c.seed([f"http://h{i % 4}.synth.test/p/{i}" for i in range(25)])
    c.run_round()
    run_hll_available_now(spark, seen_path, out, ckpt)
    first = sorted(
        (r.register, r.max_rho) for r in spark.read.parquet(out).collect()
    )

    # incremental second round folds into the SAME checkpointed state
    c.seed([f"http://h{i % 4}.synth.test/p/{i}" for i in range(25, 40)])
    c.run_round()
    run_hll_available_now(spark, seen_path, out, ckpt)
    streamed = sorted(
        (r.register, r.max_rho) for r in spark.read.parquet(out).collect()
    )

    # batch sketch over the full seen table must match exactly
    batch = sorted(
        (r.register, r.max_rho)
        for r in hll_registers(c.seen_t.read().select("url"), "url").collect()
    )
    assert streamed == batch
    assert first != streamed  # the second pass actually added state

    # idempotence: a pass with no new files rewrites the same registers
    run_hll_available_now(spark, seen_path, out, ckpt)
    again = sorted(
        (r.register, r.max_rho) for r in spark.read.parquet(out).collect()
    )
    assert again == streamed
