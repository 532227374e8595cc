"""Streaming WARC archival (streaming/archive.py): the fetched table's
growth streams into per-epoch WARC directories with an accumulated CDX;
a second invocation archives only the delta (checkpointed file source)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sinew_spark.crawl import Crawler, CrawlOptions
from sinew_spark.sinks.warc import read_warc, read_warc_record
from sinew_spark.sources.fetch import FixtureFetcher
from sinew_spark.streaming.archive import (
    read_fetched_pages_stream,
    read_stream_cdx,
    stream_warc_archive,
)


def _drain(spark, fetched_path, out, ckpt):
    q = stream_warc_archive(
        read_fetched_pages_stream(spark, fetched_path), out, ckpt
    )
    q.awaitTermination()


def test_streaming_archive_incremental(spark, tmp_path):
    wd = str(tmp_path / "crawl")
    out = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    urls1 = [f"http://h{i % 3}.test/a/{i}" for i in range(10)]
    c = Crawler(spark, wd, FixtureFetcher(seed=42), CrawlOptions(retries=0))
    c.seed(urls1)
    c.run_round()
    fetched_path = os.path.join(wd, "fetched")

    _drain(spark, fetched_path, out, ckpt)
    cdx1 = read_stream_cdx(spark, out).toPandas()
    assert len(cdx1) == 10
    epochs1 = set(cdx1["epoch"])

    # round 2 appends new pages; a second AvailableNow run archives ONLY them
    urls2 = [f"http://h{i % 3}.test/b/{i}" for i in range(7)]
    c2 = Crawler(spark, wd, FixtureFetcher(seed=42), CrawlOptions(retries=0))
    c2.seed(urls2)
    c2.run_round()
    _drain(spark, fetched_path, out, ckpt)
    cdx2 = read_stream_cdx(spark, out).toPandas()
    assert len(cdx2) == 17
    new = cdx2[~cdx2["epoch"].isin(epochs1)]
    assert set(new["url"]) == set(urls2)  # delta only — no re-archive

    # every epoch dir reads back as WARC; union == all fetched pages
    total = 0
    for e in sorted(set(cdx2["epoch"])):
        total += read_warc(spark, os.path.join(out, f"epoch={e}")).count()
    assert total == 17

    # CDX point lookup into the right epoch
    row = cdx2[cdx2["url"] == urls2[3]].iloc[0]
    rec = read_warc_record(
        os.path.join(out, f"epoch={row['epoch']}"),
        row["filename"], int(row["offset"]), int(row["length"]),
    )
    assert rec["url"] == urls2[3]
    assert rec["body"]  # payload round-tripped


def test_streaming_archive_idempotent_epoch(spark, tmp_path):
    """Replaying an epoch (same input) rewrites identical bytes — the
    at-least-once foreachBatch retry is safe."""
    wd = str(tmp_path / "crawl")
    c = Crawler(spark, wd, FixtureFetcher(seed=7), CrawlOptions(retries=0))
    c.seed([f"http://h.test/p/{i}" for i in range(8)])
    c.run_round()
    fetched_path = os.path.join(wd, "fetched")

    out1, out2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    _drain(spark, fetched_path, out1, str(tmp_path / "k1"))
    _drain(spark, fetched_path, out2, str(tmp_path / "k2"))
    d1 = sorted(os.listdir(os.path.join(out1, "epoch=0")))
    d2 = sorted(os.listdir(os.path.join(out2, "epoch=0")))
    assert d1 == d2
    for f in d1:
        a = open(os.path.join(out1, "epoch=0", f), "rb").read()
        b = open(os.path.join(out2, "epoch=0", f), "rb").read()
        assert a == b
