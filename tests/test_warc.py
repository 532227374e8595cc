"""WARC export/import (sinew_spark/sinks/warc.py): round trip, CDX point
lookup, byte determinism, multi-member stream parsing."""

from __future__ import annotations

import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from sinew_spark.sinks.warc import (
    parse_warc_stream,
    read_warc,
    read_warc_record,
    write_warc,
)


@pytest.fixture
def src(spark):
    rows = [
        ("http://a.test/1", "hello world", "2024-01-01T00:00:00Z", 200, "text/plain"),
        ("http://a.test/2", "", "2024-01-01T00:00:01Z", 404, "text/plain"),
        ("http://b.test/3", "héllo ünïcode", "2024-01-01T00:00:02Z", 200,
         "text/html; charset=utf-8"),
        ("http://b.test/4", "x" * 10000, "2024-01-01T00:00:03Z", 200, "text/plain"),
    ]
    return spark.createDataFrame(
        rows, "url string, body string, date string, status int, content_type string"
    ).repartition(2, "url").sortWithinPartitions("url")


def test_roundtrip_and_index(spark, src, tmp_path):
    out = str(tmp_path / "w")
    idx = write_warc(src, out).toPandas()
    assert len(idx) == 4
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".warc.gz") for f in files)
    # compressed member extents tile each file exactly
    for fname, g in idx.groupby("filename"):
        g = g.sort_values("offset")
        assert g.iloc[0]["offset"] == 0
        assert (g["offset"] + g["length"]).iloc[-1] == os.path.getsize(
            os.path.join(out, fname)
        )

    back = read_warc(spark, out).toPandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == [f"http://{h}.test/{i}" for h, i in
                                 [("a", 1), ("a", 2), ("b", 3), ("b", 4)]]
    assert bytes(back.loc[2, "body"]).decode() == "héllo ünïcode"
    assert int(back.loc[1, "status"]) == 404
    assert back.loc[3, "body"] == b"x" * 10000
    for _, r in back.iterrows():
        assert r["digest"] == "sha256:" + hashlib.sha256(bytes(r["body"])).hexdigest()


def test_cdx_point_lookup(spark, src, tmp_path):
    out = str(tmp_path / "w")
    idx = write_warc(src, out).toPandas()
    row = idx[idx["url"] == "http://b.test/3"].iloc[0]
    rec = read_warc_record(out, row["filename"], int(row["offset"]), int(row["length"]))
    assert rec["url"] == "http://b.test/3"
    assert rec["body"].decode() == "héllo ünïcode"
    assert rec["digest"] == row["digest"]
    assert rec["content_type"].startswith("text/html")


def test_write_is_byte_deterministic(spark, src, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(src, a).count()
    write_warc(src, b).count()
    fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
    assert fa == fb
    for f in fa:
        assert open(os.path.join(a, f), "rb").read() == open(
            os.path.join(b, f), "rb").read()


def test_parse_stream_skips_non_response_records():
    info = (
        b"WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    resp, _ = __import__("sinew_spark.sinks.warc", fromlist=["x"])._record_bytes(
        "http://x.test/", "2024-01-01T00:00:00Z", 200, "text/plain", b"payload"
    )
    recs = list(parse_warc_stream(info + resp))
    assert len(recs) == 1 and recs[0]["body"] == b"payload"
    # multi-member gzip: concatenated members parse as one stream
    data = gzip.decompress(gzip.compress(info, mtime=0) + gzip.compress(resp, mtime=0))
    assert len(list(parse_warc_stream(data))) == 1


def test_binary_body_column(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://bin.test/1", bytearray(b"\x00\x01\xff"), "2024-01-01T00:00:00Z")],
        "url string, body binary, date string",
    )
    out = str(tmp_path / "w")
    write_warc(df, out).count()
    back = read_warc(spark, out).toPandas()
    assert bytes(back.loc[0, "body"]) == b"\x00\x01\xff"


def test_wet_roundtrip(spark, src, tmp_path):
    """WET (conversion-record) export: text blocks round-trip with block
    digests; WET parts live beside WARC parts without glob collision."""
    from sinew_spark.sinks.warc import read_wet, write_wet

    out = str(tmp_path / "wet")
    texts = src.select(
        "url", "date", F.concat(F.lit("extracted: "), F.col("body")).alias("text")
    )
    idx = write_wet(texts, out).toPandas()
    assert len(idx) == 4
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".warc.wet.gz") for f in files)
    back = read_wet(spark, out).toPandas().set_index("url")
    assert (back["warc_type"] == "conversion").all()
    assert (back["content_type"] == "text/plain").all()
    assert bytes(back.loc["http://a.test/1", "body"]) == b"extracted: hello world"
    assert bytes(back.loc["http://b.test/3", "body"]).decode() == "extracted: héllo ünïcode"
    for u, r in back.iterrows():
        assert r["digest"] == "sha256:" + hashlib.sha256(bytes(r["body"])).hexdigest()
    # deterministic bytes (replay-stable like write_warc)
    out2 = str(tmp_path / "wet2")
    write_wet(texts, out2).count()
    for f in files:
        a = open(os.path.join(out, f), "rb").read()
        b = open(os.path.join(out2, f), "rb").read()
        assert a == b


def test_wet_and_warc_coexist(spark, src, tmp_path):
    """WARC responses and WET conversions in the SAME directory: each
    reader picks up only its own parts (Common Crawl layout)."""
    from sinew_spark.sinks.warc import read_wet, write_wet

    out = str(tmp_path / "both")
    write_warc(src, out).count()
    write_wet(src.withColumn("text", F.col("body")), out).count()
    warc = read_warc(spark, out).toPandas()
    wet = read_wet(spark, out).toPandas()
    assert set(warc["warc_type"]) == {"response"} and len(warc) == 4
    assert set(wet["warc_type"]) == {"conversion"} and len(wet) == 4


def test_wet_point_lookup(spark, src, tmp_path):
    """CDX index rows from write_wet support single-member point reads."""
    out = str(tmp_path / "wet")
    from sinew_spark.sinks.warc import write_wet

    idx = write_wet(src.withColumn("text", F.col("body")), out).toPandas()
    row = idx[idx["url"] == "http://b.test/4"].iloc[0]
    rec = read_warc_record(out, row["filename"], int(row["offset"]), int(row["length"]))
    assert rec["url"] == "http://b.test/4" and rec["warc_type"] == "conversion"
    assert rec["body"] == b"x" * 10000


def test_revisit_records_dedup_storage(spark, src, tmp_path):
    """Second crawl against the first crawl's CDX index: unchanged pages
    become revisit records (payload not re-stored — identical-payload-
    digest profile); changed pages re-archive in full."""
    # give /4 an incompressible body so the gzip member length actually
    # reflects payload size (x*10000 deflates to ~header size)
    import hashlib as _h
    noisy = "".join(
        _h.sha256(str(i).encode()).hexdigest() for i in range(200)
    )
    src = src.withColumn(
        "body",
        F.when(F.col("url") == "http://b.test/4", F.lit(noisy))
        .otherwise(F.col("body")),
    )
    first_dir = str(tmp_path / "c1")
    idx1 = write_warc(src, first_dir)
    idx1_pd = idx1.toPandas()

    # second crawl: /1 changed, others unchanged
    src2 = src.withColumn(
        "body",
        F.when(F.col("url") == "http://a.test/1", F.lit("hello world CHANGED"))
        .otherwise(F.col("body")),
    )
    second_dir = str(tmp_path / "c2")
    idx2 = write_warc(
        src2, second_dir, revisit_index=spark.createDataFrame(idx1_pd)
    ).toPandas()
    assert len(idx2) == 4

    back = read_warc(spark, second_dir).toPandas().set_index("url")
    assert back.loc["http://a.test/1", "warc_type"] == "response"
    assert bytes(back.loc["http://a.test/1", "body"]) == b"hello world CHANGED"
    for u in ("http://a.test/2", "http://b.test/3", "http://b.test/4"):
        assert back.loc[u, "warc_type"] == "revisit"
        assert bytes(back.loc[u, "body"]) == b""  # payload not re-stored
        # digest still identifies the unchanged payload (matches crawl 1)
        assert back.loc[u, "digest"] == idx1_pd.set_index("url").loc[u, "digest"]
    # storage actually shrank: revisit members are ~header-sized
    big = idx1_pd.set_index("url").loc["http://b.test/4", "length"]
    small_len = idx2.set_index("url").loc["http://b.test/4", "length"]
    assert small_len < big / 5


def test_revisit_multi_digest_index_is_deterministic(spark, tmp_path):
    """A multi-crawl index holds several digests per url; membership on
    (url, digest) means the CURRENT payload matching ANY stored digest is
    a revisit — no arbitrary dropDuplicates pick. Refers-to headers point
    at the latest matching prior date."""
    import gzip as _gz
    import hashlib as _h

    def digest(s):
        return "sha256:" + _h.sha256(s.encode()).hexdigest()

    # index: url U seen with body v1 (old) and v2 (newer crawl)
    idx = spark.createDataFrame(
        [
            ("http://u.test/", digest("v1"), "2024-01-01T00:00:00Z"),
            ("http://u.test/", digest("v2"), "2024-02-01T00:00:00Z"),
            ("http://w.test/", digest("w1"), "2024-01-01T00:00:00Z"),
        ],
        "url string, digest string, date string",
    )
    # current crawl: U serves v1 again (matches the OLDER digest), W changed
    src = spark.createDataFrame(
        [
            ("http://u.test/", "v1", "2024-03-01T00:00:00Z", 200, "text/plain"),
            ("http://w.test/", "w2", "2024-03-01T00:00:00Z", 200, "text/plain"),
        ],
        "url string, body string, date string, status int, content_type string",
    ).repartition(1)
    out = str(tmp_path / "w")
    write_warc(src, out, revisit_index=idx).count()
    back = read_warc(spark, out).toPandas().set_index("url")
    assert back.loc["http://u.test/", "warc_type"] == "revisit"
    assert back.loc["http://u.test/", "digest"] == digest("v1")
    assert back.loc["http://w.test/", "warc_type"] == "response"
    # refers-to headers present on the raw revisit record
    raw = b""
    for f in sorted(os.listdir(out)):
        raw += _gz.decompress(open(os.path.join(out, f), "rb").read())
    assert b"WARC-Refers-To-Target-URI: http://u.test/\r\n" in raw
    assert b"WARC-Refers-To-Date: 2024-01-01T00:00:00Z\r\n" in raw


def test_revisit_mode_output_is_deterministic(spark, tmp_path):
    """The digest join reshuffles; revisit mode re-establishes a canonical
    layout so two identical writes produce byte-identical archives."""
    rows = [(f"http://h{i % 3}.test/p/{i}", f"body {i}", "2024-01-01T00:00:00Z",
             200, "text/plain") for i in range(30)]
    src = spark.createDataFrame(
        rows, "url string, body string, date string, status int, content_type string"
    ).repartition(4, "url").sortWithinPartitions("url")
    idx_dir = str(tmp_path / "first")
    idx = write_warc(src, idx_dir).toPandas()
    out1, out2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    for out in (out1, out2):
        write_warc(src, out, revisit_index=spark.createDataFrame(idx)).count()
    files1, files2 = sorted(os.listdir(out1)), sorted(os.listdir(out2))
    assert files1 == files2
    for f in files1:
        a = open(os.path.join(out1, f), "rb").read()
        b = open(os.path.join(out2, f), "rb").read()
        assert a == b


def test_wat_roundtrip(spark, src, tmp_path):
    """WAT (metadata-record) export: Catalyst-built JSON envelopes round-
    trip with block digests; Links arrays parse back via get_json_object;
    WARC-Refers-To matches the deterministic response-record id."""
    import json
    import uuid as uuidlib

    from sinew_spark.sinks.warc import read_wat, write_wat

    out = str(tmp_path / "wat")
    meta = src.withColumn(
        "links",
        F.array(F.concat(F.col("url"), F.lit("/next")), F.lit("http://c.test/")),
    )
    idx = write_wat(meta, out).toPandas()
    assert len(idx) == 4
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".warc.wat.gz") for f in files)
    back = read_wat(spark, out).toPandas().set_index("url")
    assert (back["warc_type"] == "metadata").all()
    assert (back["content_type"] == "application/json").all()
    env = json.loads(bytes(back.loc["http://a.test/1", "body"]).decode())["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://a.test/1"
    http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert http["Status"] == 200
    assert http["HTML-Metadata"]["Links"] == [
        "http://a.test/1/next", "http://c.test/",
    ]
    for u, r in back.iterrows():
        assert r["digest"] == "sha256:" + hashlib.sha256(bytes(r["body"])).hexdigest()
    # the raw record's WARC-Refers-To resolves to the write_warc record id
    raw = gzip.decompress(open(os.path.join(out, files[0]), "rb").read())
    head = raw.split(b"\r\n\r\n", 1)[0].decode()
    uri = [l for l in head.splitlines() if l.startswith("WARC-Target-URI: ")][0][17:]
    date = [l for l in head.splitlines() if l.startswith("WARC-Date: ")][0][11:]
    want = uuidlib.uuid5(uuidlib.NAMESPACE_URL, f"{uri} {date}")
    assert f"WARC-Refers-To: <urn:uuid:{want}>" in head
    # deterministic bytes
    out2 = str(tmp_path / "wat2")
    write_wat(meta, out2).count()
    for f in files:
        assert (
            open(os.path.join(out, f), "rb").read()
            == open(os.path.join(out2, f), "rb").read()
        )


def test_wat_coexists_and_point_lookup(spark, src, tmp_path):
    """WARC + WET + WAT in one directory: each reader picks only its own
    parts; WAT CDX rows support single-member point reads."""
    from sinew_spark.sinks.warc import read_wat, read_wet, write_wat, write_wet

    out = str(tmp_path / "all3")
    write_warc(src, out).count()
    write_wet(src.withColumn("text", F.col("body")), out).count()
    meta = src.withColumn("links", F.array().cast("array<string>"))
    idx = write_wat(meta, out).toPandas()
    assert set(read_warc(spark, out).toPandas()["warc_type"]) == {"response"}
    assert set(read_wet(spark, out).toPandas()["warc_type"]) == {"conversion"}
    wat = read_wat(spark, out).toPandas()
    assert set(wat["warc_type"]) == {"metadata"} and len(wat) == 4
    r0 = idx.iloc[0]
    rec = read_warc_record(out, r0["filename"], int(r0["offset"]), int(r0["length"]))
    assert rec["warc_type"] == "metadata" and rec["url"] == r0["url"]


def _raw_record(url: str, date: str, status_line: bytes, body: bytes,
                content_length: bytes | None = None) -> bytes:
    http = status_line + b"\r\nContent-Type: text/html\r\n\r\n" + body
    clen = content_length if content_length is not None else str(len(http)).encode()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + date.encode() + b"\r\n"
        b"Content-Length: " + clen + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )


def test_malformed_archive_records_tolerated(spark, tmp_path):
    """External archives carry garbage: a non-numeric HTTP status token
    maps to status 0 (same bucket as a missing status line) and a
    malformed WARC-Date bootstraps as fetched_at 0.0 (oldest = most
    recrawl-eligible) — neither kills the job (ADVICE sitemap posture)."""
    import gzip as _gz

    arch = tmp_path / "arch"
    arch.mkdir()
    good = _raw_record("http://t.test/good", "2024-01-01T00:00:00Z",
                       b"HTTP/1.1 200 OK", b"<p>fine</p>")
    bad_status = _raw_record("http://t.test/badstatus", "not-a-date",
                             b"HTTP/1.1 abc NOPE", b"<p>odd</p>")
    (arch / "part-0.warc.gz").write_bytes(_gz.compress(good + bad_status))
    back = read_warc(spark, str(arch)).toPandas().set_index("url")
    assert back.loc["http://t.test/good", "status"] == 200
    assert back.loc["http://t.test/badstatus", "status"] == 0

    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sinks.warc import bootstrap_crawl_from_warc
    from sinew_spark.sources.fetch import FixtureFetcher

    c = Crawler(
        spark, str(tmp_path / "crawl"), FixtureFetcher(seed=1),
        CrawlOptions(retries=0),
    )
    assert bootstrap_crawl_from_warc(c, str(arch)) == 2
    ts = {
        r.url: r.fetched_at
        for r in c.fetched_t.read().select("url", "fetched_at").collect()
    }
    assert ts["http://t.test/badstatus"] == 0.0
    assert ts["http://t.test/good"] > 0.0


def test_garbage_content_length_resyncs_to_next_record(spark, tmp_path):
    """A malformed Content-Length (non-numeric — including latin-1
    digit lookalikes like '²' that pass str.isdigit but not int() —
    or negative) loses only THAT record: the parser resyncs to the
    next record-separator + WARC/1.0 marker, so later records in the
    SAME gzip stream still import (python's gzip concatenates all
    members of a file into one stream — 'end the parse' would silently
    drop everything after the corrupt record)."""
    import gzip as _gz

    arch = tmp_path / "arch"
    arch.mkdir()
    rec = lambda path, clen=None: _raw_record(  # noqa: E731
        f"http://t.test/{path}", "2024-01-01T00:00:00Z",
        b"HTTP/1.1 200 OK", b"x", content_length=clen,
    )
    # good, bad(non-numeric), good, bad(latin-1 superscript-two),
    # bad(negative), good — all in ONE gzip stream
    blob = (rec("a") + rec("b", b"oops") + rec("c")
            + rec("d", "²".encode("latin-1")) + rec("e", b"-7") + rec("f"))
    (arch / "part-0.warc.gz").write_bytes(_gz.compress(blob))
    urls = set(read_warc(spark, str(arch)).toPandas()["url"])
    assert {"http://t.test/a", "http://t.test/c", "http://t.test/f"} <= urls
    assert not {"http://t.test/b", "http://t.test/d", "http://t.test/e"} & urls
