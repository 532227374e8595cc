"""Charset detection + tolerant decode (functions/charset.py) — the
bytes-without-live-headers path (WARC import, object-store dumps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinew_spark.functions.charset import (
    decode_auto,
    decode_text,
    detect_charset_expr,
)


def _detect(spark, body: bytes, ct: str | None = None) -> str:
    df = spark.createDataFrame([(body, ct)], "b binary, ct string")
    col = detect_charset_expr(F.col("b"), F.col("ct") if ct is not None else None)
    return df.select(col.alias("cs")).collect()[0].cs


class TestDetect:
    def test_boms_win_over_everything(self, spark):
        assert _detect(spark, b"\xef\xbb\xbfhello") == "utf-8"
        assert _detect(spark, b"\xff\xfeh\x00i\x00") == "utf-16le"
        assert _detect(spark, b"\xfe\xff\x00h\x00i") == "utf-16be"
        # BOM beats a contradicting header param (WHATWG order)
        assert (
            _detect(spark, b"\xef\xbb\xbfx", "text/html; charset=iso-8859-1")
            == "utf-8"
        )

    def test_header_beats_meta(self, spark):
        body = b'<meta charset="shift_jis"><p>x</p>'
        assert _detect(spark, body, "text/html; charset=ISO-8859-1") == "iso-8859-1"
        assert _detect(spark, body, "text/html") == "shift_jis"

    def test_meta_forms_and_xml_decl(self, spark):
        assert _detect(spark, b"<meta charset=utf-8>") == "utf-8"
        assert (
            _detect(
                spark,
                b'<meta http-equiv="Content-Type" '
                b'content="text/html; charset=windows-1252">',
            )
            == "windows-1252"
        )
        assert (
            _detect(spark, b'<?xml version="1.0" encoding="ISO-8859-1"?><r/>')
            == "iso-8859-1"
        )

    def test_alias_normalization_and_default(self, spark):
        assert _detect(spark, b"<meta charset=latin1>") == "iso-8859-1"
        assert _detect(spark, b"<meta charset=GB2312>") == "gbk"
        assert _detect(spark, b"plain bytes, no declaration") == "utf-8"

    def test_sniff_never_throws_on_mojibake(self, spark):
        # invalid UTF-8 in the sniff window: latin-1 sniff is total
        assert _detect(spark, b"\x93\xff\xfa<meta charset=cp1252>") == "windows-1252"


class TestDecode:
    def test_windows_1252_smart_quotes(self):
        assert decode_text(b"\x93hi\x94", "windows-1252") == "“hi”"

    def test_malformed_utf8_replaces_not_raises(self):
        assert decode_text(b"caf\xe9", "utf-8") == "caf�"

    def test_bom_stripped(self):
        assert decode_text(b"\xef\xbb\xbfhi", "utf-8") == "hi"
        assert decode_text(b"\xff\xfeh\x00i\x00", "utf-16le") == "hi"

    def test_unknown_label_falls_back_latin1(self):
        assert decode_text(b"caf\xe9", "x-nonsense-cs") == "caf\xe9"

    def test_none_passthrough(self):
        assert decode_text(None, "utf-8") is None


def test_decode_auto_mixed_charsets(spark):
    rows = [
        ("a", "caf\xe9 latin".encode("iso-8859-1"),
         "text/html; charset=iso-8859-1"),
        ("b", b'<meta charset="utf-16le">', None),  # decl ignored: no BOM -> header/meta order
        ("c", "こん".encode("shift_jis"),
         "text/html; charset=shift_jis"),
        ("d", b"\xef\xbb\xbf" + "utf8 bom caf\xe9".encode("utf-8"), None),
        ("e", b"broken \xe9 utf8", None),
    ]
    df = spark.createDataFrame(rows, "id string, body binary, ct string")
    out = {
        r.id: r.text
        for r in df.select(
            "id", decode_auto(F.col("body"), F.col("ct")).alias("text")
        ).collect()
    }
    assert out["a"] == "caf\xe9 latin"
    assert out["c"] == "こん"
    assert out["d"] == "utf8 bom caf\xe9"
    assert out["e"] == "broken � utf8"


def test_bootstrap_imports_non_utf8_archive(spark, tmp_path):
    """WARC bootstrap end-to-end with an ISO-8859-1 record and a
    malformed-UTF-8 record: both import (tolerant decode) instead of
    failing the job, and the latin-1 text round-trips exactly."""
    from sinew_spark.crawl import Crawler, CrawlOptions
    from sinew_spark.sinks.warc import write_warc
    from sinew_spark.sources.fetch import FixtureFetcher

    rows = [
        ("http://l1.test/a", "<p>caf\xe9 and na\xefve</p>".encode("iso-8859-1"),
         "2024-01-01T00:00:00Z", 200, "text/html; charset=iso-8859-1"),
        ("http://l1.test/b", b"<p>broken \xe9 here</p>",
         "2024-01-01T00:00:01Z", 200, "text/html"),
    ]
    df = spark.createDataFrame(
        rows, "url string, body binary, date string, status int, content_type string"
    ).repartition(1)
    arch = str(tmp_path / "arch")
    write_warc(df, arch).count()
    from sinew_spark.sinks.warc import bootstrap_crawl_from_warc

    c = Crawler(
        spark, str(tmp_path / "crawl"), FixtureFetcher(seed=1), CrawlOptions(retries=0)
    )
    n = bootstrap_crawl_from_warc(c, arch)
    assert n == 2
    got = {
        r.url: r.resp_body
        for r in c.fetched_t.read().select("url", "resp_body").collect()
    }
    assert got["http://l1.test/a"] == "<p>caf\xe9 and na\xefve</p>"
    assert "�" in got["http://l1.test/b"]


def test_detect_charset_is_map_only(spark):
    """The sniff is pure Catalyst: no Exchange, no Python in the plan."""
    df = spark.createDataFrame([(b"x", "text/html")], "b binary, ct string")
    plan = (
        df.select(detect_charset_expr(F.col("b"), F.col("ct")).alias("cs"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_header_quoted_charset_param(spark):
    """RFC 9110 quoted-string parameter (charset="utf-8") must match the
    header layer instead of silently falling through to the body sniff
    (ADVICE r4)."""
    assert _detect(spark, b"no declarations", 'text/html; charset="iso-8859-1"') == "iso-8859-1"
    assert _detect(spark, b"no declarations", "text/html; charset='utf-16le'") == "utf-16le"
    # unquoted still works
    assert _detect(spark, b"no declarations", "text/html; charset=utf-16be") == "utf-16be"
