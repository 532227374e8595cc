"""Magic-byte MIME sniffing (functions/mime.py) — signature pins."""
from pyspark.sql import functions as F

from sinew_spark.functions.mime import is_textual_mime_expr, sniff_mime_expr

CASES = [
    (b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR", "image/png"),
    (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    (b"GIF87a\x01\x00", "image/gif"),
    (b"GIF89a\x01\x00", "image/gif"),
    (b"%PDF-1.7\n%\xe2\xe3", "application/pdf"),
    (b"\x1f\x8b\x08\x00junk", "application/gzip"),
    (b"PK\x03\x04\x14\x00", "application/zip"),
    (b"PK\x05\x06" + b"\x00" * 18, "application/zip"),
    (b"ID3\x04\x00", "audio/mpeg"),
    (b"\xff\xfb\x90\x44", "audio/mpeg"),  # frame sync, no ID3
    (b"BM\x8a\x00\x00\x00", "image/bmp"),
    (b"RIFF\x24\x08\x00\x00WAVEfmt ", "audio/wav"),
    (b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
    (b"P6\n4 4\n255\n\x00\x01", "image/x-portable-pixmap"),
    (b"P5 2 2 255 \x00", "image/x-portable-pixmap"),
    (b"  \t\n<!DOCTYPE html><html>", "text/html"),
    (b"<HTML><head>", "text/html"),
    (b"<body class=x>", "text/html"),
    (b'<?xml version="1.0"?><urlset>', "text/xml"),
    (b"Just some words, punctuation; 123.", "text/plain"),
    (b"\x00\x01\x02\x03garbage", "application/octet-stream"),
    (b"caf\xc3\xa9 utf8 text", "application/octet-stream"),  # non-ASCII: conservative
    # BOM branches (ADVICE r4): UTF-16LE's FF FE must NOT hit the MPEG
    # frame-sync heuristic; markup still sniffs through the BOM.
    (b"\xef\xbb\xbf<!DOCTYPE html><html>", "text/html"),
    (b"\xef\xbb\xbfjust utf8 bom text", "text/plain"),
    (b"\xff\xfe" + "<html><body>x</body></html>".encode("utf-16-le"), "text/html"),
    (b"\xff\xfe" + " \t<HTML>".encode("utf-16-le"), "text/html"),  # ws + case
    (b"\xff\xfe" + "hello utf16 page".encode("utf-16-le"), "text/plain"),
    (b"\xfe\xff" + '<?xml version="1.0"?>'.encode("utf-16-be"), "text/xml"),
    (b"\xfe\xff" + "plain big endian".encode("utf-16-be"), "text/plain"),
]


def test_signature_table(spark):
    df = spark.createDataFrame(
        [(i, body) for i, (body, _) in enumerate(CASES)], "i long, body binary"
    )
    got = {
        r.i: r.mime
        for r in df.select("i", sniff_mime_expr(F.col("body")).alias("mime")).collect()
    }
    want = {i: mime for i, (_, mime) in enumerate(CASES)}
    assert got == want


def test_riff_without_tag_is_not_wav(spark):
    df = spark.createDataFrame([(b"RIFF\x00\x00\x00\x00JUNK",)], "body binary")
    assert (
        df.select(sniff_mime_expr(F.col("body")).alias("m")).first().m
        == "application/octet-stream"
    )


def test_textual_gate(spark):
    df = spark.createDataFrame(
        [("text/html",), ("text/plain",), ("image/png",)], "m string"
    )
    got = [r[0] for r in df.select(is_textual_mime_expr(F.col("m"))).collect()]
    assert got == [True, True, False]


def test_total_on_null_and_empty(spark):
    df = spark.createDataFrame([(b"",), (None,)], "body binary")
    got = [
        r.m for r in df.select(sniff_mime_expr(F.col("body")).alias("m")).collect()
    ]
    assert got[0] == "application/octet-stream"
    assert got[1] is None or got[1] == "application/octet-stream"
