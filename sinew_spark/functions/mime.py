"""Content-type sniffing from magic bytes — pure Catalyst.

Servers lie about Content-Type (and WARC/disk corpora often lack one);
the reference trusts Faraday's header verbatim (lib/sinew/response.rb
mime handling). At corpus scale the robust identity is the payload
itself: a WHATWG-mimesniff-lite signature table over the leading bytes,
expressed entirely in Catalyst (hex-prefix equality + one regexp) so it
fuses into the scan's WholeStageCodegen — zero Python, zero shuffle,
safe to run over 100 TB of fetched bodies as a map-only projection.

Signature set matches the engine's own codecs (functions/imagecodec.py:
PNG/BMP/PPM/PGM/WAV) plus the container formats a crawl actually meets
(JPEG, GIF, PDF, gzip, zip, WebP, MP3, MP4, HTML, XML). Unknown
printable-ASCII payloads degrade to ``text/plain``, anything else to
``application/octet-stream`` — total function, never throws (binary →
string goes through CAST, which wraps bytes without validating, not the
throwing ``decode()``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# (hex-prefix, mime); longest-prefix-first within a shared stem
_SIGNATURES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),  # GIF87a
    ("474946383961", "image/gif"),  # GIF89a
    ("255044462D", "application/pdf"),  # %PDF-
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("504B0506", "application/zip"),  # empty archive
    ("504B0708", "application/zip"),  # spanned archive
    ("494433", "audio/mpeg"),  # ID3
    ("424D", "image/bmp"),  # BM
]

# first 64 bytes all in {TAB, LF, CR, 0x20-0x7E} => printable ASCII text
_ASCII_HEX = r"^(09|0A|0D|[2-6][0-9A-F]|7[0-9A-E])+$"

# markup markers for the decoded-prefix sniff (WHATWG-mimesniff-lite)
_MARKUP: tuple[tuple[str, str], ...] = (
    ("<!doctype html", "text/html"),
    ("<html", "text/html"),
    ("<head", "text/html"),
    ("<body", "text/html"),
    ("<script", "text/html"),
    ("<?xml", "text/xml"),
)


def _u16_hex_marker(marker: str, le: bool) -> str:
    """Hex-encoded regex for ``marker`` as UTF-16 code units (case-
    insensitive for letters) — lets the markup sniff run on NUL-
    interleaved text without ``decode()`` (which throws on a prefix
    truncated mid code unit under Spark 4's coding-error policy)."""
    parts = []
    for ch in marker:
        alts = sorted({f"{ord(ch.lower()):02X}", f"{ord(ch.upper()):02X}"})
        units = [(a + "00") if le else ("00" + a) for a in alts]
        parts.append("(" + "|".join(units) + ")" if len(units) > 1 else units[0])
    return "".join(parts)


def sniff_mime_expr(col: F.Column) -> F.Column:
    """MIME type sniffed from a binary column's leading bytes.

    Precedence: exact signatures (incl. RIFF/WAVE vs RIFF/WEBP at
    offset 9 and MP4's ``ftyp`` at offset 5, which prefix tables can't
    express) → markup sniff on the whitespace-trimmed ASCII prefix
    (``<!doctype html``/``<html``/... → text/html, ``<?xml`` →
    text/xml) → printable-ASCII heuristic → octet-stream.
    """
    hx = F.hex(F.substring(col, 1, 16))
    out = None
    riff = F.substring(col, 1, 4) == F.lit(b"RIFF")
    branches: list[tuple[F.Column, str]] = [
        *[(hx.startswith(sig), mime) for sig, mime in _SIGNATURES],
        (riff & (F.substring(col, 9, 4) == F.lit(b"WAVE")), "audio/wav"),
        (riff & (F.substring(col, 9, 4) == F.lit(b"WEBP")), "image/webp"),
        (F.substring(col, 5, 4) == F.lit(b"ftyp"), "video/mp4"),
        # netpbm (engine codec parity): P5/P6 then whitespace
        (
            F.hex(F.substring(col, 1, 3)).rlike(r"^50(35|36)(09|0A|0D|20)"),
            "image/x-portable-pixmap",
        ),
    ]
    # BOMs BEFORE the MPEG frame-sync heuristic: UTF-16LE's FF FE would
    # otherwise match ^FF[EF] and sniff BOM-prefixed UTF-16 HTML as
    # audio/mpeg (and is_textual_mime_expr would then gate real text
    # pages out of the parse stage). UTF-8: strip the 3-byte BOM and
    # rerun the string markup sniff; UTF-16: match markup on the hex
    # encoding of the code units (total — never decodes).
    bom8 = hx.startswith("EFBBBF")
    s8 = F.lower(
        F.regexp_replace(F.substring(col, 4, 256).cast("string"), r"^\s+", "")
    )
    for pfx, mime in _MARKUP:
        branches.append((bom8 & s8.startswith(pfx), mime))
    branches.append((bom8, "text/plain"))
    for le, bom_hex in ((True, "FFFE"), (False, "FEFF")):
        is_bom = hx.startswith(bom_hex)
        ws = "(0900|0A00|0D00|2000)*" if le else "(0009|000A|000D|0020)*"
        u16 = F.hex(F.substring(col, 3, 256))
        for pfx, mime in _MARKUP:
            branches.append(
                (is_bom & u16.rlike("^" + ws + _u16_hex_marker(pfx, le)), mime)
            )
        branches.append((is_bom, "text/plain"))
    # MPEG audio frame sync FF Ex/Fx (after the BOM branches)
    branches.append((F.hex(F.substring(col, 1, 2)).rlike(r"^FF[EF]"), "audio/mpeg"))
    # markup: trim leading whitespace of the ASCII prefix, case-fold.
    # NOT ltrim — Spark ltrim strips only 0x20, not TAB/LF/CR.
    s = F.lower(
        F.regexp_replace(F.substring(col, 1, 256).cast("string"), r"^\s+", "")
    )
    for pfx, mime in _MARKUP:
        branches.append((s.startswith(pfx), mime))
    branches.append(
        (F.hex(F.substring(col, 1, 64)).rlike(_ASCII_HEX), "text/plain")
    )
    for cond, mime in branches:
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    return out.otherwise(F.lit("application/octet-stream"))


def is_textual_mime_expr(mime: F.Column) -> F.Column:
    """True for types the parse stage should treat as text (HTML/XML/
    plain) — the sniffed twin of the header gate WARC bootstrap uses."""
    return mime.isin("text/html", "text/xml", "text/plain")
