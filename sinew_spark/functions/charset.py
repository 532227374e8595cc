"""Charset detection + tolerant decoding for raw byte bodies.

The live transport decodes with the HTTP header's charset
(sources/fetch.py:374 — faraday parity with the reference stack,
base.rb:2), but bytes arriving WITHOUT live headers — WARC archive
imports, object-store dumps, multimodal sidecars — need the charset
recovered from the bytes themselves. Spark 4's ``decode`` additionally
THROWS on malformed input (MALFORMED_CHARACTER_CODING) unless legacy
confs are set, so a blanket ``decode(body, 'UTF-8')`` over a 100 TB
archive dies on its first mojibake page; this module is the robust
path:

- ``detect_charset_expr``: pure Catalyst (whole-stage codegen, zero
  Python) WHATWG-ordered sniff — BOM > Content-Type header param >
  ``<meta charset>`` / ``<meta http-equiv>`` / XML declaration >
  default. The in-body sniff decodes only a bounded prefix window as
  ISO-8859-1 (every byte sequence is valid latin-1, so the sniff can
  never throw) and regexes the declaration out.
- ``decode_body_udf``: Arrow-batched pandas UDF mapping (body, charset)
  -> text via Python's codec registry with ``errors='replace'`` — every
  web-era encoding (windows-1252, shift_jis, gbk, koi8-r, …), malformed
  bytes degrade to U+FFFD instead of failing the job, BOMs are
  stripped. One Python crossing; used only on import/bootstrap paths
  where bodies cross into Python for span parsing anyway.

Scale: detection is map-only codegen; decode is embarrassingly parallel
per-batch with no shuffle — both survive 100× scale-up unchanged.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# label -> canonical name (lowercase). Python's codec registry resolves
# most aliases already; this map pins the EMITTED charset column to one
# deterministic spelling per encoding and catches web-only labels.
CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf16": "utf-16",
    "utf-16": "utf-16",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "iso-8859-1": "iso-8859-1",
    "l1": "iso-8859-1",
    "cp1252": "windows-1252",
    "win-1252": "windows-1252",
    "windows-1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "ascii": "us-ascii",
    "us-ascii": "us-ascii",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "gb2312": "gbk",  # WHATWG maps the gb2312 label to the gbk decoder
    "gbk": "gbk",
    "euc-jp": "euc-jp",
    "euc-kr": "euc-kr",
    "big5": "big5",
    "koi8-r": "koi8-r",
}

_LABEL_RE = "[a-z0-9_\\-]+"


def _normalize_label_expr(label: Column) -> Column:
    """Lowercase + alias-canonicalize a charset label; unknown labels pass
    through lowercased (the decode UDF falls back per-codec-registry).
    The alias map literal is built per call — Column construction needs
    an active session, so no module-level exprs."""
    alias_map = F.create_map(
        *[F.lit(x) for kv in CHARSET_ALIASES.items() for x in kv]
    )
    low = F.lower(F.trim(label))
    return F.coalesce(alias_map[low], low)


def detect_charset_expr(
    body: Column,
    content_type: Column | None = None,
    default: str = "utf-8",
    sniff_bytes: int = 1024,
) -> Column:
    """Detected charset label for a binary ``body`` column — pure
    Catalyst, WHATWG-ordered:

    1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE)
    2. ``charset=`` parameter of ``content_type`` (when provided)
    3. in-body declaration within the first ``sniff_bytes`` bytes:
       ``<meta charset=…>``, ``<meta http-equiv=content-type
       content="…charset=…">``, or an XML ``encoding="…"`` declaration
    4. ``default``

    The sniff window decodes as ISO-8859-1 (total: all byte values are
    valid), so this expression can never raise on malformed input."""
    bom = (
        F.when(F.substring(body, 1, 3) == F.lit(b"\xef\xbb\xbf"), F.lit("utf-8"))
        # UTF-16LE's FF FE must be tested before any 2-byte prefix reads
        .when(F.substring(body, 1, 2) == F.lit(b"\xff\xfe"), F.lit("utf-16le"))
        .when(F.substring(body, 1, 2) == F.lit(b"\xfe\xff"), F.lit("utf-16be"))
    )
    header = None
    if content_type is not None:
        # optional quote before the label: RFC 9110 allows the charset
        # parameter as a quoted-string (charset="utf-8"), mirroring the
        # ["']? tolerance the in-body meta regex already has
        h = F.regexp_extract(
            F.lower(content_type), f"charset=[\"']?({_LABEL_RE})", 1
        )
        header = F.when(h != "", _normalize_label_expr(h))
    sniff = F.lower(F.decode(F.substring(body, 1, sniff_bytes), "ISO-8859-1"))
    meta = F.regexp_extract(
        sniff, f"<meta[^>]*charset\\s*=\\s*[\"']?({_LABEL_RE})", 1
    )
    xml = F.regexp_extract(
        sniff, f"<\\?xml[^>]*encoding\\s*=\\s*[\"']({_LABEL_RE})", 1
    )
    body_decl = F.when(meta != "", _normalize_label_expr(meta)).when(
        xml != "", _normalize_label_expr(xml)
    )
    parts = [bom] + ([header] if header is not None else []) + [body_decl]
    return F.coalesce(*parts, F.lit(default))


_BOMS = (
    (codecs.BOM_UTF8, ("utf-8",)),
    (codecs.BOM_UTF16_LE, ("utf-16le",)),
    (codecs.BOM_UTF16_BE, ("utf-16be",)),
)

_META_RE = re.compile(rb"<meta[^>]*charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)", re.I)
_XML_RE = re.compile(rb"<\?xml[^>]*encoding\s*=\s*[\"']([a-zA-Z0-9_\-]+)", re.I)


def sniff_charset(
    raw: bytes,
    header_charset: str | None = None,
    default: str = "utf-8",
    sniff_bytes: int = 1024,
) -> str:
    """Python twin of detect_charset_expr for single in-flight responses
    (the live transport, where bytes are already driver/worker-local):
    BOM > header param > meta/XML declaration > default, same
    normalization. Lets header-less pages decode like a browser would
    instead of defaulting blind."""
    if raw:
        if raw[:3] == codecs.BOM_UTF8:
            return "utf-8"
        if raw[:2] == codecs.BOM_UTF16_LE:
            return "utf-16le"
        if raw[:2] == codecs.BOM_UTF16_BE:
            return "utf-16be"
    if header_charset:
        low = header_charset.lower().strip()
        return CHARSET_ALIASES.get(low, low)
    win = raw[:sniff_bytes] if raw else b""
    m = _META_RE.search(win) or _XML_RE.search(win)
    if m:
        low = m.group(1).decode("latin-1").lower()
        return CHARSET_ALIASES.get(low, low)
    return default


def decode_text(raw: bytes, charset: str) -> str:
    """Tolerant single-value decode: BOM stripped, codec-registry lookup
    with iso-8859-1 fallback for unknown labels, malformed bytes ->
    U+FFFD. Never raises."""
    if raw is None:
        return None
    cs = CHARSET_ALIASES.get((charset or "utf-8").lower(), (charset or "utf-8").lower())
    for bom, names in _BOMS:
        if raw.startswith(bom) and cs in names:
            raw = raw[len(bom):]
            break
    try:
        codecs.lookup(cs)
    except LookupError:
        cs = "iso-8859-1"
    return raw.decode(cs, errors="replace")


def make_decode_udf():
    """(binary body, charset label) -> decoded text; Arrow-batched,
    vectorized over the batch, tolerant per decode_text. Factory form —
    pandas_udf registration needs an active session, so creation is
    deferred to call time (same pattern as dedup.make_minhash_udf)."""

    @pandas_udf("string")
    def decode_body_udf(body: pd.Series, charset: pd.Series) -> pd.Series:
        return pd.Series(
            [
                decode_text(bytes(b) if b is not None else None, c)
                for b, c in zip(body, charset)
            ],
            dtype="object",
        )

    return decode_body_udf


def decode_auto(body: Column, content_type: Column | None = None) -> Column:
    """Detect + decode in one step: Catalyst sniff feeds the tolerant
    decode UDF. Use on any bytes-without-live-headers path."""
    return make_decode_udf()(body, detect_charset_expr(body, content_type))
