"""Scalar normalization pipeline — the `csv_emit` value contract.

Reimplements, byte-exactly, the per-cell normalization the reference applies
to every emitted value (reference: /root/reference/lib/sinew/csv.rb:52-87,
proven by /root/reference/test/test_csv.rb:21-57). Steps, in order:

  N1  node -> string       (handled upstream: spans are already strings)
  N2  array -> "a|b"       join with pipe
  N3  to_s                 stringify; nil -> None
  N4  "" -> None
  N5  strip tags           <[^>]+>  replaced WITH A SPACE
  N6  ASCII gate           skip N7-N9 iff every char in 33..126 minus '&',
                           or whitespace  (csv.rb:52-55)
  N7  smart punctuation    MS-Word quotes/dashes -> ASCII
  N8  HTML entities        &aacute; -> á, &lt;&amp;&gt; -> <&>
  N9  transliterate        NFKD + table: "šţɽĩɳģ" -> "string", café -> cafe
  N10 squish               strip + \\s+ -> " "; "" -> None

Two implementations with identical semantics:

- ``normalize_pandas(series)`` — vectorized pandas path used by the
  ``normalize_udf`` Arrow-batched pandas UDF (the engine hot path).
- ``normalize_expr(col)`` — pure-Catalyst expression chain implementing the
  ASCII-clean fast path (N5 + N10); valid whenever the gate N6 passes.
  Used for oracle-checkable SQL parity and to keep ASCII-only flows inside
  whole-stage codegen.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- N6: the ASCII gate -----------------------------------------------------
# chars 33..126 minus '&' (ASCII 38), plus whitespace
# (/root/reference/lib/sinew/csv.rb:52-55). Any '&' forces entity decoding.
_ASCII_ONLY = re.compile(r"[!-%'-~\s]+\Z")

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

# --- N7: smart punctuation table --------------------------------------------
# Windows-1252 "smart" punctuation both at the C1 codepoints (bytes
# \x82..\x97 misread as U+0082..U+0097) and the true Unicode codepoints.
# Matches the mapping exercised by test_csv.rb:47-48 ("\302\223gub\302\224"
# i.e. U+0093 / U+0094 -> '"').
_SMART_PUNCT = {
    0x0082: "'",
    0x0084: '"',
    0x0085: "...",
    0x0091: "'",
    0x0092: "'",
    0x0093: '"',
    0x0094: '"',
    0x0095: "*",
    0x0096: "-",
    0x0097: "--",
    0x2018: "'",
    0x2019: "'",
    0x201A: "'",
    0x201B: "'",
    0x201C: '"',
    0x201D: '"',
    0x201E: '"',
    0x201F: '"',
    0x2013: "-",
    0x2014: "--",
    0x2026: "...",
    0x2022: "*",
    0x00A0: " ",
}

# --- N9: transliteration table for characters NFKD cannot decompose ---------
# NFKD + combining-mark strip covers the vast majority (š->s, ţ->t, é->e...).
# This table covers common non-decomposable Latin/IPA letters (matches the
# reference's transliterate result "šţɽĩɳģ" -> "string",
# test_csv.rb:53).
_XLIT = {
    0x00C6: "AE", 0x00E6: "ae", 0x0152: "OE", 0x0153: "oe",
    0x00D8: "O", 0x00F8: "o", 0x00D0: "D", 0x00F0: "d",
    0x00DE: "Th", 0x00FE: "th", 0x00DF: "ss",
    0x0110: "D", 0x0111: "d", 0x0126: "H", 0x0127: "h",
    0x0141: "L", 0x0142: "l", 0x014A: "N", 0x014B: "n",
    0x0166: "T", 0x0167: "t", 0x0131: "i", 0x0130: "I",
    # IPA extensions (retroflex / implosive series)
    0x0253: "b", 0x0257: "d", 0x0256: "d", 0x0260: "g",
    0x0266: "h", 0x0268: "i", 0x026B: "l", 0x026D: "l",
    0x0271: "m", 0x0272: "n", 0x0273: "n", 0x0274: "N",
    0x027C: "r", 0x027D: "r", 0x027E: "r", 0x0282: "s",
    0x0288: "t", 0x0289: "u", 0x028B: "v", 0x0290: "z",
    0x0291: "z", 0x0292: "z", 0x0259: "e",
}


def _sterile(s: str) -> str:
    """N7-N9 on one string (only called for gate failures)."""
    # N7 smart punctuation -> ASCII
    s = s.translate(_SMART_PUNCT)
    # N8 HTML entities (named + numeric)
    s = _html.unescape(s)
    # N9 transliterate: NFKD, drop combining marks, table for the rest,
    # drop anything still non-ASCII (the reference's Sterile.transliterate
    # drops unmappable characters).
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.translate(_XLIT)
    s = s.encode("ascii", "ignore").decode("ascii")
    return s


def normalize_str(s) -> str | None:
    """Normalize one value exactly like the reference's CSV#normalize."""
    # N1/N2/N3 — input coercion
    if s is None:
        return None
    if isinstance(s, (list, tuple)):
        s = "|".join("" if v is None else str(v) for v in s)
    elif not isinstance(s, str):
        s = str(s)
    if s == "":
        return None  # N4
    s = _TAG_RE.sub(" ", s)  # N5
    if not _ASCII_ONLY.match(s):  # N6
        s = _sterile(s)  # N7-N9
    s = _WS_RE.sub(" ", s.strip())  # N10
    return s if s else None


def normalize_pandas(series: pd.Series) -> pd.Series:
    """Vectorized normalize over a pandas Series of strings.

    Fast path: regex steps via pandas str ops; the sterile steps (N7-N9)
    run only on the (typically tiny) subset failing the ASCII gate —
    mirroring the reference's own gate optimization (csv.rb:71).
    """
    s = series.astype("object")
    isnull = s.isna()
    s = s.fillna("")
    s = s.astype(str)
    # N5 strip tags with spaces
    s = s.str.replace(_TAG_RE, " ", regex=True)
    # N6 gate
    dirty = ~s.str.match(_ASCII_ONLY) & (s != "")
    if dirty.any():
        s.loc[dirty] = s.loc[dirty].map(_sterile)
    # N10 squish
    s = s.str.strip().str.replace(_WS_RE, " ", regex=True)
    out = s.where((s != "") & ~isnull, None)
    return out


@F.pandas_udf(T.StringType())
def normalize_udf(series: pd.Series) -> pd.Series:
    return normalize_pandas(series)


def normalize_expr(col: Column) -> Column:
    """Catalyst-only fast path: N5 + N10 (+ null-for-empty).

    Semantically identical to ``normalize_udf`` for inputs passing the
    ASCII gate (no '&', no chars outside 33..126/whitespace). Stays inside
    whole-stage codegen — use on flows known to be ASCII-clean.
    """
    c = F.regexp_replace(col.cast("string"), r"<[^>]+>", " ")
    # squish before trim: Spark trim() strips only ' ' (not \n\t\r)
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.nullif(c, F.lit(""))


def normalize_array_expr(col: Column) -> Column:
    """N2 for array columns: join with '|' then normalize (ASCII fast path)."""
    return normalize_expr(F.array_join(col, "|"))


def html_cleanup_str(body: str) -> str:
    """The reference's Response#html cleanup (response.rb:10-24):
    invalid UTF-8 -> '?', squish all whitespace, kill spaces around tags."""
    if body is None:
        return None
    # invalid utf-8 replacement happens at decode time in the fetcher;
    # here replace any U+FFFD markers like the reference replaces with '?'
    s = body.replace("�", "?")
    s = _WS_RE.sub(" ", s.strip())
    s = re.sub(r" ?<([^>]+)> ?", r"<\1>", s)
    return s


def html_cleanup_expr(col: Column) -> Column:
    """Catalyst version of Response#html cleanup (P1). Whole-stage codegen."""
    c = F.regexp_replace(col, "�", "?")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    c = F.regexp_replace(c, r" ?<([^>]+)> ?", "<$1>")
    return c


@F.pandas_udf(T.StringType())
def html_cleanup_udf(series: pd.Series) -> pd.Series:
    return series.map(lambda b: html_cleanup_str(b) if b is not None else None)
