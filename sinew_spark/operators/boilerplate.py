"""Host-level boilerplate detection over interleaved span documents.

Corpus-statistical template removal: a span (text block, nav link,
logo image) that repeats on a large fraction of a host's pages is site
chrome, not content. This is the cross-page-frequency family of
boilerplate removal (Gibson/Punera/Tomkins "The volume and evolution
of web page templates", WWW 2005; the same signal CommonCrawl-style
pipelines use to strip nav/footer blocks before LM training), applied
to the engine's interleaved span model (doc_id, spans:array<struct<
kind, text, media_ref, offset>>). It complements the *per-page*
heuristic in operators/interleave.py:main_content_spans — that one
classifies blocks from local shape (token counts, neighbors); this one
needs corpus statistics and therefore a shuffle.

Span identity is the md5 of (kind, text, media_ref) joined with an
0x1f separator — byte-replayable in SQL, independent of offset so the
same footer matches at any position. A span repeated *within* one page
counts once (per-page distinct), so a page that tiles the same promo
ten times cannot promote it to "appears everywhere" on its own.

Thresholding is exact integer arithmetic: a key is boilerplate on a
host iff

    host_pages >= min_pages  AND  n_pages * den >= host_pages * num

where num/den is the exact rational form of ``min_frac`` — no float
compare, so the >= boundary is deterministic and SQL-replayable.

Scale shape (100 TB design point):
- ``detect_host_boilerplate``: explode (Generate, no shuffle) ->
  ONE distinct-aggregate on (host, span_key) counting distinct docs
  (Spark's two-stage partial/final expand; keys shuffled, bodies are
  16-byte hashes) + a combinable groupBy(host) for page totals joined
  on host. Nothing O(n^2); shuffle volume is |distinct spans| hashes,
  not corpus bytes.
- ``strip_host_boilerplate``: boilerplate keys folded to ONE array row
  per host, then a broadcast hash join on host (hosts << docs) and a
  Catalyst ``filter``/``array_contains`` over the span array — the
  strip itself is zero-shuffle, zero-Python, embarrassingly parallel.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Unit separator joining the key fields — cannot appear in well-formed
#: span text, keeps ("a","b") distinct from ("ab","").
KEY_SEP = "\x1f"


def span_key(s: Column) -> Column:
    """md5 identity of a span's (kind, text, media_ref) — offset-free,
    null-safe (null and '' collapse together, which is what template
    matching wants), replayable in DuckDB as
    ``md5(kind || chr(31) || coalesce(text,'') || chr(31) ||
    coalesce(media_ref,''))``."""
    return F.md5(
        F.concat(
            F.coalesce(s["kind"], F.lit("")),
            F.lit(KEY_SEP),
            F.coalesce(s["text"], F.lit("")),
            F.lit(KEY_SEP),
            F.coalesce(s["media_ref"], F.lit("")),
        )
    )


def _frac(min_frac: float) -> Fraction:
    fr = Fraction(min_frac).limit_denominator(1_000_000)
    if not (0 < fr <= 1):
        raise ValueError("min_frac must be in (0, 1]")
    return fr


def detect_host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    spans_col: str = "spans",
    min_pages: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """Boilerplate key table: one row per (host, span_key) that clears
    the threshold, with its evidence counts.

    Returns columns ``host, span_key, kind, n_pages, host_pages``
    (kind = any-value of the span kind for that key — single-valued by
    construction since kind is part of the key).
    """
    if min_pages < 1:
        raise ValueError("min_pages must be >= 1")
    fr = _frac(min_frac)

    s = F.col("_s")
    per_span = docs.select(
        F.col(host_col).alias("host"),
        F.col(doc_col).alias("_doc"),
        F.explode(spans_col).alias("_s"),
    ).select(
        "host",
        "_doc",
        span_key(s).alias("span_key"),
        s["kind"].alias("kind"),
    )
    counts = per_span.groupBy("host", "span_key").agg(
        F.countDistinct("_doc").alias("n_pages"),
        F.first("kind").alias("kind"),
    )
    totals = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(doc_col).alias("host_pages")
    )
    joined = counts.join(F.broadcast(totals), "host")
    return joined.filter(
        (F.col("host_pages") >= min_pages)
        & (F.col("n_pages") * fr.denominator >= F.col("host_pages") * fr.numerator)
    ).select("host", "span_key", "kind", "n_pages", "host_pages")


def strip_host_boilerplate(
    docs: DataFrame,
    boilerplate: DataFrame,
    host_col: str = "host",
    spans_col: str = "spans",
    out_col: str = "content_spans",
) -> DataFrame:
    """Remove each host's boilerplate spans from every page of that
    host. Adds ``out_col`` with the surviving spans (original order and
    offsets preserved); pages on hosts with no detected boilerplate
    pass through unchanged.

    The key set is folded to one array per host and broadcast — the
    strip is a zero-shuffle Catalyst projection on the docs side.
    """
    keys = boilerplate.groupBy("host").agg(
        F.array_sort(F.collect_set("span_key")).alias("_bp_keys")
    )
    joined = docs.join(
        F.broadcast(keys), docs[host_col] == keys["host"], "left"
    ).drop(keys["host"])
    bp = F.coalesce(F.col("_bp_keys"), F.array().cast("array<string>"))
    kept = F.filter(
        F.col(spans_col), lambda sp: ~F.array_contains(bp, span_key(sp))
    )
    return joined.withColumn(out_col, kept).drop("_bp_keys")
