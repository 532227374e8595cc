"""Sitemap ingestion — seed the frontier from sitemap.xml documents.

The reference has no sitemap support (recipes hand-list URLs); a
distributed frontier wants bulk seeding from the standard discovery
surface. Two layers:

- ``sitemap_locs``: pure-Catalyst extraction of ``<loc>`` URLs from a
  DataFrame of sitemap bodies (works for both urlsets and sitemap
  indexes — an index's ``<loc>`` entries are themselves sitemaps).
  ``regexp_extract_all`` + ``posexplode`` keeps document order; no Python.
- ``Crawler.seed`` + ``expand_sitemap_frontier``: iterate index →
  urlset expansion with a bounded depth, like redirect resolution — one
  fetch round per index level, never a driver-side per-URL loop.

XML entity unescape (sitemap spec requires escaping ``&`` etc. in locs)
is handled for the five XML built-ins via chained ``replace`` —
Catalyst-only and matches ``xml.sax.saxutils.unescape``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOC_PATTERN = r"<loc>\s*([^<]+?)\s*</loc>"


def _xml_unescape(col: F.Column) -> F.Column:
    # the five XML predefined entities, &amp; last so "&amp;lt;" decodes
    # to the literal "&lt;" exactly like xml.sax.saxutils.unescape
    out = col
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_locs(
    sitemaps: DataFrame, body_col: str = "resp_body", id_cols: tuple = ("seq",)
) -> DataFrame:
    """One row per ``<loc>`` entry, in document order: ``(*id_cols,
    loc_idx, loc)``. Catalyst-only — regexp + posexplode, no Python."""
    locs = F.regexp_extract_all(F.col(body_col), F.lit(_LOC_PATTERN), F.lit(1))
    return sitemaps.select(
        *[F.col(c) for c in id_cols], F.posexplode(locs).alias("loc_idx", "_raw")
    ).select(*id_cols, "loc_idx", _xml_unescape(F.col("_raw")).alias("loc"))


def is_sitemap_index(body_col: F.Column) -> F.Column:
    """True when the document is a sitemap INDEX (its locs are sitemaps)."""
    return body_col.contains("<sitemapindex")
