"""hreflang alternate-language clustering — multilingual dup grouping.

Real sites publish each page in k languages and advertise the set via
``<link rel="alternate" hreflang="xx" href="...">`` (plus an optional
``x-default``). For corpus building these variants are one logical
document: near-dup machinery won't catch them (different languages ≠
similar text), so the cluster signal must come from the markup. The
reference can extract the tags with a recipe's ``css`` call
(lib/sinew/response.rb noko surface); the clustering itself is engine
work.

Three layers:

- ``extract_hreflang`` — one row per advertised variant, map-only
  Catalyst (link-tag regexp + transform + posexplode), same idiom as
  sources/feeds.py autodiscovery. Zero shuffle; fuses into the scan.
- ``cluster_by_hreflang`` — the spec-shaped fast path: hreflang sets
  are required to be COMPLETE and RECIPROCAL (every variant lists every
  other, including itself), so each page's cluster id is simply the
  lexicographic min over its own advertised set — computed per-row from
  the extraction array, ZERO shuffle at any corpus size.
- ``hreflang_components`` — the robust path for broken markup
  (non-reciprocal / partial sets): connected components over the
  (page_url → href) edge graph via operators/graph.py — min-label
  propagation with auto-degrade, one shuffle per round.

At 100 TB the fast path is free (map-only) and the CC path is the same
bounded machinery dedup clustering already runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components

# a <link ...> tag; per-tag attribute extraction below
_LINK_TAG = r"(?is)<link\s[^>]*>"
_HREFLANG = r"(?is)hreflang\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))"
_HREF = r"(?is)href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))"
_REL_ALT = r"(?i)rel\s*=\s*[\"']?alternate[\"']?"


def _attr(tag: F.Column, pattern: str) -> F.Column:
    return F.coalesce(
        *[
            F.when(F.regexp_extract(tag, pattern, g) != "", F.regexp_extract(tag, pattern, g))
            for g in (1, 2, 3)
        ]
    )


def extract_hreflang(
    pages: DataFrame, body_col: str = "resp_body", id_cols: tuple = ("seq",)
) -> DataFrame:
    """One row per ``<link rel="alternate" hreflang=...>`` tag, in
    document order: ``(*id_cols, variant_idx, lang, href)``. ``lang``
    is lowercased (BCP 47 is case-insensitive; ``x-default`` included).
    Map-only Catalyst — tag regexp + filter + transform + posexplode."""
    tags = F.filter(
        F.regexp_extract_all(F.col(body_col), F.lit(_LINK_TAG), F.lit(0)),
        lambda t: t.rlike(_REL_ALT) & t.rlike(r"(?i)hreflang\s*="),
    )
    ent = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(_attr(t, _HREFLANG)).alias("lang"),
            _attr(t, _HREF).alias("href"),
        ),
    )
    out = pages.select(
        *[F.col(c) for c in id_cols],
        F.posexplode(ent).alias("variant_idx", "_v"),
    )
    return out.where(F.col("_v.href").isNotNull()).select(
        *id_cols, "variant_idx", F.col("_v.lang").alias("lang"),
        F.col("_v.href").alias("href"),
    )


def cluster_by_hreflang(
    pages: DataFrame,
    body_col: str = "resp_body",
    url_col: str = "url",
    id_cols: tuple = ("seq",),
) -> DataFrame:
    """Spec-shaped clustering: per page, ``cluster`` = lexicographic min
    over its advertised variant set (self included — complete/reciprocal
    sets make the local min the global min), ``langs`` = the advertised
    languages in document order, ``n_variants`` their count. ZERO
    shuffle — everything is computed from the page's own array. Pages
    with no hreflang markup cluster as themselves with an empty set."""
    tags = F.filter(
        F.regexp_extract_all(F.col(body_col), F.lit(_LINK_TAG), F.lit(0)),
        lambda t: t.rlike(_REL_ALT) & t.rlike(r"(?i)hreflang\s*="),
    )
    hrefs = F.filter(
        F.transform(tags, lambda t: _attr(t, _HREF)), lambda h: h.isNotNull()
    )
    langs = F.filter(
        F.transform(tags, lambda t: F.lower(_attr(t, _HREFLANG))),
        lambda x: x.isNotNull(),
    )
    return pages.select(
        *[F.col(c) for c in id_cols],
        F.col(url_col).alias("url"),
        F.coalesce(
            F.array_min(F.concat(hrefs, F.array(F.col(url_col)))),
            F.col(url_col),
        ).alias("cluster"),
        langs.alias("langs"),
        F.size(hrefs).alias("n_variants"),
    )


def hreflang_components(
    entries: DataFrame, page_url_col: str = "url", href_col: str = "href"
) -> DataFrame:
    """Robust clustering for broken (non-reciprocal/partial) hreflang
    graphs: connected components over page→href edges. Returns
    ``(v, cluster)`` with cluster = min url in the component — the same
    contract as dedup clustering, so downstream collapse code is
    shared."""
    edges = entries.select(
        F.col(page_url_col).alias("src"), F.col(href_col).alias("dst")
    ).where(F.col("dst").isNotNull())
    return connected_components(edges)
