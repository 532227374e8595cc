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

# case-insensitive, optional namespace prefix (<sm:loc>), optional CDATA
# wrapper (<loc><![CDATA[...]]></loc> — permitted by the sitemap spec).
# Lazy body stops at the first closing tag; CDATA content also flows
# through the entity unescape (harmless for URLs, which the spec requires
# to be entity-escaped OR CDATA-wrapped). The prefix alternation EXCLUDES
# the well-known sitemap-extension namespaces (image:/video:/news:/
# xhtml:/mobile:) — a Google image sitemap nests <image:loc>photo.jpg
# inside each <url>, and matching it would seed media URLs as pages and
# shift document-order seqs for the real locs.
_EXT_PREFIXES = r"(?:image|video|news|xhtml|mobile):"
_LOC_PATTERN = (
    r"(?is)<(?:(?!" + _EXT_PREFIXES + r")[\w.-]+:)?loc\s*>\s*(?:<!\[CDATA\[)?"
    r"(.*?)(?:\]\]>)?\s*</(?:(?!" + _EXT_PREFIXES + r")[\w.-]+:)?loc\s*>"
)


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


_URL_BLOCK = r"(?is)<(?:[\w.-]+:)?url\s*>(.*?)</(?:[\w.-]+:)?url\s*>"
_LOC_IN = r"(?is)<(?:[\w.-]+:)?loc\s*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</"
_LASTMOD_IN = r"(?is)<(?:[\w.-]+:)?lastmod\s*>\s*(.*?)\s*</"


def sitemap_entries(
    sitemaps: DataFrame, body_col: str = "resp_body", id_cols: tuple = ("seq",)
) -> DataFrame:
    """One row per ``<url>`` block, in document order: ``(*id_cols,
    loc_idx, loc, lastmod)`` with ``lastmod`` NULL when the block omits
    it. Catalyst-only — block regexp + per-block transform + posexplode,
    no Python. Feeds sitemap_stale: the sitemap protocol's change-
    discovery path (fetch only what ``<lastmod>`` says moved)."""
    blocks = F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK), F.lit(1))
    ent = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC_IN, 1).alias("loc"),
            F.regexp_extract(b, _LASTMOD_IN, 1).alias("lastmod"),
        ),
    )
    out = sitemaps.select(
        *[F.col(c) for c in id_cols], F.posexplode(ent).alias("loc_idx", "_e")
    )
    return out.select(
        *id_cols,
        "loc_idx",
        _xml_unescape(F.col("_e.loc")).alias("loc"),
        F.when(F.col("_e.lastmod") != "", F.col("_e.lastmod")).alias("lastmod"),
    )


def sitemap_stale(
    entries: DataFrame,
    seen: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    seen_url_col: str = "url",
    fetched_at_col: str = "fetched_at",
    canonicalize=None,
) -> DataFrame:
    """Sitemap-driven recrawl gate: of the sitemap's entries, the ones
    worth (re)fetching — never seen (``reason='new'``), no lastmod
    claim (``'unknown'`` — the sitemap can't prove freshness), or
    lastmod on/after the stored fetch DAY (``'modified'``). Same-day
    collisions refetch (conservative: date-granularity lastmod can't
    order within a day). Entries provably unchanged are dropped — the
    fetch that conditional revalidation would have 304'd is never made
    at all.

    Day arithmetic is timezone-free on both sides: lastmod's leading
    ``yyyy-MM-dd`` through ``to_date``/``unix_date`` (pure calendar),
    fetched_at (epoch seconds) through floor-div 86400 (UTC days) — no
    session-timezone dependence, so replay and oracles agree anywhere.

    One aggregate + one equi-join on the URL (the seen side pre-shrinks
    to max(fetched_at) per url, so the join ships one row per seen URL);
    at frontier scale both sides are url-hashed — the same safe shape as
    anti_join_seen. Compose: ``crawler.seed_df(sitemap_stale(...))``
    with ``expires``/``force`` crawl options for the refetch.

    ``canonicalize``: the crawler's URL canonicalizer (a Column->Column
    fn, e.g. ``crawler.canonicalize``). The seen table stores CANONICAL
    urls (crawl.py commits canonical_url), so a raw sitemap loc the
    canonicalizer rewrites (param order, tracking params) would never
    match and be re-classified 'new' on EVERY poll — pass the same
    canonicalizer the crawl uses so the join compares like with like.
    The emitted ``loc`` stays raw (it is what gets seeded)."""
    # try_to_date, not to_date: under Spark 4's default ANSI mode a single
    # malformed <lastmod> (common in real sitemaps) would raise
    # CAST_INVALID_INPUT and abort the job; try_to_date yields NULL so the
    # entry falls into the conservative 'unknown' (refetch) bucket.
    lm_day = F.unix_date(F.try_to_date(F.substring(F.col(lastmod_col), 1, 10)))
    s = seen.groupBy(F.col(seen_url_col).alias("_u")).agg(
        F.max(fetched_at_col).alias("_fa")
    )
    join_key = entries[loc_col]
    if canonicalize is not None:
        join_key = canonicalize(join_key)
    j = entries.join(s, join_key == s["_u"], "left")
    fetched_day = F.floor(F.col("_fa") / 86400)
    reason = (
        F.when(F.col("_fa").isNull(), F.lit("new"))
        .when(lm_day.isNull(), F.lit("unknown"))
        .when(lm_day >= fetched_day, F.lit("modified"))
    )
    return (
        j.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .drop("_u", "_fa")
    )


def is_sitemap_index(body_col: F.Column) -> F.Column:
    """True when the document is a sitemap INDEX (its locs are sitemaps).
    Case-insensitive; accepts a namespace prefix (<sm:sitemapindex>)."""
    return body_col.rlike(r"(?i)<([\w.-]+:)?sitemapindex[\s>]")


LOC_STRIDE = 100_000  # seq slots per parent sitemap for nested locs


def expand_sitemap_frontier(crawler, sitemap_urls: list[str], max_depth: int = 3) -> DataFrame:
    """Iterative index → urlset expansion through the crawler: fetch the
    current level's sitemaps (one exactly-once crawl round per level —
    never a driver-side per-URL loop), split fetched docs into indexes
    (their locs are sitemaps → next level) and urlsets (their locs are
    page URLs → output). Returns the frontier-ready page-URL DataFrame
    ``(url, seq)`` with seq = nested document order, so
    ``crawler.seed_df(result)`` starts the page crawl in sitemap order.

    Sitemaps already in the seen set are NOT refetched (exactly-once
    applies to sitemaps too) and contribute no locs to THIS expansion —
    re-expansion of a partially-crawled tree wants ``expires``/``force``
    options on the crawler, same as any refetch."""
    spark = crawler.spark
    urls = spark.createDataFrame(
        [(u, i) for i, u in enumerate(sitemap_urls)], "url string, seq long"
    )
    pages: DataFrame | None = None
    for _ in range(max_depth):
        if urls.isEmpty():
            break
        crawler.seed_df(urls)
        crawler.run_round()
        snap = crawler.fetched_t.current_snapshot()
        fetched = crawler.fetched_t.read_delta(snap).where(
            F.col("status").between(200, 299) & F.col("resp_body").isNotNull()
        )
        idx = F.coalesce(is_sitemap_index(F.col("resp_body")), F.lit(False))
        locs = sitemap_locs(
            fetched.select("seq", "resp_body", idx.alias("is_index")),
            body_col="resp_body",
            id_cols=("seq", "is_index"),
        ).select(
            (F.col("seq") * LOC_STRIDE + F.col("loc_idx")).alias("seq"),
            F.col("loc").alias("url"),
            "is_index",
        )
        level_pages = locs.where(~F.col("is_index")).select("url", "seq")
        pages = level_pages if pages is None else pages.unionByName(level_pages)
        urls = locs.where(F.col("is_index")).select("url", "seq")
    if pages is None:
        pages = spark.createDataFrame([], "url string, seq long")
    return pages
