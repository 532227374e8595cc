"""Crawl-trap detection: URL-template explosion, depth, and cycles.

Real crawls die in traps — calendar pages that mint a URL per day
forever, session-id permutations, and path cycles (/a/b/a/b/...).
The reference never needs this (recipes enumerate finite URL lists);
a 10^10-URL frontier does: traps inflate the frontier with unbounded
low-value URLs and starve real hosts of politeness budget.

Detection is per URL TEMPLATE — the URL with digit runs collapsed
(``/cal/2021/7/14`` -> ``/cal/N/N/N``), keyed by host. Three signals:

- explosion:  many distinct URLs collapse to one template
  (the calendar/pagination signature)
- depth:      pathological path depth
- repetition: repeated path segments (cycle signature), measured as
  ``n_segments - n_distinct_segments``

Scale shape: ONE hash shuffle — a groupBy on (host, template) with
map-side partial aggregation; per-URL depth/repeat metrics are pure
Catalyst array ops computed before the shuffle. The prune step joins
the frontier against the flagged template set, which is tiny by
construction (traps are few templates with huge fan-out) — broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sinew_spark.functions.urls import host_expr, path_expr


def url_template_expr(url: Column) -> Column:
    """host|path with every digit run collapsed to ``N`` — the template
    identity URL-explosion is measured over. Query strings excluded:
    param churn is handled by canonicalization/ignore_params upstream."""
    return F.concat(
        host_expr(url), F.lit("|"), F.regexp_replace(path_expr(url), "[0-9]+", "N")
    )


def _segments(url: Column) -> Column:
    return F.filter(F.split(path_expr(url), "/"), lambda s: s != "")


def detect_crawl_traps(
    frontier: DataFrame,
    url_col: str = "url",
    max_urls_per_template: int = 100,
    max_depth: int = 8,
    max_repeated_segments: int = 3,
) -> DataFrame:
    """Per-(host, template) trap statistics over a frontier/seen set.

    Returns (host, template, n_urls, max_depth, max_repeats, is_trap)
    where is_trap fires on any signal: template fan-out above
    ``max_urls_per_template``, any member URL deeper than ``max_depth``
    segments, or any member with ``max_repeated_segments``+ repeated
    path segments. Thresholds are per-deployment tuning knobs; the
    defaults are conservative (flag late, never starve a real site).
    """
    if min(max_urls_per_template, max_depth, max_repeated_segments) <= 0:
        raise ValueError("trap thresholds must be positive")
    u = F.col(url_col)
    segs = _segments(u)
    per_url = frontier.select(
        host_expr(u).alias("host"),
        url_template_expr(u).alias("template"),
        F.size(segs).alias("depth"),
        (F.size(segs) - F.size(F.array_distinct(segs))).alias("repeats"),
    )
    agg = per_url.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.max("repeats").alias("max_repeats"),
    )
    return agg.withColumn(
        "is_trap",
        (F.col("n_urls") > max_urls_per_template)
        | (F.col("max_depth") > max_depth)
        | (F.col("max_repeats") >= max_repeated_segments),
    )


def prune_traps(
    frontier: DataFrame, traps: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop frontier URLs whose template is trap-flagged. The flagged
    set is small (few templates, huge fan-out) — broadcast anti-join,
    no shuffle of the frontier side."""
    flagged = F.broadcast(
        traps.where(F.col("is_trap")).select("template").distinct()
    )
    return (
        frontier.withColumn("__tpl", url_template_expr(F.col(url_col)))
        .join(flagged, F.col("__tpl") == flagged["template"], "left_anti")
        .drop("__tpl")
    )
