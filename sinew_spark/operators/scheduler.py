"""Freshness-driven recrawl scheduling: change-rate estimation over
fetch history -> recrawl priority.

The reference crawls each URL once per cache TTL (httpdisk expiry,
lib/sinew/base.rb `get` + options[:expires]); a production crawler at
10^10 URLs can't afford uniform TTLs — it should revisit pages in
proportion to how often they actually change (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS'03: the
greedy freshness-maximizing schedule revisits by estimated change
frequency x staleness). This module estimates per-URL change rates
from the engine's own fetch history (the seen/snapshot table already
records a content fingerprint per fetch round) and emits a priority
the frontier's ``take_round_budget`` can order by — closing the loop:
crawl -> observe changes -> re-prioritize -> crawl.

Estimator per URL over its observed rounds:

- ``obs``      = number of rounds the URL was fetched
- ``changes``  = count of consecutive-observation fingerprint flips
                 (LAG over rounds, per URL)
- ``change_rate`` = changes / max(obs - 1, 1)   (MLE of the per-round
                 flip probability given Bernoulli sampling)
- ``staleness``   = current_round - last observed round
- ``priority``    = change_rate * staleness     (expected number of
                 unseen changes — the greedy revisit score)

Scale shape: ONE hash shuffle on the URL key — the LAG window
(partitionBy key, orderBy round) and the per-key aggregate share the
same partitioning, so Catalyst reuses the exchange; no join, no
driver state. Output is O(distinct URLs), dominated by the history
scan, which prunes to (key, round, fingerprint) columns only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def recrawl_priority(
    history: DataFrame,
    current_round: int,
    key: str = "key",
    round_col: str = "round",
    fingerprint: str = "fingerprint",
    round_digits: int = 6,
) -> DataFrame:
    """Score every URL in ``history`` for recrawl urgency.

    ``history`` holds one row per (url key, fetch round) with the
    content fingerprint observed that round. Returns one row per key:
    (key, obs, changes, change_rate, staleness, priority), with
    change_rate/priority rounded to ``round_digits`` (each is a single
    division/multiplication of exact integers — deterministic, no
    float-sum ordering hazard).
    """
    if current_round < 0:
        raise ValueError("current_round must be non-negative")
    k, r, fp = F.col(key), F.col(round_col), F.col(fingerprint)
    w = Window.partitionBy(key).orderBy(round_col)
    flips = history.select(
        k.alias("key"),
        r.alias("round"),
        (fp != F.lag(fp).over(w)).cast("int").alias("flip"),
    )
    agg = flips.groupBy("key").agg(
        F.count(F.lit(1)).alias("obs"),
        F.coalesce(F.sum("flip"), F.lit(0)).cast("long").alias("changes"),
        F.max("round").alias("last_round"),
    )
    rate: Column = F.round(
        F.col("changes") / F.greatest(F.col("obs") - 1, F.lit(1)), round_digits
    )
    staleness = (F.lit(current_round) - F.col("last_round")).cast("long")
    return agg.select(
        "key",
        "obs",
        "changes",
        rate.alias("change_rate"),
        staleness.alias("staleness"),
        F.round(rate * staleness, round_digits).alias("priority"),
    )
