"""DUST parameter-rule mining: learn ``ignore_params`` from the crawl.

DUST — Different URLs, Same Text (Bar-Yossef/Keidar/Schonfeld, "Do not
crawl in the DUST", WWW 2007) — costs a crawler duplicate fetches and
a dedup pass downstream. The dominant web case is *irrelevant query
parameters*: session ids, tracking refs, cache busters. This operator
mines them directly from (url, content-digest) evidence so the learned
rules can be fed straight back into URL canonicalization's
``ignore_params`` (reference semantics: sinew's `url.rb` query-param
stripping; here the list becomes data-driven per host).

Method, pair-join-free (never O(n^2) over URLs):

1. Parse each distinct URL into (host, path, sorted param list).
2. For every parameter position, emit one LEAVE-ONE-OUT row: the
   removed ``k=v`` plus the residual key (host, path, the other
   params joined). posexplode + slice — pure Catalyst, map-only.
3. Group by (host, path, residual, removed-param NAME). A group that
   contains >= 2 distinct removed VALUES is an experiment: everything
   else about the URL is held fixed while one parameter varies.
   - all digests equal  -> POSITIVE evidence (param didn't matter)
   - digests differ     -> NEGATIVE evidence (param changed content)
4. Roll up to (host, param): a rule needs >= ``min_support`` positive
   experiments and ZERO negatives (one counterexample kills it —
   mistakenly stripping a relevant param merges distinct pages, which
   is far worse than fetching a dup).

Scale shape: two groupBys (experiment key, then host+param) — both
map-side combinable; shuffle rows are URL fragments, bounded by
sum(#params per URL). No self-join, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def mine_param_rules(
    pages: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 2,
) -> DataFrame:
    """Mine per-host irrelevant-parameter rules from (url, digest)
    rows. Returns ``host, param, support, n_values`` (support =
    positive experiments, n_values = per-experiment distinct values
    summed), only for params with zero negative evidence on that host.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    u = F.col("_u")
    base = (
        pages.select(
            F.col(url_col).alias("_u"), F.col(digest_col).alias("_digest")
        )
        .dropDuplicates(["_u"])
        .select(
            "_u",
            "_digest",
            F.regexp_extract(u, _HOST_RE, 1).alias("host"),
            F.regexp_extract(u, _PATH_RE, 1).alias("path"),
            F.array_sort(
                F.filter(
                    F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
                    lambda p: p != "",
                )
            ).alias("_params"),
        )
        .where(F.size("_params") > 0)
    )
    p = F.col("_params")
    loo = base.select(
        "host",
        "path",
        "_digest",
        "_params",
        F.posexplode("_params").alias("_i", "_kv"),
    ).select(
        "host",
        "path",
        "_digest",
        "_kv",
        F.array_join(
            F.concat(
                F.slice(p, F.lit(1), F.col("_i")),
                F.slice(p, F.col("_i") + 2, F.size(p) - F.col("_i") - 1),
            ),
            "&",
        ).alias("_others"),
    ).select(
        "host",
        "path",
        "_others",
        F.substring_index(F.col("_kv"), "=", 1).alias("param"),
        F.expr("substring(_kv, instr(_kv, '=') + 1)").alias("_value"),
        "_digest",
    )
    experiments = loo.groupBy("host", "path", "_others", "param").agg(
        F.countDistinct("_value").alias("_nv"),
        F.countDistinct("_digest").alias("_nd"),
    )
    judged = experiments.where(F.col("_nv") >= 2).select(
        "host",
        "param",
        (F.col("_nd") == 1).cast("long").alias("_pos"),
        (F.col("_nd") > 1).cast("long").alias("_neg"),
        "_nv",
    )
    rules = (
        judged.groupBy("host", "param")
        .agg(
            F.sum("_pos").alias("support"),
            F.sum("_neg").alias("_negatives"),
            F.sum(F.when(F.col("_pos") == 1, F.col("_nv")).otherwise(0)).alias(
                "n_values"
            ),
        )
        .where((F.col("_negatives") == 0) & (F.col("support") >= min_support))
        .select("host", "param", "support", "n_values")
    )
    return rules
