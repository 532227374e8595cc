"""Training-data pipeline operators: deterministic corpus splitting and
benchmark-contamination detection.

These sit downstream of the crawl/dedup/quality stages in a large-scale
training-data build. Neither exists in the reference (a single-node
scraper, /root/reference/lib/sinew); both are pipeline additions alongside
the dedup/similarity operators (SURVEY.md §2 addendum) and are designed
for the 100 TB regime:

- ``assign_split`` is a pure Catalyst projection — zero shuffle, zero
  Python, stable under any repartitioning.
- ``contamination_report`` broadcasts the (small) benchmark n-gram set and
  partial-aggregates corpus-side, so the only wide operation is the final
  per-document count combine — never an all-pairs or a corpus shuffle by
  n-gram.
- ``sample_stratified`` rebalances a corpus with a per-stratum
  deterministic hash filter — a pushed-down predicate, zero shuffle,
  nested across rates (the r% sample contains the r'% sample for
  r' < r).
- ``vocab_topk`` builds the corpus vocabulary with map-side partial
  aggregation + TakeOrderedAndProject — the shuffle carries one row per
  (partition, distinct token), never per occurrence, and no global sort.
- ``pack_by_token_budget`` assembles training shards by contiguous token
  offset WITHOUT a global single-partition window: a two-phase prefix sum
  (per-bucket window + bounded bucket-offset window over ~`buckets` rows)
  keeps every wide stage partitioned, so the plan survives 10^10 rows
  where a naive ``Window.orderBy(id)`` (one partition holds the corpus)
  would not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assign_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: int = 0,
    buckets: int = 10_000,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment.

    ``split`` is a pure function of the key (never of row order, partition,
    or run), so re-runs, resumes, and cluster re-partitionings assign every
    document identically — and hashing a GROUPING key (canonical URL host,
    dedup-cluster id) instead of the row id keeps near-duplicate families
    inside one split, the property that actually prevents train/test
    leakage. Buckets are allocated to splits by cumulative weight over
    ``buckets``; ``hash_expr`` overrides the bucket source (default
    ``xxhash64(key, salt)``, the engine identity; oracle-facing callers
    pass an md5-derived expression — DuckDB lacks xxhash64).

    Pure projection: no shuffle, no UDF, whole-stage codegen.
    """
    names = list(weights)
    if not names:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = hash_expr if hash_expr is not None else F.xxhash64(F.col(key_col), F.lit(salt))
    bucket = F.pmod(h, F.lit(buckets))
    acc, chain = 0.0, None
    for nm in names[:-1]:
        acc += weights[nm] / total
        cond = bucket < F.lit(int(round(acc * buckets)))
        chain = F.when(cond, nm) if chain is None else chain.when(cond, nm)
    split = chain.otherwise(names[-1]) if chain is not None else F.lit(names[-1])
    return df.withColumn("split", split)


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
    default_rate: float = 0.0,
    buckets: int = 1_000_000,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Deterministic per-stratum downsampling (corpus rebalancing: keep
    10% of English, all of low-resource languages, ...).

    A row survives iff ``pmod(hash(key, salt), buckets) <
    rate[stratum] * buckets`` — a pure function of the key, so re-runs,
    resumes, and repartitionings keep exactly the same rows, and the
    kept set at rate r is a SUBSET of the kept set at r' > r (nested
    samples, the property audits need). Strata missing from ``rates``
    sample at ``default_rate`` (0 = drop). ``hash_expr`` as in
    ``assign_split`` (default xxhash64; oracle-facing callers pass an
    md5-derived bucket). Use a salt distinct from assign_split's so
    sampling doesn't correlate with split assignment.

    Pure Catalyst filter — no shuffle, no UDF; at 100 TB this is a
    pushed-down predicate over the scan.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    h = hash_expr if hash_expr is not None else F.xxhash64(F.col(key_col), F.lit(salt))
    bucket = F.pmod(h, F.lit(buckets))
    thr = None
    for s, r in rates.items():
        t = F.lit(int(round(r * buckets)))
        thr = F.when(F.col(strata_col) == s, t) if thr is None else thr.when(
            F.col(strata_col) == s, t
        )
    dflt = F.lit(int(round(default_rate * buckets)))
    thr = dflt if thr is None else thr.otherwise(dflt)
    return df.where(bucket < thr)


def sample_weighted(
    df: DataFrame,
    weight_col: Column | str,
    key_col: str = "doc_id",
    salt: int = 0,
    buckets: int = 1_000_000,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Per-ROW acceptance-probability sampling: a row survives iff
    ``pmod(hash(key, salt), buckets) < floor(clamp(weight, 0, 1) *
    buckets)`` — the quality-curriculum generalization of
    ``sample_stratified`` (which draws the rate from a stratum table;
    here every row carries its own rate, e.g. its quality score, so
    high-quality documents are kept proportionally more often).

    Same determinism contract: membership is a pure function of the
    key, so reruns/resumes/repartitionings keep identical rows, and
    the kept set is NESTED in the weight (raising a row's weight can
    only add it, never evict others). Pure Catalyst filter — no
    shuffle, no UDF; a pushed-down predicate at scale when the weight
    is a stored column.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = hash_expr if hash_expr is not None else F.xxhash64(F.col(key_col), F.lit(salt))
    bucket = F.pmod(h, F.lit(buckets))
    thr = F.floor(F.greatest(F.lit(0.0), F.least(w, F.lit(1.0))) * buckets).cast(
        "long"
    )
    return df.where(bucket < thr)


def sample_k(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    salt: str = "sk",
    hash_expr: Column | None = None,
) -> DataFrame:
    """Fixed-SIZE uniform sample without replacement: the k rows whose
    salted key hash is smallest — the eval-set/holdout extraction rate-
    based samplers can't give you (Bernoulli sampling yields a random
    COUNT; audits want exactly k). Deterministic (pure function of the
    keys), order-free, and stable under growth in the useful sense:
    adding new rows can only displace old picks by hashing lower, never
    reshuffle the survivors' relative order.

    Scale shape: TakeOrderedAndProject — per-partition top-k heaps then
    a k-row merge, never a global sort; 0 wide exchanges. Returns the
    original columns plus nothing; ordering of the result is by the
    hash (stable tie-break by key is inherent — the hash IS of the
    key)."""
    if k <= 0:
        raise ValueError("k must be positive")
    h = (
        hash_expr
        if hash_expr is not None
        else F.xxhash64(F.lit(salt), F.col(key_col))
    )
    return df.orderBy(h.asc()).limit(k)


def vocab_topk(
    docs: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-k corpus vocabulary: (token, n) for the k most frequent
    whitespace tokens (same token rule as functions/text.py
    token_count_expr), ties broken by token ascending so the result is
    total-order deterministic.

    Scale shape: explode -> hash aggregate with map-side partial
    aggregation (the shuffle moves one row per distinct token per
    partition, not one per token occurrence) -> TakeOrderedAndProject
    (each partition keeps k rows, the driver merges P*k — never a
    global sort of the vocabulary).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.split(F.trim(txt), r"\s+")
    return (
        docs.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Assign documents to training shards by contiguous token offset.

    Documents are laid out in ascending ``id_col`` order (ids must be
    numeric and unique — the doc key, so the layout is deterministic and
    replayable); ``token_offset`` is the exclusive running sum of
    ``n_tokens_col`` and ``shard = floor(token_offset / budget)``, i.e.
    shard k owns token offsets [k*budget, (k+1)*budget). A document whose
    tokens straddle a boundary belongs to the shard its FIRST token lands
    in — the fixed-offset rule (not best-fit bin packing) precisely so the
    assignment is order-free associative and SQL-replayable.

    Scale shape (the point of this function): the global prefix sum is
    computed in two phases — (1) a window partitioned by a monotone id
    bucket (``floor((id-min)/width)``, ~``buckets`` cells) gives
    within-bucket running sums in parallel; (2) bucket totals (one row per
    bucket, bounded and tiny) take a single-partition window to become
    bucket base offsets, broadcast-joined back. No stage ever holds the
    corpus in one partition. The only driver-side value is the (min, max)
    id pair from a 1-row aggregate.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    lo, hi = df.agg(
        F.min(F.col(id_col).cast("double")), F.max(F.col(id_col).cast("double"))
    ).first()
    if lo is None:
        return df.select(
            F.col(id_col),
            F.col(n_tokens_col),
            F.lit(0).cast("bigint").alias("token_offset"),
            F.lit(0).cast("bigint").alias("shard"),
        )
    width = max((hi - lo + 1.0) / float(buckets), 1.0)
    from pyspark.sql.window import Window

    b = F.floor((F.col(id_col).cast("double") - F.lit(lo)) / F.lit(width))
    t = df.select(
        F.col(id_col), F.col(n_tokens_col).cast("bigint").alias("_ntok"), b.alias("_b")
    )
    within = Window.partitionBy("_b").orderBy(id_col)
    t = t.withColumn(
        "_within_before",
        F.coalesce(F.sum("_ntok").over(within), F.lit(0)) - F.col("_ntok"),
    )
    totals = t.groupBy("_b").agg(F.sum("_ntok").alias("_btot"))
    base_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.select(
        "_b", F.coalesce(F.sum("_btot").over(base_w), F.lit(0)).alias("_base")
    )
    out = t.join(F.broadcast(bases), "_b").select(
        id_col,
        F.col("_ntok").alias(n_tokens_col),
        (F.col("_base") + F.col("_within_before")).alias("token_offset"),
        F.floor((F.col("_base") + F.col("_within_before")) / F.lit(budget))
        .cast("bigint")
        .alias("shard"),
    )
    return out


def _word_ngrams(c: Column, n: int) -> Column:
    """Distinct word n-grams — identical construction to
    ``dedup.ngram_jaccard_pairs`` so the DuckDB oracle formula is shared."""
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark contamination: per corpus document, how many of its
    distinct word n-grams occur anywhere in the benchmark set.

    Scale shape: the benchmark side collapses to DISTINCT n-grams (eval
    sets are megabytes against a 100 TB corpus) and broadcasts; the corpus
    explodes to (doc, gram) rows that hit the broadcast join map-side, and
    the per-document count partial-aggregates before the single combine
    shuffle. Returns only contaminated documents:
    (doc_id, n_grams, n_contaminated, frac).
    """
    corp = corpus.select(
        F.col(id_col), _word_ngrams(F.col(text_col), n).alias("ng")
    ).select(
        id_col, F.size("ng").alias("n_grams"), F.explode("ng").alias("gram")
    )
    bench = benchmark.select(
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    ).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        corp.join(bench, "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .withColumn(
            "frac", F.col("n_contaminated").cast("double") / F.col("n_grams")
        )
    )


def diversified_topk(
    df: DataFrame,
    n: int,
    group_col: str = "host",
    value_col: str = "value",
    id_col: str = "doc_id",
) -> DataFrame:
    """Diversity-aware top-n selection: pick the n highest-value rows
    under a round-robin group constraint — every group's best row is
    taken before ANY group's second-best, then every second-best
    before any third, and so on. This is the standard guard against a
    value signal that concentrates on a few hosts (pure top-n from a
    crawl would return one domain's entire archive; training-data
    curation wants the value ranking WITHIN a domain-diversity
    envelope).

    Deterministic total order: (group_rank asc, value desc, id asc) —
    ties in value break by id, so the selected SET is unique and
    partition-independent. Output adds ``group_rank`` (1-based rank of
    the row within its group).

    Scale shape: one window partitioned by the GROUP (host-sized
    partitions, the same skew profile as every per-host stage in the
    engine) and then a distributed top-n on the composite key —
    TakeOrderedAndProject, never a global sort of the corpus.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).desc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("group_rank", F.row_number().over(w))
    return ranked.orderBy(
        F.col("group_rank").asc(), F.col(value_col).desc(), F.col(id_col).asc()
    ).limit(n)
