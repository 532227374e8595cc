"""Corpus mixing: exact-apportionment stratified selection.

Training-data recipes are stated as MIXTURES — "60% web, 30% code,
10% books", "cap any one language at 20%" — and the mixing step is
where a 100 TB corpus becomes a training set with the intended
composition.  Sampling each stratum independently with a rate gets
the EXPECTED mix; this operator apportions an exact row budget across
strata (largest-remainder / Hamilton, the same exact method as
scheduler.allocate_host_budget) and takes exactly that many rows per
stratum, so sum(taken) == min(total, available) always and the
realized mix is the closest integer mix to the requested one.

Availability waterfill: a stratum with fewer rows than its quota
contributes everything it has, and the shortfall is re-apportioned
among the remaining strata by their weights — iterated to fixpoint
(at most one round per stratum; all driver-side over the tiny
per-stratum count table).

Within-stratum selection is the engine's deterministic "random":
rank by md5(seed | id) with the id as tie-break, take the quota — the
same replayable-pick rule as pipeline.sample_k, so reruns and other
engines select the identical rows.

Scale shape: one combinable groupBy(strata) count (driver-collected —
strata counts are a handful of rows, documented bound), one
strata-partitioned window for the hash rank (per-stratum skew is the
stratum size — the same profile as every per-host operator here), and
a broadcast quota join.  No global sort, no driver data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apportion_waterfill(
    weights: dict, available: dict, total: int
) -> dict:
    """Exact Hamilton apportionment of ``total`` by ``weights``,
    waterfilled against per-stratum ``available`` counts.  Pure
    deterministic integer math; returns {stratum: quota} with
    sum(quotas) == min(total, sum(available over weighted strata))."""
    if total < 0:
        raise ValueError("total must be >= 0")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    quotas = {s: 0 for s in weights}
    active = {
        s: w
        for s, w in weights.items()
        if w > 0 and available.get(s, 0) > 0
    }
    remaining = total
    while remaining > 0 and active:
        wsum = sum(active.values())
        base = {s: remaining * w // wsum for s, w in active.items()}
        rem = remaining - sum(base.values())
        # largest remainder, ties to the smaller stratum key (total
        # order -> replayable)
        order = sorted(
            active,
            key=lambda s: (-(remaining * active[s] % wsum), str(s)),
        )
        for s in order[:rem]:
            base[s] += 1
        for s, q in base.items():
            quotas[s] += min(q, available[s] - quotas[s])
        for s in list(active):
            if quotas[s] >= available[s]:
                del active[s]
        # every pass either grants the full `remaining` (no stratum
        # capped — the next remaining is 0 and the loop exits) or caps
        # at least one stratum out of `active`, so the loop runs at
        # most len(weights) + 1 times
        remaining = total - sum(quotas.values())
    return quotas


def mix_corpus(
    docs: DataFrame,
    strata_col: str,
    weights: dict,
    total: int,
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Select an exact-composition sample: ``total`` rows apportioned
    across ``weights`` (relative integer weights per stratum value),
    deterministic hash-pick within each stratum.

    Returns the selected rows with their original columns plus
    ``mix_rank`` (1-based pick order within the stratum).  Strata not
    in ``weights`` are excluded; weighted strata missing from the data
    forfeit their share to the rest (waterfill).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    counts = {
        r["s"]: r["c"]
        for r in docs.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    quotas = apportion_waterfill(weights, counts, total)
    quota_rows = [(s, q) for s, q in quotas.items() if q > 0]
    spark = docs.sparkSession
    if not quota_rows:
        return docs.limit(0).withColumn("mix_rank", F.lit(1))
    strata_type = docs.schema[strata_col].dataType
    from pyspark.sql import types as T

    qdf = spark.createDataFrame(
        quota_rows,
        T.StructType(
            [
                T.StructField(strata_col, strata_type),
                T.StructField("_quota", T.LongType()),
            ]
        ),
    )
    from pyspark.sql.window import Window

    hv = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(hv, F.col(id_col))
    return (
        docs.join(F.broadcast(qdf), strata_col)
        .withColumn("mix_rank", F.row_number().over(w))
        .where(F.col("mix_rank") <= F.col("_quota"))
        .drop("_quota")
    )
