"""Explicit skew handling — salted joins and the engine's skew doctrine.

Where skew is handled in this engine (north_rule: "partitioning / shuffle /
skew handled explicitly"):

1. **Fetch stage (paced)**: a hot host cannot be salted — politeness
   REQUIRES all of a host's requests in one group to pace them. Skew is
   bounded instead by the per-host round cap
   (operators/frontier.py:per_host_cap): no host contributes more than
   ``cap`` rows to a round, so the slowest fetch task is bounded by
   ``cap * rate_limit`` regardless of host distribution.
2. **Fetch stage (unpaced)**: no host grouping at all — rows ride the
   uniform key-hash partitioning from the dedup repartition
   (crawl.py:run_round), which is strictly better than salting.
3. **Dedup / seen joins**: keys are xxhash64 hashes — uniform by
   construction; AQE skew-join covers residual imbalance.
4. **Skewed shuffle joins** (hot join key, dim too big to broadcast,
   shuffle-hash plan where AQE's skew-split does not apply): explicit
   salting below.

``salted_join`` implements the classic replicate-dim salt: fact rows get a
deterministic salt in ``[0, salts)``; every dim row is replicated ``salts``
times; the join runs on ``(key, salt)`` so a hot key's fact rows spread
over ``salts`` shuffle partitions instead of pinning one. Cost: dim side
grows ``salts``x — size salts to the observed hot-key factor, not higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``key`` with dim-replication
    salting. ``salt_from`` names a fact column whose hash assigns the salt
    (deterministic for replay) — pass a unique column (row id) when
    available; the fallback hashes the WHOLE fact row, which is equally
    deterministic under task retries / AQE re-planning (a partition-id
    based salt is not) and spreads a hot key as long as its rows differ
    anywhere.

    Only fact-preserving joins are supported (inner / left / left_semi /
    left_anti): with how='right'/'full' every UNMATCHED dim row would
    surface ``salts`` times — a correctness bug, so those raise.

    Returns the joined frame without the internal salt column.
    """
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join(how={how!r}): dim replication duplicates unmatched "
            "dim rows; use inner/left joins (or salt the other side)"
        )
    if salt_from is None:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salts))
    else:
        salt_expr = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salts))
    f = fact.withColumn(SALT_COL, salt_expr.cast("int"))
    d = dim.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))).withColumn(
        SALT_COL, F.col(SALT_COL).cast("int")
    )
    return f.join(d, [key, SALT_COL], how).drop(SALT_COL)
