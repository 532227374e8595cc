"""Mergeable cardinality sketches: HyperLogLog registers in pure Catalyst.

A 10^10-URL frontier needs distinct counts everywhere — URLs seen per
host, per template, per round — and exact countDistinct shuffles every
key. HyperLogLog (Flajolet et al. 2007) answers with a fixed 2^p-cell
register table: hash each key, route it to a register by its top p
bits, keep the max leading-zero run of the remaining bits. Registers
are tiny, MERGEABLE (elementwise max — union of sketches = sketch of
union, so per-partition partial aggregation is exact), and here fully
deterministic: the hash is the engine's oracle-facing 60-bit md5, so
an independent SQL engine reproduces every register bit-for-bit.

Scale shape: one narrow projection + one groupBy(register) MAX whose
input collapses map-side to at most 2^p rows per partition — the
shuffle carries registers, never keys. Estimation happens on the
driver over 2^p rows (``hll_estimate``), the standard bias-corrected
formula with the linear-counting small-range regime.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 — matches the oracle-facing md5 int


def _md5_int60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def register_rho_exprs(key: Column, p: int) -> "tuple[Column, Column]":
    """The oracle-facing (register, rho) pair for one key: top ``p``
    hash bits route the register, rho = leading-zero count of the
    remaining ``60-p`` bits + 1 (an all-zero word scores 60-p+1).
    SINGLE source of truth for the register math — hll_registers and
    operators/anf.py both derive from here, so the bin()-length
    convention that makes registers SQL-replayable cannot silently
    fork."""
    if not (4 <= p <= 16):
        raise ValueError("p must be in [4, 16]")
    w_bits = HASH_BITS - p
    h = _md5_int60(key)
    reg = F.shiftright(h, w_bits)
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    # bin() renders without leading zeros in both Spark and DuckDB, so
    # length(bin(w)) is the bit length; rho = w_bits - bitlen + 1
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return reg, rho


def hll_registers(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Register table (register, max_rho) of the HLL sketch of column
    ``col`` over the (multi)set of rows — duplicates cannot change a
    max, so no pre-distinct is needed. Registers never hit by any key
    are absent (rho 0 by convention — ``hll_estimate`` fills them
    in)."""
    reg, rho = register_rho_exprs(F.col(col), p)
    return (
        df.select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union of sketches = elementwise max of registers: exact, order-
    independent, the property that makes per-partition/per-day sketches
    composable without re-reading keys."""
    if not register_tables:
        raise ValueError("need at least one register table")
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def cms_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the multiset
    in ``col``: a (depth, bucket, cnt) table where row ``j`` hashes
    every value into ``width`` buckets with an independent md5-derived
    hash. Point frequency = min over rows of the landed bucket's count
    (``cms_estimate``) — never under, over only by collisions, so heavy
    hitters (hot hosts, exploding URL templates) surface from O(depth x
    width) integers instead of a per-key count at 10^10 keys.

    Scale shape: one generator projection (``depth`` struct rows per
    input via explode of a literal-range transform) + one
    groupBy(depth, bucket) SUM whose partial aggregation collapses each
    partition to at most depth*width rows before the exchange — the
    shuffle carries the sketch, never keys. Sketches MERGE by
    elementwise sum (``cms_merge``)."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    rows = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda j: F.struct(
            j.cast("int").alias("depth"),
            (
                _md5_int60(F.concat_ws("|", j.cast("string"), F.col(col))) % width
            ).alias("bucket"),
        ),
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.depth").alias("depth"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Union of sketches = elementwise sum of cells."""
    if not tables:
        raise ValueError("need at least one sketch table")
    u = tables[0]
    for t in tables[1:]:
        u = u.unionByName(t)
    return u.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cells: dict[tuple[int, int], int], value: str, depth: int = 4, width: int = 1024) -> int:
    """Point-frequency upper estimate from a collected sketch:
    min over rows of the landed cell. One-sided — never below the true
    count."""
    import hashlib

    best = None
    for j in range(depth):
        h = int(hashlib.md5(f"{j}|{value}".encode()).hexdigest()[:15], 16)
        c = cells.get((j, h % width), 0)
        best = c if best is None else min(best, c)
    return best or 0


def hll_estimate(registers: list[tuple[int, int]], p: int = 8) -> float:
    """Bias-corrected HLL estimate from a collected register table
    (2^p rows max — driver-side by design). Standard constants
    (Flajolet et al. 2007); linear counting below 2.5m when empty
    registers remain."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    got = dict(registers)
    s = sum(2.0 ** -got.get(r, 0) for r in range(m))
    est = alpha * m * m / s
    zeros = m - len(got)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est
