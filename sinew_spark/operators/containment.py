"""Asymmetric near-dup: shingle containment (Broder 1997).

Jaccard resemblance (operators/dedup.py) is symmetric — it misses the
asymmetric duplication that dominates real crawls: a page QUOTING most
of another, syndicated articles wrapped in different chrome, a long
thread containing an earlier post verbatim.  Broder's containment
  c(B in A) = |S(A) ∩ S(B)| / |S(B)|
(S = the set of k-token shingles) is the standard measure: ~1 when B's
content appears inside A regardless of how much else A carries, while
the Jaccard of the same pair can be arbitrarily small.

Scale shape: per-doc DISTINCT shingle hashes (map + one dedup
shuffle), an inverted shingle->doc index with a frequency cap (a
shingle present in more than ``max_doc_freq`` docs is boilerplate and
would explode the pair join quadratically — same degree-cap doctrine
as cocitation_pairs), then one self-join per shingle bucket and one
groupBy(pair) count.  The containment ratio is emitted as an
integer-exact scaled floor (``containment_x`` = shared * 1e6 //
|S(B)|); the threshold compare is a cross-multiply, so no float ever
enters the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) — DISTINCT md5-hashed k-token shingles per doc.
    Tokenization: lowercase, split on runs of whitespace — the SAME
    case-folding as dedup.py's ngram-Jaccard verify path, so a
    re-cased syndicated copy scores identically under containment and
    resemblance (they are meant to be compared).  Docs with fewer
    than ``k`` tokens emit nothing."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # zip k shifted slices so the lambda reads only its argument — a
    # slice-of-free-expression lambda re-runs the tokenization per
    # shingle (see quality.py _grams); the where() guarantees
    # size - k + 1 >= 1 so every slice is full-length
    length = F.size(toks) - k + 1
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, length) for i in range(k)])
    grams = F.transform(
        zipped,
        lambda s: F.md5(F.concat_ws(" ", *[s[str(i)] for i in range(k)])),
    )
    return (
        docs.where(F.size(toks) >= k)
        .select(F.col(id_col).alias("doc"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_x: int = 800_000,
    max_doc_freq: int = 1000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Directed pairs (container, contained, shared, contained_size,
    containment_x) where containment_x = shared * scale // |S(contained)|
    >= ``threshold_x`` and container != contained.

    ``max_doc_freq`` drops shingles shared by more than that many docs
    before pairing (boilerplate guard: keeps the self-join linear in
    the index size instead of quadratic in the hottest shingle).
    Dropped shingles still count toward |S(contained)| — the
    denominator is the doc's true shingle count, so capping can only
    UNDER-report containment, never fabricate it.
    """
    if not 0 < threshold_x <= scale:
        raise ValueError("threshold_x must be in (0, scale]")
    sh = shingle_sets(docs, text_col=text_col, id_col=id_col, k=k)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    idx = sh.join(freq.where(F.col("df") <= max_doc_freq), "shingle")
    pairs = (
        idx.alias("a")
        .join(idx.alias("b"), "shingle")
        .where(F.col("a.doc") != F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("container"), F.col("b.doc").alias("contained")
        )
        .agg(F.count("*").alias("shared"))
    )
    out = pairs.join(
        sizes.select(F.col("doc").alias("contained"), F.col("sz")), "contained"
    )
    return out.where(
        F.col("shared") * scale >= F.lit(threshold_x) * F.col("sz")
    ).select(
        "container",
        "contained",
        "shared",
        F.col("sz").alias("contained_size"),
        # `div` = integral division (float `/` + floor would round-trip
        # through double and can land off-by-one near exact ratios)
        F.expr(f"CAST((shared * {int(scale)}) DIV sz AS BIGINT)").alias(
            "containment_x"
        ),
    )
