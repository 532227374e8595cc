"""Mirror-host detection (Bharat & Broder, WWW8 1999, "Mirror, mirror
on the Web: a study of host pairs with replicated content").

Large crawls waste budget re-fetching mirrored hosts — CDN aliases,
www/non-www splits, country mirrors, mass-produced doorway farms. The
classic signal is HOST-level content replication: two hosts are mirror
candidates when a large fraction of the smaller host's pages exist on
the other host at the SAME path with the SAME content. This is the
host-granularity analogue of operators/containment.py (doc-level
shingle containment) and operators/media.py's digest canonicalization
(asset-level): the page fingerprint is md5(path <0x1f> content-digest),
so a mirror must agree on both the URL structure and the bytes —
path-only agreement (every host has "/index.html") or content-only
agreement (boilerplate pages) does not pair.

The reference (single-host recipes, /root/reference/lib/sinew/dsl.rb)
never meets this problem; at 10^10-URL frontier scale the detected
pairs feed the same demotion path as DUST rules (operators/dust.py):
collapse the mirror's frontier entries onto the canonical host.

Scale shape (same degree-cap doctrine as containment_pairs and
cocitation_pairs): per-host DISTINCT page fingerprints (map + one
dedup shuffle), an inverted fingerprint->host index with a frequency
cap — a fingerprint on more than ``max_fp_hosts`` hosts is mass-
produced boilerplate and would blow the pair join quadratically; the
cap bounds join volume at sum(min(df, cap)^2) while the TRUE host
sizes stay in the denominator, so capping only UNDER-reports overlap,
never fabricates it. Then one self-join per fingerprint and one
combinable groupBy(host pair). The overlap ratio is an integer-exact
scaled floor; the threshold compare is a cross-multiply — no float in
the plan, bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def page_fingerprints(
    pages: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    digest_col: str = "digest",
) -> DataFrame:
    """(host, fp) — DISTINCT md5(path <0x1f> digest) page fingerprints
    per host. NULL path/digest rows are dropped (no identity to
    compare); the 0x1f separator keeps ('/a','bc') distinct from
    ('/ab','c')."""
    return (
        pages.where(F.col(path_col).isNotNull() & F.col(digest_col).isNotNull())
        .select(
            F.col(host_col).alias("host"),
            F.md5(
                F.concat_ws(_SEP, F.col(path_col), F.col(digest_col))
            ).alias("fp"),
        )
        .distinct()
    )


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    digest_col: str = "digest",
    min_shared: int = 2,
    threshold_x: int = 500_000,
    max_fp_hosts: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Candidate mirror pairs: (host_a, host_b, shared, a_pages,
    b_pages, overlap_x) with host_a < host_b (canonical string order),
    ``shared`` = fingerprints on both hosts, ``overlap_x`` = shared *
    scale // min(a_pages, b_pages) — the replicated fraction of the
    SMALLER host, Bharat-Broder's mirror-classification direction (a
    full mirror of a subset site scores ``scale`` even when the larger
    host carries much more). Pairs must reach ``min_shared`` shared
    pages AND ``threshold_x`` overlap.

    Collapse policy downstream: keep the lexicographically smaller
    host as canonical (deterministic), or join against a host-value
    signal (host_pagerank / OPIC) to keep the important one.
    """
    if not 0 < threshold_x <= scale:
        raise ValueError("threshold_x must be in (0, scale]")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    fps = page_fingerprints(pages, host_col, path_col, digest_col)
    sizes = fps.groupBy("host").agg(F.count("*").alias("n_pages"))
    freq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    idx = fps.join(freq.where(F.col("df") <= max_fp_hosts), "fp")
    pairs = (
        idx.alias("a")
        .join(idx.alias("b"), "fp")
        .where(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    out = (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n_pages").alias("a_pages")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n_pages").alias("b_pages")),
            "host_b",
        )
        .withColumn("_m", F.least("a_pages", "b_pages"))
    )
    return out.where(
        F.col("shared") * scale >= F.lit(threshold_x) * F.col("_m")
    ).select(
        "host_a",
        "host_b",
        "shared",
        "a_pages",
        "b_pages",
        F.expr(f"CAST((shared * {int(scale)}) DIV _m AS BIGINT)").alias(
            "overlap_x"
        ),
    )
