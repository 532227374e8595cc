"""Inverted index + BM25 full-text retrieval over the crawled corpus.

The classic search stack re-expressed as DataFrames:

- ``build_inverted_index``: tokenize -> explode -> ONE partial-agg
  shuffle on (term, doc_id) for the postings, with the document length
  DENORMALIZED onto every posting row (the Lucene "norms" trick —
  scoring then never joins the corpus-sized doclens table), plus a
  term-level df table and two corpus scalars (N, total token count)
  from a single 1-row aggregate.

- ``bm25_topk``: score a bag-of-words query. The term-stats side is
  filtered to the query's terms (a handful of rows) and broadcast; the
  postings scan is filtered by an in-list on term — with postings
  written bucketed/partitioned by term this prunes to the touched
  buckets only. The plan is: pruned scan -> broadcast hash join ->
  map-side-combinable groupBy(doc_id) -> TakeOrderedAndProject. One
  shuffle, never a full sort.

Integer-exactness doctrine (see PLANS.md): BM25 is defined here in
scaled 64-bit integer arithmetic — ``div`` truncating division on
positive operands is identical in Spark (`div`) and DuckDB (`//`), so
scores replay bit-for-bit across engines and are independent of
partitioning / accumulation order.

Scoring, with k1/b carried as x1000 fixed-point and SCALE = 1e6:

    idf_s     = (SCALE * (N - df + 1)) div (df + 1)
    bnorm     = 1000 - b_x1000 + (b_x1000 * dl * N) div total_dl
    denom     = tf * 1000 + (k1_x1000 * bnorm) div 1000
    tfc_s     = (tf * (k1_x1000 + 1000) * SCALE) div denom
    contrib   = (idf_s * tfc_s) div SCALE        -- x SCALE
    score     = sum(contrib) over query terms    -- x SCALE

idf uses the rank-preserving rational (N - df + 1)/(df + 1) instead of
the classic log form: log() is not correctly-rounded and may differ by
1 ulp across libm implementations, which breaks cross-engine replay;
the rational form keeps the same ordering (monotone decreasing in df)
and is exact.

Overflow doctrine (fairness.py's): every PRODUCT that can exceed int64
runs in decimal(38,0); every `div` QUOTIENT provably fits int64, and
Spark's `div` on decimal operands returns that exact bigint quotient.
The per-term score sum accumulates in decimal(38,0) and checked-casts
to BIGINT at the end. Envelope, all exact with SCALE = 1e6 fixed:

    idf_s   <= SCALE * N / 2 (df >= 1)    -> fits int64 to N ~ 1.8e13
    products<= SCALE^2 * 1.1 * N    ~  1.1e22 at N = 1e10  (decimal ok)
    per-term quotient <= 1.1 * SCALE * N  -> the binding bound:
               fits int64 to N <= ~8e12 docs at the default k1
               (= 9.2e18 / ((k1_x1000+1000)/2000 * SCALE) — shrinks
               with larger k1)
    score   <= |query| * 1.1e16 at N = 1e10 -> ~800 distinct query
               terms at the full design point before the final checked
               cast would overflow (it raises, never wraps, under ANSI)

No user-tunable `scale` remains — the resolution is constant at any
corpus size, and DuckDB replays the identical math in HUGEINT.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize_expr(col: Column) -> Column:
    """Deterministic ASCII bag-of-words tokenization: lowercase, every
    non-[a-z0-9] run becomes a separator, empties dropped. Exactly
    replayable in SQL (lower + regexp_replace + split + filter)."""
    cleaned = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(cleaned), " "), lambda t: t != "")


@dataclass
class InvertedIndex:
    """Postings (term, doc_id, tf, dl), term stats (term, df), and the
    two corpus scalars BM25 needs. ``postings``/``terms`` are lazy
    DataFrames — persist or write them bucketed by term for reuse."""

    postings: DataFrame
    terms: DataFrame
    n_docs: int
    total_dl: int


def build_inverted_index(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> InvertedIndex:
    toks = docs.select(
        F.col(doc_col).alias("doc_id"), tokenize_expr(F.col(text_col)).alias("_toks")
    ).select("doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    terms = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.select("doc_id", "dl").groupBy("doc_id").agg(F.first("dl").alias("dl"))
    row = stats.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t")
    ).first()
    return InvertedIndex(
        postings=postings, terms=terms, n_docs=int(row["n"]), total_dl=int(row["t"])
    )


SCALE = 1_000_000  # fixed-point score resolution (x1e6, any corpus size)


def bm25_topk(
    index: InvertedIndex,
    query_terms: Sequence[str],
    k: int = 10,
    k1_x1000: int = 1200,
    b_x1000: int = 750,
) -> DataFrame:
    """Top-k documents for a bag-of-words query, columns
    ``doc_id, score`` (score x 1e6, int64), ordered score desc then
    doc_id asc — fully deterministic including ties at rank k.

    Scale-proof by construction: products that can exceed int64 run in
    decimal(38,0) and every quotient provably fits bigint (module
    docstring envelope — exact to ~8e12 docs at the default k1), so the
    same scores come out at any corpus size with no tuning knob.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if not (0 <= b_x1000 <= 1000) or k1_x1000 < 0:
        raise ValueError("k1_x1000 must be >= 0 and b_x1000 in [0, 1000]")
    n, total = index.n_docs, max(index.total_dl, 1)
    scale = SCALE
    qt = [t for t in dict.fromkeys(query_terms)]  # dedup, keep order irrelevant
    q_stats = index.terms.filter(F.col("term").isin(qt))
    p = index.postings.filter(F.col("term").isin(qt)).join(
        F.broadcast(q_stats), "term"
    )
    # one SQL expression so every division is truncating `div`; DECIMAL
    # casts sit exactly where a product can exceed int64 (the math value
    # is unchanged — decimal arithmetic is exact, and `div` on decimal
    # operands yields the exact integral quotient as BIGINT)
    contrib = F.expr(
        f"CAST((CAST((CAST({scale} AS DECIMAL(38,0)) * ({n} - df + 1)) div (df + 1) "
        f"AS DECIMAL(38,0)) * "
        f"(( CAST(tf AS DECIMAL(38,0)) * ({k1_x1000} + 1000) * {scale} ) div "
        f"( tf * 1000 + ({k1_x1000} * "
        f"(1000 - {b_x1000} + (CAST({b_x1000} AS DECIMAL(38,0)) * dl * {n}) div {total})) div 1000 ))"
        f") div {scale} AS BIGINT)"
    )
    scored = p.select("doc_id", contrib.alias("_c"))
    return (
        scored.groupBy("doc_id")
        .agg(F.sum(F.col("_c").cast("decimal(38,0)")).cast("long").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def update_inverted_index(
    index: InvertedIndex,
    new_docs: DataFrame,
    removed_doc_ids: "Sequence | DataFrame" = (),
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> InvertedIndex:
    """Incremental index maintenance: upsert ``new_docs`` and delete
    ``removed_doc_ids`` without re-tokenizing the corpus.

    Semantics are UPSERT + DELETE: the result equals
    ``build_inverted_index`` over (old corpus minus removed ids minus
    ids reappearing in ``new_docs``) union ``new_docs`` — the equality
    is test-pinned, not aspirational.  At the design point a crawl
    round touches ~1e7 of 1e10 documents; rebuilding tokenizes 100 TB,
    updating tokenizes the delta.

    Plan shape: the delta is tokenized with ``build_inverted_index``
    (O(delta)); departing doc ids (removed + upserted) are BROADCAST
    anti-/semi-joined against the old postings — a filter, no shuffle
    of the index; the df merge unions three term-count feeds (old
    terms, departing decrements, delta increments) into ONE combinable
    groupBy(term) — with postings and terms stored bucketed by term
    this is a co-partitioned merge.  Corpus scalars adjust via a 1-row
    aggregate over the departing postings.

    ``removed_doc_ids``: a Python sequence or a one-column DataFrame of
    doc ids.  Removing an id that was never indexed is a no-op.
    """
    spark = new_docs.sparkSession
    delta = build_inverted_index(new_docs, doc_col=doc_col, text_col=text_col)
    upserted = new_docs.select(F.col(doc_col).alias("doc_id")).distinct()
    if isinstance(removed_doc_ids, DataFrame):
        removed = removed_doc_ids.toDF("doc_id").distinct()
    else:
        id_type = new_docs.schema[doc_col].dataType
        from pyspark.sql import types as T

        removed = spark.createDataFrame(
            [(v,) for v in removed_doc_ids],
            T.StructType([T.StructField("doc_id", id_type)]),
        ).distinct()
    gone = upserted.union(removed).distinct()

    cols = ["term", "doc_id", "tf", "dl"]
    departing = index.postings.join(F.broadcast(gone), "doc_id", "left_semi").select(
        *cols
    )
    surviving = index.postings.join(F.broadcast(gone), "doc_id", "left_anti").select(
        *cols
    )
    postings = surviving.unionByName(delta.postings.select(*cols))

    terms = (
        index.terms.select("term", F.col("df").cast("long").alias("_d"))
        .unionByName(
            departing.groupBy("term").agg((-F.count(F.lit(1))).alias("_d"))
        )
        .unionByName(delta.terms.select("term", F.col("df").cast("long").alias("_d")))
        .groupBy("term")
        .agg(F.sum("_d").alias("df"))
        .where(F.col("df") > 0)
    )

    dep = (
        departing.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t"))
        .first()
    )
    return InvertedIndex(
        postings=postings,
        terms=terms,
        n_docs=index.n_docs - int(dep["n"]) + delta.n_docs,
        total_dl=index.total_dl - int(dep["t"]) + delta.total_dl,
    )
