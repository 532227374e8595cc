"""Inverted index + integer BM25 (operators/search.py)."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.search import build_inverted_index, bm25_topk


def _corpus(spark):
    rows = [
        ("d1", "spark spark spark engine"),          # tf(spark)=3, dl=4
        ("d2", "spark engine"),                       # tf(spark)=1, dl=2
        ("d3", "engine engine engine engine"),        # no spark
        ("d4", "rare gem inside a long long long long long document"),
        ("d5", "gem"),                                # short doc, tf=1
        ("d6", "Punct,too! SPARK?"),                  # tokenizer: lower+strip
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_index_shapes_and_tokenization(spark):
    idx = build_inverted_index(_corpus(spark))
    assert idx.n_docs == 6
    p = {(r.term, r.doc_id): (r.tf, r.dl) for r in idx.postings.collect()}
    assert p[("spark", "d1")] == (3, 4)
    assert p[("spark", "d6")] == (1, 3)  # "punct too spark"
    assert p[("too", "d6")][0] == 1
    df = {r.term: r.df for r in idx.terms.collect()}
    assert df["spark"] == 3 and df["engine"] == 3 and df["gem"] == 2
    assert idx.total_dl == sum(
        len(t.split()) for _, t in [
            ("", "spark spark spark engine"), ("", "spark engine"),
            ("", "engine engine engine engine"),
            ("", "rare gem inside a long long long long long document"),
            ("", "gem"), ("", "punct too spark"),
        ]
    )


def test_tf_and_df_ordering(spark):
    idx = build_inverted_index(_corpus(spark))
    top = bm25_topk(idx, ["spark"], k=3).collect()
    # more occurrences of the query term wins (d1 over d2/d6)
    assert top[0].doc_id == "d1"
    # rare term beats common term at equal tf: query both, the doc
    # holding only the rare one must outscore the doc holding only the
    # common one
    idx2 = build_inverted_index(
        _corpus(spark).union(
            idx.postings.sparkSession.createDataFrame(
                [("d7", "engine"), ("d8", "engine"), ("d9", "engine")],
                "doc_id string, text string",
            )
        )
    )
    both = {r.doc_id: r.score for r in bm25_topk(idx2, ["gem", "engine"], k=20).collect()}
    assert both["d5"] > both["d2"]  # gem (df=2) outweighs engine (df=6)


def test_length_normalization(spark):
    # same tf, same df: shorter document scores higher
    rows = [("s", "gem one two"), ("l", "gem " + "filler " * 20)]
    idx = build_inverted_index(
        _corpus(spark).sparkSession.createDataFrame(rows, "doc_id string, text string")
    )
    top = bm25_topk(idx, ["gem"], k=2).collect()
    assert [r.doc_id for r in top] == ["s", "l"]
    assert top[0].score > top[1].score


def test_partitioning_invariance_and_determinism(spark):
    base = _corpus(spark)
    a = bm25_topk(build_inverted_index(base.repartition(1)), ["spark", "engine"], 6)
    b = bm25_topk(build_inverted_index(base.repartition(7)), ["spark", "engine"], 6)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_plan_broadcast_and_takeordered(spark):
    idx = build_inverted_index(_corpus(spark))
    df = bm25_topk(idx, ["spark", "engine"], k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_validation(spark):
    idx = build_inverted_index(_corpus(spark))
    with pytest.raises(ValueError):
        bm25_topk(idx, [])
    with pytest.raises(ValueError):
        bm25_topk(idx, ["x"], b_x1000=2000)


def test_bm25_exact_at_design_point_scalars(spark):
    """Scale-proofing evidence: with n = 1e10 docs and total_dl = 2e11
    (the design-point scalars), the pre-decimal int64 formulation
    overflowed idf_s * tfc_s (~2.2e22). The decimal(38,0) path must
    match a pure-Python arbitrary-precision replay of the documented
    formula bit-for-bit — same resolution (x1e6), no tuning knob."""
    from sinew_spark.operators.search import InvertedIndex

    n, total = 10**10, 2 * 10**11
    postings = spark.createDataFrame(
        [("w", "d1", 3, 20), ("w", "d2", 1, 2_000_000), ("v", "d1", 5, 20)],
        "term string, doc_id string, tf long, dl long",
    )
    terms = spark.createDataFrame([("w", 2), ("v", 1)], "term string, df long")
    idx = InvertedIndex(postings, terms, n_docs=n, total_dl=total)
    got = {r.doc_id: r.score for r in bm25_topk(idx, ["w", "v"], k=10).collect()}

    def py(tf, dl, df, k1=1200, b=750, s=10**6):
        idf = (s * (n - df + 1)) // (df + 1)
        bn = 1000 - b + (b * dl * n) // total
        tfc = (tf * (k1 + 1000) * s) // (tf * 1000 + (k1 * bn) // 1000)
        return (idf * tfc) // s

    want = {"d1": py(3, 20, 2) + py(5, 20, 1), "d2": py(1, 2_000_000, 2)}
    assert got == want
