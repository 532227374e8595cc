"""update_inverted_index == build_inverted_index over the final corpus."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
    update_inverted_index,
)


def _text(i, extra=""):
    h = hashlib.md5(f"su|{i}".encode()).hexdigest()
    words = [f"w{int(h[j : j + 2], 16) % 13}" for j in range(0, 16, 2)]
    return " ".join(words) + (" " + extra if extra else "")


def _corpus(spark, ids, extra=None):
    rows = [(i, _text(i, (extra or {}).get(i, ""))) for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_same(a, b):
    pa = sorted(map(tuple, a.postings.collect()))
    pb = sorted(map(tuple, b.postings.collect()))
    assert pa == pb
    ta = sorted(map(tuple, a.terms.collect()))
    tb = sorted(map(tuple, b.terms.collect()))
    assert ta == tb
    assert (a.n_docs, a.total_dl) == (b.n_docs, b.total_dl)


def test_add_only(spark):
    old = build_inverted_index(_corpus(spark, range(10)))
    updated = update_inverted_index(old, _corpus(spark, range(10, 14)))
    rebuilt = build_inverted_index(_corpus(spark, range(14)))
    _assert_same(updated, rebuilt)


def test_remove_only(spark):
    old = build_inverted_index(_corpus(spark, range(10)))
    updated = update_inverted_index(
        old, _corpus(spark, []), removed_doc_ids=[2, 5, 7]
    )
    rebuilt = build_inverted_index(
        _corpus(spark, [i for i in range(10) if i not in (2, 5, 7)])
    )
    _assert_same(updated, rebuilt)


def test_upsert_replaces_old_postings(spark):
    old = build_inverted_index(_corpus(spark, range(8)))
    # docs 3 and 4 change content; 12 is new
    changed = _corpus(spark, [3, 4, 12], extra={3: "zz zz qq", 4: "qq"})
    updated = update_inverted_index(old, changed)
    rebuilt = build_inverted_index(
        _corpus(spark, [i for i in range(8) if i not in (3, 4)]).unionByName(changed)
    )
    _assert_same(updated, rebuilt)


def test_remove_and_upsert_combined(spark):
    old = build_inverted_index(_corpus(spark, range(12)))
    delta = _corpus(spark, [1, 20], extra={1: "fresh tokens here"})
    updated = update_inverted_index(old, delta, removed_doc_ids=[6, 7, 999])
    rebuilt = build_inverted_index(
        _corpus(spark, [i for i in range(12) if i not in (1, 6, 7)]).unionByName(
            delta
        )
    )
    _assert_same(updated, rebuilt)  # 999 never indexed: no-op


def test_removed_ids_as_dataframe(spark):
    old = build_inverted_index(_corpus(spark, range(6)))
    rm = spark.createDataFrame([(0,), (5,)], ["doc_id"])
    updated = update_inverted_index(old, _corpus(spark, []), removed_doc_ids=rm)
    rebuilt = build_inverted_index(_corpus(spark, [1, 2, 3, 4]))
    _assert_same(updated, rebuilt)


def test_bm25_on_updated_index_matches_rebuild(spark):
    old = build_inverted_index(_corpus(spark, range(20)))
    delta = _corpus(spark, [3, 25], extra={3: "w1 w1 w1"})
    updated = update_inverted_index(old, delta, removed_doc_ids=[11])
    rebuilt = build_inverted_index(
        _corpus(spark, [i for i in range(20) if i not in (3, 11)]).unionByName(delta)
    )
    q = ["w1", "w5", "w9"]
    assert [tuple(r) for r in bm25_topk(updated, q, k=10).collect()] == [
        tuple(r) for r in bm25_topk(rebuilt, q, k=10).collect()
    ]
