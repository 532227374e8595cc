"""BPE training/encoding tests (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.bpe import (
    END_TOKEN,
    _apply_merge,
    bpe_encode,
    bpe_train,
)


def _corpus(spark):
    # the classic Sennrich example distribution: low x5, lower x2,
    # newest x6, widest x3 — one word per row
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )


def test_bpe_train_hand_computed(spark):
    out = bpe_train(_corpus(spark), n_merges=5, top_words=10).collect()
    got = [(r.rank, r.left, r.right, r.pair_count) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [
        (1, "e", "s", 9),       # 9-way tie (e,s)/(s,t)/(t,</w>) -> lexicographic min
        (2, "es", "t", 9),
        (3, "est", END_TOKEN, 9),
        (4, "l", "o", 7),       # 7-way tie (l,o)/(o,w)
        (5, "lo", "w", 7),
    ]


def test_apply_merge_greedy_left_to_right(spark):
    assert _apply_merge(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _apply_merge(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _apply_merge(tuple("ababa"), "a", "b") == ("ab", "ab", "a")
    assert _apply_merge(("x",), "a", "b") == ("x",)


def test_bpe_encode_matches_training_segmentation(spark):
    corpus = _corpus(spark)
    merges = bpe_train(corpus, n_merges=5, top_words=10)
    enc = bpe_encode(
        spark.createDataFrame(
            [(0, "lowest newest low"), (1, ""), (2, None)], ["doc_id", "text"]
        ),
        merges,
    )
    rows = {r.doc_id: r for r in enc.collect()}
    assert rows[0].bpe_tokens == [
        "low", "est" + END_TOKEN,        # lowest
        "n", "e", "w", "est" + END_TOKEN,  # newest
        "low", END_TOKEN,                # low
    ]
    assert rows[0].n_bpe_tokens == 8
    assert rows[1].bpe_tokens == [] and rows[1].n_bpe_tokens == 0
    assert rows[2].bpe_tokens == [] and rows[2].n_bpe_tokens == 0


def test_bpe_encode_reference_parity(spark):
    """Independent reference: apply merges rank-order with a string
    scan, over the real documents table; totals must agree."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    merges = bpe_train(docs, n_merges=8, top_words=100)
    ml = [(r.left, r.right) for r in sorted(merges.collect(), key=lambda r: r.rank)]

    import re

    def ref_encode(text):
        syms = []
        for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
            seg = list(w) + [END_TOKEN]
            for a, b in ml:
                out, i = [], 0
                while i < len(seg):
                    if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seg[i])
                        i += 1
                seg = out
            syms.extend(seg)
        return syms

    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        assert got[r.doc_id] == ref_encode(r.text), r.doc_id


def test_bpe_train_early_stop_and_validation(spark):
    tiny = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    # 'ab' -> a b </w>: only 2 pairs exist, then 1, then 0 merges possible
    out = bpe_train(tiny, n_merges=10, top_words=5).collect()
    assert len(out) == 2
    with pytest.raises(ValueError):
        bpe_train(tiny, n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(tiny, top_words=0)


def test_bpe_train_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = [tuple(r) for r in bpe_train(docs, n_merges=6, top_words=50).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(11), n_merges=6, top_words=50).collect()]
    assert a == b
