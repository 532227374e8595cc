"""Shingle containment: asymmetric near-dup detection."""

import pytest

from sinew_spark.operators.containment import containment_pairs, shingle_sets


def _pairs(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = containment_pairs(df, **kw).collect()
    return {
        (r["container"], r["contained"]): (
            r["shared"],
            r["contained_size"],
            r["containment_x"],
        )
        for r in rows
    }


def test_quote_inside_larger_doc(spark):
    quoted = "alpha beta gamma delta epsilon zeta"
    wrapper = "intro words here " + quoted + " outro trailing words"
    got = _pairs(spark, [(1, wrapper), (2, quoted)], threshold_x=900_000)
    # Every shingle of doc 2 appears in doc 1: full containment.
    key = (1, 2)
    assert key in got
    shared, size, cx = got[key]
    assert shared == size == len(quoted.split()) - 2
    assert cx == 1_000_000
    # The reverse direction is weak and must NOT appear at 0.9.
    assert (2, 1) not in got


def test_jaccard_blind_spot(spark):
    # Containment catches what symmetric resemblance misses: B tiny
    # inside huge A -> Jaccard small, containment(B in A) == 1.
    b = "one two three four five"
    a = b + " " + " ".join(f"filler{i}" for i in range(40))
    got = _pairs(spark, [(1, a), (2, b)], threshold_x=1_000_000)
    assert (1, 2) in got
    inter = got[(1, 2)][0]
    union = len(a.split()) - 2 + len(b.split()) - 2 - inter
    assert inter / union < 0.2  # Jaccard would have missed this pair


def test_unrelated_docs_no_pairs(spark):
    docs = [(i, " ".join(f"u{i}w{j}" for j in range(10))) for i in range(4)]
    assert _pairs(spark, docs, threshold_x=100_000) == {}


def test_short_docs_emit_no_shingles(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "")], ["doc_id", "text"])
    assert shingle_sets(df, k=3).count() == 0


def test_max_doc_freq_only_underreports(spark):
    # A shingle shared by every doc is capped out of the pair join;
    # containment drops below 1.0 but the denominator stays honest.
    common = "shared common boiler plate"
    docs = [(i, common + f" unique{i} tail{i} end{i}") for i in range(5)]
    strict = _pairs(spark, docs, threshold_x=100_000, max_doc_freq=2)
    loose = _pairs(spark, docs, threshold_x=100_000, max_doc_freq=100)
    for key, (sh_s, sz_s, cx_s) in strict.items():
        assert key in loose
        assert cx_s <= loose[key][2]
        assert sz_s == loose[key][1]


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        containment_pairs(df, threshold_x=0)
    with pytest.raises(ValueError):
        containment_pairs(df, threshold_x=2_000_000)


def test_case_insensitive_like_jaccard_path(spark):
    # Re-cased syndication must still register (same case-folding rule
    # as dedup.py's ngram-Jaccard verify).
    quoted = "alpha beta gamma delta epsilon zeta"
    recased = "ALPHA Beta GAMMA delta EPSILON zeta"
    wrapper = "intro words here " + recased + " outro trailing words"
    got = _pairs(spark, [(1, wrapper), (2, quoted)], threshold_x=900_000)
    assert (1, 2) in got and got[(1, 2)][2] == 1_000_000
