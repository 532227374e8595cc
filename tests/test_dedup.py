"""Dedup operator tests: exact, minhash-LSH, simhash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-word change
FAR = "completely different content about spark query engines and shuffles everywhere"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, FAR), (5, FAR.upper())]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    # 1 and 2 collapse; others unique (case-sensitive exact)
    assert len(out) == 4
    winner = {r.doc_id: r.n_dupes for r in out}
    assert winner[1] == 2
    assert 2 not in winner


def test_minhash_signature_properties(spark, docs):
    sigs = {r.doc_id: r.signature for r in minhash_signatures(docs, num_perm=32).collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    sim_near = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 32
    sim_far = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 32
    assert sim_near > 0.5 > sim_far


def test_minhash_lsh_pipeline(spark, docs):
    pairs = minhash_dedup(docs, threshold=0.5, num_perm=32, bands=16).collect()
    got = {(r.a, r.b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) in got or (2, 3) in got  # near-dup caught
    assert not any({a, b} == {1, 4} for a, b in got)


def test_simhash(spark, docs):
    pairs = simhash_near_dups(docs, max_hamming=10).collect()
    got = {(r.a, r.b): r.hamming for r in pairs}
    assert got[(1, 2)] == 0
    near = got.get((1, 3)) or got.get((2, 3))
    assert near is not None and near <= 10


def test_ngram_jaccard(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
    out = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, pairs, n=3).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.3 < out[(1, 3)] < 1.0
    assert out[(1, 4)] < 0.05


def test_exact_dedup_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # inject duplicates deterministically, dedup must recover original count
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = exact_dedup(docs.unionByName(dup))
    assert out.count() == n
    assert out.agg(F.sum("n_dupes")).collect()[0][0] == 2 * n


def test_duplicated_ngram_stats_planted_run(spark):
    from sinew_spark.operators.dedup import duplicated_ngram_stats

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    rows = [
        ("a", f"a1 a2 a3 {shared} a4 a5"),
        ("b", f"b1 {shared} b2 b3 b4 b5"),
        ("c", "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in duplicated_ngram_stats(docs, k=3).collect()}
    # 6 shared tokens -> 4 shared 3-grams, consecutive in both docs
    assert out["a"].max_dup_run == 4
    assert out["b"].max_dup_run == 4
    assert out["a"].n_dup_kgrams == 4
    assert out["c"].n_dup_kgrams == 0 and out["c"].max_dup_run == 0
    # a: 11 tokens -> 9 3-grams
    assert out["a"].n_kgrams == 9
    assert out["a"].dup_frac_x == 4 * 1_000_000 // 9


def test_duplicated_ngram_stats_split_runs(spark):
    from sinew_spark.operators.dedup import duplicated_ngram_stats

    # two separate shared fragments in one doc -> runs don't merge
    rows = [
        ("x", "s1 s2 s3 u1 u2 u3 t1 t2 t3"),
        ("y", "s1 s2 s3 v1 v2 v3 t1 t2 t3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in duplicated_ngram_stats(docs, k=3).collect()}
    # each fragment gives exactly one dup 3-gram per doc, separated
    assert out["x"].n_dup_kgrams == 2
    assert out["x"].max_dup_run == 1


def test_duplicated_ngram_stats_short_doc_zero_row(spark):
    from sinew_spark.operators.dedup import duplicated_ngram_stats

    docs = spark.createDataFrame(
        [("s", "one two"), ("t", "three four five six")],
        "doc_id string, text string",
    )
    out = {r.doc_id: tuple(r)[1:] for r in
           duplicated_ngram_stats(docs, k=3).collect()}
    assert out["s"] == (0, 0, 0, 0)
    assert out["t"][0] == 2  # 4 tokens -> 2 3-grams
    assert len(out) == 2


def test_duplicated_ngram_stats_partitioning_invariant(spark):
    import random

    from sinew_spark.operators.dedup import duplicated_ngram_stats

    random.seed(3)
    vocab = [f"w{i}" for i in range(15)]
    rows = [
        (f"d{i}", " ".join(random.choice(vocab) for _ in range(25)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(tuple(r) for r in
               duplicated_ngram_stats(docs.repartition(1), k=4).collect())
    b = sorted(tuple(r) for r in
               duplicated_ngram_stats(docs.repartition(9), k=4).collect())
    assert a == b
