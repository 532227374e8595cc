"""Corpus mixing: exact apportionment + deterministic selection."""

import hashlib

import pytest

from sinew_spark.operators.mixer import apportion_waterfill, mix_corpus


def test_apportion_exact_sum():
    q = apportion_waterfill({"a": 6, "b": 3, "c": 1}, {"a": 100, "b": 100, "c": 100}, 10)
    assert q == {"a": 6, "b": 3, "c": 1}
    q = apportion_waterfill({"a": 1, "b": 1, "c": 1}, {"a": 100, "b": 100, "c": 100}, 10)
    assert sum(q.values()) == 10
    assert sorted(q.values()) == [3, 3, 4]


def test_apportion_waterfills_capped_stratum():
    # c can only supply 2 of its 3-row share; the shortfall goes to a/b
    # by weight.
    q = apportion_waterfill({"a": 1, "b": 1, "c": 1}, {"a": 100, "b": 100, "c": 2}, 9)
    assert q["c"] == 2 and sum(q.values()) == 9
    assert q["a"] + q["b"] == 7


def test_apportion_total_exceeds_supply():
    q = apportion_waterfill({"a": 1, "b": 9}, {"a": 3, "b": 4}, 100)
    assert q == {"a": 3, "b": 4}


def test_apportion_zero_and_missing():
    q = apportion_waterfill({"a": 0, "b": 1, "ghost": 5}, {"a": 10, "b": 10}, 6)
    assert q["a"] == 0 and q["ghost"] == 0 and q["b"] == 6
    with pytest.raises(ValueError):
        apportion_waterfill({"a": -1}, {"a": 1}, 1)
    with pytest.raises(ValueError):
        apportion_waterfill({"a": 1}, {"a": 1}, -1)


def _docs(spark, sizes):
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mix_exact_composition(spark):
    df = _docs(spark, {"en": 60, "de": 30, "fr": 20})
    out = mix_corpus(df, "lang", {"en": 6, "de": 3, "fr": 1}, total=40).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r)
    assert {s: len(v) for s, v in by.items()} == {"en": 24, "de": 12, "fr": 4}
    # within-stratum picks are the md5-rank prefix
    for s, rows in by.items():
        ids = sorted(
            (r["doc_id"] for r in df.where(f"lang = '{s}'").collect()),
            key=lambda i: (
                int(hashlib.md5(f"mix|{i}".encode()).hexdigest()[:15], 16),
                i,
            ),
        )
        assert sorted(r["doc_id"] for r in rows) == sorted(ids[: len(rows)])
        assert sorted(r["mix_rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_mix_waterfill_small_stratum(spark):
    df = _docs(spark, {"en": 50, "code": 4})
    out = mix_corpus(df, "lang", {"en": 1, "code": 1}, total=20).collect()
    n = {}
    for r in out:
        n[r["lang"]] = n.get(r["lang"], 0) + 1
    assert n == {"code": 4, "en": 16}  # code capped, shortfall to en


def test_mix_excludes_unweighted_strata(spark):
    df = _docs(spark, {"en": 10, "spam": 10})
    out = mix_corpus(df, "lang", {"en": 1}, total=5).collect()
    assert all(r["lang"] == "en" for r in out) and len(out) == 5


def test_mix_deterministic_across_partitionings(spark):
    df = _docs(spark, {"en": 40, "de": 40})
    a = sorted(
        r["doc_id"]
        for r in mix_corpus(df.repartition(1), "lang", {"en": 2, "de": 1}, 30).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mix_corpus(df.repartition(7), "lang", {"en": 2, "de": 1}, 30).collect()
    )
    assert a == b


def test_mix_empty_weights_rejected(spark):
    df = _docs(spark, {"en": 5})
    with pytest.raises(ValueError):
        mix_corpus(df, "lang", {}, total=3)
