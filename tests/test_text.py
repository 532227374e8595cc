"""Text analysis operator tests (token count, quality, lang id, fingerprint)."""

from pyspark.sql import functions as F

from sinew_spark.functions.text import (
    fingerprint_expr,
    lang_id_expr,
    punct_ratio_expr,
    quality_score_expr,
    robust_fingerprint_expr,
    subword_count_expr,
    token_count_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("the quick brown fox",), ("  one  ",), ("",), ("a\tb\nc",)], ["text"]
    )
    got = [r[0] for r in df.select(token_count_expr(F.col("text"))).collect()]
    assert got == [4, 1, 0, 3]


def test_subword_count(spark):
    df = spark.createDataFrame([("hello world42!",)], ["text"])
    # hell+o, worl+d? -> [a-z]{1,4}: 'hell','o','worl','d'? no: 'world' -> 'worl','d'... plus '42' and '!'
    n = df.select(subword_count_expr(F.col("text"))).collect()[0][0]
    assert n == 6  # hell, o, worl, d, 42, !


def test_punct_ratio(spark):
    df = spark.createDataFrame([("ab!?",), ("abcd",)], ["text"])
    got = [r[0] for r in df.select(punct_ratio_expr(F.col("text"))).collect()]
    assert got == [0.5, 0.0]


def test_lang_id(spark):
    rows = [
        ("the cat and the dog went to the park and it was good",),
        ("der hund und die katze sind nicht mit der maus",),
        ("le chat est dans la maison et les oiseaux",),
        ("el perro y la casa es una cosa que de todos",),
        ("zzz qqq xxx",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = [r[0] for r in df.select(lang_id_expr(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and runs through the green fields of the valley " * 3
    bad = "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))"
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "text"])
    got = {r.id: r.q for r in df.select("id", quality_score_expr(F.col("text")).alias("q")).collect()}
    assert got[1] > 0.5 > got[2]
    assert 0.0 <= got[2] <= 1.0


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),
            (3, "world hello"),
            (4, "totally different"),
        ],
        ["id", "text"],
    )
    out = {
        r.id: (r.fp, r.rfp)
        for r in df.select(
            "id",
            fingerprint_expr(F.col("text")).alias("fp"),
            robust_fingerprint_expr(F.col("text")).alias("rfp"),
        ).collect()
    }
    assert out[1][0] == out[2][0]  # case/space-insensitive exact fp
    assert out[2][0] != out[3][0]  # order matters for exact fp
    assert out[2][1] == out[3][1]  # order-independent robust fp
    assert out[2][1] != out[4][1]


def _score_bruteforce(text, buckets=4096, seed="qlc"):
    import hashlib

    md5i = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)  # noqa: E731
    t = text.strip()
    if t == "":
        return 0
    return sum(
        md5i(f"{seed}|{md5i(tok) % buckets}") % 2001 - 1000
        for tok in __import__("re").split(r"\s+", t.lower())
    )


def test_hashed_linear_score_matches_bruteforce(spark):
    from sinew_spark.functions.text import hashed_linear_score_expr

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "  Mixed   CASE   and   runs  of   spaces ",
        "",
        "   ",
        "one-token",
        "repeated repeated repeated words count each time",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    got = {
        r.id: r.s
        for r in df.select(
            "id", hashed_linear_score_expr(F.col("text")).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _score_bruteforce(t), t
    # multi-count: a repeated token shifts the score vs its distinct set
    once = _score_bruteforce("repeated words count each time")
    assert got[5] != once


def test_hashed_linear_score_partition_invariant(spark):
    from sinew_spark.functions.text import hashed_linear_score_expr

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i * 7 % 13} shared words") for i in range(50)],
        ["id", "text"],
    )
    a = sorted(
        (r.id, r.s)
        for r in df.repartition(2)
        .select("id", hashed_linear_score_expr(F.col("text")).alias("s"))
        .collect()
    )
    b = sorted(
        (r.id, r.s)
        for r in df.repartition(13)
        .select("id", hashed_linear_score_expr(F.col("text")).alias("s"))
        .collect()
    )
    assert a == b


def test_hashed_linear_score_rejects_bad_buckets(spark):
    import pytest as _pytest

    from sinew_spark.functions.text import hashed_linear_score_expr

    with _pytest.raises(ValueError):
        hashed_linear_score_expr(F.lit("x"), buckets=0)


def test_hashed_linear_score_zero_shuffle_zero_python(spark):
    from sinew_spark.functions.text import hashed_linear_score_expr

    df = spark.createDataFrame([("a b c",)], ["text"]).select(
        hashed_linear_score_expr(F.col("text")).alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # PLANS.md claim: one Project, all codegen — no Exchange, no Python
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_soft404_expr(spark):
    """200-status error pages flag; real 404s, long phrase-bearing
    content, and benign short pages do not."""
    from pyspark.sql import functions as F

    from sinew_spark.functions.text import soft404_expr

    rows = [
        (1, 200, "Sorry, page not found."),
        (2, 404, "Sorry, page not found."),          # real 404: not soft
        (3, 200, ("word " * 200) + "page not found"),  # long content: not soft
        (4, 200, "perfectly fine short page"),
        (5, 200, "ERROR 404 Not Found"),             # case-folded phrase
    ]
    df = spark.createDataFrame(rows, "id int, status int, text string")
    got = {
        r.id: r.s
        for r in df.select(
            "id", soft404_expr(F.col("status"), F.col("text")).alias("s")
        ).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: True}
