"""Interleaved-span linearization (operators/interleave.py): placeholder
insertion, exact manifest character offsets, custom token maps, and the
zero-shuffle plan shape."""

from pyspark.sql import functions as F

from sinew_spark.operators.interleave import linearize_spans, strip_media

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(spark, spans, doc_id="d0"):
    return spark.createDataFrame([(doc_id, spans)], SCHEMA)


def test_linearize_basic_and_manifest_offsets(spark):
    df = _doc(
        spark,
        [
            ("text", "hello world", None, 0),
            ("image", None, "img://a/0", 1),
            ("text", "tail", None, 2),
            ("audio", None, "aud://a/1", 3),
        ],
    )
    r = linearize_spans(df).collect()[0]
    assert r.text_linear == "hello world <|image|> tail <|audio|>"
    m = [(e.pos, e.kind, e.media_ref) for e in r.media_manifest]
    assert m == [(12, "image", "img://a/0"), (27, "audio", "aud://a/1")]
    # positions point exactly at the tokens
    for pos, kind, _ in m:
        assert r.text_linear[pos:].startswith(f"<|{kind}|>")


def test_linearize_sorts_by_offset_not_array_order(spark):
    df = _doc(
        spark,
        [
            ("text", "b", None, 2),
            ("image", None, "img://x", 1),
            ("text", "a", None, 0),
        ],
    )
    r = linearize_spans(df).collect()[0]
    assert r.text_linear == "a <|image|> b"
    assert r.media_manifest[0].pos == 2


def test_linearize_empty_text_span_keeps_positions_deterministic(spark):
    df = _doc(
        spark,
        [
            ("text", "", None, 0),
            ("image", None, "img://x", 1),
            ("text", None, None, 2),  # null text == empty
        ],
    )
    r = linearize_spans(df).collect()[0]
    assert r.text_linear == " <|image|> "
    assert r.media_manifest[0].pos == 1


def test_linearize_custom_tokens_and_unknown_kind_default(spark):
    df = _doc(
        spark,
        [
            ("image", None, "img://x", 0),
            ("video", None, "vid://y", 1),
        ],
    )
    r = linearize_spans(df, tokens={"image": "[IMG]"}).collect()[0]
    assert r.text_linear == "[IMG] <|video|>"


def test_linearize_no_spans(spark):
    r = linearize_spans(_doc(spark, [])).collect()[0]
    assert r.text_linear == "" and r.media_manifest == []


def test_strip_media(spark):
    df = _doc(
        spark,
        [
            ("text", "a", None, 0),
            ("image", None, "img://x", 1),
            ("text", "b", None, 2),
        ],
    )
    r = strip_media(df).collect()[0]
    assert r.text_only == "a b"


def test_linearize_plan_zero_shuffle_zero_python(spark):
    df = _doc(spark, [("text", "a", None, 0)])
    for out in (linearize_spans(df), strip_media(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


def _brute_main_content(spans, min_tokens=10, link_min_tokens=3):
    import re

    spans = sorted(spans, key=lambda s: s[3])
    toks = lambda t: 0 if not t or not t.strip() else len(re.split(r"\s+", t.strip()))  # noqa: E731
    base = [
        k == "title" or (k == "text" and toks(t) >= min_tokens)
        for k, t, _m, _o in spans
    ]
    kept = []
    for i, (k, t, m, o) in enumerate(spans):
        adj = (i > 0 and base[i - 1]) or (i < len(spans) - 1 and base[i + 1])
        rides = k in ("text", "image") or (k == "link" and toks(t) >= link_min_tokens)
        if base[i] or (adj and rides):
            kept.append((k, t, m, o))
    return kept


def test_main_content_matches_bruteforce(spark):
    from sinew_spark.operators.interleave import main_content_spans

    spans = [
        ("title", "Doc heading words", None, 0),
        ("link", "home", "http://nav.test/", 1),
        ("image", None, "img://d/0", 2),
        ("text", "a long paragraph of real prose with twelve whole tokens here ok", None, 3),
        ("link", "read the full report here", "http://x.test/r", 4),
        ("text", "short trailing note", None, 5),
        ("link", "privacy terms", "http://nav.test/p", 6),
    ]
    got = [
        (s.kind, s.text, s.media_ref, s.offset)
        for s in main_content_spans(_doc(spark, spans)).collect()[0].content_spans
    ]
    want = _brute_main_content(spans)
    assert got == want
    kinds_kept = [k for k, *_ in got]
    # title + image (rides with title) + prose + inline link survive;
    # one-word nav chrome and the orphan short text do not
    assert kinds_kept == ["title", "image", "text", "link"]


def test_main_content_unsorted_input_and_edge_spans(spark):
    from sinew_spark.operators.interleave import main_content_spans

    spans = [
        ("link", "read all about it today", "http://x/1", 1),
        ("text", "one two three four five six seven eight nine ten eleven", None, 0),
        ("text", "", None, 2),
        ("image", None, "img://tail", 3),
    ]
    got = [
        (s.kind, s.offset)
        for s in main_content_spans(_doc(spark, spans)).collect()[0].content_spans
    ]
    want = [(k, o) for k, _t, _m, o in _brute_main_content(spans)]
    assert got == want
    # the long prose block survives as base content
    assert got[0] == ("text", 0)


def test_main_content_all_boilerplate_and_empty(spark):
    from sinew_spark.operators.interleave import main_content_spans

    nav = [("link", "home", "h", 0), ("link", "about", "a", 1)]
    assert main_content_spans(_doc(spark, nav)).collect()[0].content_spans == []
    assert main_content_spans(_doc(spark, [])).collect()[0].content_spans == []


def test_main_content_zero_shuffle_plan(spark):
    from sinew_spark.operators.interleave import main_content_spans

    df = _doc(spark, [("title", "t", None, 0)])
    plan = (
        main_content_spans(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_main_content_rejects_bad_thresholds(spark):
    import pytest as _pytest

    from sinew_spark.operators.interleave import main_content_spans

    with _pytest.raises(ValueError):
        main_content_spans(_doc(spark, []), min_tokens=0)


def test_multimodal_token_cost_per_kind_and_text(spark):
    from sinew_spark.operators.interleave import multimodal_token_cost

    docs = spark.createDataFrame(
        [
            (0, [("text", "a b c", None, 0), ("image", None, "img://x", 1),
                 ("audio", None, "aud://y", 2), ("video", None, "vid://z", 3)]),
            (1, [("text", "  ", None, 0)]),  # blank text span counts 0
            (2, []),
        ],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {r.doc_id: r.n_tokens for r in multimodal_token_cost(
        docs, media_tokens={"image": 576, "audio": 32}
    ).collect()}
    # 3 text tokens + 576 image + 32 audio + 64 default (video)
    assert out[0] == 3 + 576 + 32 + 64
    assert out[1] == 0
    assert out[2] == 0


def test_multimodal_token_cost_feeds_packing(spark):
    from sinew_spark.operators.interleave import multimodal_token_cost
    from sinew_spark.operators.pipeline import pack_by_token_budget

    docs = spark.createDataFrame(
        [(i, [("text", "w " * 5, None, 0), ("image", None, f"img://{i}", 1)])
         for i in range(10)],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    costed = multimodal_token_cost(docs, media_tokens={"image": 95})
    packed = pack_by_token_budget(costed.select("doc_id", "n_tokens"), budget=200)
    rows = {r.doc_id: r for r in packed.collect()}
    # every doc costs 5 text + 95 image = 100; budget 200 -> 2 docs/shard
    assert all(r.n_tokens == 100 for r in rows.values())
    assert [rows[i].shard for i in range(10)] == [i // 2 for i in range(10)]
