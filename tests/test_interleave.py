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
