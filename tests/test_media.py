"""Media asset table + digest canonicalization (operators/media.py)."""

from pyspark.sql import functions as F

from sinew_spark.operators.media import canonicalize_media_refs, media_asset_table

SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _docs(spark):
    rows = [
        ("d1", [("text", "hello", None, 0), ("image", None, "img://logo", 1),
                ("image", None, "img://a", 2)]),
        ("d2", [("image", None, "img://logo", 0), ("image", None, "img://b", 1),
                ("image", None, "img://logo", 2)]),  # logo twice in one doc
        ("d3", [("audio", None, "aud://x", 0), ("text", "bye", None, 1)]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _digests(spark):
    # img://a and img://b are byte-identical (mirrored); logo unique
    return spark.createDataFrame(
        [("img://logo", "h_logo"), ("img://a", "h_ab"), ("img://b", "h_ab"),
         ("aud://x", "h_x")],
        "media_ref string, digest string",
    )


def test_asset_table_by_ref(spark):
    t = {r.asset_key: (r.n_docs, r.n_spans, r.n_kinds)
         for r in media_asset_table(_docs(spark)).collect()}
    assert t["img://logo"] == (2, 3, 1)  # d1 once + d2 twice
    assert t["img://a"] == (1, 1, 1)
    assert t["aud://x"] == (1, 1, 1)
    assert len(t) == 4  # text spans never become assets


def test_asset_table_by_digest_merges_mirrors(spark):
    t = {r.asset_key: (r.canonical_ref, r.n_docs, r.n_spans)
         for r in media_asset_table(_docs(spark), _digests(spark)).collect()}
    assert t["h_ab"] == ("img://a", 2, 2)  # a+b merged, min ref canonical
    assert t["h_logo"] == ("img://logo", 2, 3)


def test_asset_table_unresolved_ref_is_own_asset(spark):
    docs = _docs(spark)
    partial = _digests(spark).filter(F.col("media_ref") != "aud://x")
    t = {r.asset_key for r in media_asset_table(docs, partial).collect()}
    assert "aud://x" in t  # no digest row -> self-keyed


def test_canonicalize_rewrites_only_mirrored(spark):
    out = canonicalize_media_refs(_docs(spark), _digests(spark))
    spans = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
             for r in out.collect()}
    # d2's img://b became img://a; logo and text untouched; order kept
    assert spans["d2"] == [("image", None, "img://logo", 0),
                           ("image", None, "img://a", 1),
                           ("image", None, "img://logo", 2)]
    assert spans["d1"] == [("text", "hello", None, 0),
                           ("image", None, "img://logo", 1),
                           ("image", None, "img://a", 2)]
    assert spans["d3"] == [("audio", None, "aud://x", 0), ("text", "bye", None, 1)]
    # element schema preserved exactly (transform tightens containsNull)
    assert (
        out.schema["spans"].dataType.elementType
        == _docs(spark).schema["spans"].dataType.elementType
    )


def test_canonicalize_plan_broadcast(spark):
    out = canonicalize_media_refs(_docs(spark), _digests(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_roundtrip_asset_table_after_canonicalize(spark):
    out = canonicalize_media_refs(_docs(spark), _digests(spark))
    t = {r.asset_key: r.n_spans for r in media_asset_table(out).collect()}
    assert t == {"img://logo": 3, "img://a": 2, "aud://x": 1}


def test_canonicalize_ref_with_two_digests_no_duplicate_map_key(spark):
    """A media_ref that carries TWO digests (re-fetch with changed bytes)
    must not raise DUPLICATED_MAP_KEY under Spark's default EXCEPTION
    policy (ADVICE r4): the mapping dedupes to one canonical (min) per
    ref before the per-doc map fold."""
    docs = spark.createDataFrame(
        [("d1", [("image", None, "img://flappy", 0)])], SCHEMA
    )
    digests = spark.createDataFrame(
        [
            ("img://flappy", "h_old"), ("img://flappy", "h_new"),
            ("img://a", "h_old"), ("img://b", "h_new"),
        ],
        "media_ref string, digest string",
    )
    out = canonicalize_media_refs(docs, digests).collect()
    # min canonical across its digest groups: h_old -> img://a
    assert [s.media_ref for s in out[0].spans] == ["img://a"]


def test_perceptual_media_groups(spark):
    import numpy as np

    from sinew_spark.functions.imagecodec import encode_png
    from sinew_spark.operators.media import perceptual_media_groups

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    near = base.copy()
    near[3, 4] = (int(near[3, 4]) + 128) % 256  # <= 2 gradient bits flip
    far = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    rows = [
        ("m1", bytearray(encode_png(base))),
        ("m2", bytearray(encode_png(near))),  # near-dup of m1
        ("m3", bytearray(encode_png(far))),   # unrelated singleton
        ("m4", bytearray(b"corrupt-bytes")),  # undecodable -> own canonical
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    got = {
        r.media_id: r.canonical
        for r in perceptual_media_groups(media, max_hamming=3).collect()
    }
    assert got == {"m1": "m1", "m2": "m1", "m3": "m3", "m4": "m4"}
