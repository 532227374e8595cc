"""hreflang extraction + clustering (operators/hreflang.py)."""
from pyspark.sql import functions as F

from sinew_spark.operators.hreflang import (
    cluster_by_hreflang,
    extract_hreflang,
    hreflang_components,
)

PAGE_EN = """<html><head>
<link rel="alternate" hreflang="en" href="https://ex.com/en/p">
<link hreflang="DE" rel="alternate" href='https://ex.com/de/p'>
<link rel="alternate" hreflang=fr href=https://ex.com/fr/p>
<link rel="alternate" hreflang="x-default" href="https://ex.com/en/p">
<link rel="stylesheet" href="/s.css">
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
</head><body>hello</body></html>"""

PAGE_PLAIN = "<html><head><title>no alternates</title></head></html>"


def _df(spark, rows):
    return spark.createDataFrame(rows, "seq long, url string, resp_body string")


def test_extract_hreflang_variants_and_attr_orders(spark):
    df = _df(spark, [(0, "https://ex.com/en/p", PAGE_EN)])
    rows = extract_hreflang(df).orderBy("variant_idx").collect()
    assert [(r.lang, r.href) for r in rows] == [
        ("en", "https://ex.com/en/p"),
        ("de", "https://ex.com/de/p"),  # lang lowercased, attr order swapped
        ("fr", "https://ex.com/fr/p"),  # unquoted attrs
        ("x-default", "https://ex.com/en/p"),
    ]


def test_cluster_by_hreflang_zero_shuffle_min(spark):
    df = _df(
        spark,
        [
            (0, "https://ex.com/en/p", PAGE_EN),
            (1, "https://ex.com/nolinks", PAGE_PLAIN),
        ],
    )
    out = {r.seq: r for r in cluster_by_hreflang(df).collect()}
    assert out[0].cluster == "https://ex.com/de/p"  # lexicographic min of set
    assert out[0].langs == ["en", "de", "fr", "x-default"]
    assert out[0].n_variants == 4
    # page without markup clusters as itself, empty set
    assert out[1].cluster == "https://ex.com/nolinks"
    assert out[1].langs == [] and out[1].n_variants == 0
    # no Exchange in the plan: map-only contract
    plan = cluster_by_hreflang(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_components_close_non_reciprocal_chains(spark):
    # en lists de only; de lists fr only; fr lists nothing — a chain the
    # per-page min cannot close, CC can
    entries = spark.createDataFrame(
        [
            ("https://ex.com/en", "https://ex.com/de"),
            ("https://ex.com/de", "https://ex.com/fr"),
        ],
        "url string, href string",
    )
    got = {r.v: r.cluster for r in hreflang_components(entries).collect()}
    assert got == {
        "https://ex.com/en": "https://ex.com/de",
        "https://ex.com/de": "https://ex.com/de",
        "https://ex.com/fr": "https://ex.com/de",
    }
