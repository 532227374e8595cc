"""Host-level boilerplate detection/strip (operators/boilerplate.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sinew_spark.operators.boilerplate import (
    detect_host_boilerplate,
    strip_host_boilerplate,
)


def _span(kind, text, ref, off):
    return Row(kind=kind, text=text, media_ref=ref, offset=off)


def _docs(spark):
    """Two hosts. Host a: 4 pages, nav+footer+logo on all 4, promo on
    2/4 (exactly at the 0.5 boundary), prose unique per page. Host b:
    1 page only (under min_pages). Host a page 0 tiles the promo twice
    (within-page repeat must count once)."""
    rows = []
    for i in range(4):
        spans = [
            _span("link", "home", "http://a.test/", 0),
            _span("text", "copyright a.test", None, 1),
            _span("image", None, "logo://a", 2),
            _span("text", f"unique prose for page {i} on host a", None, 3),
        ]
        if i < 2:
            spans.append(_span("text", "promo banner", None, 4))
        if i == 0:
            spans.append(_span("text", "promo banner", None, 5))
        rows.append(Row(host="a.test", doc_id=f"a{i}", spans=spans))
    rows.append(
        Row(
            host="b.test",
            doc_id="b0",
            spans=[
                _span("text", "copyright b.test", None, 0),
                _span("text", "b prose", None, 1),
            ],
        )
    )
    return spark.createDataFrame(rows)


def test_detect_threshold_and_min_pages(spark):
    docs = _docs(spark)
    bp = detect_host_boilerplate(docs, min_pages=2, min_frac=0.5)
    got = {(r.host, r.kind, r.n_pages) for r in bp.collect()}
    # host a: nav link, footer, logo on 4/4; promo on 2/4 == boundary (>=)
    assert got == {
        ("a.test", "link", 4),
        ("a.test", "text", 4),  # copyright
        ("a.test", "image", 4),
        ("a.test", "text", 2),  # promo at exactly 0.5
    }
    # host b excluded entirely by min_pages
    assert bp.filter(F.col("host") == "b.test").count() == 0
    # strictly-above-half knocks the boundary key out
    bp2 = detect_host_boilerplate(docs, min_pages=2, min_frac=0.51)
    assert bp2.filter(F.col("n_pages") == 2).count() == 0
    assert bp2.filter(F.col("host") == "a.test").count() == 3


def test_within_page_repeat_counts_once(spark):
    # promo appears twice on page a0 but n_pages must be 2, not 3
    docs = _docs(spark)
    bp = detect_host_boilerplate(docs, min_pages=2, min_frac=0.5)
    promo = [r for r in bp.collect() if r.n_pages == 2]
    assert len(promo) == 1


def test_strip_preserves_content_and_order(spark):
    docs = _docs(spark)
    bp = detect_host_boilerplate(docs, min_pages=2, min_frac=0.5)
    out = strip_host_boilerplate(docs, bp)
    # page a1 carries the promo, but promo is boilerplate at 0.5 — only
    # the unique prose survives
    a1 = out.filter(F.col("doc_id") == "a1").select("content_spans").first()[0]
    assert [(s.kind, s.offset) for s in a1] == [("text", 3)]
    # page a3 (no promo): only its unique prose survives
    a3 = out.filter(F.col("doc_id") == "a3").select("content_spans").first()[0]
    assert [(s.kind, s.text, s.offset) for s in a3] == [
        ("text", "unique prose for page 3 on host a", 3)
    ]
    # host b untouched (no boilerplate rows): passthrough
    b0 = out.filter(F.col("doc_id") == "b0").select("content_spans").first()[0]
    assert len(b0) == 2


def test_strip_plan_is_broadcast_no_smj(spark):
    docs = _docs(spark)
    bp = detect_host_boilerplate(docs, min_pages=2, min_frac=0.5)
    out = strip_host_boilerplate(docs, bp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_param_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        detect_host_boilerplate(docs, min_pages=0)
    with pytest.raises(ValueError):
        detect_host_boilerplate(docs, min_frac=0.0)
    with pytest.raises(ValueError):
        detect_host_boilerplate(docs, min_frac=1.5)
