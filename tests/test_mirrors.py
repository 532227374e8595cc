"""Mirror-host detection tests (operators/mirrors.py)."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.mirrors import mirror_hosts, page_fingerprints


def _pages(spark):
    rows = []
    # host A: 10 pages; host B mirrors all of them (+ nothing else)
    for i in range(10):
        rows.append(("a.test", f"/p{i}", f"d{i}"))
        rows.append(("b.test", f"/p{i}", f"d{i}"))
    # host C mirrors half of A and has 5 unique pages
    for i in range(5):
        rows.append(("c.test", f"/p{i}", f"d{i}"))
        rows.append(("c.test", f"/u{i}", f"u{i}"))
    # host D: same paths as A but different content -> no fingerprint match
    for i in range(10):
        rows.append(("d.test", f"/p{i}", f"x{i}"))
    return spark.createDataFrame(rows, ["host", "path", "digest"])


def test_mirror_full_and_partial(spark):
    out = {(r.host_a, r.host_b): r for r in mirror_hosts(_pages(spark)).collect()}
    assert set(out) == {("a.test", "b.test"), ("a.test", "c.test"), ("b.test", "c.test")}
    full = out[("a.test", "b.test")]
    assert full.shared == 10 and full.overlap_x == 1_000_000
    part = out[("a.test", "c.test")]
    # min side is C (10 pages), 5 shared -> exactly the 500k threshold
    assert part.shared == 5 and part.overlap_x == 500_000
    assert part.a_pages == 10 and part.b_pages == 10


def test_mirror_same_path_different_content_no_pair(spark):
    out = mirror_hosts(_pages(spark)).collect()
    assert not any("d.test" in (r.host_a, r.host_b) for r in out)


def test_mirror_fp_cap_under_reports_never_fabricates(spark):
    # one boilerplate page replicated on 30 hosts; cap at 10 kills the
    # pair contribution but the denominator still counts the page
    rows = [(f"h{i:02d}.test", "/terms", "boiler") for i in range(30)]
    rows += [("h00.test", "/a", "d1"), ("h01.test", "/a", "d1"),
             ("h00.test", "/b", "d2"), ("h01.test", "/b", "d2"),
             ("h00.test", "/c", "c0"), ("h01.test", "/c", "c1")]
    pages = spark.createDataFrame(rows, ["host", "path", "digest"])
    out = {(r.host_a, r.host_b): r for r in mirror_hosts(
        pages, threshold_x=500_000, max_fp_hosts=10
    ).collect()}
    assert set(out) == {("h00.test", "h01.test")}
    r = out[("h00.test", "h01.test")]
    # shared counts only the uncapped fps (2 of a true 3); denominators
    # keep all 4 pages -> 2*1e6//4
    assert r.shared == 2 and r.a_pages == 4 and r.overlap_x == 500_000


def test_mirror_null_rows_dropped_and_dedup(spark):
    pages = spark.createDataFrame(
        [("a", "/p", "d"), ("a", "/p", "d"), ("a", None, "d"), ("b", "/p", None),
         ("b", "/p", "d"), ("b", "/q", "e")],
        ["host", "path", "digest"],
    )
    fps = page_fingerprints(pages)
    assert fps.groupBy("host").count().where("host = 'a'").collect()[0]["count"] == 1
    out = mirror_hosts(pages, min_shared=1).collect()
    assert len(out) == 1 and out[0].shared == 1 and out[0].overlap_x == 1_000_000


def test_mirror_partitioning_invariant(spark):
    p = _pages(spark)
    a = sorted(mirror_hosts(p).collect())
    b = sorted(mirror_hosts(p.repartition(13, "digest")).collect())
    assert a == b


def test_mirror_validation(spark):
    p = _pages(spark)
    with pytest.raises(ValueError):
        mirror_hosts(p, threshold_x=0)
    with pytest.raises(ValueError):
        mirror_hosts(p, min_shared=0)
