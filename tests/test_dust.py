"""DUST param-rule mining (operators/dust.py)."""

import pytest

from sinew_spark.operators.dust import mine_param_rules


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string")


def test_irrelevant_param_mined_relevant_excluded(spark):
    rows = []
    # page matters (digest follows it), session doesn't
    for page in range(2):
        for sess in range(3):
            rows.append(
                (f"http://a.test/list?page={page}&session=s{sess}", f"d{page}")
            )
    r = {(x.host, x.param): (x.support, x.n_values)
         for x in mine_param_rules(_pages(spark, rows)).collect()}
    # session: 2 experiments (one per page value), 3 values each
    assert r == {("a.test", "session"): (2, 6)}


def test_one_counterexample_kills_rule(spark):
    rows = [
        ("http://b.test/x?sid=1&q=a", "same"),
        ("http://b.test/x?sid=2&q=a", "same"),
        ("http://b.test/y?sid=1&q=a", "p1"),
        ("http://b.test/y?sid=2&q=a", "p2"),  # sid changed content here
    ]
    assert mine_param_rules(_pages(spark, rows), min_support=1).count() == 0


def test_min_support_threshold(spark):
    rows = [
        ("http://c.test/x?sid=1", "same"),
        ("http://c.test/x?sid=2", "same"),
    ]
    assert mine_param_rules(_pages(spark, rows), min_support=1).count() == 1
    assert mine_param_rules(_pages(spark, rows), min_support=2).count() == 0


def test_param_order_and_rules_are_per_host(spark):
    # same experiment with params in shuffled order; rule is host-scoped
    rows = [
        ("http://d.test/x?z=1&sid=7", "k"),
        ("http://d.test/x?sid=9&z=1", "k"),
        ("http://e.test/x?sid=1", "u1"),
        ("http://e.test/x?sid=2", "u2"),
    ]
    got = {(x.host, x.param) for x in
           mine_param_rules(_pages(spark, rows), min_support=1).collect()}
    assert got == {("d.test", "sid")}


def test_urls_without_query_ignored_and_dupes_collapsed(spark):
    rows = [
        ("http://f.test/plain", "p"),
        ("http://f.test/x?sid=1", "same"),
        ("http://f.test/x?sid=1", "same"),  # exact dup URL: one observation
        ("http://f.test/x?sid=2", "same"),
    ]
    out = mine_param_rules(_pages(spark, rows), min_support=1).collect()
    assert [(r.host, r.param, r.support, r.n_values) for r in out] == [
        ("f.test", "sid", 1, 2)
    ]


def test_validation(spark):
    with pytest.raises(ValueError):
        mine_param_rules(_pages(spark, [("http://x/?a=1", "d")]), min_support=0)
