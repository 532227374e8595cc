"""resolve_redirect_chains: pointer-doubling redirect collapse."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.chains import resolve_redirect_chains


def _resolve(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = resolve_redirect_chains(df).collect()
    return {r["src"]: (r["final_url"], r["hops"], r["cyclic"]) for r in rows}


def test_single_hop(spark):
    out = _resolve(spark, [("a", "b")])
    assert out == {"a": ("b", 1, False)}


def test_long_chain_every_entry_point(spark):
    # a0 -> a1 -> ... -> a9 -> T : every prefix resolves to T with the
    # right remaining hop count.
    edges = [(f"a{i}", f"a{i+1}") for i in range(9)] + [("a9", "T")]
    out = _resolve(spark, edges)
    for i in range(10):
        assert out[f"a{i}"] == ("T", 10 - i, False)


def test_chains_longer_than_one_doubling_band(spark):
    # Two equal-length chains (the case a progress-plateau heuristic
    # would misclassify as cyclic).
    edges = []
    for c in ("x", "y"):
        edges += [(f"{c}{i}", f"{c}{i+1}") for i in range(16)]
    out = _resolve(spark, edges)
    assert out["x0"] == ("x16", 16, False)
    assert out["y0"] == ("y16", 16, False)
    assert not any(v[2] for v in out.values())


def test_cycle_detected_and_flagged(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("in", "a"), ("ok", "done")]
    out = _resolve(spark, edges)
    assert out["ok"] == ("done", 1, False)
    for v in ("a", "b", "c", "in"):
        final, hops, cyclic = out[v]
        assert cyclic is True
        assert hops is None
    # Non-cyclic rows keep exact hops even when cycles coexist.
    assert out["ok"][1] == 1


def test_self_loop(spark):
    out = _resolve(spark, [("s", "s"), ("p", "s")])
    assert out["s"][2] is True and out["p"][2] is True


def test_convergent_tree(spark):
    # Many sources redirecting into one hub then out: hub is a hot
    # build-side key, results still exact.
    edges = [(f"u{i}", "hub") for i in range(50)] + [("hub", "final")]
    out = _resolve(spark, edges)
    assert out["hub"] == ("final", 1, False)
    for i in range(50):
        assert out[f"u{i}"] == ("final", 2, False)


def test_duplicate_source_rejected(spark):
    df = spark.createDataFrame([("a", "b"), ("a", "c")], ["src", "dst"])
    with pytest.raises(ValueError, match="duplicate source"):
        resolve_redirect_chains(df)


def test_partitioning_invariance(spark):
    edges = [(f"a{i}", f"a{i+1}") for i in range(20)] + [("a20", "T")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = {
        r["src"]: (r["final_url"], r["hops"], r["cyclic"])
        for r in resolve_redirect_chains(df.repartition(1)).collect()
    }
    many = {
        r["src"]: (r["final_url"], r["hops"], r["cyclic"])
        for r in resolve_redirect_chains(
            df.repartition(7, F.col("dst"))
        ).collect()
    }
    assert one == many
