"""HyperLogLog sketch (operators/sketch.py): register brute-force
equivalence, merge law, estimate accuracy, and plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sinew_spark.operators.sketch import hll_estimate, hll_merge, hll_registers


def _brute_registers(values, p=8):
    w_bits = 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, w = h >> w_bits, h & ((1 << w_bits) - 1)
        rho = (w_bits + 1) if w == 0 else (w_bits - w.bit_length() + 1)
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_registers_match_bruteforce(spark):
    vals = [f"http://h{i % 7}.test/p/{i % 113}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], ["url"]).repartition(6)
    got = {r.register: r.max_rho for r in hll_registers(df, "url").collect()}
    assert got == _brute_registers(vals)


def test_duplicates_do_not_change_registers(spark):
    once = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["k"])
    thrice = spark.createDataFrame([(f"k{i % 200}",) for i in range(600)], ["k"])
    a = sorted((r.register, r.max_rho) for r in hll_registers(once, "k").collect())
    b = sorted((r.register, r.max_rho) for r in hll_registers(thrice, "k").collect())
    assert a == b


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["k"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], ["k"])
    merged = sorted(
        (r.register, r.max_rho)
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    )
    union = sorted(
        (r.register, r.max_rho)
        for r in hll_registers(a.unionByName(b), "k").collect()
    )
    assert merged == union


def test_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(f"url{i}",) for i in range(n)], ["k"])
    regs = [(r.register, r.max_rho) for r in hll_registers(df, "k").collect()]
    est = hll_estimate(regs, p=8)
    # standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.20
    # small-range regime: linear counting keeps tiny counts tight
    small = spark.createDataFrame([(f"s{i}",) for i in range(20)], ["k"])
    sregs = [(r.register, r.max_rho) for r in hll_registers(small, "k").collect()]
    assert abs(hll_estimate(sregs, p=8) - 20) <= 3


def test_shuffle_carries_registers_not_keys(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["k"])
    plan = hll_registers(df, "k")._jdf.queryExecution().executedPlan().toString()
    # partial aggregation before the single register exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan or "HashAggregate" in plan


def test_bad_p_rejected(spark):
    df = spark.createDataFrame([("x",)], ["k"])
    with pytest.raises(ValueError):
        hll_registers(df, "k", p=2)
    with pytest.raises(ValueError):
        hll_merge()


def _brute_cms(values, depth=4, width=1024):
    import hashlib

    cells = {}
    for v in values:
        for j in range(depth):
            h = int(hashlib.md5(f"{j}|{v}".encode()).hexdigest()[:15], 16)
            k = (j, h % width)
            cells[k] = cells.get(k, 0) + 1
    return cells


def test_cms_matches_bruteforce(spark):
    from sinew_spark.operators.sketch import cms_table

    vals = [f"t{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(5)
    got = {(r.depth, r.bucket): r.cnt for r in cms_table(df, "k").collect()}
    assert got == _brute_cms(vals)


def test_cms_estimate_one_sided_and_heavy_hitter(spark):
    from sinew_spark.operators.sketch import cms_estimate, cms_table

    vals = ["hot"] * 400 + [f"cold{i}" for i in range(600)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    cells = {(r.depth, r.bucket): r.cnt for r in cms_table(df, "k").collect()}
    est_hot = cms_estimate(cells, "hot")
    assert est_hot >= 400  # never under
    assert est_hot <= 400 + 10  # 600 colds over 1024 buckets: tiny collision mass
    for i in range(0, 600, 97):
        assert cms_estimate(cells, f"cold{i}") >= 1
    assert cms_estimate(cells, "never-seen") <= 3


def test_cms_merge_equals_sketch_of_union(spark):
    from sinew_spark.operators.sketch import cms_merge, cms_table

    a = spark.createDataFrame([(f"a{i % 9}",) for i in range(100)], ["k"])
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(100)], ["k"])
    merged = sorted(
        (r.depth, r.bucket, r.cnt)
        for r in cms_merge(cms_table(a, "k"), cms_table(b, "k")).collect()
    )
    union = sorted(
        (r.depth, r.bucket, r.cnt)
        for r in cms_table(a.unionByName(b), "k").collect()
    )
    assert merged == union


def test_cms_bad_params(spark):
    from sinew_spark.operators.sketch import cms_merge, cms_table

    df = spark.createDataFrame([("x",)], ["k"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cms_table(df, "k", depth=0)
    with _pytest.raises(ValueError):
        cms_merge()
