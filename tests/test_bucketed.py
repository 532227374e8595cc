"""Bucketed tables (plans/bucketed.py): the co-located join really
plans with zero Exchange (and zero Sort when written sorted), and
results match the plain join."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.plans.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # expose the sortBy metadata as scan output ordering (safe with
    # one_file_per_bucket; off by default since Spark 3.0)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    yield
    spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
    else:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_cobucketed_join_zero_exchange(spark, tmpdir_path, no_broadcast):
    left = spark.range(0, 2_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1_500).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bk_left", ["key"], 8, path=f"{tmpdir_path}/l")
    write_bucketed(right, "bk_right", ["key"], 8, path=f"{tmpdir_path}/r")
    try:
        j = read_bucketed(spark, "bk_left").join(
            read_bucketed(spark, "bk_right"), "key"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # the shuffle was paid at write time
        assert "SortMergeJoin" in plan
        # sortBy means no runtime Sort either
        assert "Sort " not in plan.replace("SortMergeJoin", "")

        # sanity 1: values match the plain join
        plain = left.join(right, "key")
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
        # sanity 2: the unbucketed join DOES shuffle — the assertion above
        # is not vacuous
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_cobucketed_groupby_zero_exchange(spark, tmpdir_path):
    df = spark.range(0, 2_000).select(
        (F.col("id") % 100).alias("key"), F.col("id").alias("v")
    )
    write_bucketed(df, "bk_agg", ["key"], 8, path=f"{tmpdir_path}/g")
    try:
        agg = read_bucketed(spark, "bk_agg").groupBy("key").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        got = {r.key: r.s for r in agg.collect()}
        want = {r.key: r.s for r in df.groupBy("key").agg(F.sum("v").alias("s")).collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_agg")


def test_write_bucketed_guard(spark):
    df = spark.range(1).select(F.col("id").alias("key"))
    with pytest.raises(ValueError):
        write_bucketed(df, "bk_bad", ["key"], 0)
