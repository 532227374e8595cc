"""Sharded Bloom filter: no false negatives, bounded false positives,
round-trip serialization; executor-side shard store lifecycle."""

import numpy as np
from pyspark.sql import functions as F

from sinew_spark.operators.bloom import BloomShards, BloomShardStore


def test_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    b = BloomShards(capacity=20_000, fpp=0.01, n_shards=8)
    b.add(keys)
    assert b.might_contain(keys).all()


def test_false_positive_rate():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    other = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    b = BloomShards(capacity=20_000, fpp=0.01, n_shards=8)
    b.add(keys)
    fpp = b.might_contain(other).mean()
    assert fpp < 0.05, fpp


def test_serialization_roundtrip():
    keys = np.arange(1000, dtype=np.int64) * 7919
    b = BloomShards(capacity=1000, n_shards=4)
    b.add(keys)
    b2 = BloomShards.from_bytes(b.to_bytes())
    assert b2.might_contain(keys).all()
    assert b2.n_added == 1000


def test_empty():
    b = BloomShards(capacity=100)
    assert not b.might_contain(np.array([1, 2, 3], dtype=np.int64)).any()


# --- BloomShardStore (executor-side lifecycle) --------------------------------


def test_store_prefilter_no_false_negatives(spark, tmp_path):
    """Every added key must be rejected by prefilter (no false negatives);
    an empty store passes everything through."""
    store = BloomShardStore(str(tmp_path / "b"), capacity=10_000, n_shards=8)
    keys = spark.range(0, 5000).select((F.col("id") * 7919 - 2**40).alias("key"))
    fresh = spark.range(6000, 7000).select((F.col("id") * 104729 + 2**50).alias("key"))

    assert store.prefilter(keys).count() == 5000  # empty store: all pass
    n = store.add_delta(keys)
    assert n == 5000
    assert store.prefilter(keys).count() == 0  # all seen keys rejected
    # fresh keys mostly pass (false positives bounded, never negatives)
    assert store.prefilter(fresh).count() > 900


def test_store_incremental_delta_and_reopen(spark, tmp_path):
    """add_delta accumulates across rounds; a reopened store (new object,
    same dir) picks up the persisted shards + meta."""
    path = str(tmp_path / "b")
    store = BloomShardStore(path, capacity=10_000, n_shards=4)
    k1 = spark.range(0, 1000).select(F.col("id").alias("key"))
    k2 = spark.range(1000, 2000).select(F.col("id").alias("key"))
    store.add_delta(k1)
    store.add_delta(k2)
    reopened = BloomShardStore(path, capacity=999, n_shards=16)  # params ignored
    assert reopened.n_shards == 4 and reopened.n_added == 2000
    both = k1.unionByName(k2)
    assert reopened.prefilter(both).count() == 0


def test_store_rebuild_after_delete(spark, tmp_path):
    store = BloomShardStore(str(tmp_path / "b"), capacity=1000, n_shards=4)
    keys = spark.range(0, 500).select(F.col("id").alias("key"))
    store.add_delta(keys)
    kept = spark.range(0, 250).select(F.col("id").alias("key"))
    store.rebuild(kept)
    assert store.n_added == 250
    assert store.prefilter(kept).count() == 0
    # dropped keys may straggle as false positives but most must pass again
    dropped = spark.range(250, 500).select(F.col("id").alias("key"))
    assert store.prefilter(dropped).count() > 200


# --- SeenKeyShardStore (exact membership, zero-shuffle anti-join path) --------


def test_seen_keys_matches_anti_join(spark, tmp_path):
    """reject_seen == left_anti join vs the same key set, exactly."""
    from sinew_spark.operators.bloom import SeenKeyShardStore
    from sinew_spark.plans.snapshots import SnapshotTable
    from pyspark.sql import types as T

    t = SnapshotTable(
        spark, str(tmp_path / "seen"), T.StructType([T.StructField("key", T.LongType())])
    )
    t.append(spark.range(0, 3000).select((F.col("id") * 31 - 2**45).alias("key")))
    store = SeenKeyShardStore(str(tmp_path / "ks"), n_shards=4)
    store.sync(t)
    assert store.in_sync_with(t)

    frontier = spark.range(0, 9000).select((F.col("id") * 31 - 2**45).alias("key"))
    exact = frontier.join(t.read(), "key", "left_anti")
    via_store = store.reject_seen(frontier)
    assert sorted(r.key for r in via_store.collect()) == sorted(r.key for r in exact.collect())


def test_seen_keys_incremental_and_rebuild(spark, tmp_path):
    """Append deltas absorb incrementally; an overwrite (uncache/compact)
    forces a rebuild; snapshot id advances only after shards are written."""
    from sinew_spark.operators.bloom import SeenKeyShardStore
    from sinew_spark.plans.snapshots import SnapshotTable
    from pyspark.sql import types as T

    t = SnapshotTable(
        spark, str(tmp_path / "seen"), T.StructType([T.StructField("key", T.LongType())])
    )
    store = SeenKeyShardStore(str(tmp_path / "ks"), n_shards=4)
    t.append(spark.range(0, 100).select(F.col("id").alias("key")))
    store.sync(t)
    t.append(spark.range(100, 200).select(F.col("id").alias("key")))
    store.sync(t)  # incremental
    probe = spark.range(0, 300).select(F.col("id").alias("key"))
    assert sorted(r.key for r in store.reject_seen(probe).collect()) == list(range(200, 300))

    t.delete_where(F.col("key") < 50)  # overwrite op -> rebuild on sync
    store2 = SeenKeyShardStore(str(tmp_path / "ks"), n_shards=4)  # reopen
    store2.sync(t)
    kept = sorted(r.key for r in store2.reject_seen(probe).collect())
    assert kept == list(range(0, 50)) + list(range(200, 300))


def test_seen_keys_lsm_runs_and_compaction(spark, tmp_path):
    """Absorbs append O(delta) run files without rewriting existing runs;
    crossing KEYS_COMPACT_RUNS merges a shard back to one run; membership
    is always the union. A stale leftover run (crash between compaction
    rename and input unlink) changes nothing."""
    import os
    import shutil

    import numpy as np

    from sinew_spark.operators.bloom import (
        KEYS_COMPACT_RUNS,
        SeenKeyShardStore,
        _load_keys_shard,
        _shard_run_files,
    )
    from sinew_spark.plans.snapshots import SnapshotTable
    from pyspark.sql import types as T

    t = SnapshotTable(
        spark, str(tmp_path / "seen"), T.StructType([T.StructField("key", T.LongType())])
    )
    store = SeenKeyShardStore(str(tmp_path / "ks"), n_shards=2)

    t.append(spark.range(0, 100).select(F.col("id").alias("key")))
    store.sync(t)
    first = {
        s: {(os.path.basename(p), os.stat(p).st_mtime_ns) for p in _shard_run_files(store.path, s)}
        for s in range(2)
    }
    assert all(len(v) == 1 for v in first.values())

    t.append(spark.range(100, 200).select(F.col("id").alias("key")))
    store.sync(t)
    for s in range(2):
        now = {(os.path.basename(p), os.stat(p).st_mtime_ns) for p in _shard_run_files(store.path, s)}
        assert first[s] <= now and len(now) == 2  # old run untouched, new run added

    # drive past the compaction threshold
    lo = 200
    for _ in range(KEYS_COMPACT_RUNS):
        t.append(spark.range(lo, lo + 50).select(F.col("id").alias("key")))
        store.sync(t)
        lo += 50
    assert all(len(_shard_run_files(store.path, s)) <= KEYS_COMPACT_RUNS for s in range(2))
    probe = spark.range(0, lo + 100).select(F.col("id").alias("key"))
    assert sorted(r.key for r in store.reject_seen(probe).collect()) == list(range(lo, lo + 100))

    # stale-run crash model: duplicate an existing run under a newer name
    runs0 = _shard_run_files(store.path, 0)
    shutil.copyfile(runs0[0], os.path.join(store.path, "keys-00000.r009999.npy"))
    before = _load_keys_shard(store.path, 0)
    assert sorted(r.key for r in store.reject_seen(probe).collect()) == list(range(lo, lo + 100))
    assert np.array_equal(_load_keys_shard(store.path, 0), before)
