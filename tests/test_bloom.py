"""Sharded Bloom filter: no false negatives, bounded false positives,
round-trip serialization."""

import numpy as np

from sinew_spark.operators.bloom import BloomShards


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
