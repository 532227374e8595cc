"""Sharded Bloom filter for the URL-seen set.

The exactly-once guarantee is enforced by an exact left-anti join against
the `seen` table (/root/reference/README.md:114 — "Each URL will be hit
exactly once"); the Bloom filter is a probabilistic PRE-filter that rejects
the vast majority of already-seen candidates before they reach the shuffle,
so at 10^10-key scale the anti-join only sees the (tiny) maybe-new set plus
false positives.

Two layers:

- ``BloomShards``: the numpy bitset core (k probes from splitmix64 remixes,
  fully vectorized, no per-row Python).
- ``BloomShardStore``: the executor-side lifecycle. Shards live as files in
  a sidecar directory, one per shard; shard routing is
  ``pmod(hash(key), S)`` — ``F.hash`` is Murmur3-32 with seed 42, the SAME
  function Spark's hash partitioner applies, so in a stage repartitioned
  S-ways on ``key`` every row of partition p belongs to shard p and a task
  opens exactly one shard file. Both the probe (``prefilter``) and the
  per-round update (``add_delta``) are Spark jobs whose tasks touch only
  their own shard — no driver ever holds keys or the filter, no broadcast
  of the whole bitset. At the 10^10-key design point (~12 GB of bits at
  fpp 0.01) the driver cost is a meta.json write per round.

Crash safety: shard files are written tmp+rename, and an under-populated
filter only weakens the prefilter (the key passes through to the exact
anti-join) — it can never cause a missed or duplicate fetch, so a crash
between shard writes needs no repair.

False-positive budget: fpp ~ (1 - e^(-k*n/m))^k. Default sizing ~9.6 bits/key
with k=7 gives fpp ≈ 1e-2 per probe at capacity; a false positive only costs
a redundant anti-join row (never a missed fetch), so the filter can run hot.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> _U64(31))


class BloomShards:
    """n_shards independent bitsets; key -> shard by pmod, then k probes."""

    def __init__(self, capacity: int, fpp: float = 0.01, n_shards: int = 8):
        bits_total = max(1024, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.n_shards = n_shards
        self.k = max(1, int(round(bits_total / max(1, capacity) * math.log(2))))
        per = (bits_total // n_shards // 64 + 1) * 64
        self.bits_per_shard = per
        self.words = np.zeros((n_shards, per // 64), dtype=np.uint64)
        self.n_added = 0

    def _probes(self, keys: np.ndarray):
        """Vectorized (shard, bit-index[k]) for an array of int64 keys."""
        u = keys.astype(np.int64).view(np.uint64)
        shard = (u % _U64(self.n_shards)).astype(np.int64)
        idx = np.empty((self.k, len(u)), dtype=np.int64)
        h = u
        for i in range(self.k):
            h = _splitmix64(h ^ _U64(0xA5A5A5A5 + i * 0x9E37))
            idx[i] = (h % _U64(self.bits_per_shard)).astype(np.int64)
        return shard, idx

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        shard, idx = self._probes(np.asarray(keys))
        for i in range(self.k):
            w = idx[i] >> 6
            b = np.uint64(1) << (idx[i] & 63).astype(np.uint64)
            np.bitwise_or.at(self.words, (shard, w), b)
        self.n_added += len(keys)

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe -> bool array (no false negatives)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        shard, idx = self._probes(np.asarray(keys))
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            w = idx[i] >> 6
            b = np.uint64(1) << (idx[i] & 63).astype(np.uint64)
            out &= (self.words[shard, w] & b) != 0
        return out

    # --- persistence (sidecar next to the seen table) -------------------------

    def to_bytes(self) -> bytes:
        import io

        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            words=self.words,
            meta=np.array([self.n_shards, self.k, self.bits_per_shard, self.n_added]),
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomShards":
        import io

        z = np.load(io.BytesIO(data))
        ns, k, per, n_added = (int(x) for x in z["meta"])
        obj = cls.__new__(cls)
        obj.n_shards = ns
        obj.k = k
        obj.bits_per_shard = per
        obj.words = z["words"]
        obj.n_added = n_added
        return obj
