"""Sharded Bloom filter for the URL-seen set.

The exactly-once guarantee is enforced by an EXACT check — the left-anti
join against the `seen` table, or its zero-shuffle scale path, the
``SeenKeyShardStore`` binary-search probe (/root/reference/README.md:114 —
"Each URL will be hit exactly once"). The Bloom filter is a probabilistic
short-circuit INSIDE that exact probe (``SeenKeyShardStore.reject_seen``):
rows whose key the bloom cannot contain skip the sorted-run search; rows
the bloom flags as maybe-seen fall through to the exact search, so a bloom
false positive costs one redundant binary search — NEVER a dropped URL. (An
earlier design filtered the frontier on ``~might_contain`` alone, which
silently dropped ~fpp of genuinely-new URLs at capacity fill; the fused
probe is the fix.)

Because "definitely new skips the exact search" is load-bearing, the bloom
must contain EVERY key of the seen snapshot it claims to cover — an
under-populated bloom would let a seen key skip the search and be
refetched. ``sync()`` enforces the same snapshot discipline as the key
store: meta records the last absorbed seen snapshot id, newer append
deltas are absorbed before any probe, and the fused probe only consults a
bloom that is in sync (otherwise it runs exact-only, which is always
safe). Non-append history (uncache's delete, compaction) only ever REMOVES
seen keys, so the stale bloom is an over-approximation — fail-safe under
the fused probe — and sync just advances the snapshot id.

Two layers:

- ``BloomShards``: the numpy bitset core (k probes from splitmix64 remixes,
  fully vectorized, no per-row Python).
- ``BloomShardStore``: the executor-side lifecycle. Shards live as files in
  a sidecar directory, one per shard; shard routing is
  ``pmod(hash(key), S)`` — ``F.hash`` is Murmur3-32 with seed 42, the SAME
  function Spark's hash partitioner applies, so in a stage repartitioned
  S-ways on ``key`` every row of partition p belongs to shard p and a task
  opens exactly one shard file. The alignment generalizes: any stage
  hash-partitioned on ``key`` into a MULTIPLE of S partitions maps each
  partition to exactly one shard (m ≡ p mod kS ⇒ m ≡ p mod S), which is
  why the crawl round's ``repartition(2*cores, key)`` stays one-shard-
  per-task as long as S divides the partition count. Both the probe and the
  per-round update (``add_delta``) are Spark jobs whose tasks touch only
  their own shard — no driver ever holds keys or the filter, no broadcast
  of the whole bitset. At the 10^10-key design point (~12 GB of bits at
  fpp 0.01) the driver cost is a meta.json write per round.

Why keep a bloom at all when the key shards are exact: the bitset is
~25x smaller than the sorted key runs (1.2 vs 8 bytes/key at fpp 0.01),
so under the worker LRU budget the bloom stays resident when the key runs
don't — in the steady-state crawl, where most candidates are NEW, the
bloom answers most rows from memory and the key-run load/search happens
only for the maybe-seen minority.

Crash safety: shard files are written tmp+rename; the snapshot id only
advances after the shard writes land, so a crash mid-sync is repaired by
re-absorbing on the next sync (re-adding keys to a bloom is idempotent).

False-positive budget: fpp ~ (1 - e^(-k*n/m))^k. Default sizing ~9.6 bits/key
with k=7 gives fpp ≈ 1e-2 per probe at capacity; a false positive only costs
a redundant exact search (never a missed fetch), so the filter can run hot.
``sync()`` re-sizes (rebuilds at 4x) when n_added outgrows capacity.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

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


# --- executor-side shard store ----------------------------------------------------


class _ShardLRU:
    """Byte-bounded per-python-worker cache of shard payloads, keyed by a
    stable shard identity plus a freshness fingerprint (mtime/size — a new
    fingerprint drops the shard's stale generations on insert). Worker
    processes are reused across tasks/batches, so a hot shard is read once
    per worker per round.

    The byte bound exists because probe placement is not always
    one-shard-per-task: Catalyst pushes the probe filter BELOW the key
    exchange when that is the better plan (blocked rows never shuffle — the
    recrawl regime's big win), and there a task's rows span many shards. An
    unbounded cache would then grow toward the whole store per worker
    (80-240 GB at the 10^10 design point); the LRU keeps each worker at
    SINEW_SHARD_CACHE_BYTES (default 2 GiB) and the hot shards resident."""

    def __init__(self, budget_bytes: int):
        from collections import OrderedDict

        self.budget = budget_bytes
        self._d = OrderedDict()
        self._bytes = 0

    def get(self, ident, fp):
        hit = self._d.get((ident, fp))
        if hit is None:
            return None
        self._d.move_to_end((ident, fp))
        return hit[0]

    def put(self, ident, fp, value, nbytes: int) -> None:
        for k in [k for k in self._d if k[0] == ident]:
            self._bytes -= self._d.pop(k)[1]
        self._d[(ident, fp)] = (value, int(nbytes))
        self._bytes += int(nbytes)
        while self._bytes > self.budget and len(self._d) > 1:
            _k, (_v, b) = self._d.popitem(last=False)
            self._bytes -= b


_CACHE_BUDGET = int(os.environ.get("SINEW_SHARD_CACHE_BYTES", str(2 << 30)))

_SHARD_CACHE = _ShardLRU(_CACHE_BUDGET)


def _load_shard(dirpath: str, shard: int) -> "BloomShards | None":
    p = os.path.join(dirpath, f"shard-{shard:05d}.npz")
    try:
        st = os.stat(p)
    except FileNotFoundError:
        return None
    fp = (st.st_mtime_ns, st.st_size)
    hit = _SHARD_CACHE.get(p, fp)
    if hit is None:
        with open(p, "rb") as f:
            hit = BloomShards.from_bytes(f.read())
        _SHARD_CACHE.put(p, fp, hit, hit.words.nbytes)
    return hit


def _delta_chain(seen_t, from_id: int, cur: int) -> "list[dict] | None":
    """Snapshots strictly after ``from_id`` on the lineage path to ``cur``,
    oldest first — or None when ``from_id`` is NOT an ancestor of ``cur``
    (``rollback_to`` moved current behind the store's recorded snapshot, or
    onto a divergent branch built on an older snapshot). None means a
    sidecar store cannot sync incrementally: its shards hold keys from
    rolled-back snapshots the table no longer contains, and absorbing
    "newer ids" would silently keep them (exactly-once violation — seen
    filter drops frontier URLs that were never fetched on this branch).

    Walks the manifest's Iceberg-style ``parent`` pointers. Legacy
    snapshots without one (pre-parent manifests) fall back to
    largest-smaller-id order — but ``rollback_to`` predates parent
    pointers (ADVICE r3), so a legacy manifest can contain an abandoned
    branch that largest-smaller-id "reaches" (rollback + re-append walks
    onto snapshots whose keys the table no longer holds → phantom keys in
    the exact seen shards, the exactly-once violation this walk exists to
    prevent). The fallback is therefore gated on structural evidence of
    linear lineage: it is only taken in an ALL-parentless manifest with
    ``current == max(ids)``, and each fallback step from ``s`` down to its
    presumed predecessor ``prev`` must satisfy the append-chain invariant
    ``dirs(prev) ⊆ dirs(s)`` (cumulative data dirs only grow along
    append/edelete lineage; a legacy rollback+re-append breaks it because
    the abandoned append's dir is missing from the re-appended snapshot).
    Ops that legitimately reset dirs (overwrite/compact) can't be
    validated — unknown provenance. Any unvalidated walk returns None and
    the store rebuilds, which is always safe."""
    snaps = {s["id"]: s for s in seen_t.snapshots()}
    # mixed provenance (parented snapshots stacked on a legacy prefix) or
    # a parked rollback (current behind the id high-water mark) make the
    # parentless fallback untrustworthy; compute once up front
    all_parentless = snaps and all("parent" not in s for s in snaps.values())
    legacy_linear_ok = bool(
        all_parentless
        and cur == max(snaps)
        and seen_t.current_snapshot() == max(snaps)
    )
    chain: list[dict] = []
    sid = cur
    while sid is not None and sid != from_id:
        s = snaps.get(sid)
        if s is None or s.get("expired"):
            # expire_snapshots keeps the manifest entry but collected the
            # files — an incremental absorb across it would read missing
            # deltas; rebuild from the retained current instead
            return None
        chain.append(s)
        if "parent" in s:
            sid = s["parent"]
        elif legacy_linear_ok:
            older = [i for i in snaps if i < sid]
            sid = max(older) if older else None
            if sid is not None:
                if s.get("op") not in ("append", "edelete"):
                    return None  # dirs reset: lineage unverifiable
                prev_dirs = set(snaps[sid].get("dirs", []))
                if not prev_dirs <= set(s.get("dirs", [])):
                    return None  # abandoned-branch evidence -> rebuild
        else:
            return None  # unknown provenance -> force rebuild
    if sid != from_id:
        return None
    chain.reverse()
    return chain


class BloomShardStore:
    """Directory-backed sharded Bloom sidecar; every probe and update runs
    executor-side on exactly one shard per task (module docstring).

    Layout: ``dir/meta.json`` + ``dir/shard-%05d.npz``. A shard file is a
    serialized single-shard ``BloomShards`` sized for ``capacity/n_shards``
    keys. Routing: ``pmod(hash(key), n_shards)`` — aligned with Spark's
    hash partitioner so ``repartition(n_shards, key)`` stages are
    one-shard-per-task."""

    def __init__(self, path: str, capacity: int = 1_000_000, fpp: float = 0.01, n_shards: int = 64):
        self.path = path
        meta = self._read_meta()
        if meta is None:
            self.capacity, self.fpp, self.n_shards = capacity, fpp, n_shards
            self.n_added = 0
            self.snapshot_id: int | None = None
        else:  # persisted layout wins — shards are already sized for it
            self.capacity = int(meta["capacity"])
            self.fpp = float(meta["fpp"])
            self.n_shards = int(meta["n_shards"])
            self.n_added = int(meta["n_added"])
            # legacy meta (pre-sync discipline) has no snapshot id: unknown
            # provenance, first sync() rebuilds from the seen table
            self.snapshot_id = meta.get("snapshot_id")

    # --- meta -----------------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def _read_meta(self) -> dict | None:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _write_meta(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "capacity": self.capacity,
                    "fpp": self.fpp,
                    "n_shards": self.n_shards,
                    "n_added": self.n_added,
                    "snapshot_id": self.snapshot_id,
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    # --- spark-side ops ---------------------------------------------------------

    def _shard_expr(self):
        from pyspark.sql import functions as F

        return F.pmod(F.hash(F.col("key")), F.lit(self.n_shards))

    def add_delta(self, keys_df, snapshot_id: int | None = None) -> int:
        """Distributed shard update: one task per touched shard loads its
        shard file, ORs in the new keys' bits, writes tmp+rename. The driver
        never sees a key. Returns the number of keys added.

        ``snapshot_id``: the seen snapshot these keys complete — recorded in
        meta AFTER the shard writes land, so a crash mid-update leaves the
        store honestly behind (next sync() re-absorbs; re-adding is
        idempotent)."""
        from pyspark.sql import functions as F

        dirpath, per_cap, fpp, ns = (
            self.path,
            max(1024, self.capacity // self.n_shards),
            self.fpp,
            self.n_shards,
        )

        def upd(pdf):
            import pandas as pd

            shard = int(pdf["_shard"].iloc[0])
            # read the file directly (not via the worker cache) — mutating a
            # cached object would let a failed write leave memory ahead of disk
            p0 = os.path.join(dirpath, f"shard-{shard:05d}.npz")
            if os.path.exists(p0):
                with open(p0, "rb") as f:
                    b = BloomShards.from_bytes(f.read())
            else:
                b = BloomShards(per_cap, fpp=fpp, n_shards=1)
            keys = pdf["key"].to_numpy("int64")
            b.add(keys)
            tmp = p0 + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(b.to_bytes())
            os.replace(tmp, p0)
            return pd.DataFrame({"shard": [shard], "n_keys": [len(keys)]})

        os.makedirs(dirpath, exist_ok=True)
        counts = (
            keys_df.select("key")
            .withColumn("_shard", self._shard_expr())
            .groupBy("_shard")
            .applyInPandas(upd, "shard int, n_keys long")
            .agg(F.sum("n_keys").alias("n"))
            .collect()
        )
        n = int(counts[0].n or 0)
        self.n_added += n
        if snapshot_id is not None:
            self.snapshot_id = snapshot_id
        self._write_meta()
        return n

    def sync(self, seen_t) -> None:
        """Bring the bloom up to the seen table's current snapshot — the
        precondition for the fused probe's "definitely new skips the exact
        search" short-circuit (module docstring). Append snapshots on the
        lineage path are absorbed as deltas; edelete/compact only remove
        seen keys, so the over-approximate bloom stays fail-safe and the id
        just advances. Everything else rebuilds from the full key set:
        fresh/legacy/lost sidecar, rollback or divergent history (the
        shards may hold keys from rolled-back snapshots — the invariant
        "bloom contains every seen key AND nothing decides on phantom
        keys alone" needs the exact store rebuilt in lockstep; the bloom
        rebuilds for hygiene since phantom keys degrade the prefilter),
        an ``overwrite`` snapshot (may ADD keys; advancing past it would
        break "bloom contains every seen key" and the short-circuit would
        skip the exact search for genuinely-seen URLs), and outgrowing
        capacity (4x re-size keeps amortized cost O(delta))."""
        cur = seen_t.current_snapshot()
        if cur == self.snapshot_id or cur is None:
            return
        newer = (
            _delta_chain(seen_t, self.snapshot_id, cur)
            if self.snapshot_id is not None
            else None
        )
        if newer is None:
            # fresh/legacy/lost sidecar/rollback: pre-size from manifest
            # stats (free) so the rebuild lands under the fpp budget in one
            # pass
            est = seen_t.approx_rows()
            if est > self.capacity:
                self.capacity = max(self.capacity * 4, est * 2)
            self.rebuild(seen_t.read().select("key"), snapshot_id=cur)
            return
        for s in newer:
            if s["op"] == "append":
                self.add_delta(seen_t.read_delta(s["id"]).select("key"), snapshot_id=s["id"])
            elif s["op"] in ("edelete", "compact"):
                # keys only shrink: over-approximation is fail-safe
                self.snapshot_id = s["id"]
                self._write_meta()
            else:  # overwrite/unknown may add keys the bloom lacks
                est = seen_t.approx_rows()
                if est > self.capacity:
                    self.capacity = max(self.capacity * 4, est * 2)
                self.rebuild(seen_t.read().select("key"), snapshot_id=cur)
                return
        if self.n_added > self.capacity:  # fpp past budget: re-size + rebuild
            self.capacity = max(self.capacity * 4, self.n_added * 2)
            self.rebuild(seen_t.read().select("key"), snapshot_id=cur)

    def in_sync_with(self, seen_t) -> bool:
        return seen_t.current_snapshot() == self.snapshot_id

    def maybe_seen(self, frontier):
        """Rows the bloom flags as possibly-seen — an OVER-approximation of
        the truly-seen rows (no false negatives: every added key is
        flagged). Diagnostics/tests surface; the engine's hot path consults
        the bloom inside ``SeenKeyShardStore.reject_seen`` instead, where a
        false positive falls through to the exact search rather than
        deciding anything."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if self.n_added == 0:
            return frontier.where(F.lit(False))
        dirpath = self.path

        @F.pandas_udf(T.BooleanType())
        def flagged(key: pd.Series, shard: pd.Series) -> pd.Series:
            keys = key.to_numpy("int64")
            out = np.zeros(len(keys), dtype=bool)
            for s in shard.unique():
                b = _load_shard(dirpath, int(s))
                if b is None:  # shard never written -> nothing seen there
                    continue
                m = (shard == s).to_numpy()
                out[m] = b.might_contain(keys[m])
            return pd.Series(out)

        return frontier.where(flagged(F.col("key"), self._shard_expr()))

    def rebuild(self, keys_df, snapshot_id: int | None = None) -> int:
        """Drop and re-add from scratch (sidecar lost, legacy meta, or a
        capacity re-size). One distributed pass over the keys."""
        self.drop()
        return self.add_delta(keys_df, snapshot_id=snapshot_id)

    def drop(self) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        self.n_added = 0
        self.snapshot_id = None


# --- exact seen-key shards (the anti-join's scale path) ----------------------------

_KEYS_CACHE = _ShardLRU(_CACHE_BUDGET)  # (dirpath, shard) + run-list fp -> sorted int64 keys

# LSM knobs: a shard is a set of sorted-unique RUN files (one per absorbed
# round) unioned at probe time; when a shard accumulates this many runs the
# next absorb merges them into one. Bounds per-round write volume to
# O(delta) instead of O(shard) — at the 10^10-key design point a round
# writes ~0.8 GB of new runs instead of rewriting the full 80 GB key set,
# while probes still see one worker-cached sorted array per shard.
KEYS_COMPACT_RUNS = 8


def _run_gen(name: str) -> int:
    """Run-file generation: keys-SSSSS.rGGGGGG.npy -> G; legacy
    keys-SSSSS.npy (pre-LSM single-file shard) counts as generation 0."""
    base = name[:-4]  # strip .npy
    pos = base.rfind(".r")
    return int(base[pos + 2 :]) if pos >= 0 else 0


def _shard_run_files(dirpath: str, shard: int, prefix: str = "keys") -> list[str]:
    pre = f"{prefix}-{shard:05d}"
    try:
        names = os.listdir(dirpath)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.join(dirpath, n)
        for n in names
        if n.startswith(pre) and n.endswith(".npy")
    )


def _fold_key_runs(entries: list[tuple[int, str, np.ndarray]]) -> np.ndarray:
    """Resolve a shard's run sequence into one sorted-unique key array.
    ``entries`` are (generation, kind, sorted-unique array) with kind 'k'
    (add run) or 'd' (tombstone run); later generations win, so a key
    deleted at gen g and re-added at gen g' > g is a member. Runs within
    one kind commute, so the no-tombstone fast path is a plain union."""
    if all(kind == "k" for _g, kind, _a in entries):
        arrs = [a for _g, _k, a in entries]
        return arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
    cur = np.empty(0, dtype=np.int64)
    for _g, kind, arr in sorted(entries, key=lambda e: e[0]):
        if kind == "k":
            cur = np.union1d(cur, arr)
        else:
            cur = np.setdiff1d(cur, arr, assume_unique=True)
    return cur


def _shard_entries(dirpath: str, shard: int, prefix: str = "keys") -> list[tuple[int, str, str]]:
    """(generation, kind, path) for a shard's add + tombstone run files."""
    adds = _shard_run_files(dirpath, shard, prefix)
    dels = _shard_run_files(dirpath, shard, "dels" if prefix == "keys" else "vdel")
    return [(_run_gen(os.path.basename(p)), "k", p) for p in adds] + [
        (_run_gen(os.path.basename(p)), "d", p) for p in dels
    ]


def _load_keys_shard(dirpath: str, shard: int) -> np.ndarray:
    """The shard's run sequence folded into one sorted array (tombstones
    applied in generation order), worker-cached keyed by the run list's
    (name, mtime, size) fingerprint — reloaded only when an
    absorb/compaction changes the shard."""
    for _attempt in range(3):  # a concurrent compaction can unlink a run mid-read
        entries = _shard_entries(dirpath, shard)
        if not entries:
            return np.empty(0, dtype=np.int64)
        try:
            sig = tuple((p, os.stat(p).st_mtime_ns, os.stat(p).st_size) for _g, _k, p in entries)
            hit = _KEYS_CACHE.get((dirpath, shard), sig)
            if hit is None:
                hit = _fold_key_runs([(g, k, np.load(p)) for g, k, p in entries])
                _KEYS_CACHE.put((dirpath, shard), sig, hit, hit.nbytes)
            return hit
        except FileNotFoundError:
            continue
    raise OSError(f"shard {shard} runs kept disappearing under {dirpath}")


class SeenKeyShardStore:
    """EXACT seen-key membership as sorted int64 shard files — the
    exactly-once filter's scale path.

    Why it exists: the exact ``left_anti`` join against ``seen`` reshuffles
    the seen side's keys every round (~80 GB at the 10^10-key design
    point). This store keeps those keys as per-shard sorted arrays (same
    ``pmod(hash(key), S)`` routing as ``BloomShardStore``, so the probe
    runs inside the already-key-partitioned dedup stage, one shard file
    per task, ~80 MB/shard at S=1000) and answers membership by binary
    search — no shuffle of either side, no sort, worker-cached across
    rounds until the shard changes.

    Shard layout is LSM-shaped: an absorb appends a sorted-unique RUN file
    per touched shard (write volume O(round delta), not O(total keys) — a
    round at the design point writes ~0.8 GB of runs instead of rewriting
    the 80 GB key set); equality deletes (uncache) absorb as TOMBSTONE
    runs in the same generation sequence; and a shard that reaches
    KEYS_COMPACT_RUNS runs is folded back to one resolved run on its next
    absorb. Probes fold a shard's runs in generation order (adds union,
    tombstones subtract — so delete-then-re-append replays exactly) into
    one sorted array, cached per worker until the run list changes.

    Correctness discipline (this is TRUTH, unlike the fail-safe bloom): a
    shard must never be BEHIND the committed seen table when probed, or a
    seen URL would be refetched. ``sync()`` enforces it: shard meta records
    the last absorbed seen snapshot id; on round start any newer append /
    equality-delete snapshots are absorbed (incremental O(delta) deltas),
    and history the runs can't express (overwrite/compaction) triggers a
    full rebuild. The probe is refused (caller falls back to the
    anti-join) only if sync was skipped. Crash between seen commit and
    shard add is repaired by the same catch-up on next start — the
    snapshot id only advances AFTER the shards are written, and
    re-absorbing a snapshot sequence is idempotent (unions and ordered
    subtractions replay to the same fold)."""

    def __init__(self, path: str, n_shards: int = 64):
        self.path = path
        meta = self._read_meta()
        if meta is None:
            self.n_shards = n_shards
            self.snapshot_id: int | None = None
            self.n_keys = 0
        else:
            self.n_shards = int(meta["n_shards"])
            self.snapshot_id = meta["snapshot_id"]
            self.n_keys = int(meta["n_keys"])

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "meta.json")

    def _read_meta(self) -> dict | None:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _write_meta(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"n_shards": self.n_shards, "snapshot_id": self.snapshot_id, "n_keys": self.n_keys},
                f,
            )
        os.replace(tmp, self._meta_path)

    def _shard_expr(self):
        from pyspark.sql import functions as F

        return F.pmod(F.hash(F.col("key")), F.lit(self.n_shards))

    def _absorb(self, keys_df) -> int:
        """Distributed LSM absorb: each touched shard gains one sorted-unique
        RUN file holding just the delta (write volume O(delta), never a
        rewrite of the shard's existing keys); once a shard accumulates
        KEYS_COMPACT_RUNS runs the absorb merges them into a single run.
        Crash-safe without repair: runs are tmp+renamed, compaction renames
        the merged run BEFORE unlinking its inputs, and membership is the
        UNION of run files — a leftover stale run after a crash is a subset
        of the merged run and changes nothing. Returns delta key count."""
        from pyspark.sql import functions as F

        dirpath = self.path

        def upd(pdf):
            shard = int(pdf["_shard"].iloc[0])
            new = np.unique(pdf["key"].to_numpy("int64"))
            entries = _shard_entries(dirpath, shard)
            nxt = max((g for g, _k, _p in entries), default=0) + 1
            target = os.path.join(dirpath, f"keys-{shard:05d}.r{nxt:06d}.npy")
            tmp = os.path.join(dirpath, f"tmp-{shard}-{os.getpid()}.npy")
            compact = len(entries) + 1 > KEYS_COMPACT_RUNS
            if compact:  # merge all runs + delta, tombstones resolved
                out = _fold_key_runs(
                    [(g, k, np.load(p)) for g, k, p in entries] + [(nxt, "k", new)]
                )
            else:
                out = new
            np.save(tmp, out)
            os.replace(tmp, target)
            if compact:  # drop absorbed inputs (rename-first)
                for _g, _k, p in entries:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
            return pd.DataFrame({"shard": [shard], "n_keys": [len(new)]})

        os.makedirs(dirpath, exist_ok=True)
        counts = (
            keys_df.select("key")
            .withColumn("_shard", self._shard_expr())
            .groupBy("_shard")
            .applyInPandas(upd, "shard int, n_keys long")
            .agg(F.sum("n_keys").alias("n"))
            .collect()
        )
        return int(counts[0].n or 0)

    def _absorb_deletes(self, keys_df) -> int:
        """Absorb an equality-delete snapshot as TOMBSTONE runs — O(delta),
        vs the full O(seen) rebuild that row-level deletes used to force.
        Each touched shard gains one sorted-unique `dels-` run in the same
        generation sequence as the add runs; the fold (probe time /
        compaction) applies runs in generation order, so a key re-added
        after the delete is seen again. Crossing KEYS_COMPACT_RUNS folds
        everything into one resolved add run (rename-before-unlink, same
        crash model: a stale lower-generation leftover is re-subsumed)."""
        from pyspark.sql import functions as F

        dirpath = self.path

        def upd(pdf):
            shard = int(pdf["_shard"].iloc[0])
            dead = np.unique(pdf["key"].to_numpy("int64"))
            entries = _shard_entries(dirpath, shard)
            nxt = max((g for g, _k, _p in entries), default=0) + 1
            tmp = os.path.join(dirpath, f"tmp-{shard}-{os.getpid()}.npy")
            if len(entries) + 1 > KEYS_COMPACT_RUNS:  # fold to one resolved run
                out = _fold_key_runs(
                    [(g, k, np.load(p)) for g, k, p in entries] + [(nxt, "d", dead)]
                )
                target = os.path.join(dirpath, f"keys-{shard:05d}.r{nxt:06d}.npy")
                np.save(tmp, out)
                os.replace(tmp, target)
                for _g, _k, p in entries:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
            else:
                target = os.path.join(dirpath, f"dels-{shard:05d}.r{nxt:06d}.npy")
                np.save(tmp, dead)
                os.replace(tmp, target)
            return pd.DataFrame({"shard": [shard], "n_keys": [len(dead)]})

        os.makedirs(dirpath, exist_ok=True)
        counts = (
            keys_df.select("key")
            .withColumn("_shard", self._shard_expr())
            .groupBy("_shard")
            .applyInPandas(upd, "shard int, n_keys long")
            .agg(F.sum("n_keys").alias("n"))
            .collect()
        )
        return int(counts[0].n or 0)

    def sync(self, seen_t) -> None:
        """Bring shards up to the seen table's current snapshot: absorb
        newer append deltas incrementally and equality-delete snapshots as
        tombstone runs (both O(delta)); rebuild only on history the runs
        can't express incrementally (overwrite/compaction rewrites the
        table). Appends and edeletes are absorbed in snapshot order so the
        run-generation sequence reproduces the table's delete-then-re-add
        semantics. A rollback (or a branch built on an older snapshot) is
        never incremental — the shards would keep keys the table no longer
        holds and reject_seen would silently drop live frontier URLs, a
        violation of exactly-once — so lineage is walked via the
        manifest's parent pointers (``_delta_chain``); any history not
        reaching the recorded snapshot takes the full-rebuild branch."""
        cur = seen_t.current_snapshot()
        if cur is None or cur == self.snapshot_id:
            return
        newer = (
            _delta_chain(seen_t, self.snapshot_id, cur)
            if self.snapshot_id is not None
            else None
        )
        incremental = newer is not None and all(
            s["op"] in ("append", "edelete") for s in newer
        )
        if incremental:
            for s in newer:
                if s["op"] == "append":
                    self._absorb(seen_t.read_delta(s["id"]).select("key"))
                else:
                    self._absorb_deletes(seen_t.read_delete_delta(s["id"]).select("key"))
        else:
            import shutil

            shutil.rmtree(self.path, ignore_errors=True)
            self._absorb(seen_t.read().select("key"))
        # count once from shard metas? cheap: track approximately via absorb
        self.snapshot_id = cur
        self.n_keys = -1  # unknown aggregate; per-shard files are the truth
        self._write_meta()

    def in_sync_with(self, seen_t) -> bool:
        return seen_t.current_snapshot() == self.snapshot_id

    def probe_local(self, key: int) -> bool | None:
        """Driver-side membership probe — NO Spark job: route the key to
        its shard with the pure-Python hash twin (functions/localhash.py,
        JVM-parity test-pinned) and binary-search the shard's folded runs.
        Returns None when the store is cold (never synced) — the caller
        falls back to the Spark path. Caller is responsible for
        ``in_sync_with``; a stale warm store answers for its recorded
        snapshot (interactive probes tolerate that; the crawl loop never
        uses this path)."""
        if self.snapshot_id is None:
            return None
        from ..functions.localhash import shard_of_key

        arr = _load_keys_shard(self.path, shard_of_key(key, self.n_shards))
        if len(arr) == 0:
            return False
        i = int(np.searchsorted(arr, key))
        return i < len(arr) and int(arr[i]) == key

    def reject_seen(self, frontier, bloom: "BloomShardStore | None" = None):
        """EXACT filter: drop frontier rows whose key is in the seen set.
        Equivalent to ``left_anti`` vs seen keys, with zero shuffle — a
        per-task binary search against the task's shard file. Caller must
        have sync()ed this round.

        ``bloom``: optional fused short-circuit. Rows whose key the bloom
        cannot contain skip the sorted-run search (the steady-state
        majority: new URLs); maybe-seen rows fall through to the exact
        search, so a bloom false positive costs one binary search — never a
        dropped row. The caller must pass a bloom that is in_sync_with the
        SAME seen snapshot as this store (else pass None): "definitely new"
        is only trustworthy when the bloom holds every seen key. Both
        stores must share the shard routing (asserted)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if self.snapshot_id is None:
            return frontier
        if bloom is not None and (bloom.n_added == 0 or bloom.snapshot_id != self.snapshot_id):
            bloom = None  # empty or differently-synced bloom: exact-only
        if bloom is not None and bloom.n_shards != self.n_shards:
            # shard-routing mismatch (e.g. one sidecar deleted and rebuilt
            # under a different bloom_shards setting): the bloom's shard
            # files don't correspond to this store's routing, so its
            # "definitely new" answers are untrustworthy — degrade to
            # exact-only, same discipline as the out-of-sync branch above.
            # Raising here would put the crawl in a permanent per-round
            # crash loop that only manual sidecar deletion could clear.
            bloom = None
        dirpath = self.path
        bloom_dir = bloom.path if bloom is not None else None

        @F.pandas_udf(T.BooleanType())
        def is_new(key: pd.Series, shard: pd.Series) -> pd.Series:
            keys = key.to_numpy("int64")
            out = np.ones(len(keys), dtype=bool)
            for s in shard.unique():
                m = (shard == s).to_numpy()
                ks = keys[m]
                need = np.ones(len(ks), dtype=bool)  # rows needing exact search
                if bloom_dir is not None:
                    b = _load_shard(bloom_dir, int(s))
                    # missing bloom shard = no information (lost file is
                    # indistinguishable from never-written): search all rows
                    if b is not None:
                        need = b.might_contain(ks)
                if not need.any():
                    continue  # whole batch definitely new for this shard
                arr = _load_keys_shard(dirpath, int(s))
                if len(arr) == 0:
                    continue
                sub = ks[need]
                idx = np.minimum(np.searchsorted(arr, sub), len(arr) - 1)
                res = np.ones(len(ks), dtype=bool)
                res[need] = ~(arr[idx] == sub)
                out[m] = res
            return pd.Series(out)

        return frontier.where(is_new(F.col("key"), self._shard_expr()))


# --- valued seen shards (semantic modes: TTL expiry / force_errors) ----------------

_VALS_CACHE = _ShardLRU(_CACHE_BUDGET)  # (dirpath, shard) + run fp -> (keys, fa_ok, fa_err)

_NEG_INF = float("-inf")


def _shard_val_files(dirpath: str, shard: int) -> list[str]:
    prefix = f"vals-{shard:05d}"
    try:
        names = os.listdir(dirpath)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.join(dirpath, n)
        for n in names
        if n.startswith(prefix) and n.endswith(".npz")
    )


def _merge_val_runs(arrs: list[tuple]) -> tuple:
    """Union runs into (sorted unique keys, per-key class maxima)."""
    keys = np.concatenate([a[0] for a in arrs])
    fa_ok = np.concatenate([a[1] for a in arrs])
    fa_err = np.concatenate([a[2] for a in arrs])
    uk, inv = np.unique(keys, return_inverse=True)
    mok = np.full(len(uk), _NEG_INF)
    merr = np.full(len(uk), _NEG_INF)
    np.maximum.at(mok, inv, fa_ok)
    np.maximum.at(merr, inv, fa_err)
    return uk, mok, merr


def _val_entries(dirpath: str, shard: int) -> list[tuple[int, str, str]]:
    """(generation, kind, path) for a shard's value runs ('k') and
    tombstone runs ('d', plain .npy key arrays under the vdel- prefix)."""
    adds = _shard_val_files(dirpath, shard)
    dels = _shard_run_files(dirpath, shard, "vdel")
    # _run_gen strips a 4-char extension: works for .npz and .npy alike
    return [(_run_gen(os.path.basename(p)), "k", p) for p in adds] + [
        (_run_gen(os.path.basename(p)), "d", p) for p in dels
    ]


def _fold_val_runs(entries: list[tuple[int, str, object]]) -> tuple:
    """Resolve value runs + tombstones in generation order: add runs merge
    per-key class maxima; a tombstone removes its keys (with all their
    statistics — a later re-add starts fresh, matching the table's
    delete-then-re-append semantics). No-tombstone fast path is the
    order-free class-max merge."""
    if all(kind == "k" for _g, kind, _a in entries):
        arrs = [a for _g, _k, a in entries]
        return arrs[0] if len(arrs) == 1 else _merge_val_runs(arrs)
    e = np.empty(0)
    cur = (e.astype(np.int64), e.astype(np.float64), e.astype(np.float64))
    for _g, kind, payload in sorted(entries, key=lambda t: t[0]):
        if kind == "k":
            cur = _merge_val_runs([cur, payload]) if len(cur[0]) else payload
        else:
            keep = ~np.isin(cur[0], payload, assume_unique=True)
            cur = (cur[0][keep], cur[1][keep], cur[2][keep])
    return cur


def _load_vals_shard(dirpath: str, shard: int) -> tuple:
    for _attempt in range(3):
        entries = _val_entries(dirpath, shard)
        if not entries:
            e = np.empty(0)
            return e.astype(np.int64), e, e
        try:
            sig = tuple((p, os.stat(p).st_mtime_ns, os.stat(p).st_size) for _g, _k, p in entries)
            hit = _VALS_CACHE.get((dirpath, shard), sig)
            if hit is None:
                loaded = []
                for g, k, p in entries:
                    if k == "k":
                        z = np.load(p)
                        loaded.append((g, k, (z["keys"], z["fa_ok"], z["fa_err"])))
                    else:
                        loaded.append((g, k, np.load(p)))
                hit = _fold_val_runs(loaded)
                _VALS_CACHE.put((dirpath, shard), sig, hit, sum(a.nbytes for a in hit))
            return hit
        except FileNotFoundError:
            continue
    raise OSError(f"value shard {shard} runs kept disappearing under {dirpath}")


class SeenValueShardStore(SeenKeyShardStore):
    """Seen-key shards carrying the per-key sufficient statistics for the
    SEMANTIC exactly-once modes — TTL expiry and force_errors — so the
    recrawl loop (the realistic continuous mode at scale: ``expires`` set,
    every round re-examines the whole corpus) is as shuffle-free as the
    plain path.

    Per key two values: ``fa_ok`` = max fetched_at over non-error seen
    entries (status 100..399, matching ``anti_join_seen``'s live filter;
    the transport's -1 stamp is error-class) and
    ``fa_err`` = max over error entries; either is -inf when that class has
    no entry. These are sufficient for every predicate combination
    ``anti_join_seen`` evaluates, because its live-entry condition is a
    conjunction of a status-class test and a freshness test and seen
    entries only accumulate:

    - plain:            blocked iff any entry          (fa_ok or fa_err > -inf)
    - expires:          blocked iff max(fa_ok, fa_err) >= now - expires
    - force_errors:     blocked iff fa_ok > -inf
    - both:             blocked iff fa_ok >= now - expires

    Same LSM layout/discipline as the key store (O(delta) runs with
    class-max merge on compaction, rename-before-unlink, snapshot-gated
    sync); runs are 24 B/key npz files (240 MB/shard at S=1000 and 10^10
    keys — still one worker-cached array set per task)."""

    def probe_local(self, key: int) -> bool | None:
        """Driver-side membership probe against the vals- run files (the
        inherited implementation reads keys- files, which this store does
        not write)."""
        if self.snapshot_id is None:
            return None
        from ..functions.localhash import shard_of_key

        keys, _fa_ok, _fa_err = _load_vals_shard(
            self.path, shard_of_key(key, self.n_shards)
        )
        if len(keys) == 0:
            return False
        i = int(np.searchsorted(keys, key))
        return i < len(keys) and int(keys[i]) == key

    def _absorb(self, keys_df) -> int:
        from pyspark.sql import functions as F

        dirpath = self.path

        def upd(pdf):
            shard = int(pdf["_shard"].iloc[0])
            keys = pdf["key"].to_numpy("int64")
            # null status: anti_join_seen's `status < 400` is NULL -> the
            # entry never counts as ok-class but still blocks plainly —
            # i.e. exactly the error-class treatment, so map null -> 600.
            # null fetched_at: NULL freshness comparisons drop the entry
            # from every TTL-filtered live set while it still blocks the
            # plain probe — a finite -1e308 reproduces both.
            status = pdf["status"].fillna(600).to_numpy("int64")
            fa = pdf["fetched_at"].fillna(-1e308).to_numpy("float64")
            # ok-class = 100..399, matching anti_join_seen's live filter:
            # status < 100 is the transport's -1 stamp (DNS/timeout/TLS,
            # redirect-limit) — error-class, so force_errors retries it
            ok = (status >= 100) & (status < 400)
            uk, inv = np.unique(keys, return_inverse=True)
            mok = np.full(len(uk), _NEG_INF)
            merr = np.full(len(uk), _NEG_INF)
            np.maximum.at(mok, inv[ok], fa[ok])
            np.maximum.at(merr, inv[~ok], fa[~ok])
            new = (uk, mok, merr)
            entries = _val_entries(dirpath, shard)
            nxt = max((g for g, _k, _p in entries), default=0) + 1
            target = os.path.join(dirpath, f"vals-{shard:05d}.r{nxt:06d}.npz")
            tmp = os.path.join(dirpath, f"tmp-{shard}-{os.getpid()}.npz")
            compact = len(entries) + 1 > KEYS_COMPACT_RUNS
            if compact:  # fold all runs + delta, tombstones resolved
                loaded = []
                for g, k, p in entries:
                    if k == "k":
                        z = np.load(p)
                        loaded.append((g, k, (z["keys"], z["fa_ok"], z["fa_err"])))
                    else:
                        loaded.append((g, k, np.load(p)))
                out = _fold_val_runs(loaded + [(nxt, "k", new)])
            else:
                out = new
            with open(tmp, "wb") as fh:
                np.savez(fh, keys=out[0], fa_ok=out[1], fa_err=out[2])
            os.replace(tmp, target)
            if compact:
                for _g, _k, p in entries:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
            return pd.DataFrame({"shard": [shard], "n_keys": [len(uk)]})

        os.makedirs(dirpath, exist_ok=True)
        counts = (
            keys_df.select("key", "status", "fetched_at")
            .withColumn("_shard", self._shard_expr())
            .groupBy("_shard")
            .applyInPandas(upd, "shard int, n_keys long")
            .agg(F.sum("n_keys").alias("n"))
            .collect()
        )
        return int(counts[0].n or 0)

    def _absorb_deletes(self, keys_df) -> int:
        """Equality-delete tombstones, same discipline as the key store's:
        one `vdel-` run per touched shard in the shared generation
        sequence. A tombstone wipes the key's statistics entirely — the
        table forgot the entry, so the store must too (a later re-append
        rebuilds stats from its own run)."""
        from pyspark.sql import functions as F

        dirpath = self.path

        def upd(pdf):
            shard = int(pdf["_shard"].iloc[0])
            dead = np.unique(pdf["key"].to_numpy("int64"))
            entries = _val_entries(dirpath, shard)
            nxt = max((g for g, _k, _p in entries), default=0) + 1
            if len(entries) + 1 > KEYS_COMPACT_RUNS:  # fold to one resolved run
                loaded = []
                for g, k, p in entries:
                    if k == "k":
                        z = np.load(p)
                        loaded.append((g, k, (z["keys"], z["fa_ok"], z["fa_err"])))
                    else:
                        loaded.append((g, k, np.load(p)))
                out = _fold_val_runs(loaded + [(nxt, "d", dead)])
                target = os.path.join(dirpath, f"vals-{shard:05d}.r{nxt:06d}.npz")
                tmpz = os.path.join(dirpath, f"tmp-{shard}-{os.getpid()}.npz")
                with open(tmpz, "wb") as fh:
                    np.savez(fh, keys=out[0], fa_ok=out[1], fa_err=out[2])
                os.replace(tmpz, target)
                for _g, _k, p in entries:
                    try:
                        os.unlink(p)
                    except FileNotFoundError:
                        pass
            else:
                target = os.path.join(dirpath, f"vdel-{shard:05d}.r{nxt:06d}.npy")
                tmp = os.path.join(dirpath, f"tmp-{shard}-{os.getpid()}.npy")
                np.save(tmp, dead)
                os.replace(tmp, target)
            return pd.DataFrame({"shard": [shard], "n_keys": [len(dead)]})

        os.makedirs(dirpath, exist_ok=True)
        counts = (
            keys_df.select("key")
            .withColumn("_shard", self._shard_expr())
            .groupBy("_shard")
            .applyInPandas(upd, "shard int, n_keys long")
            .agg(F.sum("n_keys").alias("n"))
            .collect()
        )
        return int(counts[0].n or 0)

    def sync(self, seen_t) -> None:
        """Same snapshot discipline as the key store (appends + equality
        deletes absorb O(delta), in snapshot order; other history —
        including rollback/divergent lineage, detected via
        ``_delta_chain`` parent walking — rebuilds), but append deltas
        carry (key, status, fetched_at)."""
        cur = seen_t.current_snapshot()
        if cur is None or cur == self.snapshot_id:
            return
        newer = (
            _delta_chain(seen_t, self.snapshot_id, cur)
            if self.snapshot_id is not None
            else None
        )
        incremental = newer is not None and all(
            s["op"] in ("append", "edelete") for s in newer
        )
        cols = ["key", "status", "fetched_at"]
        if incremental:
            for s in newer:
                if s["op"] == "append":
                    self._absorb(seen_t.read_delta(s["id"]).select(*cols))
                else:
                    self._absorb_deletes(seen_t.read_delete_delta(s["id"]).select("key"))
        else:
            import shutil

            shutil.rmtree(self.path, ignore_errors=True)
            self._absorb(seen_t.read().select(*cols))
        self.snapshot_id = cur
        self.n_keys = -1
        self._write_meta()

    def reject_seen(
        self,
        frontier,
        expires: float | None = None,
        force_errors: bool = False,
        now: float | None = None,
    ):
        """EXACT semantic filter, shard-local: equivalent to
        ``anti_join_seen(frontier, seen, expires=..., force_errors=...)``
        with zero shuffle of the seen side. Caller must have sync()ed."""
        import time as _time

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if self.snapshot_id is None:
            return frontier
        dirpath = self.path
        cutoff = None
        if expires is not None:
            cutoff = (_time.time() if now is None else now) - expires

        @F.pandas_udf(T.BooleanType())
        def is_fetchable(key: pd.Series, shard: pd.Series) -> pd.Series:
            keys = key.to_numpy("int64")
            out = np.ones(len(keys), dtype=bool)
            for s in shard.unique():
                uk, mok, merr = _load_vals_shard(dirpath, int(s))
                m = (shard == s).to_numpy()
                if len(uk) == 0:
                    continue
                ks = keys[m]
                idx = np.minimum(np.searchsorted(uk, ks), len(uk) - 1)
                found = uk[idx] == ks
                fa_ok = np.where(found, mok[idx], _NEG_INF)
                fa_err = np.where(found, merr[idx], _NEG_INF)
                live = fa_ok if force_errors else np.maximum(fa_ok, fa_err)
                blocked = live >= cutoff if cutoff is not None else live > _NEG_INF
                out[m] = ~blocked
            return pd.Series(out)

        return frontier.where(is_fetchable(F.col("key"), self._shard_expr()))
