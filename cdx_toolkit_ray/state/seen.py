"""Sharded URL-seen set: bloom-filter actor pool keyed by hash range.

north_rule component: "a sharded cuckoo/bloom URL-seen set lives in an
actor pool keyed by hash-range partitions". The reference's only seen
state is a per-process hostname set (cocrawler/cdx_toolkit
cdx_toolkit/myrequests.py:10-20) plus the urlkey/digest dedup
identities it documents (README.md:207-212, 233-235); at frontier scale
that becomes cluster state:

* shard routing: top bits of ``hash64(urlkey)`` -> one of 2^b actors,
  so each shard owns a contiguous hash range and checkpoints
  independently
* each shard holds a numpy-bitarray bloom filter (k probes via
  double hashing) and — optionally, for exact small-scale verification
  — the exact backing set of hashes
* batched vectorized calls: a map_batches stage partitions each Arrow
  batch's hashes by shard and issues ONE actor call per shard per
  batch (no per-row RPCs)

Determinism note: concurrent ``offer`` arrival order is
nondeterministic, so the STREAMING seen-set is used for cross-run /
incremental membership. The frontier pipeline's dedup-for-scheduling is
the exact ``groupby(hash64).map_groups(first)`` in
``pipelines/frontier.py``, whose winner rule (min (priority,
seed_order)) is arrival-order independent; the bloom path is verified
against it for zero false negatives.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

# odd multiplier for the second probe hash (splitmix64 finalizer constant)
_H2_MULT = np.uint64(0xBF58476D1CE4E5B9)


class BloomFilter:
    """Vectorized bloom filter over uint64 keys (plain object, used
    inside shard actors and unit tests)."""

    def __init__(self, n_bits: int = 1 << 24, k: int = 7, exact: bool = False):
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.k = k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)
        self.n_added = 0
        self.exact = set() if exact else None

    def _probes(self, hashes: np.ndarray) -> np.ndarray:
        """(k, n) bit indices via double hashing.

        h2 must depend on the HIGH bits of the key: with m a power of
        two, ``h*C mod m`` preserves low-bit-only dependence, which
        would collapse the probe entropy to log2(m) bits (observed as
        birthday-paradox false positives). Xor-shift folds the high
        bits down first (splitmix64-style finalizer).
        """
        h1 = hashes.astype(np.uint64)
        x = h1.copy()
        x ^= x >> np.uint64(33)
        x *= _H2_MULT
        x ^= x >> np.uint64(29)
        h2 = x | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) & np.uint64(self.n_bits - 1)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._probes(hashes)
        word = idx >> np.uint64(6)
        bit = np.uint64(1) << (idx & np.uint64(63))
        hit = (self.words[word] & bit) != 0
        return hit.all(axis=0)

    def add(self, hashes: np.ndarray) -> None:
        idx = self._probes(hashes)
        word = (idx >> np.uint64(6)).ravel()
        bit = (np.uint64(1) << (idx & np.uint64(63))).ravel()
        np.bitwise_or.at(self.words, word, bit)
        self.n_added += len(hashes)
        if self.exact is not None:
            self.exact.update(int(h) for h in hashes)

    def offer(self, hashes: np.ndarray) -> np.ndarray:
        """Insert all; return mask of hashes NOT seen before this call.

        Within one call, duplicate hashes after their first occurrence
        report as seen (first-occurrence-wins), matching serial
        semantics for a single ordered batch.
        """
        seen_before = self.contains(hashes)
        # first-occurrence-wins within the batch
        _, first_idx = np.unique(hashes, return_index=True)
        is_first = np.zeros(len(hashes), dtype=bool)
        is_first[first_idx] = True
        new = (~seen_before) & is_first
        if new.any():
            self.add(hashes[new])
        return new


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One hash-range shard of the URL-seen set."""

    def __init__(self, n_bits: int, k: int, exact: bool):
        self.bloom = BloomFilter(n_bits=n_bits, k=k, exact=exact)

    def offer(self, hashes: np.ndarray) -> np.ndarray:
        return self.bloom.offer(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.bloom.contains(hashes)

    def stats(self) -> dict:
        return {"n_added": self.bloom.n_added,
                "fill": float(np.count_nonzero(
                    np.unpackbits(self.bloom.words.view(np.uint8)))) / self.bloom.n_bits}

    def checkpoint(self, path: str) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, self.bloom.words)
        if self.bloom.exact is not None:
            np.save(path + ".exact.npy",
                    np.fromiter(self.bloom.exact, dtype=np.uint64))
        return path

    def restore(self, path: str) -> int:
        self.bloom.words = np.load(path if path.endswith(".npy") else path + ".npy")
        exact_p = (path if not path.endswith(".npy") else path[:-4]) + ".exact.npy"
        if os.path.exists(exact_p):
            self.bloom.exact = set(int(h) for h in np.load(exact_p))
        return int(self.bloom.words.sum())


class ShardedSeenSet:
    """Driver-side handle to the shard actor pool.

    ``num_shards`` must be a power of two; routing uses the TOP bits of
    hash64 so each shard owns a contiguous hash range (hash-range
    partitioning, checkpointable per shard).
    """

    def __init__(self, num_shards: int = 8, n_bits: int = 1 << 22,
                 k: int = 7, exact: bool = False):
        if num_shards & (num_shards - 1):
            raise ValueError("num_shards must be a power of two")
        self.num_shards = num_shards
        self.shift = np.uint64(64 - int(np.log2(num_shards)))
        self.shards = [SeenShard.remote(n_bits, k, exact)
                       for _ in range(num_shards)]

    def shard_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) >> self.shift).astype(np.int64)

    def offer(self, hashes: np.ndarray) -> np.ndarray:
        """Batched routed offer; returns is-new mask aligned to input."""
        sid = self.shard_of(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        futures, slots = [], []
        for s in np.unique(sid):
            m = sid == s
            futures.append(self.shards[int(s)].offer.remote(hashes[m]))
            slots.append(m)
        for m, r in zip(slots, ray.get(futures)):
            out[m] = r
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        sid = self.shard_of(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        futures, slots = [], []
        for s in np.unique(sid):
            m = sid == s
            futures.append(self.shards[int(s)].contains.remote(hashes[m]))
            slots.append(m)
        for m, r in zip(slots, ray.get(futures)):
            out[m] = r
        return out

    def checkpoint(self, directory: str) -> list[str]:
        return ray.get([sh.checkpoint.remote(
            os.path.join(directory, "seen-shard-%04d.npy" % i))
            for i, sh in enumerate(self.shards)])

    def restore(self, directory: str) -> None:
        ray.get([sh.restore.remote(
            os.path.join(directory, "seen-shard-%04d.npy" % i))
            for i, sh in enumerate(self.shards)])

    def stats(self) -> list[dict]:
        return ray.get([sh.stats.remote() for sh in self.shards])


class SeenFilterStage:
    """map_batches callable: drop rows whose hash64 was already seen.

    Holds the shard handles; one routed actor round-trip per batch.
    Use for INCREMENTAL runs (membership vs prior crawls); in-run
    scheduling dedup is the exact groupby in the frontier pipeline.
    """

    def __init__(self, seen: ShardedSeenSet, hash_col: str = "hash64"):
        self.seen = seen
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = batch[self.hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = self.seen.offer(hashes)
        return batch.filter(pa.array(keep))


def merge_checkpoints(dir_a: str, dir_b: str, out_dir: str) -> int:
    """Union two seen-set checkpoints into a third — the incremental
    crawl story for membership state (the bloom twin of the HLL
    register merge, stages/sketch.hll_registers): bitwise OR of each
    shard's bitmap (Bloom union is exact: OR of the filters equals the
    filter of the union) plus the union of the exact backing sets
    where present. Pure file-level numpy; no actors needed. Shard
    layouts must match (same count, same n_bits). Returns the number
    of shards merged.
    """
    import glob as _glob

    a_paths = sorted(_glob.glob(os.path.join(dir_a, "seen-shard-*.npy")))
    a_paths = [p for p in a_paths if not p.endswith(".exact.npy")]
    b_paths = sorted(_glob.glob(os.path.join(dir_b, "seen-shard-*.npy")))
    b_paths = [p for p in b_paths if not p.endswith(".exact.npy")]
    if len(a_paths) != len(b_paths) or not a_paths:
        raise ValueError("shard count mismatch: %d vs %d"
                         % (len(a_paths), len(b_paths)))
    os.makedirs(out_dir, exist_ok=True)
    for pa_, pb in zip(a_paths, b_paths):
        wa, wb = np.load(pa_), np.load(pb)
        if wa.shape != wb.shape:
            raise ValueError("bitmap shape mismatch in %s" % pa_)
        out = os.path.join(out_dir, os.path.basename(pa_))
        np.save(out[:-4], wa | wb)
        ea, eb = pa_[:-4] + ".exact.npy", pb[:-4] + ".exact.npy"
        if os.path.exists(ea) or os.path.exists(eb):
            xs = []
            for e in (ea, eb):
                if os.path.exists(e):
                    xs.append(np.load(e))
            merged = np.unique(np.concatenate(xs)) if xs else \
                np.zeros(0, np.uint64)
            np.save(out[:-4] + ".exact", merged.astype(np.uint64))
    return len(a_paths)
