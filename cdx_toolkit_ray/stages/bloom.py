"""Distributed Bloom filter: tree-OR build, broadcast membership gate.

The exact decontamination index (stages/decontam.py) collects the test
set's distinct gram hashes to the driver — correct while the test side
is benchmark-sized. This module is the scale path for negative lookups
whose "small side" outgrows a sorted array but still fits a fixed bit
budget: a Bloom filter built DISTRIBUTED (per-block partial bitmaps,
OR-folded by a binary tree of Ray tasks, the driver holding only
object refs) and broadcast once (``ray.put`` semantics via the final
task output ref — one plasma read per worker, zero-copy numpy view).

Guarantees: no false negatives ever (a Bloom filter cannot un-set a
bit), so a bloom-gated decontamination pass keeps a SUPERSET of the
exact pass's flagged documents — safe for hygiene (over-flagging errs
clean). The false-positive rate for m bits, k hashes, n keys is the
textbook (1 - e^{-kn/m})^k; ``bloom_fp_rate`` computes it so callers
can size ``num_bits``.

Hashing: keys are the engine's 64-bit FNV/splitmix values; bit
positions use Kirsch-Mitzenbauer double hashing (pos_i = h1 + i*h2
mod m) off two independent splitmix64 finalizations — vectorized, no
per-key Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _mix64

_H2_SALT = np.uint64(0xA24BAED4963EE407)


def _positions(keys: np.ndarray, num_bits: int,
               num_hashes: int) -> np.ndarray:
    """(len(keys), num_hashes) bit positions, vectorized."""
    h1 = _mix64(keys.astype(np.uint64))
    h2 = _mix64(keys.astype(np.uint64) ^ _H2_SALT) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits))


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(words, (flat >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (flat & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL of a row's positions are set."""
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (w >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


@ray.remote
def _partial_bloom(hash_col: str, num_bits: int, num_hashes: int, *tbls):
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    for t in tbls:
        # sparse upstream filters emit schema-less zero-row blocks
        if not t.num_rows or hash_col not in t.column_names:
            continue
        keys = t[hash_col].to_numpy(zero_copy_only=False)
        _set_bits(words, _positions(keys, num_bits, num_hashes))
    return words


@ray.remote
def _or_fold(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_fp_rate(num_bits: int, num_hashes: int, n_keys: int) -> float:
    """Expected false-positive probability for the given sizing."""
    if n_keys == 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes


def build_bloom(ds: ray.data.Dataset, hash_col: str, *,
                num_bits: int = 1 << 24, num_hashes: int = 4):
    """Bloom filter over a uint64 hash column -> object ref of the
    packed uint64 bitmap.

    Per-block partial bitmaps are built where the blocks live and
    OR-folded pairwise (tree depth log2(blocks)); the driver touches
    only refs. ``num_bits`` must be a multiple of 64.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    refs = ds.materialize().to_arrow_refs()
    if not refs:
        return ray.put(np.zeros(num_bits // 64, dtype=np.uint64))
    # a few blocks per partial task: bitmap traffic (num_bits/8 bytes
    # per partial) dominates at high fan-in, so cap the partial count
    chunk = max(1, (len(refs) + 31) // 32)
    parts = [_partial_bloom.remote(hash_col, num_bits, num_hashes,
                                   *refs[i:i + chunk])
             for i in range(0, len(refs), chunk)]
    while len(parts) > 1:
        nxt = [_or_fold.remote(parts[i], parts[i + 1])
               for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def make_bloom_member_stage(bloom_ref, num_bits: int, num_hashes: int,
                            hash_col: str, out_col: str = "maybe_member"):
    """map_batches fn: append bool ``out_col`` — True iff the row's
    hash MAY be in the built set (false positives possible at the
    sized rate, false negatives never)."""

    def member(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        words = _get_broadcast(bloom_ref)
        keys = batch[hash_col].to_numpy(zero_copy_only=False)
        if len(keys):
            hit = _test_bits(words,
                             _positions(keys, num_bits, num_hashes))
        else:
            hit = np.zeros(0, bool)
        return batch.append_column(out_col, pa.array(hit))

    return member


def bloom_decontaminate(train_ds: ray.data.Dataset,
                        test_ds: ray.data.Dataset, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 5, min_hits: int = 1,
                        num_bits: int = 1 << 24,
                        num_hashes: int = 4) -> ray.data.Dataset:
    """Bloom-gated decontamination: same contract as
    ``decontam.decontaminate`` (appends ``n_grams``, ``n_hits``,
    ``contaminated``) but the test-set index is a fixed-size bitmap
    built distributed — the path for test sides too large to collect
    as a sorted array. ``n_hits`` here counts BLOOM hits, an upper
    bound on the exact count: ``contaminated`` is a superset of the
    exact pass's flags (never misses real contamination).
    """
    from .dedup import doc_gram_hashes

    def test_grams(batch: pa.Table) -> pa.Table:
        _, h = doc_gram_hashes(batch[text_col], shingle_k)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    grams = test_ds.select_columns([text_col]).map_batches(
        test_grams, batch_format="pyarrow", batch_size=None)
    bloom_ref = build_bloom(grams, "h", num_bits=num_bits,
                            num_hashes=num_hashes)

    def score(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        words = _get_broadcast(bloom_ref)
        didx, h = doc_gram_hashes(batch[text_col], shingle_k)
        n = batch.num_rows
        n_grams = np.zeros(n, np.int64)
        n_hits = np.zeros(n, np.int64)
        if len(h):
            np.add.at(n_grams, didx, 1)
            hits = _test_bits(words, _positions(h, num_bits, num_hashes))
            np.add.at(n_hits, didx, hits.astype(np.int64))
        batch = batch.append_column("n_grams", pa.array(n_grams))
        batch = batch.append_column("n_hits", pa.array(n_hits))
        return batch.append_column(
            "contaminated",
            pa.array((n_hits >= min_hits).astype(np.int64)))

    return train_ds.map_batches(score, batch_format="pyarrow",
                                batch_size=None)
