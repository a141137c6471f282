"""Cuckoo-filter seen-set: membership, deletion, order independence,
shard routing, checkpointing. The cuckoo backend is the north_rule's
deletable seen-state variant (recrawl eviction); the bloom twin is
covered in tests/test_seen.py / test_bloom.py."""

import numpy as np
import pytest

from cdx_toolkit_ray.state.seen import CuckooFilter


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**63, n, dtype=np.uint64))


def test_add_contains_no_false_negatives():
    ks = _keys(150_000, 1)
    cf = CuckooFilter(n_buckets=1 << 16)
    cf.add(ks)
    assert cf.contains(ks).all()
    assert cf.load_factor() > 0.5


def test_fp_rate_bounded():
    ks = _keys(150_000, 2)
    cf = CuckooFilter(n_buckets=1 << 16)
    cf.add(ks)
    probe = np.setdiff1d(_keys(150_000, 3), ks)
    # 32-bit fingerprints: expected FPs ~ n * 8 / 2^32 << 1
    assert cf.contains(probe).sum() <= 2


def test_delete_flips_membership_exactly():
    ks = _keys(40_000, 4)
    cf = CuckooFilter(n_buckets=1 << 14)
    cf.add(ks)
    gone, kept = ks[::2], ks[1::2]
    removed = cf.delete(gone)
    assert removed.all()
    assert cf.contains(kept).all()
    assert cf.contains(gone).sum() <= 2  # fp-collision allowance
    # double delete finds nothing
    assert not cf.delete(gone[:100]).any() or \
        cf.delete(gone[:100]).sum() <= 2


def test_delete_duplicate_requests_in_one_call():
    cf = CuckooFilter(n_buckets=1 << 8)
    h = np.array([42], dtype=np.uint64)
    cf.add(h)  # one stored copy
    req = np.array([42, 42, 42], dtype=np.uint64)
    removed = cf.delete(req)
    assert removed.sum() == 1  # only one copy existed
    assert not cf.contains(h)[0]


def test_multiset_add_then_counted_deletes():
    cf = CuckooFilter(n_buckets=1 << 8)
    h = np.array([7, 7], dtype=np.uint64)
    cf.add(h)  # two copies via raw add
    assert cf.delete(np.array([7], np.uint64))[0]
    assert cf.contains(np.array([7], np.uint64))[0]  # one copy left
    assert cf.delete(np.array([7], np.uint64))[0]
    assert not cf.contains(np.array([7], np.uint64))[0]


def test_offer_first_occurrence_wins():
    cf = CuckooFilter(n_buckets=1 << 8)
    h = np.array([5, 5, 9, 11], dtype=np.uint64)
    assert cf.offer(h).tolist() == [True, False, True, True]
    assert not cf.offer(h).any()


def test_membership_order_independent():
    ks = _keys(20_000, 5)
    a, b = CuckooFilter(n_buckets=1 << 13), CuckooFilter(n_buckets=1 << 13)
    a.add(ks)
    b.add(ks[::-1].copy())
    probe = _keys(60_000, 6)
    assert (a.contains(probe) == b.contains(probe)).all()


def test_over_capacity_raises():
    cf = CuckooFilter(n_buckets=1 << 4, max_kicks=50)  # capacity 64
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add(_keys(400, 7)[:200])


def test_power_of_two_guard():
    with pytest.raises(ValueError):
        CuckooFilter(n_buckets=100)


def test_sharded_cuckoo_offer_forget_roundtrip(ray_session):
    from cdx_toolkit_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(num_shards=4, backend="cuckoo",
                          n_buckets=1 << 12)
    ks = _keys(5_000, 8)
    new = seen.offer(ks)
    assert new.all()
    assert seen.contains(ks).all()
    due = ks[::3]
    assert seen.forget(due).all()
    assert not seen.contains(due).any()
    # re-offer: evicted keys admit again, retained ones don't
    again = seen.offer(ks)
    assert (again == np.isin(ks, due)).all()
    stats = seen.stats()
    assert all(s["backend"] == "cuckoo" for s in stats)


def test_sharded_bloom_forget_raises(ray_session):
    import ray

    from cdx_toolkit_ray.state.seen import ShardedSeenSet

    seen = ShardedSeenSet(num_shards=2, n_bits=1 << 12)
    with pytest.raises(Exception, match="cuckoo"):
        ray.get(seen.shards[0].forget.remote(
            np.array([1], dtype=np.uint64)))


def test_cuckoo_checkpoint_restore(ray_session, tmp_path):
    from cdx_toolkit_ray.state.seen import ShardedSeenSet

    ks = _keys(3_000, 9)
    seen = ShardedSeenSet(num_shards=2, backend="cuckoo",
                          n_buckets=1 << 11)
    seen.offer(ks)
    seen.forget(ks[:1000])
    seen.checkpoint(str(tmp_path))

    fresh = ShardedSeenSet(num_shards=2, backend="cuckoo",
                           n_buckets=1 << 11)
    fresh.restore(str(tmp_path))
    assert not fresh.contains(ks[:1000]).any()
    assert fresh.contains(ks[1000:]).all()


def test_forget_stage_requires_cuckoo(ray_session):
    from cdx_toolkit_ray.state.seen import SeenForgetStage, ShardedSeenSet

    with pytest.raises(ValueError, match="cuckoo"):
        SeenForgetStage(ShardedSeenSet(num_shards=2, n_bits=1 << 10))


def test_expected_keys_sizing(ray_session):
    import ray

    from cdx_toolkit_ray.state.seen import ShardedSeenSet

    # cuckoo: 1M keys over 4 shards -> >= 250k/3.8 buckets per shard
    seen = ShardedSeenSet(num_shards=4, backend="cuckoo",
                          expected_keys=1_000_000)
    ks = _keys(50_000, 10)
    assert seen.offer(ks).all()
    fill = max(s["fill"] for s in seen.stats())
    assert fill < 0.3  # plenty of headroom at the estimate
    # bloom path: n_bits sized to ~20 bits/key
    b = ShardedSeenSet(num_shards=2, expected_keys=10_000)
    assert b.offer(ks[:5000]).all()


def _model_ops(ops):
    """Serial multiset model of offer/delete/contains."""
    from collections import Counter

    stored = Counter()
    out = []
    for op, k in ops:
        if op == "offer":
            new = stored[k] == 0
            if new:
                stored[k] += 1
            out.append(("offer", k, new))
        elif op == "delete":
            found = stored[k] > 0
            if found:
                stored[k] -= 1
            out.append(("delete", k, found))
        else:
            out.append(("contains", k, stored[k] > 0))
    return out


def test_cuckoo_random_op_sequences_match_multiset_model():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.integers(min_value=1, max_value=40)
    ops = st.lists(st.tuples(
        st.sampled_from(["offer", "delete", "contains"]), keys),
        max_size=120)

    @settings(max_examples=60, deadline=None)
    @given(ops)
    def check(seq):
        cf = CuckooFilter(n_buckets=1 << 6)
        want = _model_ops(seq)
        for (op, k, expect) in want:
            h = np.array([k], dtype=np.uint64)
            if op == "offer":
                got = bool(cf.offer(h)[0])
            elif op == "delete":
                got = bool(cf.delete(h)[0])
            else:
                got = bool(cf.contains(h)[0])
            assert got == expect, (op, k, got, expect)

    check()


def test_restore_adopts_stored_geometry(ray_session, tmp_path):
    """A checkpoint restores into a differently-sized shard correctly:
    addressing follows the stored table, not the constructor arg."""
    from cdx_toolkit_ray.state.seen import ShardedSeenSet

    ks = _keys(2_000, 11)
    big = ShardedSeenSet(num_shards=2, backend="cuckoo",
                         n_buckets=1 << 12)
    big.offer(ks)
    big.checkpoint(str(tmp_path))
    small = ShardedSeenSet(num_shards=2, backend="cuckoo",
                           n_buckets=1 << 6)  # wrong size on purpose
    small.restore(str(tmp_path))
    assert small.contains(ks).all()  # no false negatives after restore


def test_merge_checkpoints_rejects_cuckoo(ray_session, tmp_path):
    from cdx_toolkit_ray.state.seen import (ShardedSeenSet,
                                            merge_checkpoints)

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (a, b):
        s = ShardedSeenSet(num_shards=2, backend="cuckoo",
                           n_buckets=1 << 8)
        s.offer(_keys(100, 12))
        s.checkpoint(d)
    with pytest.raises(ValueError, match="cuckoo"):
        merge_checkpoints(a, b, str(tmp_path / "out"))
