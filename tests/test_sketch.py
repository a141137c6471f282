"""Exact heavy hitters (stages/sketch): MG candidates + exact verify."""

import collections

import numpy as np
import pytest
import ray.data

from cdx_toolkit_ray.stages.sketch import heavy_hitters

pytestmark = pytest.mark.usefixtures("ray_session")


def _skewed_keys(n=20000, seed=5):
    """Zipf-ish host stream: a few very hot keys + a long unique tail."""
    rng = np.random.default_rng(seed)
    hot = rng.integers(0, 8, n // 2)          # 8 keys share half the rows
    tail = rng.integers(1000, 1000 + n, n - n // 2)  # mostly-unique tail
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    return [f"host-{k}.example" for k in keys]


def _exact(keys, threshold):
    c = collections.Counter(keys)
    return {k: v for k, v in c.items() if v >= threshold}


@pytest.mark.parametrize("m", [4, 16, None])
def test_heavy_hitters_exact_under_pruning(m):
    """Small num_counters forces real per-block MG pruning; the
    containment guarantee (m >= n/threshold) still holds for m=None
    (auto) and the result must be EXACT regardless."""
    keys = _skewed_keys()
    threshold = len(keys) // 16  # hot keys qualify, tail never does
    want = _exact(keys, threshold)
    ds = ray.data.from_items([{"host": k} for k in keys],
                             override_num_blocks=16)
    got = heavy_hitters(ds, "host", threshold=threshold,
                        num_counters=m, count_col="n").to_pandas()
    assert dict(zip(got.host, got.n)) == want
    assert len(want) > 0  # the test actually exercises hits


def test_heavy_hitters_phi_threshold():
    keys = _skewed_keys(n=4000)
    ds = ray.data.from_items([{"host": k} for k in keys],
                             override_num_blocks=8)
    got = heavy_hitters(ds, "host", phi=0.05).to_pandas()
    want = _exact(keys, int(np.ceil(0.05 * len(keys))))
    assert dict(zip(got.host, got.n_rows)) == want


def test_heavy_hitters_empty_result_keeps_schema():
    ds = ray.data.from_items([{"host": f"h{i}"} for i in range(100)],
                             override_num_blocks=4)
    got = heavy_hitters(ds, "host", threshold=50)
    # Dataset.to_pandas() drops columns when every block is empty (Ray
    # Data quirk), so assert on the Dataset schema — the engine truth.
    assert set(got.schema().names) == {"host", "n_rows"}
    assert got.count() == 0


def test_heavy_hitters_arg_validation():
    ds = ray.data.from_items([{"host": "a"}])
    with pytest.raises(ValueError):
        heavy_hitters(ds, "host")
    with pytest.raises(ValueError):
        heavy_hitters(ds, "host", threshold=1, phi=0.1)
    with pytest.raises(ValueError):
        heavy_hitters(ds, "host", phi=1.5)


def test_heavy_hitters_int_keys():
    ids = np.r_[np.zeros(500, np.int64), np.arange(1000)]
    ds = ray.data.from_items([{"uid": int(i)} for i in ids],
                             override_num_blocks=8)
    got = heavy_hitters(ds, "uid", threshold=100).to_pandas()
    assert dict(zip(got.uid, got.n_rows)) == {0: 501}
