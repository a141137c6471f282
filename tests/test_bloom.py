"""Bloom build/gate: no false negatives, sane FP rate, decontam superset."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from cdx_toolkit_ray.stages import bloom

pytestmark = pytest.mark.usefixtures("ray_session")


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.int64) \
        .astype(np.uint64)
    ds = ray.data.from_arrow(pa.table({"h": pa.array(keys, pa.uint64())}))
    num_bits, num_hashes = 1 << 19, 4
    ref = bloom.build_bloom(ds, "h", num_bits=num_bits,
                            num_hashes=num_hashes)
    words = ray.get(ref)
    # every inserted key tests positive
    pos = bloom._positions(keys, num_bits, num_hashes)
    assert bloom._test_bits(words, pos).all()
    # fresh keys: FP rate near the textbook estimate
    fresh = rng.integers(0, 2**63, size=50_000, dtype=np.int64) \
        .astype(np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    fp = bloom._test_bits(
        words, bloom._positions(fresh, num_bits, num_hashes)).mean()
    expect = bloom.bloom_fp_rate(num_bits, num_hashes, len(keys))
    assert fp <= max(3 * expect, 0.01), (fp, expect)


def test_member_stage_and_empty_build():
    empty = ray.data.from_arrow(pa.table({"h": pa.array([], pa.uint64())}))
    ref = bloom.build_bloom(empty, "h", num_bits=1 << 10)
    batch_ds = ray.data.from_arrow(pa.table({
        "h": pa.array([1, 2, 3], pa.uint64())}))
    out = batch_ds.map_batches(
        bloom.make_bloom_member_stage(ref, 1 << 10, 4, "h"),
        batch_format="pyarrow").to_pandas()
    assert not out["maybe_member"].any()


def test_bloom_decontam_superset_of_exact():
    from cdx_toolkit_ray.stages.decontam import decontaminate

    rng = np.random.default_rng(11)
    vocab = ["w%d" % i for i in range(50)]
    test_rows, train_rows = [], []
    for i in range(10):
        test_rows.append({"doc_id": 1000 + i, "text": " ".join(
            rng.choice(vocab, size=20))})
    for i in range(80):
        body = " ".join(rng.choice(vocab, size=rng.integers(6, 30)))
        if i % 5 == 0:  # plant contamination: splice in a test doc span
            body += " " + test_rows[i % 10]["text"]
        train_rows.append({"doc_id": i, "text": body})
    train = ray.data.from_pandas(pd.DataFrame(train_rows))
    test = ray.data.from_pandas(pd.DataFrame(test_rows))

    exact = decontaminate(train, test, shingle_k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    approx = bloom.bloom_decontaminate(
        train, test, shingle_k=5, num_bits=1 << 20).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    assert (approx["n_grams"] == exact["n_grams"]).all()
    # bloom hits bound exact hits from above; flags are a superset
    assert (approx["n_hits"] >= exact["n_hits"]).all()
    assert (approx["contaminated"] >= exact["contaminated"]).all()
    # planted contamination is all caught
    planted = exact[exact["doc_id"] % 5 == 0]["contaminated"]
    assert planted.all()
    # at this sizing the bloom pass should be exact-equal almost surely
    frac_extra = (approx["contaminated"] != exact["contaminated"]).mean()
    assert frac_extra < 0.05
