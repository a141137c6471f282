"""Content-defined chunking: edit locality, boundary determinism,
shared-chunk counting, degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _chunks(texts, **kw):
    from cdx_toolkit_ray.stages.cdc import cdc_chunk_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return cdc_chunk_batch(batch, **kw)


def test_chunks_cover_and_deterministic():
    rng = np.random.RandomState(1)
    text = "".join(rng.choice(list("abcdefgh "), 600))
    out = _chunks([text]).to_pylist()
    # chunks tile the text exactly
    assert out[0]["start"] == 0
    for a, b in zip(out, out[1:]):
        assert b["start"] == a["start"] + a["length"]
    assert out[-1]["start"] + out[-1]["length"] == len(text)
    assert [r["chunk_idx"] for r in out] == list(range(len(out)))
    assert len(out) > 3  # mask 6 over 600 bytes really cuts
    # rerun == identical
    assert _chunks([text]).to_pylist() == out


def test_edit_locality():
    """The CDC property fixed shingles lack: one inserted byte only
    perturbs chunks near the edit — chunk contents far after it are
    identical (they realign)."""
    rng = np.random.RandomState(2)
    base = "".join(rng.choice(list("abcdefgh "), 800))
    edited = base[:100] + "X" + base[100:]
    h1 = {r["chunk_hash"] for r in _chunks([base]).to_pylist()}
    h2 = {r["chunk_hash"] for r in _chunks([edited]).to_pylist()}
    shared = len(h1 & h2)
    assert shared >= max(len(h1), len(h2)) - 4  # most chunks survive
    assert h1 != h2  # but the edit region did change


def test_normalization_and_degenerate():
    # non-ascii strips, case folds; empty/None docs emit nothing
    out = _chunks(["CaFÉ au lait", "", None]).to_pylist()
    assert all(r["doc_id"] == 0 for r in out)
    joined = "caf au lait"
    assert sum(r["length"] for r in out) == len(joined)


def test_shared_chunks_cross_block(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.cdc import cdc_shared_chunks

    rng = np.random.RandomState(3)
    common = "".join(rng.choice(list("abcdefgh "), 400))
    docs = [common + " tail one", common + " tail two",
            "".join(rng.choice(list("qrstuv "), 300))]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = cdc_shared_chunks(ds, min_docs=2).take_all()
    assert len(out) >= 2  # the shared prefix yields shared chunks
    for r in out:
        assert r["n_docs"] >= 2
        assert r["n_occurrences"] >= r["n_docs"]


def test_window_start_isolation():
    """A doc's first bytes must not hash with the previous doc's tail
    (the per-doc window reset): the same text chunks identically
    whether alone or preceded by another doc in the batch."""
    rng = np.random.RandomState(4)
    t = "".join(rng.choice(list("abcdefgh "), 500))
    alone = [r["chunk_hash"] for r in _chunks([t]).to_pylist()]
    packed = [r["chunk_hash"] for r in
              _chunks(["zzz other doc zzz", t]).to_pylist()
              if r["doc_id"] == 1]
    assert packed == alone


def test_neardup_twins_flag_and_strangers_dont(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.cdc import cdc_neardup_pairs

    rng = np.random.RandomState(7)
    base = "".join(rng.choice(list("abcdefgh "), 700))
    other = "".join(rng.choice(list("qrstuvw "), 700))
    docs = [
        (0, base),
        (1, "x " + base),        # prefix-edit twin of 0
        (2, other),              # unrelated
        (3, base[:50] + other),  # shares a little with 0/1
    ]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = {(r["doc_a"], r["doc_b"]): r
           for r in cdc_neardup_pairs(ds, num=1, den=4).take_all()}
    assert (0, 1) in out and out[(0, 1)]["is_dup"]
    # the twins share most chunks
    r = out[(0, 1)]
    assert r["n_shared"] * 2 > max(r["n_a"], r["n_b"])
    # doc 3 CONTAINS doc 2 -> also a legit near-dup pair
    assert (2, 3) in out and out[(2, 3)]["is_dup"]
    # disjoint alphabets never pair
    assert (0, 2) not in out and (1, 2) not in out
    # the small base[:50] overlap with 0/1 must not reach the bar
    for k in ((0, 3), (1, 3)):
        if k in out:
            assert not out[k]["is_dup"], out[k]
