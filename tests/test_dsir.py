"""DSIR importance resampling (stages/dsir.py): serial-reference
parity, smoothing, selection tie-breaks, target discrimination."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cdx_toolkit_ray.canon import hash64_batch


def _mk(docs, targets):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "is_target": pa.array(targets, pa.bool_()),
    }))


def _serial_scores(docs, targets, F=64):
    import re

    toks = [re.findall(r"\w+", d.lower()) for d in docs]
    fb = [np.asarray(
        hash64_batch(np.array(t, object)) % np.uint64(F), np.int64)
        if t else np.zeros(0, np.int64) for t in toks]
    tc = np.zeros(F, np.int64)
    rc = np.zeros(F, np.int64)
    for b, is_t in zip(fb, targets):
        rc += np.bincount(b, minlength=F)
        if is_t:
            tc += np.bincount(b, minlength=F)
    num = ((tc + 1) * (rc.sum() + F)).astype(np.float64)
    den = ((rc + 1) * (tc.sum() + F)).astype(np.float64)
    lut = np.floor(np.log(num / den) * 1e6 + 0.5).astype(np.int64)
    return np.array([lut[b].sum() for b in fb], np.int64), \
        np.array([len(b) for b in fb], np.int64)


def test_scores_match_serial_reference(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_scores

    rng = np.random.default_rng(3)
    vocab_t = ["alpha", "beta", "gamma"]
    vocab_r = ["delta", "epsilon", "zeta", "eta"]
    docs, targets = [], []
    for i in range(60):
        is_t = bool(i % 3 == 0)
        v = vocab_t if is_t else vocab_r
        docs.append(" ".join(rng.choice(v + vocab_r[:1],
                                        rng.integers(1, 20))))
        targets.append(is_t)
    got = dsir_scores(_mk(docs, targets), n_features=64) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want_w, want_n = _serial_scores(docs, targets, F=64)
    assert (got["logw_1e6"].to_numpy() == want_w).all()
    assert (got["n_tok"].to_numpy() == want_n).all()


def test_empty_doc_scores_zero(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_scores

    got = dsir_scores(_mk(["", "hello world"], [False, True]),
                      n_features=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "n_tok"] == 0 and got.loc[0, "logw_1e6"] == 0


def test_target_docs_rank_higher(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_scores, dsir_select

    docs = (["target words only special lexicon"] * 10
            + ["completely different other tokens stream"] * 30)
    targets = [True] * 10 + [False] * 30
    scores = dsir_scores(_mk(docs, targets), n_features=64)
    out = dsir_select(scores, k=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["selected"].sum() == 10
    assert out.loc[:9, "selected"].all()  # the 10 target docs win


def test_select_tie_break_by_doc_id(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_select

    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 1, 3, 2], pa.int64()),
        "n_tok": pa.array([1, 1, 1, 1], pa.int64()),
        "logw_1e6": pa.array([7, 7, 7, 9], pa.int64()),
    }))
    out = dsir_select(scores, k=2).to_pandas() \
        .set_index("doc_id")["selected"]
    # 2 wins on weight; tie at 7 broken by doc_id asc -> 1
    assert out[2] and out[1] and not out[3] and not out[5]


def test_select_k_exceeds_rows(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_select

    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "n_tok": pa.array([1, 1], pa.int64()),
        "logw_1e6": pa.array([4, -2], pa.int64()),
    }))
    out = dsir_select(scores, k=10).to_pandas()
    assert out["selected"].all()


def test_select_k_zero_selects_nothing(ray_session):
    from cdx_toolkit_ray.stages.dsir import dsir_select

    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "n_tok": pa.array([1, 1], pa.int64()),
        "logw_1e6": pa.array([4, -2], pa.int64()),
    }))
    out = dsir_select(scores, k=0).to_pandas()
    assert not out["selected"].any()


def test_lut_finite_at_web_scale_counts():
    """Counts whose int64 products would wrap still yield finite
    log-ratios (float64-first multiply)."""
    import numpy as np

    from cdx_toolkit_ray.stages.dsir import dsir_log_ratio_lut

    counts = np.zeros((4, 2), np.int64)
    counts[:, 0] = [10**9, 5, 0, 10**8]       # target
    counts[:, 1] = [10**10, 10**10, 7, 10**9]  # raw
    lut = dsir_log_ratio_lut(counts)
    assert np.isfinite(lut).all()
    assert (np.abs(lut) < 60_000_000).all()  # |ln| < 60 nats
