"""K-means, TF-IDF, sequence packing, and grouped-quantile stages."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from cdx_toolkit_ray.stages.chunk import chunk_documents, pack_chunks
from cdx_toolkit_ray.stages.cluster import (
    _sq_dists,
    kmeans,
    kmeans_assign,
    kmeans_init,
    kmeans_iterate,
)
from cdx_toolkit_ray.stages.textstats import group_quantiles, tfidf_topk

pytestmark = pytest.mark.usefixtures("ray_session")


def _vec_rows(n=120, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # three separated blobs so clustering has real structure
    centers = rng.normal(0, 1, (3, dim)) * 6
    rows = []
    for i in range(n):
        c = i % 3
        rows.append({"vec_id": i,
                     "embedding": (centers[c]
                                   + rng.normal(0, 0.5, dim)).tolist()})
    return rows


def test_kmeans_init_deterministic_and_order_free():
    rows = _vec_rows()
    a = kmeans_init(ray.data.from_items(rows), k=4, seed=0)
    b = kmeans_init(ray.data.from_items(rows[::-1]), k=4, seed=0)
    assert np.array_equal(a, b)
    c = kmeans_init(ray.data.from_items(rows), k=4, seed=1)
    assert not np.array_equal(a, c)


def test_kmeans_inertia_non_increasing_and_recovers_blobs():
    ds = ray.data.from_items(_vec_rows())
    cents = kmeans_init(ds, k=3, seed=0)
    cents, inertias = kmeans_iterate(ds, cents, n_iters=5)
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    assert inertias[-1] < inertias[0]
    # distributed iterate == driver-side numpy Lloyd with the same init
    rows = _vec_rows()
    mat = np.asarray([r["embedding"] for r in rows], np.float64)
    ref = kmeans_init(ds, k=3, seed=0)
    for _ in range(5):
        a = _sq_dists(mat, ref).argmin(axis=1)
        for c in range(3):
            if (a == c).any():
                ref[c] = mat[a == c].mean(axis=0)
    assert np.allclose(cents, ref, rtol=1e-9, atol=1e-12)
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert np.array_equal(got.cluster.to_numpy(),
                          _sq_dists(mat, ref).argmin(axis=1))


def test_kmeans_assign_matches_driver_argmin():
    rows = _vec_rows(n=60)
    ds = ray.data.from_items(rows)
    cents = kmeans_init(ds, k=4, seed=0)
    got = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    mat = np.asarray([r["embedding"] for r in rows], np.float64)
    want = _sq_dists(mat, cents).argmin(axis=1)
    assert np.array_equal(got.cluster.to_numpy(), want)


def test_kmeans_pipeline_runs():
    ds = ray.data.from_items(_vec_rows())
    out = kmeans(ds, k=3, n_iters=2, seed=0).to_pandas()
    assert len(out) == 120 and set(out.columns) == {"vec_id", "cluster"}


def test_group_quantiles_matches_duckdb():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(list("abcde"), 500),
        "v": rng.integers(0, 40, 500),
    })
    out = (group_quantiles(ray.data.from_pandas(df), "g", "v",
                           q_pcts=(10, 25, 50, 75, 90, 99))
           .to_pandas().sort_values(["g", "q_pct"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("\nUNION ALL\n".join(
        "SELECT g, CAST(%d AS BIGINT) AS q_pct, "
        "CAST(quantile_disc(v, %s) AS BIGINT) AS value FROM t GROUP BY g"
        % (p, p / 100) for p in (10, 25, 50, 75, 90, 99))).df()
    want = want.sort_values(["g", "q_pct"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_group_quantiles_singleton_group():
    df = pd.DataFrame({"g": ["x"], "v": [7]})
    out = group_quantiles(ray.data.from_pandas(df), "g", "v").to_pandas()
    assert (out.value == 7).all() and len(out) == 4


def test_tfidf_ranks_rare_terms_highest():
    # 'zebra' appears once in one doc; 'the' in every doc
    docs = [{"doc_id": i, "text": "the common filler words here"}
            for i in range(9)]
    docs.append({"doc_id": 9, "text": "the zebra zebra quantum"})
    out = tfidf_topk(ray.data.from_items(docs), k=2).to_pandas()
    d9 = out[out.doc_id == 9].sort_values("term_rank")
    assert list(d9.word[:2]) == ["zebra", "quantum"]
    assert (d9.df.iloc[0], d9.tf.iloc[0]) == (1, 2)
    # 'the' has df == N -> score 0; never outranks any df < N term
    the_rows = out[out.word == "the"]
    assert (the_rows.score_1e6 == 0).all()


def test_tfidf_topk_respects_k_and_rank_order():
    docs = [{"doc_id": i,
             "text": " ".join("w%d" % (i * 7 + j) for j in range(20))}
            for i in range(20)]
    out = tfidf_topk(ray.data.from_items(docs), k=5).to_pandas()
    per = out.groupby("doc_id")
    assert (per.size() <= 5).all()
    for _, g in per:
        g = g.sort_values("term_rank")
        assert list(g.term_rank) == list(range(1, len(g) + 1))
        assert (np.diff(g.score_1e6.to_numpy()) <= 0).all()


def test_pack_chunks_contiguous_per_shard():
    docs = [{"doc_id": i, "text": " ".join("t%d" % j for j in range(150))}
            for i in range(40)]
    chunks = chunk_documents(ray.data.from_items(docs),
                             chunk_size=64, stride=48)
    out = pack_chunks(chunks, seq_len=100, n_shards=4, seed=0).to_pandas()
    assert (out.seq_off == out.tok_off % 100).all()
    assert (out.seq_id == out.tok_off // 100).all()
    for _, g in out.groupby("shard"):
        g = g.sort_values("tok_off")
        # offsets tile the shard stream exactly (concat-and-cut)
        assert g.tok_off.iloc[0] == 0
        assert (g.tok_off.to_numpy()[1:]
                == (g.tok_off + g.n_tokens).to_numpy()[:-1]).all()
    # deterministic across arrival order
    chunks_rev = chunk_documents(ray.data.from_items(docs[::-1]),
                                 chunk_size=64, stride=48)
    out2 = pack_chunks(chunks_rev, seq_len=100, n_shards=4,
                       seed=0).to_pandas()
    key = ["doc_id", "chunk_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key + ["shard", "tok_off"]],
                                  b[key + ["shard", "tok_off"]])
