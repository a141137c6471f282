"""SemDeDup-style semantic dedup (stages/semdedup): within-kmeans-
cluster cosine pairs -> connected components -> min-id survivors."""

import numpy as np
import pytest
import ray.data

from cdx_toolkit_ray.stages.cluster import _sq_dists, kmeans_init
from cdx_toolkit_ray.stages.semdedup import semantic_dedup, semantic_pairs

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=150, dim=8, seed=3, dup_every=5):
    """Blobby vectors with planted exact/near duplicates: every
    ``dup_every``-th vector is a tiny perturbation of its
    predecessor (cosine ~0.999)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (4, dim)) * 8
    rows = []
    for i in range(n):
        if i % dup_every == dup_every - 1 and rows:
            base = np.asarray(rows[-1]["embedding"])
            v = base + rng.normal(0, 1e-3, dim)
        else:
            v = centers[i % 4] + rng.normal(0, 0.5, dim)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rows


def _brute_force(rows, k, threshold, seed=0):
    """Driver-side replica: seeded init -> argmin assign -> within-
    cluster cosine pairs -> union-find -> min-id survivors."""
    ds = ray.data.from_items(rows)
    cents = kmeans_init(ds, k=k, seed=seed)
    vecs = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    cl = _sq_dists(vecs, np.asarray(cents, dtype=np.float64)).argmin(axis=1)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cl[a] == cl[b] and unit[a] @ unit[b] >= threshold:
                lo, hi = sorted((int(ids[a]), int(ids[b])))
                pairs.add((lo, hi))
                ra, rb = find(lo), find(hi)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {int(i): find(int(i)) for i in ids}
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    survivors = {i: (c, sizes[c]) for i, c in comp.items() if i == c}
    return pairs, survivors


def test_semantic_pairs_match_brute_force():
    rows = _corpus()
    want, _ = _brute_force(rows, k=6, threshold=0.9)
    got = semantic_pairs(ray.data.from_items(rows), k=6, threshold=0.9,
                         seed=0).to_pandas()
    assert set(zip(got.id_a, got.id_b)) == want
    assert (got.id_a < got.id_b).all()
    assert (got.cosine >= 0.9).all()


def test_semantic_dedup_survivors_and_invariant():
    rows = _corpus()
    _, want = _brute_force(rows, k=6, threshold=0.9)
    got = semantic_dedup(ray.data.from_items(rows), k=6, threshold=0.9,
                         seed=0).to_pandas()
    assert {int(r.vec_id): (int(r.component), int(r.cluster_size))
            for r in got.itertuples()} == want
    # every survivor is its own component label (min id), and cluster
    # sizes partition the corpus
    assert (got.vec_id == got.component).all()
    assert got.cluster_size.sum() == len(rows)
    # planted near-dups were actually removed
    assert len(got) < len(rows)


def test_semantic_dedup_no_pairs_is_identity():
    rng = np.random.default_rng(11)
    # orthogonal-ish one-hot vectors: no near-dups at 0.9
    rows = [{"vec_id": i,
             "embedding": (np.eye(40)[i] * (1 + i)
                           + rng.normal(0, 1e-6, 40)).tolist()}
            for i in range(40)]
    got = semantic_dedup(ray.data.from_items(rows), k=4, threshold=0.999,
                         seed=0).to_pandas()
    assert len(got) == 40
    assert (got.cluster_size == 1).all()


def test_semantic_pairs_max_cluster_raises():
    rows = _corpus(n=60)
    with pytest.raises(Exception) as ei:
        semantic_pairs(ray.data.from_items(rows), k=1, threshold=0.9,
                       max_cluster=10).to_pandas()
    assert "max_cluster" in str(ei.value)
