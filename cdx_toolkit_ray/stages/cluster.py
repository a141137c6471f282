"""Distributed k-means over an embedding column.

The corpus-clustering step of a training-data pipeline (topic
balancing, domain mixing, curriculum bucketing): assign every
embedding row to one of ``k`` centroids, with Lloyd iterations run as
streaming partial-sum passes.

Scale shape:
- **Init** is deterministic and order-free: the ``k`` rows with the
  smallest seeded FNV hash of their id (the stratified-sample trick)
  — every batch prunes to its local k candidates, the driver merges
  O(k x blocks) candidate rows, never the corpus.
- **Each Lloyd iteration** is one streaming ``map_batches`` pass: the
  centroid matrix is broadcast via ``ray.put`` (read once per task,
  never re-shipped per batch); each batch emits ``k`` partial rows
  (cluster, member count, vector sum, min member id). The driver
  reduces O(k x dim x blocks) scalars — bounded, independent of corpus
  size. Partials are summed in (cluster, min-id) sorted order so the
  float reduction is deterministic across runs.
- **Assignment** is a pure vectorized map: one matmul-style distance
  per batch against the broadcast centroids, argmin with lowest-index
  tie-break.

Reference role: beyond-reference training-data operator (the
reference, cdx_toolkit, has no numeric/clustering surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .ann import _as_matrix
from .sampling import _seeded_key


def _sq_dists(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared L2 distances, rows x centroids, via the expansion
    ``|x|^2 - 2 x.c + |c|^2`` (one matmul instead of a k-times-larger
    broadcast subtract)."""
    x2 = np.einsum("ij,ij->i", mat, mat)[:, None]
    c2 = np.einsum("ij,ij->i", cents, cents)[None, :]
    return np.maximum(x2 - 2.0 * (mat @ cents.T) + c2, 0.0)


def kmeans_init(ds: ray.data.Dataset, vec_col: str = "embedding",
                id_col: str = "vec_id", k: int = 8,
                seed: int = 0) -> np.ndarray:
    """Deterministic seed centroids: the ``k`` rows with the smallest
    ``(skey, id)`` where skey is the seeded FNV hash of the id.
    Cluster index = rank in that order (matches the SQL oracle's
    ``row_number() OVER (ORDER BY skey, id)``)."""

    def prune(batch: pa.Table) -> pa.Table:
        skey = _seeded_key(batch[id_col], seed)
        order = np.lexsort((batch[id_col].to_numpy(zero_copy_only=False),
                            skey))[:k]
        t = batch.select([id_col, vec_col]).take(pa.array(order))
        return t.append_column("skey", pa.array(skey[order], pa.uint64()))

    cand = ds.map_batches(prune, batch_format="pyarrow",
                          batch_size=None).take_all()
    cand.sort(key=lambda r: (r["skey"], r[id_col]))
    return np.asarray([r[vec_col] for r in cand[:k]], dtype=np.float64)


def kmeans_iterate(ds: ray.data.Dataset, centroids: np.ndarray,
                   n_iters: int, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> tuple[np.ndarray, list[float]]:
    """Run ``n_iters`` Lloyd iterations; returns (centroids, inertia
    per iteration). Each iteration streams the corpus once; empty
    clusters keep their previous centroid."""
    k = len(centroids)
    inertias: list[float] = []
    for _ in range(n_iters):
        cref = ray.put(np.ascontiguousarray(centroids))

        def partials(batch: pa.Table, cref=cref) -> pa.Table:
            cents = ray.get(cref)
            mat = _as_matrix(batch[vec_col])
            d = _sq_dists(mat, cents)
            assign = d.argmin(axis=1)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            order = np.argsort(assign, kind="stable")
            uniq, starts = np.unique(assign[order], return_index=True)
            sums = np.add.reduceat(mat[order], starts, axis=0)
            cnts = np.diff(np.append(starts, len(order)))
            min_ids = np.minimum.reduceat(ids[order], starts)
            # block inertia rides on the first cluster row only
            inert = np.zeros(len(uniq))
            inert[0] = d[np.arange(len(assign)), assign].sum()
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "min_id": pa.array(min_ids.astype(np.int64)),
                "inert": pa.array(inert),
            })

        rows = ds.map_batches(partials, batch_format="pyarrow",
                              batch_size=None).take_all()
        # deterministic float reduction: sorted by (cluster, min id)
        rows.sort(key=lambda r: (r["cluster"], r["min_id"]))
        new = centroids.copy()
        cnt_tot = np.zeros(k)
        sum_tot = np.zeros_like(centroids)
        inertia = 0.0
        for r in rows:
            c = r["cluster"]
            cnt_tot[c] += r["cnt"]
            sum_tot[c] += np.asarray(r["vsum"])
            inertia += r["inert"]
        nz = cnt_tot > 0
        new[nz] = sum_tot[nz] / cnt_tot[nz, None]
        centroids = new
        inertias.append(inertia)
    return centroids, inertias


def kmeans_assign(ds: ray.data.Dataset, centroids: np.ndarray,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> ray.data.Dataset:
    """Final assignment pass: (id, cluster), argmin squared L2 with
    lowest-cluster-index tie-break."""
    cref = ray.put(np.ascontiguousarray(np.asarray(centroids,
                                                   dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        mat = _as_matrix(batch[vec_col])
        a = _sq_dists(mat, cents).argmin(axis=1).astype(np.int64)
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(a)})

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=None)


def kmeans(ds: ray.data.Dataset, vec_col: str = "embedding",
           id_col: str = "vec_id", k: int = 8, n_iters: int = 3,
           seed: int = 0) -> ray.data.Dataset:
    """Full pipeline: seeded deterministic init -> ``n_iters`` Lloyd
    passes -> assignment Dataset (id, cluster).

    The narrow (id, vec) stream is materialized once up front: init +
    each Lloyd pass + the final assignment all re-consume it, and
    without the checkpoint every pass re-executes the upstream read
    (n_iters + 2 reads). The materialized footprint is id + embedding
    only — at a scale where even that exceeds the object store, swap
    for a write_parquet/read_parquet checkpoint (the corpus_clean
    convention)."""
    ds = ds.select_columns([id_col, vec_col]).materialize()
    cents = kmeans_init(ds, vec_col, id_col, k, seed)
    if n_iters > 0:
        cents, _ = kmeans_iterate(ds, cents, n_iters, vec_col, id_col)
    return kmeans_assign(ds, cents, vec_col, id_col)
