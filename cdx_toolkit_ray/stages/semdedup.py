"""SemDeDup-style semantic deduplication over an embedding column.

Public method (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
partition the embedding space with k-means, then search for near-
duplicates ONLY within each cluster — the O(n^2) all-pairs cosine
shrinks to O(sum cluster_i^2), and with k grown so clusters stay at a
target size the verify cost is linear in the corpus (the paper used
50k clusters for LAION-440M). Survivor policy here is min-id per
connected component (arrival-order independent, the same convention as
components.fuzzy_dedup) rather than the paper's keep-farthest-from-
centroid: the policy is a one-line kernel swap, and min-id is the one
a SQL oracle can replicate exactly.

Dataflow (everything distributed; the driver holds only the k
centroids and the CC convergence scalar):

1. ``cluster.kmeans_init`` — deterministic seeded centroid pick
   (bounded candidate merge), broadcast once via ``ray.put``.
2. One ``map_batches`` pass assigns every vector to its nearest
   centroid (squared-L2 argmin, lowest-index tie-break — identical to
   ``cluster.kmeans_assign``) while carrying the embedding forward.
3. One cluster-keyed hash exchange (``exchange.hash_bucket_apply``)
   co-locates each cluster; the merge kernel lexsorts by (cluster, id)
   and runs a unit-vector matmul per cluster run — many clusters per
   bucket is the normal case at scale (k >> buckets), the loop is per
   CLUSTER, never per row, and each pair lands in exactly one bucket
   (a vector has one cluster) so no distinct pass is needed.
4. ``components.survivors_from_pairs`` — distributed connected
   components + min-id representative + full cluster sizes.

Scale contract: the per-cluster verify is O(cluster^2) work and
memory; clusters larger than ``max_cluster`` raise rather than
silently stall (the fix is a larger k — the same contract as
``dedup.embedding_neardup_pairs``'s max_bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .cluster import _sq_dists, kmeans_init
from .ann import _as_matrix

_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("cosine", pa.float64())])


def semantic_pairs(ds: ray.data.Dataset, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 8,
                   threshold: float = 0.4, seed: int = 0,
                   num_buckets: int | None = None,
                   max_cluster: int | None = 200_000
                   ) -> ray.data.Dataset:
    """Within-kmeans-cluster near-dup pairs: (id_a < id_b, cosine).

    Cosine is computed in float64 on unit vectors, matching DuckDB's
    ``list_cosine_similarity(CAST(... AS DOUBLE[]))`` to ~1e-13 — the
    oracle threshold therefore needs (and the synthetic corpus has)
    margin around ``threshold``.
    """
    cents = kmeans_init(ds, vec_col, id_col, k, seed)
    cref = ray.put(np.ascontiguousarray(np.asarray(cents,
                                                   dtype=np.float64)))
    nb = num_buckets or max(1, min(32, k))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _as_matrix(batch[vec_col])
        a = _sq_dists(mat, c).argmin(axis=1).astype(np.int64)
        batch = batch.append_column("cluster", pa.array(a))
        return batch.append_column("cl_bucket", pa.array(a % nb))

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              batch_size=None)

    def verify(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        cl = tbl["cluster"].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _as_matrix(tbl[vec_col]).astype(np.float64)
        order = np.lexsort((ids, cl))
        cl, ids, vecs = cl[order], ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n < 2:
                continue
            if max_cluster is not None and n > max_cluster:
                raise ValueError(
                    "semantic cluster of %d vectors exceeds "
                    "max_cluster=%d (raise k)" % (n, max_cluster))
            sim = unit[s:e] @ unit[s:e].T
            ia, ib = np.triu_indices(n, k=1)
            keep = sim[ia, ib] >= threshold
            if keep.any():
                out_a.append(ids[s + ia[keep]])
                out_b.append(ids[s + ib[keep]])
                out_c.append(sim[ia, ib][keep])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table({"id_a": pa.array(np.concatenate(out_a)),
                         "id_b": pa.array(np.concatenate(out_b)),
                         "cosine": pa.array(np.concatenate(out_c))})

    from .exchange import hash_bucket_apply

    return hash_bucket_apply(assigned, "cl_bucket", verify,
                             num_buckets=nb)


def semantic_dedup(ds: ray.data.Dataset, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 8,
                   threshold: float = 0.4, seed: int = 0,
                   num_buckets: int | None = None,
                   max_cluster: int | None = 200_000,
                   num_partitions: int | None = None
                   ) -> ray.data.Dataset:
    """Corpus -> survivors (id, component, cluster_size): one min-id
    representative per semantic near-dup component, singletons kept.
    ``sum(cluster_size) == count(corpus)`` (the oracle invariant)."""
    from .components import survivors_from_pairs

    pairs = semantic_pairs(ds, vec_col=vec_col, id_col=id_col, k=k,
                           threshold=threshold, seed=seed,
                           num_buckets=num_buckets,
                           max_cluster=max_cluster)
    return survivors_from_pairs(ds, pairs, id_col=id_col,
                                num_partitions=num_partitions)
