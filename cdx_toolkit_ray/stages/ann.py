"""Similarity search over an embedding column (``list<float>``).

* ``cosine_topk`` — brute-force baseline: one numpy matmul per Arrow
  batch against a BROADCAST query matrix (``ray.put`` once, cached
  ``ray.get`` per worker), per-batch local top-k, then a tiny global
  sort+limit over the per-batch candidates. The full corpus is never
  collected; the reduction input is ``O(num_batches * k)`` rows.
* ``lsh_topk`` — the scale path: hyperplane-LSH buckets restrict the
  scan to same/adjacent buckets of the query (probing masks with
  hamming distance <= ``probe_bits``), trading recall for a bucket-
  pruned read. Falls back to exact ranking within probed buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import make_hyperplane_stage


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False).tolist(),
                      dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def quantize_batch(batch: pa.Table, vec_col: str = "embedding",
                   out_col: str = "qvec",
                   scale_col: str = "max_abs") -> pa.Table:
    """Per-vector symmetric int8 quantization (the standard storage /
    bandwidth trick for embedding corpora: 4x smaller, dequant
    ``x ~= q * max_abs / 127`` with error <= max_abs/254 per element).

    ``q_i = round_half_away(x_i * 127 / max(|x|))``; the all-zero
    vector quantizes to zeros with ``max_abs = 0``. Math runs in
    float64 on the Arrow list VALUES buffer (reduceat over the row
    offsets — no per-row Python, rows may vary in length), matching
    DuckDB's FLOAT->DOUBLE promotion so the SQL oracle compares
    exactly."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    # a sliced ListArray's values buffer covers the WHOLE parent: rebase
    # offsets to the slice window so vals and repeat(lengths) align
    # (same normalization the explode kernel in queries.py does)
    if offsets[0] != 0 or offsets[-1] != len(vals):
        vals = vals[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    maxabs = np.zeros(len(starts), np.float64)
    nz = lengths > 0
    if nz.any():
        # reduceat over nonzero-row starts only: zero-length rows
        # occupy no values, so consecutive nonzero starts bound each
        # segment exactly (a zero-length start index would alias the
        # next row's data)
        maxabs[nz] = np.maximum.reduceat(np.abs(vals), starts[nz])
    safe = np.where(maxabs == 0, 1.0, maxabs)
    t = vals * (127.0 / np.repeat(safe, lengths))
    q = np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))
    qarr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(q.astype(np.int8)))
    batch = batch.append_column(out_col, qarr)
    return batch.append_column(scale_col, pa.array(maxabs, pa.float64()))


def cosine_topk(ds: ray.data.Dataset, query_vec, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = 6) -> ray.data.Dataset:
    """Exact cosine top-k of one query vector, deterministic tie-break
    by ascending id. Returns (id, cosine) sorted best-first."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        qv = _get_broadcast(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = _unit(_as_matrix(batch[vec_col])) @ qv
        if round_to is not None:
            sims = np.round(sims, round_to)
        take = min(k, len(ids))
        # best sims, ties -> smaller id first
        order = np.lexsort((ids, -sims))[:take]
        return pa.table({id_col: pa.array(ids[order]),
                         "cosine": pa.array(sims[order], pa.float64())})

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    return (cands.sort(["cosine", id_col], descending=[True, False])
            .limit(k))


def lsh_topk(ds: ray.data.Dataset, query_vec, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int = 64, n_planes: int = 8, probe_bits: int = 1,
             seed: int = 7) -> ray.data.Dataset:
    """Approximate top-k: scan only LSH buckets within ``probe_bits``
    hamming distance of the query's bucket."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float32)
    q = np.asarray(query_vec, dtype=np.float32)
    qb = 0
    signs = (q @ planes) > 0
    for j in range(n_planes):
        qb |= int(signs[j]) << j
    probes = {qb}
    if probe_bits >= 1:
        probes |= {qb ^ (1 << j) for j in range(n_planes)}
    if probe_bits >= 2:
        for j in range(n_planes):
            for l in range(j + 1, n_planes):
                probes.add(qb ^ (1 << j) ^ (1 << l))
    probe_arr = np.array(sorted(probes), dtype=np.uint64)

    ds = ds.map_batches(make_hyperplane_stage(vec_col, dim, n_planes, seed),
                        batch_format="pyarrow")

    def in_probes(batch: pa.Table) -> pa.Table:
        b = batch["lsh_bucket"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(b, probe_arr)))

    pruned = ds.map_batches(in_probes, batch_format="pyarrow")
    return cosine_topk(pruned, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def ivf_centroids(ds: ray.data.Dataset, n_centroids: int = 16,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  sample_mod: int = 1, iters: int = 5) -> np.ndarray:
    """Deterministic IVF codebook: k-means (Lloyd) on a modulo-sampled
    subset, initialized from the ``n_centroids`` lowest-id sample rows.

    The sample is collected to the driver (it is tiny by construction:
    pick ``sample_mod`` so ``corpus/sample_mod`` is ~10^4-10^5 rows even
    at 10^10 corpus scale); everything downstream uses the centroids as
    a broadcast matrix, never the sample."""
    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = (ids % sample_mod) == 0 if sample_mod > 1 else np.ones(
            len(ids), bool)
        return batch.select([id_col, vec_col]).filter(pa.array(keep))

    sample = ds.map_batches(pick, batch_format="pyarrow") \
        .sort(id_col).limit(max(n_centroids * 200, n_centroids)) \
        .to_pandas()
    vecs = _unit(np.asarray(sample[vec_col].tolist(), dtype=np.float64))
    cents = vecs[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cents[c] = vecs[m].mean(axis=0)
        cents = _unit(cents)
    return cents


def assign_centroid_stage(centroids_ref, vec_col: str = "embedding",
                          out_col: str = "ivf_cell"):
    """map_batches fn: argmax-cosine centroid id per row. At cluster
    scale, write the corpus hive-partitioned by this column
    (``partition_cols=['ivf_cell']``) so probes prune at the read —
    the per-batch filter below is the single-pass variant."""
    def assign(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        cents = _get_broadcast(centroids_ref)
        sims = _unit(_as_matrix(batch[vec_col])) @ cents.T
        return batch.append_column(
            out_col, pa.array(np.argmax(sims, axis=1).astype(np.int32)))

    return assign


def ivf_topk(ds: ray.data.Dataset, query_vec, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_mod: int = 1) -> ray.data.Dataset:
    """IVF approximate top-k: train a small codebook, scan only the
    ``nprobe`` cells nearest the query. ``nprobe=n_centroids`` degrades
    to exact brute force (useful as a correctness oracle)."""
    cents = ivf_centroids(ds, n_centroids, vec_col, id_col, sample_mod)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe_cells = np.argsort(-(cents @ q))[:nprobe].astype(np.int32)
    c_ref = ray.put(cents)
    probe_set = np.sort(probe_cells)

    ds = ds.map_batches(assign_centroid_stage(c_ref, vec_col),
                        batch_format="pyarrow")

    def in_cells(batch: pa.Table) -> pa.Table:
        cell = batch["ivf_cell"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(cell, probe_set)))

    pruned = ds.map_batches(in_cells, batch_format="pyarrow")
    return cosine_topk(pruned, query_vec, k=k, vec_col=vec_col,
                       id_col=id_col)


def ivf_build_index(ds: ray.data.Dataset, out_dir: str,
                    n_centroids: int = 16, vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    sample_mod: int = 1) -> np.ndarray:
    """Materialize the IVF index as hive-partitioned Parquet: one
    ``ivf_cell=<c>/`` directory per codebook cell plus the codebook
    itself. This is the prune-at-the-read scale path — a search then
    touches only ``nprobe`` directories instead of scanning the corpus
    (and the layout is resumable / appendable per cell)."""
    import os

    cents = ivf_centroids(ds, n_centroids, vec_col, id_col, sample_mod)
    c_ref = ray.put(cents)
    ds = ds.map_batches(assign_centroid_stage(c_ref, vec_col),
                        batch_format="pyarrow", batch_size=None)
    ds.write_parquet(out_dir, partition_cols=["ivf_cell"])
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    return cents


def ivf_search_index(index_dir: str, query_vec, k: int = 10,
                     nprobe: int = 4, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> ray.data.Dataset:
    """Search an ``ivf_build_index`` layout reading ONLY the nprobe
    nearest cells' partitions (row groups of other cells never leave
    storage)."""
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    cells = np.argsort(-(cents @ q))[:nprobe]
    import glob as _glob

    # expand each probed cell dir to its files (read_parquet accepts a
    # single dir but not a list of dirs)
    paths = []
    for c in cells:
        paths.extend(sorted(_glob.glob(
            os.path.join(index_dir, "ivf_cell=%d" % c, "*.parquet"))))
    if not paths:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({id_col: [], "cosine": []}))
    pruned = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return cosine_topk(pruned, query_vec, k=k, vec_col=vec_col,
                       id_col=id_col)


def pairwise_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int,
                  vec_col: str = "embedding", id_col: str = "vec_id"
                  ) -> ray.data.Dataset:
    """Batched multi-query exact top-k: (n_queries, dim) broadcast
    matrix, one matmul per corpus batch, per-query heaps merged by a
    final per-query sort+limit via groupby."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)

    def local(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        qmat = _get_broadcast(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = _unit(_as_matrix(batch[vec_col])) @ qmat.T  # (n, q)
        take = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(qmat.shape[0]):
            order = np.lexsort((ids, -sims[:, qi]))[:take]
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(sims[order, qi])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_s))})

    cands = ds.map_batches(local, batch_format="pyarrow")

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True])
        return g.head(k)

    return cands.groupby("query_id").map_groups(per_query,
                                                batch_format="pandas")


def int8_topk(ds: ray.data.Dataset, query_vec, k: int = 10,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """Quantized retrieval: exact top-k over the int8-compressed corpus
    — the search half of ``quantize_batch`` (4x memory cut is what
    makes a 100-TB embedding corpus scannable; this op proves the
    quantized representation still ranks).

    Score is ALL-integer, so the ranking is reduction-order
    independent and exactly SQL-checkable:

        score = (sum_i q8_i * v8_i) * round(max_abs_v * 1e6)

    where q8/v8 are the symmetric int8 codes (quantize_batch
    semantics) and the second factor restores each corpus vector's
    per-vector scale in fixed-point micro units (the query's scale is
    a rank-invariant constant and omitted). Bounded: |dot| <= 127^2 *
    dim, times <= max_abs * 1e6 — far inside int64 for unit-norm-ish
    embeddings. Ties -> ascending id. Returns (id, qscore) best-first.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qm = float(np.abs(q).max()) if len(q) else 0.0
    t = q * (127.0 / (qm or 1.0))
    q8 = np.where(t >= 0, np.floor(t + 0.5),
                  np.ceil(t - 0.5)).astype(np.int64)
    q_ref = ray.put(q8)

    def local_topk(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        qv = _get_broadcast(q_ref)
        qb = quantize_batch(batch, vec_col=vec_col)
        ids = qb[id_col].to_numpy(zero_copy_only=False)
        col = qb["qvec"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if len(lens) and not (lens == len(qv)).all():
            raise ValueError("int8_topk requires fixed-dim vectors "
                             "matching the query dimension")
        mat = col.values.to_numpy(zero_copy_only=False) \
            .astype(np.int64).reshape(len(ids), -1)
        # half-away rounding (max_abs >= 0), matching SQL floor(x+0.5)
        scale = np.floor(
            qb["max_abs"].to_numpy(zero_copy_only=False) * 1e6 + 0.5) \
            .astype(np.int64)
        score = (mat @ qv) * scale
        take = min(k, len(ids))
        order = np.lexsort((ids, -score))[:take]
        return pa.table({id_col: pa.array(ids[order]),
                         "qscore": pa.array(score[order], pa.int64())})

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    return (cands.sort(["qscore", id_col], descending=[True, False])
            .limit(k))


def ivf_add(index_dir: str, ds: ray.data.Dataset,
            vec_col: str = "embedding",
            id_col: str = "vec_id") -> np.ndarray:
    """Append new vectors to an existing ``ivf_build_index`` layout —
    the vector twin of the inverted-index upsert
    (stages/invindex.merge_index): the increment is assigned under the
    FROZEN codebook (broadcast once) so cell boundaries — and
    therefore probe pruning — stay valid, and its rows land as new
    Parquet files inside the matching ``ivf_cell=`` partitions (the
    layout is append-only per cell; existing files are never
    rewritten). Search needs no changes: a probe reads old + new files
    of its cells alike. Periodic re-training (drifted centroids) is a
    rebuild, deliberately out of scope here.
    """
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    c_ref = ray.put(cents)
    ds = ds.map_batches(assign_centroid_stage(c_ref, vec_col),
                        batch_format="pyarrow", batch_size=None)
    ds.write_parquet(index_dir, partition_cols=["ivf_cell"])
    return cents


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011) — the embedding-compression scale path
# past int8: dim 64 floats (256 B) become m=4 uint8 codes (4 B), a 64x
# cut that makes a 100-TB embedding corpus scannable from the codes
# alone. Everything here is FIXED-POINT INTEGER (vectors quantize by
# floor(x*scale + 0.5) once, distances are exact int64 sums), so codes
# and ADC scores are reduction-order independent and the DuckDB oracle
# (inner-product identity over integer-valued doubles) is bit-exact —
# the ann_int8 convention extended to codebooks.
# ---------------------------------------------------------------------------

def _int_fixed(mat: np.ndarray, scale: int) -> np.ndarray:
    """floor(x*scale + 0.5) — the repo's deterministic half-up rule
    (np.round would bank; DuckDB floor(+0.5) matches this exactly)."""
    return np.floor(mat * scale + 0.5).astype(np.int64)


def pq_codebook(ds: ray.data.Dataset, *, k: int = 8, seed: int = 0,
                scale: int = 1000, vec_col: str = "embedding",
                id_col: str = "vec_id") -> np.ndarray:
    """Integer PQ codebook: the k seeded-init rows (kmeans_init — the
    k smallest (seeded-FNV(id), id), the SAME deterministic rule the
    kmeans oracle pins) quantized to fixed-point. Shape (k, dim)
    int64; subspace s uses columns [s*sub_dim, (s+1)*sub_dim)."""
    from .cluster import kmeans_init

    rows = kmeans_init(ds, vec_col=vec_col, id_col=id_col, k=k,
                       seed=seed)
    return _int_fixed(np.asarray(rows, np.float64), scale)


def _pq_codes(mat_int: np.ndarray, cb: np.ndarray, m: int) -> np.ndarray:
    """(n, dim) int64 -> (n, m) codes: per-subspace squared-L2 argmin
    (ties -> lowest code, numpy argmin's rule == the oracle's
    ``ORDER BY dist, j``)."""
    n, dim = mat_int.shape
    sub = dim // m
    codes = np.empty((n, m), np.int64)
    for s in range(m):
        a = mat_int[:, s * sub:(s + 1) * sub]
        c = cb[:, s * sub:(s + 1) * sub]
        d = ((a[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
    return codes


def pq_encode(ds: ray.data.Dataset, codebook: np.ndarray, *,
              m: int = 4, scale: int = 1000,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """Corpus -> PQ codes in long form ``(id, s, code)`` (one row per
    vector per subspace — the layout a codes table shuffles/joins by).
    Stateless vectorized pass; the codebook broadcasts once."""
    cb_ref = ray.put(np.ascontiguousarray(codebook))

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _int_fixed(_as_matrix(batch[vec_col]), scale)
        codes = _pq_codes(mat, cb, m)
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, m)),
            "s": pa.array(np.tile(np.arange(m, dtype=np.int64), n)),
            "code": pa.array(codes.reshape(-1)),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          batch_size=None)


def pq_search_adc(ds: ray.data.Dataset, codebook: np.ndarray,
                  query_vec, *, m: int = 4, k: int = 10,
                  scale: int = 1000, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> ray.data.Dataset:
    """Asymmetric-distance top-k over PQ codes: the query stays exact
    (fixed-point), each corpus vector is approximated by its codeword;
    score(v) = sum_s D[s][code_s(v)] with D the per-subspace integer
    distance table — m int64 adds per vector, reduction-order free.
    Per-batch local top-k prune, tiny global sort. Returns
    ``(id, score)`` best-first (ties -> ascending id)."""
    q = _int_fixed(np.asarray(query_vec, np.float64)[None, :], scale)[0]
    dim = codebook.shape[1]
    sub = dim // m
    dtab = np.empty((m, codebook.shape[0]), np.int64)
    for s in range(m):
        qs = q[s * sub:(s + 1) * sub]
        cs = codebook[:, s * sub:(s + 1) * sub]
        dtab[s] = ((cs - qs[None, :]) ** 2).sum(axis=1)
    cb_ref = ray.put((np.ascontiguousarray(codebook),
                      np.ascontiguousarray(dtab)))

    def local(batch: pa.Table) -> pa.Table:
        cb, dt = ray.get(cb_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _int_fixed(_as_matrix(batch[vec_col]), scale)
        codes = _pq_codes(mat, cb, m)
        score = dt[np.arange(m)[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, score))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(score[order])})

    loc = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    return loc.sort(["score", id_col]).limit(k)


def ivfpq_build(ds: ray.data.Dataset, out_dir: str, *,
                n_cells: int = 4, m: int = 4, k: int = 8,
                scale: int = 1000, cell_seed: int = 1, pq_seed: int = 0,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ index (the FAISS-standard layout): vectors route to one
    of ``n_cells`` coarse cells (fixed-point integer nearest-centroid,
    the kmeans seeded-init rule with its own seed) and store ONLY
    their PQ codes, hive-partitioned ``cell=<c>/`` — a search touches
    nprobe directories of 4-byte codes instead of the float corpus.
    Returns (coarse_centroids_int, pq_codebook_int); both also persist
    beside the partitions for ``ivfpq_search``."""
    import os

    coarse = pq_codebook(ds, k=n_cells, seed=cell_seed, scale=scale,
                         vec_col=vec_col, id_col=id_col)
    cb = pq_codebook(ds, k=k, seed=pq_seed, scale=scale,
                     vec_col=vec_col, id_col=id_col)
    co_ref = ray.put((np.ascontiguousarray(coarse),
                      np.ascontiguousarray(cb)))

    def encode(batch: pa.Table) -> pa.Table:
        co, codebook = ray.get(co_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _int_fixed(_as_matrix(batch[vec_col]), scale)
        d = ((mat[:, None, :] - co[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1).astype(np.int64)
        codes = _pq_codes(mat, codebook, m)
        cols = {id_col: pa.array(ids), "cell": pa.array(cell)}
        for s in range(m):
            cols["code_%d" % s] = pa.array(codes[:, s])
        return pa.table(cols)

    ds.map_batches(encode, batch_format="pyarrow",
                   batch_size=None).write_parquet(
        out_dir, partition_cols=["cell"])
    np.save(os.path.join(out_dir, "coarse.npy"), coarse)
    np.save(os.path.join(out_dir, "pq_codebook.npy"), cb)
    return coarse, cb


def ivfpq_search(index_dir: str, query_vec, *, m: int = 4,
                 k: int = 10, nprobe: int = 2, scale: int = 1000,
                 id_col: str = "vec_id") -> ray.data.Dataset:
    """Search an ``ivfpq_build`` layout: pick the ``nprobe`` coarse
    cells nearest the query (integer metric), read ONLY those cells'
    code partitions (prune-at-read — float vectors never load), and
    ADC-score the codes. With ``nprobe = n_cells`` the routing cannot
    drop any candidate, so the result provably equals ``pq_search_adc``
    over the whole corpus — the exact-twin oracle pattern."""
    import glob
    import os

    coarse = np.load(os.path.join(index_dir, "coarse.npy"))
    cb = np.load(os.path.join(index_dir, "pq_codebook.npy"))
    q = _int_fixed(np.asarray(query_vec, np.float64)[None, :], scale)[0]
    cd = ((coarse - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(cd)), cd))
    probe = sorted(int(c) for c in order[:nprobe])

    dim = cb.shape[1]
    sub = dim // m
    dtab = np.empty((m, cb.shape[0]), np.int64)
    for s in range(m):
        qs = q[s * sub:(s + 1) * sub]
        cs = cb[:, s * sub:(s + 1) * sub]
        dtab[s] = ((cs - qs[None, :]) ** 2).sum(axis=1)
    dt_ref = ray.put(np.ascontiguousarray(dtab))

    paths = [p for c in probe
             for p in glob.glob(os.path.join(index_dir,
                                             "cell=%d" % c, "*.parquet"))]
    code_cols = ["code_%d" % s for s in range(m)]
    ds = ray.data.read_parquet(paths, columns=[id_col] + code_cols)

    def score(batch: pa.Table) -> pa.Table:
        dt = ray.get(dt_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = np.stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
             for c in code_cols], axis=1)
        sc = dt[np.arange(m)[None, :], codes].sum(axis=1)
        o = np.lexsort((ids, sc))[:k]
        return pa.table({id_col: pa.array(ids[o]),
                         "score": pa.array(sc[o])})

    loc = ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    return loc.sort(["score", id_col]).limit(k)


def signed_projection_batch(batch: pa.Table, *, dim_out: int = 16,
                            seed: int = 7, vec_col: str = "qvec",
                            id_col: str = "vec_id") -> pa.Table:
    """Signed random projection (Achlioptas 2001's database-friendly
    Johnson-Lindenstrauss variant; also the hyperplane kernel behind
    SimHash for embeddings, Charikar 2002): project each int8-quantized
    vector onto ``dim_out`` fixed ±1 hyperplanes — the 4-16x cheaper
    sketch an ANN prefilter or near-dup pass scans INSTEAD of the full
    embedding. All-integer (|sum| <= dim_in * 127, int32-safe), so the
    result is bit-stable and SQL-oracle-checkable; the ±1 matrix comes
    from the fixed seed and is regenerated per worker (bytes never
    ship). Requires fixed-dimension input; emits one
    ``(id, dim_idx, pval)`` row per output dimension."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    if offsets[0] != 0 or offsets[-1] != len(vals):
        vals = vals[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    lengths = np.diff(offsets)
    sch = pa.schema([(id_col, pa.int64()), ("dim_idx", pa.int64()),
                     ("pval", pa.int64())])
    if batch.num_rows == 0:
        return sch.empty_table()
    dim_in = int(lengths[0])
    if not (lengths == dim_in).all():
        raise ValueError("signed_projection: ragged embedding column "
                         "(fixed dimension required)")
    signs = (np.random.RandomState(seed)
             .randint(0, 2, size=(dim_in, dim_out))
             .astype(np.int32) * 2 - 1)
    q = vals.astype(np.int32).reshape(-1, dim_in)
    proj = q @ signs                       # int32: |sum| <= 127*dim_in
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        id_col: pa.array(np.repeat(ids, dim_out), pa.int64()),
        "dim_idx": pa.array(np.tile(np.arange(dim_out, dtype=np.int64),
                                    len(ids)), pa.int64()),
        "pval": pa.array(proj.reshape(-1).astype(np.int64), pa.int64()),
    })


def embedding_outliers(ds: ray.data.Dataset, *, k: int = 20,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> ray.data.Dataset:
    """Exact top-``k`` embedding outliers: the vectors FARTHEST from
    the corpus centroid — the standard first-pass triage for corrupt
    encodes, OCR junk and off-distribution documents in an embedding
    corpus. All-integer and scale-exact: over the int8-quantized
    vectors, ``d2_i = Σ_j (N·q_ij − S_j)²`` is the squared distance
    to the centroid scaled by N² (S_j = per-dimension sums, N = row
    count — 65 driver scalars from per-block partials). ``N·127``
    beyond ~3·10⁸ rows would overflow the int64 square — the stage
    raises loudly there (shard the corpus or mean-center in chunks).

    Dataflow: one partial-sums pass, one scoring pass with per-block
    top-k pruning, one tiny final merge. Returns ``(rank, id, d2)``
    with ties broken by id."""
    if k < 1:
        raise ValueError("k must be >= 1")

    qds = ds.map_batches(quantize_batch, batch_format="pyarrow",
                         batch_size=None).materialize()

    def part_sums(batch: pa.Table) -> pa.Table:
        col = batch["qvec"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        if offsets[0] != 0 or offsets[-1] != len(vals):
            vals = vals[offsets[0]:offsets[-1]]
            offsets = offsets - offsets[0]
        lengths = np.diff(offsets)
        if batch.num_rows == 0 or len(vals) == 0:
            return pa.table({"dim_idx": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        dim = int(lengths[0])
        if not (lengths == dim).all():
            raise ValueError("embedding_outliers: ragged embeddings")
        s = vals.astype(np.int64).reshape(-1, dim).sum(axis=0)
        return pa.table({
            "dim_idx": pa.array(np.arange(dim, dtype=np.int64)),
            "s": pa.array(s, pa.int64()),
            "n": pa.array(np.full(dim, batch.num_rows, np.int64))})

    parts = qds.map_batches(part_sums, batch_format="pyarrow",
                            batch_size=None).take_all()
    if not parts:
        return ray.data.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64())}))
    dim = max(r["dim_idx"] for r in parts) + 1
    S = np.zeros(dim, np.int64)
    n_total = 0
    for r in parts:
        S[r["dim_idx"]] += r["s"]
        if r["dim_idx"] == 0:
            n_total += r["n"]
    if n_total * 127 > 3_000_000_000:
        raise ValueError("embedding_outliers: N*127 overflows the "
                         "int64 square at %d rows" % n_total)

    def score(batch: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("d2", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        col = batch["qvec"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        if offsets[0] != 0 or offsets[-1] != len(vals):
            vals = vals[offsets[0]:offsets[-1]]
            offsets = offsets - offsets[0]
        q = vals.astype(np.int64).reshape(-1, dim)
        diff = n_total * q - S[None, :]
        d2 = (diff * diff).sum(axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # per-block top-k prune (d2 desc, id asc)
        order = np.lexsort((ids, -d2))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "d2": pa.array(d2[order], pa.int64())})

    pruned = qds.map_batches(score, batch_format="pyarrow",
                             batch_size=None).take_all()
    rows = sorted(((-r["d2"], r[id_col]) for r in pruned))[:k]
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
        id_col: pa.array([r[1] for r in rows], pa.int64()),
        "d2": pa.array([-r[0] for r in rows], pa.int64())}))
