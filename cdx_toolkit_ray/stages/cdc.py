"""Content-defined chunking (Gear hash, FastCDC family).

Fixed n-gram fingerprints (stages/spans.py) break when one byte is
inserted: every downstream shingle shifts. Content-DEFINED boundaries
(Muthitacharoen et al., "A Low-Bandwidth Network File System", SOSP
2001; Xia et al., "FastCDC", ATC 2016) cut where a rolling hash of
the LOCAL window hits a mask, so an edit only perturbs the chunks it
touches — the storage-dedup primitive that finds shared byte runs
across near-identical documents (mirrors, templated pages, doc
revisions).

This implementation is the oracle-checkable core: a W-byte gear
window (h_j = sum over s<W of gear[b_{j-s}] << s, mod 2^64 — the
shift-out is implicit in the overflow) with a boundary wherever
``h_j % 2^k == 0``. Boundary decisions are POSITION-LOCAL (no
min/max-size clamps), which is what makes the DuckDB oracle exact;
production FastCDC adds min/max chunk bounds, a sequential-per-doc
refinement over these candidate cuts.

Scale shape: the whole corpus's windowed hash is ~W vectorized
masked adds over one flat byte buffer (per-doc window reset via a
start mask, no per-doc Python); chunk rows are a zero-shuffle
flat-map. Cross-doc shared-chunk detection is then one chunk-hash
keyed aggregation of the narrow (hash, doc) stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..canon import hash64_batch
from .dedup import _mix64

#: gear table: splitmix64 finalizer of (byte value + 1) — 256 seeded
#: constants both sides derive identically (+1 keeps byte 0 off the
#: finalizer's 0 -> 0 fixed point).
GEAR = _mix64(np.arange(256, dtype=np.uint64) + np.uint64(1))


def cdc_chunk_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 16,
                    mask_bits: int = 6) -> pa.Table:
    """One row per content-defined chunk:
    ``(doc_id, chunk_idx, start, length, chunk_hash)`` with
    ``chunk_hash`` = FNV-1a of the chunk text (canon.hash64, int64
    via >> 1). Texts normalize to printable ASCII first (lowercase,
    strip everything outside 0x20-0x7E) so byte and character
    positions coincide on both sides of the oracle."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    sch = pa.schema([("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                     ("start", pa.int64()), ("length", pa.int64()),
                     ("chunk_hash", pa.int64())])
    if batch.num_rows == 0:
        return sch.empty_table()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    clean = (pl.from_arrow(batch[text_col].combine_chunks()
                           .cast(pa.string()))
             .fill_null("").str.to_lowercase()
             .str.replace_all(r"[^ -~]", "").to_list())

    lens = np.array([len(t) for t in clean], dtype=np.int64)
    keep = lens > 0
    if not keep.any():
        return sch.empty_table()
    texts = [t for t, k in zip(clean, keep.tolist()) if k]
    ids_k = ids[keep]
    lens_k = lens[keep]

    flat = np.frombuffer("".join(texts).encode("ascii"), np.uint8)
    starts = np.r_[0, np.cumsum(lens_k)[:-1]]
    doc_start = np.repeat(starts, lens_k)
    pos = np.arange(len(flat), dtype=np.int64)

    # windowed gear hash: W masked shifted adds over the flat buffer
    g = GEAR[flat]
    h = np.zeros(len(flat), np.uint64)
    for s in range(window):
        src = pos - s
        ok = src >= doc_start
        contrib = np.where(ok, g[np.maximum(src, 0)], np.uint64(0))
        h += contrib << np.uint64(s)
    mask = np.uint64((1 << mask_bits) - 1)
    is_cut = (h & mask) == 0

    # chunk assembly, fully vectorized: a chunk starts at every doc
    # start and after every in-doc cut; chunks tile the flat buffer
    # contiguously, so the chunk STRINGS build as one Arrow
    # StringArray straight from (offsets, flat bytes) — no per-doc
    # loop, no Python slices
    prev_cut = np.zeros(len(flat), bool)
    prev_cut[1:] = is_cut[:-1]
    start_flag = (pos == doc_start) | (prev_cut & (pos - 1 >= doc_start))
    S = np.flatnonzero(start_flag)
    offsets = np.r_[S, len(flat)].astype(np.int32)
    chunk_strs = pa.StringArray.from_buffers(
        len(S), pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(flat.tobytes()))
    doc_of = np.searchsorted(starts, S, side="right") - 1
    first_of_doc = np.r_[0, np.flatnonzero(doc_of[1:] != doc_of[:-1]) + 1]
    chunk_idx = np.arange(len(S)) - first_of_doc[
        np.cumsum(np.r_[False, doc_of[1:] != doc_of[:-1]])]
    ch = (hash64_batch(chunk_strs) >> np.uint64(1)).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(ids_k[doc_of]),
        "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
        "start": pa.array((S - starts[doc_of]).astype(np.int64)),
        "length": pa.array((offsets[1:] - offsets[:-1])
                           .astype(np.int64)),
        "chunk_hash": pa.array(ch),
    })


def cdc_chunks(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    """Dataset wrapper over :func:`cdc_chunk_batch`."""
    return ds.map_batches(lambda b: cdc_chunk_batch(b, **kw),
                          batch_format="pyarrow", batch_size=None)


def cdc_shared_chunks(ds: ray.data.Dataset, *, min_docs: int = 2,
                      num_buckets: int = 32, **kw) -> ray.data.Dataset:
    """Cross-document shared-chunk detection: chunks -> one row per
    chunk content appearing in >= ``min_docs`` DISTINCT docs:
    ``(chunk_hash, n_docs, n_occurrences, length)``. Per-block fold to
    distinct (hash, doc) partials BEFORE the shuffle, one hash-bucket
    exchange — chunk text never moves."""
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        chunks = cdc_chunk_batch(batch, **kw)
        sch = pa.schema([("chunk_hash", pa.int64()),
                         ("doc_id", pa.int64()), ("n", pa.int64()),
                         ("length", pa.int64()), ("_cb", pa.int64())])
        if chunks.num_rows == 0:
            return sch.empty_table()
        h = chunks["chunk_hash"].to_numpy(zero_copy_only=False)
        d = chunks["doc_id"].to_numpy(zero_copy_only=False)
        ln = chunks["length"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        hs, ds_, ls = h[order], d[order], ln[order]
        new = np.ones(len(hs), bool)
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        st = np.flatnonzero(new)
        n = np.diff(np.r_[st, len(hs)])
        return pa.table({
            "chunk_hash": pa.array(hs[st]),
            "doc_id": pa.array(ds_[st]),
            "n": pa.array(n.astype(np.int64)),
            "length": pa.array(ls[st]),
            "_cb": pa.array((hs[st].astype(np.uint64) % nbu)
                            .astype(np.int64)),
        })

    def merge(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("chunk_hash", pa.int64()),
                         ("n_docs", pa.int64()),
                         ("n_occurrences", pa.int64()),
                         ("length", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        h = tbl["chunk_hash"].to_numpy(zero_copy_only=False)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        ln = tbl["length"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        hs, ds_, ns, ls = h[order], d[order], n[order], ln[order]
        # fold cross-block (hash, doc) dupes, then docs per hash
        pnew = np.ones(len(hs), bool)
        pnew[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        ps = np.flatnonzero(pnew)
        ph, pn = hs[ps], np.add.reduceat(ns, ps)
        pl_ = ls[ps]
        hnew = np.ones(len(ph), bool)
        hnew[1:] = ph[1:] != ph[:-1]
        ks = np.flatnonzero(hnew)
        n_docs = np.diff(np.r_[ks, len(ph)])
        n_occ = np.add.reduceat(pn, ks)
        sel = n_docs >= min_docs
        return pa.table({
            "chunk_hash": pa.array(ph[ks][sel]),
            "n_docs": pa.array(n_docs[sel].astype(np.int64)),
            "n_occurrences": pa.array(n_occ[sel].astype(np.int64)),
            "length": pa.array(pl_[ks][sel]),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return hash_bucket_apply(partials, "_cb", merge,
                             num_buckets=num_buckets)


def cdc_neardup_pairs(ds: ray.data.Dataset, *, num: int = 1,
                      den: int = 4, num_buckets: int = 32,
                      max_docs_per_chunk: int = 64,
                      **kw) -> ray.data.Dataset:
    """Document near-dup candidates by CDC chunk-set Jaccard: pairs
    sharing >= ``num/den`` of their distinct chunk contents —
    byte-granular near-dup that survives insertions MinHash shingles
    blur (an edit shifts every shingle; CDC chunks realign). Output:
    ``(doc_a, doc_b, n_shared, n_a, n_b, is_dup)`` per candidate pair,
    is_dup by EXACT integer cross-multiply
    (den*shared >= num*(n_a + n_b - shared)).

    Dataflow: distinct (chunk, doc) rows per block ->
    :func:`~.dedup.shared_key_pairs_with_sizes`'s three-exchange plan:
    a chunk-keyed exchange emits the pairs of each chunk's doc group
    (pairwise per SHARED chunk — bounded by ``max_docs_per_chunk``; a
    chunk shared by more docs than that is boilerplate, dropped with a
    warning, the LSH-band guard) and per-doc partial set sizes, then
    doc_a- and doc_b-keyed exchanges count shared chunks and attach
    both set sizes from bucket-co-located size rows — no driver-side
    per-doc structure at any point.
    """
    nbu = np.uint64(num_buckets)

    def chunk_doc(batch: pa.Table) -> pa.Table:
        chunks = cdc_chunk_batch(batch, **kw)
        sch = pa.schema([("ch", pa.int64()), ("doc", pa.int64()),
                         ("_b", pa.int64())])
        if chunks.num_rows == 0:
            return sch.empty_table()
        h = chunks["chunk_hash"].to_numpy(zero_copy_only=False)
        d = chunks["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        hs, ds_ = h[order], d[order]
        new = np.ones(len(hs), bool)
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        st = np.flatnonzero(new)
        return pa.table({
            "ch": pa.array(hs[st]),
            "doc": pa.array(ds_[st]),
            "_b": pa.array((hs[st].astype(np.uint64) % nbu)
                           .astype(np.int64)),
        })

    cd = ds.map_batches(chunk_doc, batch_format="pyarrow",
                        batch_size=None)
    from .dedup import shared_key_pairs_with_sizes

    return shared_key_pairs_with_sizes(
        cd, key_col="ch", bucket_col="_b", num_buckets=num_buckets,
        min_shared=1, max_docs_per_key=max_docs_per_chunk,
        warn_label="cdc_neardup_pairs", flag_name="is_dup",
        flag_fn=lambda shared, na, nb:
            den * shared >= num * (na + nb - shared))
