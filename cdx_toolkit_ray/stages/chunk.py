"""Document chunking: split each document's token stream into
fixed-size overlapping windows (the sequence-windowing step of an LLM
training pipeline, upstream of packing/tokenization).

A chunk is a window of ``chunk_size`` words starting at every
``stride`` word offset (``stride < chunk_size`` yields overlap). Word
convention: ``\\w+`` on the RAW text (no lowercasing — chunk text must
round-trip the original tokens). Documents with zero words emit no
chunks (flat-map semantics: the output has its own row count).

At 100 TB this is a pure streaming ``map_batches`` with zero shuffles;
the output is strictly larger than the input (overlap factor
``chunk_size / stride``) so it must stay a flat_map-style transform
the executor can pipeline straight into the next stage — never a
driver-side explode.

Reference role: the reference has no chunker (it streams whole capture
records, cdx_toolkit/__init__.py:122-134); this is one of the
beyond-reference training-data operators (brief: "the operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def chunk_documents_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id", chunk_size: int = 64,
                          stride: int = 48) -> pa.Table:
    """One output row per (document, window-start): ``doc_id``,
    ``chunk_id`` (start // stride), ``chunk_start`` (word offset),
    ``n_tokens`` (window length, < chunk_size only for the tail) and
    ``chunk_text`` (space-joined window). Fully vectorized: polars
    ``int_ranges`` builds the start offsets, ``list.slice`` +
    ``list.join`` build the window text — no per-document Python."""
    import polars as pl

    df = pl.DataFrame({
        "doc_id": pl.from_arrow(batch[id_col].combine_chunks()),
        "t": pl.from_arrow(batch[text_col].combine_chunks()),
    }).with_columns(
        # cast first: an all-null Arrow block arrives Null-typed
        w=pl.col("t").cast(pl.String).fill_null("")
            .str.extract_all(r"\w+")).drop("t")
    df = df.filter(pl.col("w").list.len() > 0).with_columns(
        n=pl.col("w").list.len().cast(pl.Int64))
    df = df.with_columns(
        chunk_start=pl.int_ranges(0, pl.col("n"), stride,
                                  dtype=pl.Int64)).explode("chunk_start")
    if df.height == 0:
        # explicit schema: polars' list.slice degrades List(String) to
        # List(Null) on zero-height frames, breaking list.join
        id_type = batch.schema.field(id_col).type
        return pa.table({
            "doc_id": pa.array([], id_type),
            "chunk_id": pa.array([], pa.int64()),
            "chunk_start": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
    start = pl.col("chunk_start")
    out = df.select(
        "doc_id",
        chunk_id=(start // stride),
        chunk_start=start,
        n_tokens=pl.min_horizontal(pl.lit(chunk_size, pl.Int64),
                                   pl.col("n") - start),
        chunk_text=pl.col("w").list.slice(start, chunk_size)
                     .list.join(" "))
    return out.to_arrow()


def chunk_documents(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id", chunk_size: int = 64,
                    stride: int = 48) -> ray.data.Dataset:
    """Streaming chunker: documents -> chunk windows, zero shuffles."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    return ds.map_batches(
        lambda b: chunk_documents_batch(b, text_col, id_col,
                                        chunk_size, stride),
        batch_format="pyarrow", batch_size=None)


def pack_chunks(ds: ray.data.Dataset, token_col: str = "n_tokens",
                id_col: str = "doc_id", chunk_col: str = "chunk_id",
                seq_len: int = 256, n_shards: int = 8,
                seed: int = 0) -> ray.data.Dataset:
    """Concat-and-cut sequence packing: lay chunk token windows
    head-to-tail and cut every ``seq_len`` tokens — the assignment step
    that turns chunk windows into fixed-length training sequences
    (GPT-style packing; a straddling chunk belongs to the sequence
    where it STARTS, with ``seq_off`` recording the in-sequence start).

    Adds per row: ``shard`` (seeded hash of the doc id % n_shards),
    ``tok_off`` (token offset of this chunk within its shard's stream,
    in deterministic (skey, doc, chunk) order), ``seq_id``
    (tok_off // seq_len) and ``seq_off`` (tok_off % seq_len).

    Scale shape: packing needs an ordered prefix sum, which is
    sequential — so it runs independently per shard, one balanced
    ``groupby(shard)`` with a fully vectorized cumsum kernel inside.
    ``(shard, seq_id)`` is the global sequence key; any shard can be
    re-derived alone (deterministic seed -> resumable per shard).
    Size ``n_shards`` so one shard's chunk METADATA (ids + token
    counts, not text) fits a worker; at 100 TB that means thousands of
    shards, still one task each.
    """
    import pandas as pd

    from .sampling import _seeded_key

    def key_stage(batch: pa.Table) -> pa.Table:
        import numpy as np

        skey = _seeded_key(batch[id_col], seed)
        batch = batch.append_column("skey", pa.array(skey, pa.uint64()))
        return batch.append_column(
            "shard", pa.array((skey % n_shards).astype(np.int64)))

    def pack_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        g = g.sort_values(["skey", id_col, chunk_col],
                          kind="stable").copy()
        n = g[token_col].to_numpy(np.int64)
        off = np.cumsum(n) - n
        g["tok_off"] = off
        g["seq_id"] = off // seq_len
        g["seq_off"] = off % seq_len
        return g.drop(columns=["skey"])

    keyed = ds.map_batches(key_stage, batch_format="pyarrow",
                           batch_size=None)
    return keyed.groupby("shard").map_groups(pack_shard,
                                             batch_format="pandas")
