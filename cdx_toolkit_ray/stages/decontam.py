"""Benchmark decontamination: flag training documents that share
word-n-grams with a held-out evaluation set.

The standard pretraining hygiene pass (GPT-3 appendix C / PaLM style):
any training document containing an n-gram that also appears in an
evaluation benchmark is contaminated and must be dropped (or at least
counted) before training. At 100 TB the asymmetry is the whole design:
the TEST side is tiny (benchmarks are megabytes) while the TRAIN side
is the corpus — so the test-set n-gram index is the canonical
broadcast small side (``ray.put`` once, one cached ``ray.get`` per
worker), and scoring is a stateless ``map_batches`` over the training
stream with zero shuffles.

Gram convention and hashing are shared with the MinHash family
(stages/dedup.doc_gram_hashes: lowercase ``\\w+`` words, k-gram
windows, <k words -> single all-words gram, FNV-1a 64) so the DuckDB
oracle replicates both sides bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import doc_gram_hashes


def build_ngram_index(test_ds: ray.data.Dataset, text_col: str = "text",
                      shingle_k: int = 5) -> np.ndarray:
    """Sorted distinct gram hashes of the evaluation set.

    Per-block distinct runs distributed; only the deduped hash arrays
    land on the driver. Bounded by the TEST set's vocabulary — the
    small side by definition (a benchmark suite is MBs; if your "test
    set" is corpus-sized you are not decontaminating, you are
    deduplicating — use stages/dedup)."""

    def block_hashes(batch: pa.Table) -> pa.Table:
        _, h = doc_gram_hashes(batch[text_col], shingle_k)
        return pa.table({"h": np.unique(h)})

    rows = test_ds.map_batches(block_hashes, batch_format="pyarrow",
                               batch_size=None).take_all()
    if not rows:
        return np.array([], np.uint64)
    return np.unique(np.array([r["h"] for r in rows], np.uint64))


def make_decontam_stage(index_ref, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        min_hits: int = 1):
    """map_batches fn: append per-document contamination evidence.

    Adds ``n_grams`` (distinct grams), ``n_hits`` (distinct grams also
    in the test index; membership = searchsorted into the broadcast
    sorted array) and ``contaminated`` (int 0/1: n_hits >= min_hits).
    Never drops rows — corpus policy (drop vs weight vs audit) stays a
    downstream filter.
    """
    from ..pipelines.frontier import _get_broadcast

    def score(batch: pa.Table) -> pa.Table:
        index = _get_broadcast(index_ref)
        n = batch.num_rows
        du, hu = doc_gram_hashes(batch[text_col], shingle_k)
        n_grams = np.zeros(n, np.int64)
        n_hits = np.zeros(n, np.int64)
        if len(du):
            np.add.at(n_grams, du, 1)
            if len(index):
                pos = np.searchsorted(index, hu)
                pos[pos == len(index)] = 0
                hit = index[pos] == hu
                np.add.at(n_hits, du[hit], 1)
        batch = batch.append_column("n_grams", pa.array(n_grams))
        batch = batch.append_column("n_hits", pa.array(n_hits))
        return batch.append_column(
            "contaminated",
            pa.array((n_hits >= min_hits).astype(np.int64)))

    return score


def decontaminate(train_ds: ray.data.Dataset, test_ds: ray.data.Dataset,
                  *, text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 5,
                  min_hits: int = 1) -> ray.data.Dataset:
    """Score every training document against the evaluation set's
    n-gram index: train stream -> (… , n_grams, n_hits, contaminated).

    One driver-side index build over the tiny test side, then a pure
    streaming map over the corpus — no shuffle, no materialization of
    the training data."""
    index = build_ngram_index(test_ds, text_col, shingle_k)
    index_ref = ray.put(index)
    return train_ds.map_batches(
        make_decontam_stage(index_ref, text_col, id_col, shingle_k,
                            min_hits),
        batch_format="pyarrow", batch_size=None)
