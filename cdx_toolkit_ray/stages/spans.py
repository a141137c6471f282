"""Cross-document repeated-span detection (training-data hygiene).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") show that substrings repeated across documents — boilerplate,
licenses, templated pages — are memorized disproportionately and
should be down-weighted or cut. This module implements the exact
n-gram form of that signal as a two-exchange Ray pipeline:

  per-doc distinct word-k-gram hashes  (map-side, vectorized; the same
  gram/FNV convention as the MinHash chain in stages/dedup.py, so the
  SQL oracle reuses the proven shingle CTE)
    -> exchange 1, bucketed by GRAM hash: each bucket holds every
       (doc, gram) row of its grams, so "how many distinct docs carry
       this gram" is a run-length pass; the bucket then folds its
       per-doc partial counts (total grams seen, repeated grams seen)
    -> exchange 2, bucketed by DOC id: sums the partials.

Scale contract: traffic is the (doc_id, hash) pair stream — two int64
columns, never the text — and the driver holds only object refs. Skew
is bounded: a gram shared by D docs contributes D rows to ONE bucket
(run-length, not pairwise), so even a corpus-wide boilerplate line
costs O(D), unlike candidate-pair emission which would cost O(D^2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import _mix64, doc_gram_hashes
from .exchange import hash_bucket_apply


def repeated_span_stats(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", span_k: int = 5,
                        min_docs: int = 2,
                        num_buckets: int = 32) -> ray.data.Dataset:
    """Per-document repeated-span counts.

    Returns ``(doc_id, n_spans, n_repeated_spans)`` where ``n_spans``
    is the document's DISTINCT word-``span_k``-gram count and
    ``n_repeated_spans`` how many of those grams occur in at least
    ``min_docs`` distinct documents corpus-wide. Documents with zero
    grams (empty/whitespace text) are absent — mirror with an INNER
    join downstream.

    Gram convention matches ``stages/dedup.doc_gram_hashes`` (>= k
    words -> one gram per window; 1..k-1 words -> the single all-words
    gram), so the DuckDB oracle composes from the same shingle CTE the
    MinHash oracle uses.
    """
    nb = np.uint64(num_buckets)

    def emit_pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        didx, hashes = doc_gram_hashes(batch[text_col], span_k)
        gb = (_mix64(hashes) % nb).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[didx], pa.int64()),
            "h": pa.array(hashes, pa.uint64()),
            "_gb": pa.array(gb),
        })

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        emit_pairs, batch_format="pyarrow", batch_size=None)

    def per_gram(tbl: pa.Table) -> pa.Table:
        # rows are globally distinct (doc, h): doc_gram_hashes dedups
        # within a doc and each doc lives in exactly one input batch
        h = tbl["h"].to_numpy(zero_copy_only=False)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, ds_ = h[order], d[order]
        new_run = np.ones(len(hs), bool)
        new_run[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        run_len = np.diff(np.append(starts, len(hs)))
        repeated = (run_len >= min_docs)[run_id]
        # fold this bucket's per-doc partials before it leaves the task
        dorder = np.argsort(ds_, kind="stable")
        dd = ds_[dorder]
        dnew = np.ones(len(dd), bool)
        dnew[1:] = dd[1:] != dd[:-1]
        dstarts = np.flatnonzero(dnew)
        if not len(dstarts):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_spans": pa.array([], pa.int64()),
                             "n_repeated_spans": pa.array([], pa.int64()),
                             "_db": pa.array([], pa.int64())})
        n_spans = np.diff(np.append(dstarts, len(dd)))
        n_rep = np.add.reduceat(
            repeated[dorder].astype(np.int64), dstarts)
        docs = dd[dstarts]
        db = (_mix64(docs.astype(np.uint64)) % nb).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "n_spans": pa.array(n_spans.astype(np.int64)),
            "n_repeated_spans": pa.array(n_rep),
            "_db": pa.array(db),
        })

    partials = hash_bucket_apply(pairs, "_gb", per_gram,
                                 num_buckets=num_buckets)

    def per_doc(tbl: pa.Table) -> pa.Table:
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        ns = tbl["n_spans"].to_numpy(zero_copy_only=False)
        nr = tbl["n_repeated_spans"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        dd = d[order]
        new_run = np.ones(len(dd), bool)
        new_run[1:] = dd[1:] != dd[:-1]
        starts = np.flatnonzero(new_run)
        if not len(starts):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_spans": pa.array([], pa.int64()),
                             "n_repeated_spans": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(dd[starts], pa.int64()),
            "n_spans": pa.array(np.add.reduceat(ns[order], starts)),
            "n_repeated_spans": pa.array(np.add.reduceat(nr[order], starts)),
        })

    return hash_bucket_apply(partials, "_db", per_doc,
                             num_buckets=num_buckets)
