"""Unigram language-model quality scoring (perplexity proxy).

The CCNet-style corpus-quality operator: score every document by the
mean negative log-likelihood of its tokens under the corpus's own
unigram distribution — boilerplate and natural prose score low
(frequent tokens), gibberish and rare-token soup score high. Real
pipelines use a KenLM n-gram model; the unigram variant keeps the
exact same dataflow (train token statistics over the corpus, broadcast
nothing, score every doc) while staying deterministic and
SQL-checkable.

Scale shape (nothing lands on the driver, no broadcast of the vocab):
1. one streaming pass computes the corpus token total ``T`` (a single
   scalar via a Sum aggregate over per-batch partial counts);
2. a per-batch polars kernel emits distinct ``(doc, word, tf)``
   triples tagged ``wb = hash64(word) % n_buckets``;
3. ``groupby(wb)`` co-locates each word's rows, so the word's corpus
   count is computable INSIDE the bucket (sum of its tf rows — the
   same trick as textstats.tfidf_topk); each (doc, word) term is
   quantized to an integer micro-score ``floor(tf * ln(T / cnt) * 1e6
   + 0.5)`` and pre-summed per doc within the bucket, so at most
   ``docs x buckets`` partial rows enter the second shuffle;
4. ``groupby(doc)`` Sum-merges the partials; the per-token mean is an
   INTEGER division, so the result is bit-stable regardless of how
   partials were bucketed.

The integer quantization (micro-nats) is what lets the DuckDB oracle
value-hash the output: float nll sums would differ in the last ulp
between summation orders; int64 term values cannot.

Reference role: beyond-reference training-data operator (the
reference, cdx_toolkit, streams captures and has no content-quality
surface; its closest analogue is the status filter,
cdx_toolkit/filters.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def unigram_lm_score(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id", n_buckets: int = 32,
                     total_tokens: int | None = None) -> ray.data.Dataset:
    """Per-document unigram negative log-likelihood:
    ``(doc_id, n_tok, nll_sum_1e6, nll_per_tok_1e6)`` where each
    (doc, word) term is ``floor(tf * ln(T / cnt) * 1e6 + 0.5)`` (T =
    corpus token total, cnt = word's corpus count) and
    ``nll_per_tok_1e6 = nll_sum_1e6 // n_tok`` (integer mean in
    micro-nats per token). Lower = more typical of the corpus.
    """
    from ..canon import hash64_batch

    def triples(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        df = pl.DataFrame({
            id_col: pl.from_arrow(batch[id_col].combine_chunks()),
            "t": pl.from_arrow(batch[text_col].combine_chunks()),
        }).with_columns(w=pl.col("t").cast(pl.String).fill_null("")
                        .str.to_lowercase().str.extract_all(r"\w+")
                        ).drop("t")
        tf = (df.explode("w").drop_nulls("w")
                .group_by(id_col, "w").len())
        words = tf["w"].to_arrow()
        wb = (hash64_batch(words) % n_buckets).astype(np.int64)
        return pa.table({
            id_col: tf[id_col].to_arrow(),
            "word": words,
            "tf": tf["len"].cast(pl.Int64).to_arrow(),
            "wb": pa.array(wb),
        })

    t = ds.map_batches(triples, batch_format="pyarrow", batch_size=None)
    if total_tokens is None:
        # corpus token total: one light pass (regex count per batch, no
        # explode/groupby), one partial row per block, summed on the
        # driver — O(blocks) driver work (Dataset.aggregate(Sum) costs
        # a full shuffle round's fixed overhead for a single scalar;
        # measured ~15s vs <2s at sf0.1)
        def count_tokens(batch: pa.Table) -> pa.Table:
            import os

            os.environ.setdefault("POLARS_MAX_THREADS", "1")
            import polars as pl

            s = pl.Series(batch[text_col].combine_chunks()) \
                .cast(pl.String).fill_null("")
            n = s.str.count_matches(r"\w+").sum()
            return pa.table({"n": pa.array([int(n)], pa.int64())})

        parts = ds.map_batches(count_tokens, batch_format="pyarrow",
                               batch_size=None).take_all()
        total_tokens = sum(r["n"] for r in parts)
    t_f = float(total_tokens)

    # Both shuffles run on the direct task-graph exchange
    # (stages/exchange.hash_bucket_apply): the shuffled stream is tiny
    # (distinct triples, then docs x buckets partials), so the
    # executor groupby's sampling round + barriers dominate —
    # measured 18.2s for groupby(doc).aggregate(Sum,Sum) over 73k
    # partial rows / 5k docs vs <1s through the exchange.

    def score_bucket(tbl: pa.Table) -> pa.Table:
        g = tbl.to_pandas()
        codes, uniq = pd.factorize(g["word"], sort=False)
        tf = g["tf"].to_numpy(np.int64)
        cnt = np.bincount(codes, weights=tf, minlength=len(uniq))
        term = np.floor(tf * np.log(t_f / cnt[codes]) * 1e6
                        + 0.5).astype(np.int64)
        part = pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "nll_part": term, "tok_part": tf})
        out = part.groupby(id_col, sort=False, as_index=False).sum()
        out["db"] = (out[id_col].to_numpy(np.uint64)
                     % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_docs(tbl: pa.Table) -> pa.Table:
        g = tbl.to_pandas()
        m = (g.groupby(id_col, sort=False, as_index=False)
             [["nll_part", "tok_part"]].sum())
        nll = m["nll_part"].to_numpy(np.int64)
        ntok = m["tok_part"].to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(m[id_col]),
            "n_tok": pa.array(ntok),
            "nll_sum_1e6": pa.array(nll),
            "nll_per_tok_1e6": pa.array(nll // ntok),
        })

    from .exchange import hash_bucket_apply

    parts = hash_bucket_apply(t, "wb", score_bucket,
                              num_buckets=n_buckets)
    return hash_bucket_apply(parts, "db", merge_docs,
                             num_buckets=n_buckets)
