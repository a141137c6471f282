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


def bigram_lm_score(score_ds: ray.data.Dataset,
                    train_ds: ray.data.Dataset, *,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 32) -> ray.data.Dataset:
    """Bigram LM with STUPID BACKOFF (Brants et al. 2007) — the
    held-out twin of :func:`unigram_lm_score`: train bigram/context
    counts on one corpus, score another, so unseen bigrams actually
    occur and the backoff path is exercised.

    Per scored bigram (w1, w2) with count ``tf`` in the doc:

        seen   (c2(w1,w2) > 0):  nll = ln(ctx(w1) / c2(w1,w2))
        unseen              :    nll = ln(2.5 * T / (c1(w2) + 1))

    where ``ctx(w1) = sum_w c2(w1, w)`` (the MLE denominator),
    ``c1`` the training unigram counts, ``T`` the training token
    total, and 2.5 = 1/alpha for the canonical alpha = 0.4 (exactly
    representable, so the double math is bit-identical in SQL). Terms
    quantize to integer micro-nats (``floor(tf * nll * 1e6 + 0.5)``)
    — summation-order-free, value-hashable.

    Output per doc with >= 1 bigram: ``(doc_id, n_big, n_backoff,
    nll_sum_1e6, nll_per_big_1e6)``.

    Dataflow — three narrow task-graph exchanges, text never moves:
    1. bigram rows (train: (w1,w2,tf); score: (doc,w1,w2,tf)) bucket
       by ``hash64(w1)``: c2 and ctx(w1) are computable inside the
       bucket; seen terms fold to per-doc partials there, unseen rows
       re-emit as (doc, w2, tf);
    2. unseen rows + train UNIGRAM rows bucket by ``hash64(w)``:
       c1(w2) is local, backoff terms fold to per-doc partials;
    3. all partials bucket by doc and sum.
    """
    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nbu = np.uint64(n_buckets)

    def _bigrams(batch: pa.Table, with_doc: bool) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        cols = {"t": pl.from_arrow(batch[text_col].combine_chunks())}
        if with_doc:
            cols[id_col] = pl.from_arrow(batch[id_col].combine_chunks())
        df = pl.DataFrame(cols).with_columns(
            w=pl.col("t").cast(pl.String).fill_null("")
            .str.to_lowercase().str.extract_all(r"\w+")).drop("t")
        df = df.with_columns(
            w1=pl.col("w").list.slice(0, pl.col("w").list.len() - 1),
            w2=pl.col("w").list.slice(1)).drop("w")
        keys = [id_col, "w1", "w2"] if with_doc else ["w1", "w2"]
        tf = (df.explode(["w1", "w2"]).drop_nulls("w1")
              .group_by(keys).len())
        out = {
            "doc": (tf[id_col].cast(pl.Int64).to_arrow() if with_doc
                    else pa.array(np.full(len(tf), -1, np.int64))),
            "w1": tf["w1"].to_arrow().cast(pa.string()),
            "w2": tf["w2"].to_arrow().cast(pa.string()),
            "tf": tf["len"].cast(pl.Int64).to_arrow(),
        }
        t = pa.table(out)
        b = (hash64_batch(t["w1"]) % nbu).astype(np.int64)
        return t.append_column("_b", pa.array(b)) \
                .append_column("kind", pa.array(
                    np.full(len(tf), 1 if with_doc else 0, np.int8)))

    train_b = train_ds.map_batches(
        lambda b: _bigrams(b, False), batch_format="pyarrow",
        batch_size=None)
    score_b = score_ds.map_batches(
        lambda b: _bigrams(b, True), batch_format="pyarrow",
        batch_size=None)

    # T = training token total (one light pass, O(blocks) driver rows)
    def count_tokens(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = pl.Series(batch[text_col].combine_chunks()) \
            .cast(pl.String).fill_null("")
        return pa.table({"n": pa.array(
            [int(s.str.count_matches(r"\w+").sum())], pa.int64())})

    total = sum(r["n"] for r in train_ds.map_batches(
        count_tokens, batch_format="pyarrow", batch_size=None)
        .take_all())
    t_f = float(total)

    def bucket_w1(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("kind", pa.int8()), ("doc", pa.int64()),
                         ("w", pa.string()), ("a", pa.int64()),
                         ("b", pa.int64()), ("c", pa.int64()),
                         ("_b2", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        g = tbl.to_pandas()
        tr = g[g["kind"] == 0]
        c2 = tr.groupby(["w1", "w2"])["tf"].sum()
        ctx = tr.groupby("w1")["tf"].sum()
        sc = g[g["kind"] == 1]
        if not len(sc):
            return sch.empty_table()
        # cross-block (doc, bigram) dupes fold here
        sc = sc.groupby(["doc", "w1", "w2"], as_index=False,
                        sort=False)["tf"].sum()
        if len(c2):
            c2v = c2.reindex(
                pd.MultiIndex.from_arrays([sc["w1"], sc["w2"]])
            ).to_numpy()
        else:
            c2v = np.full(len(sc), np.nan)
        seen = ~np.isnan(c2v)
        tf = sc["tf"].to_numpy(np.int64)
        parts = []
        if seen.any():
            cxv = ctx.reindex(sc["w1"][seen]).to_numpy(np.float64)
            term = np.floor(tf[seen] * np.log(cxv / c2v[seen]) * 1e6
                            + 0.5).astype(np.int64)
            p = pd.DataFrame({"doc": sc["doc"][seen].to_numpy(np.int64),
                              "a": term, "b": tf[seen]})
            p = p.groupby("doc", sort=False, as_index=False).sum()
            parts.append(pa.table({
                "kind": pa.array(np.full(len(p), 2, np.int8)),
                "doc": pa.array(p["doc"].to_numpy(np.int64)),
                "w": pa.array([""] * len(p), pa.string()),
                "a": pa.array(p["a"].to_numpy(np.int64)),
                "b": pa.array(p["b"].to_numpy(np.int64)),
                "c": pa.array(np.zeros(len(p), np.int64)),
                "_b2": pa.array((p["doc"].to_numpy(np.uint64)
                                 % nbu).astype(np.int64)),
            }))
        if (~seen).any():
            w2 = sc["w2"][~seen].to_numpy(object)
            parts.append(pa.table({
                "kind": pa.array(np.full((~seen).sum(), 3, np.int8)),
                "doc": pa.array(sc["doc"][~seen].to_numpy(np.int64)),
                "w": pa.array(w2.tolist(), pa.string()),
                "a": pa.array(tf[~seen]),
                "b": pa.array(np.zeros((~seen).sum(), np.int64)),
                "c": pa.array(np.zeros((~seen).sum(), np.int64)),
                "_b2": pa.array(
                    (hash64_batch(pa.array(w2.tolist(), pa.string()))
                     % nbu).astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    mixed = train_b.union(score_b)
    out1 = hash_bucket_apply(mixed, "_b", bucket_w1,
                             num_buckets=n_buckets)

    import pyarrow.compute as pc

    def split_kind(want: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], want))
        return f

    parts1 = out1.map_batches(split_kind(2), batch_format="pyarrow",
                              batch_size=None)
    backoff = out1.map_batches(split_kind(3), batch_format="pyarrow",
                               batch_size=None)

    # train unigram rows for c1(w)
    def unigrams(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = (pl.DataFrame({"t": pl.from_arrow(
            batch[text_col].combine_chunks())})
            .with_columns(w=pl.col("t").cast(pl.String).fill_null("")
                          .str.to_lowercase().str.extract_all(r"\w+"))
            .explode("w").drop_nulls("w").group_by("w").len())
        w = s["w"].to_arrow().cast(pa.string())
        n = len(s)
        return pa.table({
            "kind": pa.array(np.full(n, 4, np.int8)),
            "doc": pa.array(np.full(n, -1, np.int64)),
            "w": w,
            "a": s["len"].cast(pl.Int64).to_arrow(),
            "b": pa.array(np.zeros(n, np.int64)),
            "c": pa.array(np.zeros(n, np.int64)),
            "_b2": pa.array((hash64_batch(w) % nbu).astype(np.int64)),
        })

    uni = train_ds.map_batches(unigrams, batch_format="pyarrow",
                               batch_size=None)

    def bucket_w2(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("doc", pa.int64()), ("a", pa.int64()),
                         ("b", pa.int64()), ("c", pa.int64()),
                         ("_b2", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        g = tbl.to_pandas()
        c1 = g[g["kind"] == 4].groupby("w")["a"].sum()
        sc = g[g["kind"] == 3]
        if not len(sc):
            return sch.empty_table()
        sc = sc.groupby(["doc", "w"], as_index=False,
                        sort=False)["a"].sum()
        cv = (c1.reindex(sc["w"]).fillna(0).to_numpy(np.float64)
              if len(c1) else np.zeros(len(sc)))
        tf = sc["a"].to_numpy(np.int64)
        term = np.floor(tf * np.log(2.5 * t_f / (cv + 1.0)) * 1e6
                        + 0.5).astype(np.int64)
        p = pd.DataFrame({"doc": sc["doc"].to_numpy(np.int64),
                          "a": term, "b": tf, "c": tf})
        p = p.groupby("doc", sort=False, as_index=False).sum()
        return pa.table({
            "doc": pa.array(p["doc"].to_numpy(np.int64)),
            "a": pa.array(p["a"].to_numpy(np.int64)),
            "b": pa.array(p["b"].to_numpy(np.int64)),
            "c": pa.array(p["c"].to_numpy(np.int64)),
            "_b2": pa.array((p["doc"].to_numpy(np.uint64)
                             % nbu).astype(np.int64)),
        })

    parts2 = hash_bucket_apply(backoff.union(uni), "_b2", bucket_w2,
                               num_buckets=n_buckets)
    parts1n = parts1.map_batches(
        lambda b: b.select(["doc", "a", "b", "c", "_b2"]),
        batch_format="pyarrow", batch_size=None)

    def merge_docs(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("n_big", pa.int64()),
                         ("n_backoff", pa.int64()),
                         ("nll_sum_1e6", pa.int64()),
                         ("nll_per_big_1e6", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        g = tbl.to_pandas()
        m = g.groupby("doc", sort=False, as_index=False)[
            ["a", "b", "c"]].sum()
        nll = m["a"].to_numpy(np.int64)
        nbig = m["b"].to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(m["doc"].to_numpy(np.int64)),
            "n_big": pa.array(nbig),
            "n_backoff": pa.array(m["c"].to_numpy(np.int64)),
            "nll_sum_1e6": pa.array(nll),
            "nll_per_big_1e6": pa.array(nll // nbig),
        })

    return hash_bucket_apply(parts1n.union(parts2), "_b2", merge_docs,
                             num_buckets=n_buckets)


def pmi_topk(ds: ray.data.Dataset, *, text_col: str = "text",
             k: int = 50, min_count: int = 5,
             n_buckets: int = 32) -> ray.data.Dataset:
    """Corpus-level collocation mining: top-k word bigrams by
    pointwise mutual information (Church & Hanks 1990) — the
    statistical-phrase signal tokenizer training and stopword lists
    are built from.

        pmi_1e6 = floor(ln(c2 * T / (c1(w1) * c1(w2))) * 1e6 + 0.5)

    over bigrams with ``c2 >= min_count``; ties break on the bigram
    string, so the top-k is fully deterministic and the DuckDB oracle
    matches bit-for-bit.

    Dataflow: bigram + unigram count partials -> one hash64(w1)
    exchange (c2 folds where all of w1's bigrams co-locate; c1(w1)
    arrives as unigram rows keyed the same) -> one hash64(w2)
    exchange attaches c1(w2) and scores -> per-bucket top-k prune ->
    tiny global sort (nb x k rows on the driver, the tfidf_topk
    shape). T is one O(blocks) scalar pass.
    """
    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nbu = np.uint64(n_buckets)

    def counts(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        df = pl.DataFrame({"t": pl.from_arrow(
            batch[text_col].combine_chunks())}).with_columns(
            w=pl.col("t").cast(pl.String).fill_null("")
            .str.to_lowercase().str.extract_all(r"\w+")).drop("t")
        uni = (df.explode("w").drop_nulls("w").group_by("w").len()
               .rename({"w": "w1", "len": "c"}))
        big = df.filter(pl.col("w").list.len() >= 2).with_columns(
            w1=pl.col("w").list.slice(0, pl.col("w").list.len() - 1),
            w2=pl.col("w").list.slice(1)).drop("w")
        big = (big.explode(["w1", "w2"]).group_by(["w1", "w2"]).len()
               .rename({"len": "c"}))
        n_u, n_b = len(uni), len(big)
        w1 = pa.concat_arrays([
            uni["w1"].to_arrow().cast(pa.string()),
            big["w1"].to_arrow().cast(pa.string())])
        out = pa.table({
            "kind": pa.array(np.r_[np.zeros(n_u, np.int8),
                                   np.ones(n_b, np.int8)]),
            "w1": w1,
            "w2": pa.concat_arrays([
                pa.array([""] * n_u, pa.string()),
                big["w2"].to_arrow().cast(pa.string())]),
            "c": pa.concat_arrays([
                uni["c"].cast(pl.Int64).to_arrow(),
                big["c"].cast(pl.Int64).to_arrow()]),
        })
        return out.append_column("_b", pa.array(
            (hash64_batch(out["w1"]) % nbu).astype(np.int64)))

    parts = ds.map_batches(counts, batch_format="pyarrow",
                           batch_size=None)

    def count_tokens(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = pl.Series(batch[text_col].combine_chunks()) \
            .cast(pl.String).fill_null("")
        return pa.table({"n": pa.array(
            [int(s.str.count_matches(r"\w+").sum())], pa.int64())})

    total = sum(r["n"] for r in ds.map_batches(
        count_tokens, batch_format="pyarrow", batch_size=None)
        .take_all())
    t_f = float(total)

    def fold_w1(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                         ("c2", pa.int64()), ("c1a", pa.int64()),
                         ("_b2", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        g = tbl.to_pandas()
        c1 = g[g["kind"] == 0].groupby("w1")["c"].sum()
        bg = g[g["kind"] == 1].groupby(["w1", "w2"], as_index=False,
                                       sort=False)["c"].sum()
        if not len(bg):
            return sch.empty_table()
        keep = bg["c"].to_numpy() >= min_count
        bg = bg[keep]
        if not len(bg):
            return sch.empty_table()
        c1a = c1.reindex(bg["w1"]).to_numpy(np.int64)
        w2 = pa.array(bg["w2"].tolist(), pa.string())
        return pa.table({
            "w1": pa.array(bg["w1"].tolist(), pa.string()),
            "w2": w2,
            "c2": pa.array(bg["c"].to_numpy(np.int64)),
            "c1a": pa.array(c1a),
            "_b2": pa.array((hash64_batch(w2) % nbu)
                            .astype(np.int64)),
        })

    # unigram rows must ALSO reach the second exchange (keyed by the
    # word itself) so c1(w2) is local there
    out1 = hash_bucket_apply(parts, "_b", fold_w1,
                             num_buckets=n_buckets)

    def uni_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = batch.filter(pc.equal(batch["kind"], 0))
        return pa.table({
            "w1": pa.array([""] * m.num_rows, pa.string()),
            "w2": m["w1"],
            "c2": pa.array(np.full(m.num_rows, -1, np.int64)),
            "c1a": m["c"].cast(pa.int64()),
            "_b2": pa.array(
                (hash64_batch(m["w1"]) % nbu).astype(np.int64)),
        })

    uni2 = parts.map_batches(uni_rows, batch_format="pyarrow",
                             batch_size=None)

    def score_w2(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                         ("c2", pa.int64()), ("pmi_1e6", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        g = tbl.to_pandas()
        uni = g[g["c2"] < 0].groupby("w2")["c1a"].sum()
        bg = g[g["c2"] >= 0]
        if not len(bg):
            return sch.empty_table()
        c1b = uni.reindex(bg["w2"]).to_numpy(np.int64)
        c2 = bg["c2"].to_numpy(np.int64)
        c1a = bg["c1a"].to_numpy(np.int64)
        num = c2.astype(np.float64) * t_f
        den = c1a.astype(np.float64) * c1b
        pmi = np.floor(np.log(num / den) * 1e6 + 0.5).astype(np.int64)
        t = pa.table({
            "w1": pa.array(bg["w1"].tolist(), pa.string()),
            "w2": pa.array(bg["w2"].tolist(), pa.string()),
            "c2": pa.array(c2), "pmi_1e6": pa.array(pmi),
        })
        # per-bucket prune: only the local top-k can make the global
        order = np.lexsort((bg["w2"].to_numpy(), bg["w1"].to_numpy(),
                            -pmi))
        return t.take(pa.array(order[:k]))

    pruned = hash_bucket_apply(uni2.union(out1), "_b2", score_w2,
                               num_buckets=n_buckets)
    rows = pruned.take_all()
    rows.sort(key=lambda r: (-r["pmi_1e6"], r["w1"], r["w2"]))
    rows = rows[:k]
    return ray.data.from_arrow(pa.table({
        "w1": pa.array([r["w1"] for r in rows], pa.string()),
        "w2": pa.array([r["w2"] for r in rows], pa.string()),
        "c2": pa.array([r["c2"] for r in rows], pa.int64()),
        "pmi_1e6": pa.array([r["pmi_1e6"] for r in rows], pa.int64()),
    }))
