"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Training-data operators over the ``documents`` / ``pages`` text columns
(driver brief: "lang-ID (n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a BPE-ish
regex), document fingerprinting (rolling hash)").

Everything here is a stateless vectorized ``map_batches`` stage; the
kernels are chosen to be EXACTLY reproducible in ANSI SQL (DuckDB)
where possible so the driver's oracle can value-check them:

* ``n_tokens_ws``  == len(regexp_extract_all(text, '\\S+'))
* ``n_tokens_re``  == len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
* ``stopword_ratio`` over whitespace tokens vs a fixed list
* ``lang_id``: argmax of per-language stopword hit counts with a
  deterministic alphabetical tie-break
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WS_RE = re.compile(r"\S+")
BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

# tiny per-language marker sets for the heuristic language ID
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
}


def _pl_series(batch: pa.Table, text_col: str):
    """Arrow column -> polars string Series with nulls as ''."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.Series("t", col).fill_null("")


_NONASCII_RE = re.compile(r"[^\x00-\x7F]")
_WSRUN_RE = re.compile(r"[ \t\n\r\f\v]+")


def normalize_batch(batch: pa.Table, text_col: str = "text",
                    out_col: str = "text_norm") -> pa.Table:
    """Append the canonical text form: lowercase -> unicode NFC ->
    collapse ASCII-whitespace runs to one space -> trim spaces.

    SQL-equivalent (the oracle):
    ``trim(regexp_replace(nfc_normalize(lower(text)),
    '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))``. Nulls propagate.

    Two-path kernel, same shape as canon.py's fast path: pure-ASCII
    rows (the overwhelming majority of web text post language filter,
    and NFC-invariant by construction) run entirely in polars; rows
    containing any non-ASCII byte take a scalar Python fallback
    (``str.lower`` + ``unicodedata.normalize``), whose casing can
    differ from utf8proc's on exotic code points — acceptable drift
    for a normalizer whose job is stable keys, and covered by unit
    tests on the fallback path.
    """
    import unicodedata

    s = _pl_series(batch, text_col)
    norm = (s.str.to_lowercase()
            .str.replace_all(r"[ \t\n\r\f\v]+", " ")
            .str.strip_chars(" "))
    out = norm.to_list()
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nulls = np.asarray(pc.is_null(col))
    texts = col.to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(~nulls):
        t = texts[i]
        if t and _NONASCII_RE.search(t):
            x = unicodedata.normalize("NFC", t.lower())
            out[i] = _WSRUN_RE.sub(" ", x).strip(" ")
    out_arr = pa.array(out, pa.string())
    out_arr = pc.if_else(pa.array(nulls), pa.nulls(len(out), pa.string()),
                         out_arr)
    return batch.append_column(out_col, out_arr)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens_ws`` (whitespace) and ``n_tokens_re``
    (BPE-ish word/punct regex) counts.

    Vectorized polars ``count_matches`` (Rust regex, unicode classes
    match Python's) — the per-doc ``re.findall`` loop this replaces was
    the token-level hot loop at corpus scale."""
    s = _pl_series(batch, text_col)
    ws = s.str.count_matches(r"\S+").cast(int).to_numpy()
    # the alternation '\w+|[^\w\s]' partitions into two DISJOINT match
    # classes, so its count is the sum of two cheap single-class counts
    # (the fused alternation measured ~4x slower in the regex engine)
    bpe = (s.str.count_matches(r"\w+")
           + s.str.count_matches(r"[^\w\s]")).cast(int).to_numpy()
    batch = batch.append_column("n_tokens_ws",
                                pa.array(ws.astype(np.int64), pa.int64()))
    batch = batch.append_column("n_tokens_re",
                                pa.array(bpe.astype(np.int64), pa.int64()))
    return batch


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality metrics: char count, whitespace-token count,
    stopword count, mean token length, stopword ratio — one polars
    pass (extract_all + list kernels), no per-document Python."""
    import polars as pl

    s = _pl_series(batch, text_col)
    df = pl.DataFrame({"t": s}).with_columns(
        toks=pl.col("t").str.extract_all(r"\S+"),
    ).with_columns(
        n_chars_actual=pl.col("t").str.len_chars().cast(pl.Int64),
        n_tokens_ws=pl.col("toks").list.len().cast(pl.Int64),
        n_stopwords=pl.col("toks").list.eval(
            pl.element().is_in(list(STOPWORDS))).list.sum()
            .fill_null(0).cast(pl.Int64),
        _tok_chars=pl.col("toks").list.eval(
            pl.element().str.len_chars()).list.sum()
            .fill_null(0).cast(pl.Int64),
    )
    n_chars = df["n_chars_actual"].to_numpy()
    n_tok = df["n_tokens_ws"].to_numpy()
    n_stop = df["n_stopwords"].to_numpy()
    tok_chars = df["_tok_chars"].to_numpy()
    safe = np.maximum(n_tok, 1)
    mean_len = np.where(n_tok > 0, tok_chars / safe, 0.0)
    stop_ratio = np.where(n_tok > 0, n_stop / safe, 0.0)
    for name, arr, typ in (("n_chars_actual", n_chars, pa.int64()),
                           ("n_tokens_ws", n_tok, pa.int64()),
                           ("n_stopwords", n_stop, pa.int64()),
                           ("mean_token_len", mean_len, pa.float64()),
                           ("stopword_ratio", stop_ratio, pa.float64())):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch


def lang_id_batch(batch: pa.Table, text_col: str = "text",
                  out_col: str = "lang_pred") -> pa.Table:
    """Append the heuristic language guess.

    Score per language = count of whitespace tokens in that language's
    marker set; winner = max score, ties broken alphabetically;
    'und' (undetermined) when all scores are zero. One polars
    extract_all + an is_in per language; argmax in numpy (langs sorted,
    so argmax's first-max rule IS the alphabetical tie-break)."""
    import polars as pl

    langs = sorted(LANG_MARKERS)
    s = _pl_series(batch, text_col)
    df = pl.DataFrame({"t": s}).with_columns(
        toks=pl.col("t").str.to_lowercase().str.extract_all(r"\S+"),
    ).with_columns(**{
        "s_" + l: pl.col("toks").list.eval(
            pl.element().is_in(list(LANG_MARKERS[l]))).list.sum()
            .fill_null(0).cast(pl.Int64)
        for l in langs
    })
    scores = np.stack([df["s_" + l].to_numpy() for l in langs], axis=1)
    best = np.argmax(scores, axis=1)
    out = np.array(langs, dtype=object)[best]
    out[scores.max(axis=1) == 0] = "und"
    return batch.append_column(out_col, pa.array(out, pa.string()))


def make_fingerprint_stage(text_col: str = "text", window: int = 4,
                           out_col: str = "fingerprint"):
    """Winnowing-style document fingerprint: min rolling hash over word
    ``window``-grams (deterministic; robust to small edits at the
    min-selection level)."""
    from .dedup import _hash_text_array

    def fingerprint(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        # hash every document's grams in ONE vectorized call, then
        # reduce per-document slices (the per-doc hash call paid fixed
        # vectorization overhead n times — same fix as minhash)
        all_grams: list = []
        bounds = np.zeros(n + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            words = WS_RE.findall((t or "").lower())
            if words:
                if len(words) < window:
                    all_grams.append(" ".join(words))
                else:
                    all_grams.extend(
                        " ".join(words[j:j + window])
                        for j in range(len(words) - window + 1))
            bounds[i + 1] = len(all_grams)
        out = np.zeros(n, dtype=np.uint64)
        if all_grams:
            hashes = _hash_text_array(np.asarray(all_grams, dtype=object))
            has = bounds[1:] > bounds[:-1]
            mins = np.minimum.reduceat(hashes, bounds[:-1][has])
            out[has] = mins
        return batch.append_column(out_col, pa.array(out, pa.uint64()))

    return fingerprint


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals, all integer-form (Rae et al.
    2021 §A1.1 use fractional thresholds; the integer counts carry the
    same information and value-check exactly against SQL):

    ``n_words`` (all ``\\w+`` occurrences, lowercased), ``n_distinct_words``,
    ``top_word_count`` (occurrences of the most frequent word),
    ``n_2grams`` (word-bigram windows) and ``top_2gram_count``.
    A boilerplate page shows high top_*_count relative to n_*; the
    threshold policy stays a downstream filter.

    Fully vectorized: polars explode + two group_bys inside the batch —
    no per-document Python, no shuffle.
    """
    import polars as pl

    n = batch.num_rows
    df = pl.DataFrame({"t": pl.from_arrow(
        batch[text_col].combine_chunks())}).with_row_index("d") \
        .with_columns(w=pl.col("t").fill_null("").str.to_lowercase()
                      .str.extract_all(r"\w+")).drop("t")
    words = df.explode("w").drop_nulls("w")
    wc = words.group_by("d", "w").len()
    pw = wc.group_by("d").agg(
        n_words=pl.col("len").sum().cast(pl.Int64),
        n_distinct_words=pl.len().cast(pl.Int64),
        top_word_count=pl.col("len").max().cast(pl.Int64))
    big = words.with_columns(w2=pl.col("w").shift(-1).over("d")) \
        .drop_nulls("w2") \
        .select("d", g=pl.concat_str(["w", "w2"], separator=" "))
    gc = big.group_by("d", "g").len()
    pg = gc.group_by("d").agg(
        n_2grams=pl.col("len").sum().cast(pl.Int64),
        top_2gram_count=pl.col("len").max().cast(pl.Int64))

    cols = {"n_words": pw, "n_distinct_words": pw, "top_word_count": pw,
            "n_2grams": pg, "top_2gram_count": pg}
    arrays = {}
    for name, src in cols.items():
        out = np.zeros(n, np.int64)
        d = src["d"].to_numpy().astype(np.int64)
        out[d] = src[name].to_numpy()
        arrays[name] = out
    for name, arr in arrays.items():
        batch = batch.append_column(name, pa.array(arr, pa.int64()))
    return batch


def repetition_stats(ds, text_col: str = "text"):
    """Streaming repetition-signal pass (map_batches, zero shuffles)."""
    return ds.map_batches(
        lambda b: repetition_batch(b, text_col),
        batch_format="pyarrow", batch_size=None)


def doc_frequency(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_df: int = 2):
    """Corpus document frequency: ``(word, df)`` for every lowercased
    ``\\w+`` word appearing in at least ``min_df`` documents — the
    distributed half of TF-IDF (idf = ln(N/df) is a driver-side scalar
    transform on this output).

    Scale shape: the per-batch kernel collapses each block to DISTINCT
    (word, doc) pairs and pre-counts them per word, so the ``groupby``
    shuffle moves one partial-count row per (word, block) — vocabulary
    x blocks, never words x documents. The ``min_df`` filter runs
    after the merge (a word's partials may be spread across blocks).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "d": pl.from_arrow(batch[id_col].combine_chunks()),
            "t": pl.from_arrow(batch[text_col].combine_chunks()),
        }).with_columns(w=pl.col("t").fill_null("").str.to_lowercase()
                        .str.extract_all(r"\w+")).drop("t")
        pairs = df.explode("w").drop_nulls("w").unique(["d", "w"])
        part = pairs.group_by("w").len()
        return pa.table({"word": part["w"].to_arrow(),
                         "df_part": part["len"].cast(pl.Int64).to_arrow()})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    merged = parts.groupby("word").aggregate(
        Sum("df_part", alias_name="df"))

    def threshold(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["df"], min_df))

    return merged.map_batches(threshold, batch_format="pyarrow",
                              batch_size=None)


def tfidf_topk(ds, text_col: str = "text", id_col: str = "doc_id",
               k: int = 5, n_buckets: int = 32, n_docs: int | None = None):
    """Per-document top-``k`` TF-IDF terms: for every document, the
    ``k`` words with the largest ``tf * ln(N / df)``, emitted as
    ``(doc_id, word, tf, df, score_1e6, term_rank)``.

    The score is carried as ``score_1e6 = floor(tf * ln(N/df) * 1e6
    + 0.5)`` (int64): an integer micro-score makes the ranking — and
    the DuckDB oracle's value hash — independent of float formatting,
    and the (score desc, word asc) tie-break makes ranks deterministic.

    Scale shape (nothing lands on the driver):
    1. per-batch polars kernel -> distinct ``(doc, word, tf)`` triples
       (a doc lives in exactly one batch, so triples are globally
       distinct) tagged ``wb = hash64(word) % n_buckets``;
    2. ``groupby(wb)`` co-locates each word's rows; a vectorized
       factorize+bincount kernel computes ``df`` and the micro-score,
       then prunes to the per-doc top-k WITHIN the bucket, so at most
       ``k x docs`` candidate rows enter the second shuffle;
    3. ``groupby(doc bucket)`` + vectorized per-doc rank keeps the
       global top-k.
    ``N`` (corpus doc count) is the one driver-side scalar — a
    metadata count over the id column.

    Reference role: beyond-reference training-data operator (the
    reference streams captures, cdx_toolkit/__init__.py:157-205, and
    computes no term statistics).
    """
    from ..canon import hash64_batch

    if n_docs is None:
        n_docs = ds.count()
    n_f = float(n_docs)

    def triples(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "doc_id": pl.from_arrow(batch[id_col].combine_chunks()),
            "t": pl.from_arrow(batch[text_col].combine_chunks()),
        }).with_columns(w=pl.col("t").cast(pl.String).fill_null("")
                        .str.to_lowercase().str.extract_all(r"\w+")
                        ).drop("t")
        tf = (df.explode("w").drop_nulls("w")
                .group_by("doc_id", "w").len())
        words = tf["w"].to_arrow()
        wb = (hash64_batch(words) % n_buckets).astype(np.int64)
        return pa.table({
            "doc_id": tf["doc_id"].to_arrow(),
            "word": words,
            "tf": tf["len"].cast(pl.Int64).to_arrow(),
            "wb": pa.array(wb),
        })

    # both shuffles run on the direct task-graph exchange — the
    # shuffled stream (distinct triples, then k x docs candidates) is
    # small, so executor-groupby sampling+barrier fixed costs dominate
    # (same finding as lm.unigram_lm_score, measured there)
    def score_bucket(tbl: pa.Table) -> pa.Table:
        # df per word: each row is one distinct (doc, word)
        g = tbl.to_pandas()
        codes, uniq = pd.factorize(g["word"], sort=False)
        dfc = np.bincount(codes, minlength=len(uniq))
        g["df"] = dfc[codes].astype(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        g["score_1e6"] = np.floor(
            tf * np.log(n_f / g["df"].to_numpy(np.float64)) * 1e6
            + 0.5).astype(np.int64)
        # per-doc local top-k inside this word bucket
        g = g.sort_values(["doc_id", "score_1e6", "word"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("doc_id", sort=False).head(k)
        g["db"] = (g["doc_id"].to_numpy(np.uint64)
                   % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(g.drop(columns=["wb"]),
                                    preserve_index=False)

    def final_rank(tbl: pa.Table) -> pa.Table:
        g = tbl.to_pandas()
        g = g.sort_values(["doc_id", "score_1e6", "word"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["term_rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return pa.Table.from_pandas(g.drop(columns=["db"]),
                                    preserve_index=False)

    from .exchange import hash_bucket_apply

    t = ds.map_batches(triples, batch_format="pyarrow", batch_size=None)
    scored = hash_bucket_apply(t, "wb", score_bucket,
                               num_buckets=n_buckets)
    return hash_bucket_apply(scored, "db", final_rank,
                             num_buckets=n_buckets)


def group_quantiles(ds, group_col: str, value_col: str,
                    q_pcts: tuple[int, ...] = (25, 50, 75, 90)):
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: the value at 0-based sorted index ``max(0,
    ceil(q*n)-1)``), emitted long-form as ``(group, q_pct, value)``.

    Scale shape: each batch compresses to distinct ``(group, value,
    cnt)`` partial counts before the shuffle, so the all-to-all moves
    one row per distinct value per group per block — for discrete
    metrics (token counts, char lengths, status codes) that is
    orders of magnitude below row count. The per-group kernel merges
    the partials (value-sorted cumsum) and reads each quantile off the
    cumulative histogram. For continuous values this degrades to a
    full shuffle; bucket or round first.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = pl.DataFrame({
            "g": pl.from_arrow(batch[group_col].combine_chunks()),
            "v": pl.from_arrow(batch[value_col].combine_chunks()),
        }).group_by("g", "v").len()
        return pa.table({group_col: t["g"].to_arrow(),
                         "v": t["v"].to_arrow(),
                         "cnt": t["len"].cast(pl.Int64).to_arrow()})

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        import math

        agg = g.groupby("v")["cnt"].sum().sort_index()
        vals = agg.index.to_numpy()
        cum = agg.to_numpy().cumsum()
        n = int(cum[-1])
        out_v = []
        for p in q_pcts:
            idx = max(0, math.ceil(p / 100 * n) - 1)
            out_v.append(vals[int(np.searchsorted(cum, idx + 1))])
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]] * len(q_pcts),
            "q_pct": np.asarray(q_pcts, np.int64),
            "value": np.asarray(out_v, np.int64),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return parts.groupby(group_col).map_groups(quantiles,
                                               batch_format="pandas")


def quantile_gate(ds, group_col: str, value_col: str, q_pct: int = 25,
                  keep: str = "above"):
    """Adaptive per-group quality gate: drop every row whose
    ``value_col`` is below (``keep="above"``) or above its OWN group's
    ``q_pct`` quantile — e.g. "drop the shortest quartile of documents
    per language", the data-driven twin of a fixed length threshold
    (a fixed cut over mixed languages mostly removes one language).

    Adds ``q_thresh`` (the group's threshold) to surviving rows.

    Scale shape: the thresholds come from :func:`group_quantiles`
    (distinct-value partials, one small shuffle); the result is one row
    per group — collected to the driver (bounded by the number of
    groups, thousands at most) and applied as a broadcast vectorized
    filter. The corpus itself streams through exactly one map_batches
    pass; it is read twice (once for partials, once for the gate),
    which beats shuffling it once.
    """
    q = group_quantiles(ds, group_col, value_col, q_pcts=(q_pct,))
    lut = {r[group_col]: r["value"] for r in q.take_all()}

    def gate(batch: pa.Table) -> pa.Table:
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(grp, sort=False)
        thr = np.array([lut[g] for g in uniq], dtype=np.int64)[codes]
        ok = val >= thr if keep == "above" else val <= thr
        return batch.append_column(
            "q_thresh", pa.array(thr)).filter(pa.array(ok))

    return ds.map_batches(gate, batch_format="pyarrow", batch_size=None)


def minmax_normalize(ds, group_col: str, value_col: str,
                     scale: int = 1_000_000):
    """Per-group min-max feature scaling in exact integers:
    ``norm = (x - min_g) * scale // (max_g - min_g)`` (a degenerate
    group with min == max normalizes to 0) — the all-integer twin of
    the float (x-min)/(max-min) rescale, so the result is bit-stable
    under any execution order and exactly SQL-checkable. Adds
    ``v_min``, ``v_max``, ``v_norm``.

    Scale shape: per-block (group, min, max) partials fold into one
    tiny table (one row per group, collected to the driver — bounded
    by group count, like quantile_gate's LUT), broadcast into a
    single vectorized rescale pass. The corpus streams; only the
    O(groups) extrema table moves.
    """
    import pandas as pd

    def extrema(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        new = np.ones(len(gs), bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        return pa.table({
            group_col: pa.array(gs[starts]),
            "lo": pa.array(np.minimum.reduceat(vs, starts)),
            "hi": pa.array(np.maximum.reduceat(vs, starts)),
        })

    from ray.data.aggregate import Max, Min

    # per-block partials -> one tiny groupby -> exactly O(groups)
    # rows reach the driver (not blocks x groups)
    parts = (ds.select_columns([group_col, value_col])
             .map_batches(extrema, batch_format="pyarrow",
                          batch_size=None)
             .groupby(group_col)
             .aggregate(Min("lo", alias_name="lo"),
                        Max("hi", alias_name="hi"))
             .take_all())
    lut = {r[group_col]: (r["lo"], r["hi"]) for r in parts}

    def rescale(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(g, sort=False)
        lo = np.array([lut[x][0] for x in uniq], np.int64)[codes]
        hi = np.array([lut[x][1] for x in uniq], np.int64)[codes]
        rng = hi - lo
        norm = np.where(rng > 0, (v - lo) * scale // np.maximum(rng, 1), 0)
        batch = batch.append_column("v_min", pa.array(lo, pa.int64()))
        batch = batch.append_column("v_max", pa.array(hi, pa.int64()))
        return batch.append_column("v_norm", pa.array(norm, pa.int64()))

    return ds.map_batches(rescale, batch_format="pyarrow", batch_size=None)


def gopher_gate_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_words: int = 20, max_words: int = 100_000
                      ) -> pa.Table:
    """Gopher-style document quality gate (Rae et al. 2021 Table A1
    shape) in exact integer form — every rule is an integer
    cross-multiplication, so keep/drop and the reason string are
    bit-stable and SQL-checkable:

    * ``n_words``   outside [min_words, max_words]       -> 'n_words'
    * mean word length outside [3, 10] chars
      (``3*n_words <= word_chars <= 10*n_words``)        -> 'word_len'
    * fewer than 2 stopwords (tiny fixed list)           -> 'stopwords'
    * top word  > 30% of words  (``10*top  > 3*n_words``)-> 'rep_word'
    * top 2-gram > 20% of 2-grams (``5*top2 > n_2grams``)-> 'rep_2gram'

    Output: ``(doc_id, n_words, keep, reasons)`` where ``reasons`` is
    the comma-joined rule names in the order above ('' when kept).
    One vectorized pass, zero shuffles; the text never leaves the
    task. Word model: lowercased ``\\w+`` (the corpus gram
    convention).
    """
    import polars as pl

    n = batch.num_rows
    sch = pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                     ("keep", pa.bool_()), ("reasons", pa.string())])
    if n == 0:
        return sch.empty_table()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pl.DataFrame({"t": pl.from_arrow(
        batch[text_col].combine_chunks())}).with_row_index("d") \
        .with_columns(w=pl.col("t").fill_null("").str.to_lowercase()
                      .str.extract_all(r"\w+")).drop("t")
    words = df.explode("w").drop_nulls("w")
    wc = words.group_by("d", "w").len()
    pw = wc.group_by("d").agg(
        n_words=pl.col("len").sum().cast(pl.Int64),
        top_word=pl.col("len").max().cast(pl.Int64))
    chars = words.group_by("d").agg(
        word_chars=pl.col("w").str.len_chars().sum().cast(pl.Int64),
        n_stop=pl.col("w").is_in(list(STOPWORDS)).sum().cast(pl.Int64))
    big = words.with_columns(w2=pl.col("w").shift(-1).over("d")) \
        .drop_nulls("w2") \
        .select("d", g=pl.concat_str(["w", "w2"], separator=" "))
    pg = big.group_by("d", "g").len().group_by("d").agg(
        n_2grams=pl.col("len").sum().cast(pl.Int64),
        top_2gram=pl.col("len").max().cast(pl.Int64))

    def dense(src, name):
        out = np.zeros(n, np.int64)
        out[src["d"].to_numpy().astype(np.int64)] = \
            src[name].to_numpy()
        return out

    n_words = dense(pw, "n_words")
    top_word = dense(pw, "top_word")
    word_chars = dense(chars, "word_chars")
    n_stop = dense(chars, "n_stop")
    n_2grams = dense(pg, "n_2grams")
    top_2gram = dense(pg, "top_2gram")

    bad = [
        ("n_words", (n_words < min_words) | (n_words > max_words)),
        ("word_len", (3 * n_words > word_chars)
         | (word_chars > 10 * n_words)),
        ("stopwords", n_stop < 2),
        ("rep_word", 10 * top_word > 3 * n_words),
        ("rep_2gram", 5 * top_2gram > n_2grams),
    ]
    keep = np.ones(n, bool)
    reasons = np.full(n, "", dtype=object)
    for name, mask in bad:
        keep &= ~mask
        appended = np.where(reasons == "", name, reasons + ("," + name))
        reasons = np.where(mask, appended, reasons)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "keep": pa.array(keep),
        "reasons": pa.array(reasons, pa.string()),
    })


# Soft-404 phrase lexicons (Bar-Yossef et al., "Sic Transit Gloria
# Telae", WWW 2004 — error pages served with status 200). Title hits
# are the stronger signal and win the signal label.
_SOFT404_TITLE = ("404", "not found", "page not found")
_SOFT404_BODY = ("page not found", "does not exist", "error 404",
                 "404 not found", "no longer available")


def soft404_batch(batch: pa.Table, *, status_col: str = "status",
                  title_col: str = "title", text_col: str = "text",
                  keep_cols: tuple = ("url",)) -> pa.Table:
    """Soft-404 detection: error pages served with HTTP 200 — the
    capture-table pollution CDX consumers cannot see from ``status``
    alone (the reference exposes status/mime as-is, README.md:222-225;
    a 200 'Page Not Found' still enters the index). A page flags iff
    status == 200 AND a title or body phrase from the lexicon matches
    case-insensitively; honest 404s never flag (their status already
    says so). Output: ``keep_cols + (soft404, signal)`` with signal in
    {'title', 'body', null} (title is the stronger signal and wins).
    One vectorized polars pass, zero shuffles."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    keep = [c for c in keep_cols if c in batch.column_names]
    if batch.num_rows == 0:
        return pa.table(
            {**{c: batch[c] for c in keep},
             "soft404": pa.array([], pa.bool_()),
             "signal": pa.array([], pa.string())})
    df = pl.from_arrow(batch.select(
        [c for c in {status_col, title_col, text_col}
         if c in batch.column_names]))
    lt = pl.col(title_col).str.to_lowercase()
    lb = pl.col(text_col).str.to_lowercase()
    title_hit = pl.any_horizontal([
        lt.str.contains(p, literal=True) for p in _SOFT404_TITLE])
    body_hit = pl.any_horizontal([
        lb.str.contains(p, literal=True) for p in _SOFT404_BODY])
    ok = pl.col(status_col).cast(pl.String) == "200"
    out = df.select(
        soft404=(ok & (title_hit.fill_null(False)
                       | body_hit.fill_null(False))),
        signal=pl.when(ok & title_hit.fill_null(False))
        .then(pl.lit("title"))
        .when(ok & body_hit.fill_null(False))
        .then(pl.lit("body"))
        .otherwise(None)).to_arrow()
    return pa.table(
        {**{c: batch[c] for c in keep},
         "soft404": out["soft404"].cast(pa.bool_()),
         "signal": out["signal"].cast(pa.string())})


def vocab_coverage(ds, vocab_size: int = 64, text_col: str = "text",
                   id_col: str = "doc_id", num_buckets: int = 32):
    """Tokenizer-prep measurement: build the top-``vocab_size``
    corpus vocabulary (by count, ties -> lexicographically smaller
    word) and report each document's out-of-vocabulary rate —
    ``(doc_id, n_tokens, n_oov, oov_micro)``, all integers.

    Scale shape: corpus word counts fold per block before ONE
    word-bucket exchange; each bucket keeps only its LOCAL top-V
    (a word's global count is complete within its bucket, so the
    global top-V is a subset of the union of bucket top-Vs), and the
    driver merges just buckets x V rows before broadcasting the
    O(V) vocabulary into a stateless per-doc scoring pass. The corpus
    streams twice (count pass + score pass); only word partials
    shuffle.
    """
    import polars as pl
    import ray

    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def count_partial(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("_wb", pa.int64()), ("word", pa.string()),
                         ("c", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        wc = (pl.DataFrame({"t": pl.from_arrow(
                  batch[text_col].combine_chunks())})
              .select(w=pl.col("t").fill_null("").str.to_lowercase()
                      .str.extract_all(r"\w+"))
              .explode("w").drop_nulls("w")
              .group_by("w").len())
        words = wc["w"].to_arrow()
        wb = (hash64_batch(words) % nbu).astype(np.int64)
        return pa.table({
            "_wb": pa.array(wb, pa.int64()),
            "word": words.cast(pa.string()),
            "c": wc["len"].cast(pl.Int64).to_arrow(),
        })

    def bucket_topv(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("word", pa.string()), ("c", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        w = tbl["word"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        ws, cs = w[order], c[order]
        new = np.ones(len(ws), bool)
        new[1:] = ws[1:] != ws[:-1]
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(cs, starts)
        uw = ws[starts]
        top = np.lexsort((uw, -tot))[:vocab_size]
        return pa.table({"word": pa.array(uw[top], pa.string()),
                         "c": pa.array(tot[top], pa.int64())})

    parts = ds.select_columns([text_col]).map_batches(
        count_partial, batch_format="pyarrow", batch_size=None)
    tops = hash_bucket_apply(parts, "_wb", bucket_topv,
                             num_buckets=num_buckets).take_all()
    cand = pd.DataFrame(tops)
    if len(cand):
        cand = cand.sort_values(["c", "word"],
                                ascending=[False, True])[:vocab_size]
        vocab = np.sort(cand["word"].to_numpy().astype(object))
    else:
        vocab = np.zeros(0, object)
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        from ..pipelines.frontier import _get_broadcast

        sch = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                         ("n_oov", pa.int64()), ("oov_micro", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        voc = _get_broadcast(vocab_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = (pl.DataFrame({"t": pl.from_arrow(
                  batch[text_col].combine_chunks())})
              .with_row_index("d")
              .with_columns(w=pl.col("t").fill_null("")
                            .str.to_lowercase().str.extract_all(r"\w+"))
              .drop("t"))
        ex = df.explode("w").drop_nulls("w")
        d = ex["d"].to_numpy().astype(np.int64)
        w = ex["w"].to_numpy().astype(object)
        n = len(ids)
        n_tok = np.zeros(n, np.int64)
        np.add.at(n_tok, d, 1)
        if len(voc) and len(w):
            p = np.searchsorted(voc, w)
            p[p == len(voc)] = 0
            oov = voc[p] != w
        else:
            oov = np.ones(len(w), bool)
        n_oov = np.zeros(n, np.int64)
        np.add.at(n_oov, d, oov.astype(np.int64))
        micro = np.where(n_tok > 0,
                         n_oov * 1_000_000 // np.maximum(n_tok, 1), 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "oov_micro": pa.array(micro, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=None)


SCRIPTS = ("latin", "cyrillic", "greek", "han", "arabic")
_SCRIPT_RE = {"latin": r"\p{Latin}", "cyrillic": r"\p{Cyrillic}",
              "greek": r"\p{Greek}", "han": r"\p{Han}",
              "arabic": r"\p{Arabic}"}


def script_profile_batch(batch: pa.Table, *, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Unicode SCRIPT histogram + dominant script per doc — the
    writing-system signal the n-gram language-ID heuristic cannot see
    (it assumes one alphabet; mixed-script pages, CJK, and
    transliteration spam all need the codepoint-class view).

    One vectorized pass: per script, one ``\\p{Script}`` codepoint
    count (rust-regex in polars; DuckDB's RE2 counts the same
    classes, which is what makes the SQL oracle exact). Dominant =
    first script in the fixed ``SCRIPTS`` order reaching the maximum
    nonzero count; all-zero -> 'none'. Zero shuffles.
    """
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    df = pl.DataFrame({
        id_col: pl.from_arrow(batch[id_col].combine_chunks()),
        "t": pl.from_arrow(batch[text_col].combine_chunks()),
    })
    df = df.with_columns(**{
        "n_" + name: pl.col("t").cast(pl.String).fill_null("")
        .str.count_matches(rx).cast(pl.Int64)
        for name, rx in _SCRIPT_RE.items()}).drop("t")
    counts = np.stack([df["n_" + s].to_numpy() for s in SCRIPTS])
    mx = counts.max(axis=0)
    # first script (in SCRIPTS order) reaching the max; 'none' if 0
    first = np.argmax(counts == mx[None, :], axis=0)
    dom = np.where(mx > 0, np.asarray(SCRIPTS, object)[first], "none")
    out = df.to_arrow()
    sch = pa.schema([(f.name, pa.int64() if f.name.startswith("n_")
                      else f.type) for f in out.schema])
    return out.cast(sch).append_column(
        "dominant_script", pa.array(dom.tolist(), pa.string()))


def char_entropy_batch(batch: pa.Table, *, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document Shannon entropy of the CHARACTER distribution in
    integer micro-nats — the compression-proxy quality signal
    (gibberish and base64 blobs score high, repetitive boilerplate
    scores low; the cheap stand-in for the zlib-ratio filter real
    pipelines run). Exact integer form (the unigram-LM quantization):

        term(ch) = floor(c_ch * ln(n / c_ch) * 1e6 + 0.5)
        entropy_1e6 = sum(term) // n          (micro-nats/char)

    with c_ch the char's count and n the doc's total chars —
    summation-order-free, so the DuckDB oracle matches bit-for-bit.
    One vectorized polars pass (explode + group count), zero
    shuffles. Empty/null docs report 0.
    """
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    sch = pa.schema([(id_col, pa.int64()), ("n_chars", pa.int64()),
                     ("entropy_1e6", pa.int64())])
    if batch.num_rows == 0:
        return sch.empty_table()
    df = pl.DataFrame({
        id_col: pl.from_arrow(batch[id_col].combine_chunks()),
        "t": pl.from_arrow(batch[text_col].combine_chunks()),
    }).with_columns(ch=pl.col("t").cast(pl.String).fill_null("")
                    .str.split(""))
    cc = (df.select(id_col, "ch").explode("ch").drop_nulls("ch")
          .filter(pl.col("ch") != "")
          .group_by(id_col, "ch").len())
    if not len(cc):
        ids = df[id_col].cast(pl.Int64).to_numpy()
        z = np.zeros(len(ids), np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_chars": pa.array(z), "entropy_1e6":
                         pa.array(z)})
    tot = cc.group_by(id_col).agg(pl.col("len").sum().alias("n"))
    j = cc.join(tot, on=id_col)
    c = j["len"].cast(pl.Int64).to_numpy()
    n = j["n"].cast(pl.Int64).to_numpy()
    term = np.floor(c * np.log(n / c) * 1e6 + 0.5).astype(np.int64)
    agg = (pl.DataFrame({id_col: j[id_col], "term": term,
                         "n": n})
           .group_by(id_col)
           .agg(pl.col("term").sum(), pl.col("n").first()))
    ids = agg[id_col].cast(pl.Int64).to_numpy()
    ns = agg["n"].cast(pl.Int64).to_numpy()
    ent = (agg["term"].cast(pl.Int64).to_numpy() // ns)
    # docs with no chars at all (empty/null text)
    all_ids = df[id_col].cast(pl.Int64).to_numpy()
    missing = np.setdiff1d(all_ids, ids)
    if len(missing):
        ids = np.concatenate([ids, missing])
        ns = np.concatenate([ns, np.zeros(len(missing), np.int64)])
        ent = np.concatenate([ent, np.zeros(len(missing), np.int64)])
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "n_chars": pa.array(ns, pa.int64()),
                     "entropy_1e6": pa.array(ent, pa.int64())})


# --------------------------------------------------------------------------
# RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010)
# --------------------------------------------------------------------------

RAKE_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in",
                  "for", "is", "on", "with", "as", "by", "at")


def rake_keywords_batch(batch: pa.Table, *, text_col: str = "text",
                        id_col: str = "doc_id", top_k: int = 3,
                        scale: int = 1000,
                        stopwords: tuple = RAKE_STOPWORDS) -> pa.Table:
    """Per-document RAKE keyword extraction — top-``top_k`` candidate
    phrases by the degree/frequency word score (Rose et al. 2010,
    "Automatic keyword extraction from individual documents").

    Candidate phrases are maximal runs of non-stopword tokens
    (lowercased ``\\w+``); for each word, ``freq`` counts its
    occurrences in phrases and ``deg`` sums the lengths of the phrases
    each occurrence sits in (co-occurrence degree including self); a
    phrase scores the sum over its tokens (with multiplicity) of
    ``deg * scale DIV freq`` — the floor-per-word integer form of
    RAKE's deg/freq, deterministic under any order and exactly
    expressible in SQL. Duplicate phrases within a doc dedup before
    ranking; ties break by phrase text ascending.

    Entirely per-document: zero shuffle, one vectorized polars pass
    per block — the map side of a keyword index, not an exchange.
    """
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    sch = pa.schema([(id_col, pa.int64()), ("phrase", pa.string()),
                     ("score", pa.int64())])
    if batch.num_rows == 0:
        return sch.empty_table()
    df = pl.DataFrame({
        "doc": pl.from_arrow(batch[id_col].combine_chunks()),
        "t": pl.from_arrow(batch[text_col].combine_chunks()),
    }).with_columns(
        w=pl.col("t").cast(pl.String).fill_null("")
        .str.to_lowercase().str.extract_all(r"\w+")).drop("t")
    tok = (df.explode("w").drop_nulls("w")
           .with_columns(stop=pl.col("w").is_in(list(stopwords)))
           .with_columns(run=pl.col("stop").cast(pl.Int64)
                         .cum_sum().over("doc")))
    nt = tok.filter(~pl.col("stop"))
    if not nt.height:
        return sch.empty_table()
    ph = (nt.group_by("doc", "run", maintain_order=True)
          .agg(phrase=pl.col("w").str.join(" "),
               plen=pl.len().cast(pl.Int64)))
    nt2 = nt.join(ph.select("doc", "run", "plen"), on=["doc", "run"])
    ws = (nt2.group_by("doc", "w")
          .agg(freq=pl.len().cast(pl.Int64),
               deg=pl.col("plen").sum()))
    nt3 = (nt2.join(ws, on=["doc", "w"])
           .with_columns(wscore=(pl.col("deg") * scale)
                         // pl.col("freq")))
    psc = (nt3.group_by("doc", "run")
           .agg(score=pl.col("wscore").sum()))
    phx = (ph.join(psc, on=["doc", "run"])
           .select("doc", "phrase", "score").unique())
    top = (phx.sort(["doc", "score", "phrase"],
                    descending=[False, True, False])
           .with_columns(rk=pl.int_range(0, pl.len()).over("doc"))
           .filter(pl.col("rk") < top_k)
           .drop("rk"))
    out = top.rename({"doc": id_col}).to_arrow()
    return out.cast(sch)


def vocab_drift(ds_a: ray.data.Dataset, ds_b: ray.data.Dataset, *,
                text_col: str = "text",
                num_buckets: int = 32) -> ray.data.Dataset:
    """Jensen-Shannon divergence between two corpora's unigram
    distributions — the crawl-to-crawl CONTENT-DRIFT monitor (JS is
    symmetric and bounded by ln 2, so a recrawl scheduler can
    threshold it; KL alone explodes on vocabulary that one crawl
    lacks). Exact integer micro-nats: with word counts (c1, c2) and
    totals (T1, T2), each word's KL(P||M) term is
    ``floor(1e6·c1·ln(2·c1·T2 / (c1·T2 + c2·T1)) + 0.5)`` (the lm.py
    quantization — the count multiplies INSIDE the floor), the sums
    divide by T1/T2 at the end, and ``js = (kl_a + kl_b) // 2``.
    One-side-only words cost exactly ``c·ln 2``; zero-count sides
    contribute 0 — no infinities anywhere.

    Dataflow: per-block distinct (word, count) partials per side ->
    ONE word-bucket exchange folds both sides and emits per-bucket
    integer partial sums -> one tiny final fold. Returns one row
    ``(n_words, t_a, t_b, kl_a_micro, kl_b_micro, js_micro)``."""
    import polars as pl

    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def counts(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            df = pl.DataFrame({
                "t": pl.from_arrow(batch[text_col].combine_chunks()),
            }).with_columns(
                w=pl.col("t").cast(pl.String).fill_null("")
                .str.to_lowercase().str.extract_all(r"\w+")).drop("t")
            c = df.explode("w").drop_nulls("w").group_by("w").len()
            words = c["w"].to_arrow().cast(pa.string())
            h = (hash64_batch(words.combine_chunks()
                              if isinstance(words, pa.ChunkedArray)
                              else words) % nbu).astype(np.int64)
            return pa.table({
                "w": words,
                "c": c["len"].cast(pl.Int64).to_arrow(),
                "side": pa.array(np.full(len(words), side, np.int8)),
                "_b": pa.array(h, pa.int64())})
        return fn

    rows = (ds_a.map_batches(counts(0), batch_format="pyarrow",
                             batch_size=None)
            .union(ds_b.map_batches(counts(1), batch_format="pyarrow",
                                    batch_size=None)))

    # totals: two driver scalars from the narrow count rows
    mat = rows.materialize()
    t_a = int(mat.filter(lambda r: r["side"] == 0).sum("c") or 0)
    t_b = int(mat.filter(lambda r: r["side"] == 1).sum("c") or 0)
    if t_a == 0 or t_b == 0:
        raise ValueError("vocab_drift: empty corpus side")

    def fold(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("n_words", pa.int64()),
                         ("kl_a_part", pa.int64()),
                         ("kl_b_part", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        df = (pl.from_arrow(tbl.select(["w", "c", "side"]))
              .group_by("w")
              .agg(c1=pl.col("c").filter(pl.col("side") == 0).sum(),
                   c2=pl.col("c").filter(pl.col("side") == 1).sum())
              .fill_null(0))
        c1 = df["c1"].to_numpy().astype(np.int64)
        c2 = df["c2"].to_numpy().astype(np.int64)
        denom = (c1 * t_b + c2 * t_a).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ta_ = np.floor(1e6 * c1 * np.log(2.0 * c1 * t_b / denom)
                           + 0.5)
            tb_ = np.floor(1e6 * c2 * np.log(2.0 * c2 * t_a / denom)
                           + 0.5)
        ta_ = np.where(c1 > 0, ta_, 0.0).astype(np.int64)
        tb_ = np.where(c2 > 0, tb_, 0.0).astype(np.int64)
        return pa.table({
            "n_words": pa.array([np.int64(len(df))]),
            "kl_a_part": pa.array([np.int64(ta_.sum())]),
            "kl_b_part": pa.array([np.int64(tb_.sum())])})

    parts = hash_bucket_apply(mat, "_b", fold, num_buckets=num_buckets)

    def final(tbl: pa.Table) -> pa.Table:
        n = int(pa.compute.sum(tbl["n_words"]).as_py() or 0)
        ka = int(pa.compute.sum(tbl["kl_a_part"]).as_py() or 0)
        kb = int(pa.compute.sum(tbl["kl_b_part"]).as_py() or 0)
        kam = ka // t_a
        kbm = kb // t_b
        return pa.table({
            "n_words": pa.array([n], pa.int64()),
            "t_a": pa.array([t_a], pa.int64()),
            "t_b": pa.array([t_b], pa.int64()),
            "kl_a_micro": pa.array([kam], pa.int64()),
            "kl_b_micro": pa.array([kbm], pa.int64()),
            "js_micro": pa.array([(kam + kbm) // 2], pa.int64())})

    return parts.repartition(1).map_batches(final,
                                            batch_format="pyarrow",
                                            batch_size=None)
