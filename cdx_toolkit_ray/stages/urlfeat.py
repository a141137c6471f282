"""URL-level spam features (RefinedWeb-style URL filtering).

Web-corpus pipelines gate documents on URL shape before fetching or
keeping them: RefinedWeb (Penedo et al. 2023) filters on a bad-word
lexicon over the URL, excessive digits, and structural signals —
cheap evidence available before a single content byte is read, which
at crawl scale means the filter runs at the FRONTIER, not after
fetch. One stateless vectorized pass (polars string kernels);
zero shuffles; the lexicon is compiled into the closure (O(lexicon)
state, broadcast-free because it is constant).

Every feature is integer/boolean and string-arithmetic only, so the
DuckDB oracle reproduces the whole row bit-for-bit.

Reference role: beyond-reference frontier hygiene (the reference's
only URL gates are fgrep/fgrepv substring filters, cdx_toolkit
cli.py:188-200 — the ``bad_hits`` feature generalizes exactly that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_LEXICON = ("casino", "viagra", "porn", "xxx", "loan",
                   "pills")


def url_features(ds: ray.data.Dataset, *, url_col: str = "url",
                 lexicon: tuple = DEFAULT_LEXICON,
                 max_digits: int = 1,
                 flag_query: bool = True) -> ray.data.Dataset:
    """Append URL spam features:

    - ``url_len``    total characters
    - ``n_digits``   count of [0-9] characters
    - ``depth``      path depth = '/' count beyond the scheme's ``//``
    - ``n_params``   query parameters (0 without '?', '&'-count + 1
                     with)
    - ``bad_hits``   how many lexicon words occur as substrings
      (case-insensitive)
    - ``spam``       the gate verdict: any lexicon hit, or digits over
      ``max_digits`` on a parameterized URL (``flag_query``) — the
      digit/query heuristic that catches calendar traps and session-id
      explosions in crawl frontiers.
    """

    def feats(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        u = pl.DataFrame({"u": pl.from_arrow(
            batch[url_col].combine_chunks().cast(pa.string()))}) \
            .with_columns(lo=pl.col("u").fill_null("")
                          .str.to_lowercase())
        lo = pl.col("lo")
        out = u.with_columns(
            url_len=lo.str.len_chars().cast(pl.Int64),
            n_digits=lo.str.count_matches(r"[0-9]").cast(pl.Int64),
            slashes=lo.str.count_matches("/", literal=True)
            .cast(pl.Int64),
            has_q=lo.str.contains("?", literal=True),
            n_amp=lo.str.count_matches("&", literal=True)
            .cast(pl.Int64),
            bad_hits=sum(
                (lo.str.contains(w, literal=True).cast(pl.Int64)
                 for w in lexicon),
                start=pl.lit(0, pl.Int64)),
        )
        out = out.with_columns(
            depth=(pl.col("slashes") - 2).clip(lower_bound=0),
            n_params=pl.when(pl.col("has_q"))
            .then(pl.col("n_amp") + 1).otherwise(0).cast(pl.Int64),
        )
        spam = (out["bad_hits"] > 0) | (
            (out["n_digits"] > max_digits)
            & (out["n_params"] > 0 if flag_query
               else pl.Series([True] * len(out))))
        for name in ("url_len", "n_digits", "depth", "n_params",
                     "bad_hits"):
            batch = batch.append_column(
                name, out[name].to_arrow().cast(pa.int64()))
        return batch.append_column("spam", spam.to_arrow())

    return ds.map_batches(feats, batch_format="pyarrow",
                          batch_size=None)
