"""DUST safe-parameter mining — query params that never change content.

A production crawler feeds its canonicalizer a per-host blacklist of
URL query parameters (session ids, tracking tags, view state) whose
removal provably does not change the fetched content — the
rule-mining problem of Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl
in the DUST: Different URLs with Similar Text" (WWW 2007), scaled
down to single-parameter strip rules. The reference (cdx_toolkit)
consumes SURT urlkeys whose canonicalization embeds exactly such
rules (README.md:207-212); this stage MINES them from capture
evidence instead of hardcoding them.

Semantics, per ``(host, param)``:

* every captured url containing ``param`` is assigned to the *class*
  it would join if the param were stripped: ``host + path + '?' +
  sorted(remaining k=v pairs, '&'-joined)`` (removal is by KEY — all
  pairs of that key go);
* a class is a **conflict** when it holds >= 2 distinct content
  digests (stripping the param would conflate different content),
  and **multi** when it holds >= 2 capture rows (real merge
  evidence);
* the param is **safe** iff it has zero conflict classes AND at
  least ``min_multi`` multi classes — no counterevidence plus
  positive evidence, never vacuous safety from singleton classes.

Dataflow: one vectorized polars parse/explode per block (the p² pair
expansion is per-url, p = params per url, small), a per-block partial
fold to distinct ``(host, param, class, digest)`` counts — the text
and full urls never leave the block — then two narrow hash-bucket
exchanges: class-level digest-distinct counting, and (host, param)
rollup. At 100 TB the wire carries only the folded class partials.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data

from ..canon import hash64_batch
from .exchange import hash_bucket_apply

_SCHEME_HOST = r"^[a-z][a-z0-9+.\-]*://([^/?#]+)"
_SCHEME_PATH = r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)"
_QUERY = r"\?([^#]*)"


def _emit_class_partials(batch: pa.Table, url_col: str,
                         digest_col: str, nb: int) -> pa.Table:
    """One block -> folded (host, param, class, digest, n) partials."""
    df = pl.from_arrow(batch.select([url_col, digest_col])).rename(
        {url_col: "url", digest_col: "digest"}).with_row_index("rid")
    df = df.with_columns(
        host=pl.col("url").str.extract(_SCHEME_HOST, 1),
        path=pl.col("url").str.extract(_SCHEME_PATH, 1),
        qs=pl.col("url").str.extract(_QUERY, 1),
    ).filter(pl.col("qs").is_not_null() & (pl.col("qs") != "")
             & pl.col("host").is_not_null())
    empty = pa.table({
        "bucket": pa.array([], pa.int64()),
        "host": pa.array([], pa.string()),
        "param": pa.array([], pa.string()),
        "cls": pa.array([], pa.string()),
        "digest": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
    })
    if not df.height:
        return empty
    ex = (df.select("rid", "host", "path", "digest",
                    kv=pl.col("qs").str.split("&"))
          .explode("kv")
          .with_columns(k=pl.col("kv").str.extract(r"^([^=]*)", 1)))
    # one candidate row per (url row, param KEY); p² pair expansion to
    # collect each candidate's sorted remaining pairs
    base = ex.select("rid", "host", "path", "digest", "k").unique()
    rem = (base.select("rid", k_rm=pl.col("k"))
           .join(ex.select("rid", "kv", "k"), on="rid")
           .filter(pl.col("k") != pl.col("k_rm"))
           .group_by("rid", "k_rm")
           .agg(rest=pl.col("kv").sort().str.join("&")))
    out = (base.join(rem, left_on=["rid", "k"],
                     right_on=["rid", "k_rm"], how="left")
           .with_columns(rest=pl.col("rest").fill_null(""))
           .with_columns(cls=pl.col("host") + pl.col("path") + "?"
                         + pl.col("rest")))
    part = (out.group_by("host", "k", "cls", "digest")
            .agg(n=pl.len().cast(pl.Int64))
            .rename({"k": "param"}))
    if not part.height:
        return empty
    t = part.to_arrow()
    key = (part["host"] + "\x00" + part["param"] + "\x00"
           + part["cls"]).to_arrow()
    h = hash64_batch(key)
    return t.append_column(
        "bucket", pa.array((h % np.uint64(nb)).astype(np.int64),
                           pa.int64())).select(
        ["bucket", "host", "param", "cls", "digest", "n"])


def dust_params(ds: ray.data.Dataset, *, url_col: str = "url",
                digest_col: str = "digest", num_buckets: int = 32,
                min_multi: int = 1) -> ray.data.Dataset:
    """Mine per-(host, param) strip-safety verdicts from captures.

    Returns ``(host, param, n_urls, n_classes, n_multi, n_conflict,
    safe)`` — see module docstring for the exact semantics.
    """
    nb = num_buckets

    def emit(batch: pa.Table) -> pa.Table:
        return _emit_class_partials(batch, url_col, digest_col, nb)

    def merge_classes(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        cls = (df.group_by("host", "param", "cls")
               .agg(n_urls=pl.col("n").sum(),
                    n_dig=pl.col("digest").n_unique().cast(pl.Int64)))
        out = (cls.select(
            "host", "param",
            n_urls=pl.col("n_urls"),
            is_multi=(pl.col("n_urls") >= 2).cast(pl.Int64),
            is_conflict=(pl.col("n_dig") >= 2).cast(pl.Int64)))
        t2 = out.to_arrow()
        key = (out["host"] + "\x00" + out["param"]).to_arrow()
        h = hash64_batch(key)
        return t2.append_column(
            "bucket2", pa.array((h % np.uint64(nb)).astype(np.int64),
                                pa.int64()))

    def merge_params(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        agg = (df.group_by("host", "param")
               .agg(n_urls=pl.col("n_urls").sum(),
                    n_classes=pl.len().cast(pl.Int64),
                    n_multi=pl.col("is_multi").sum(),
                    n_conflict=pl.col("is_conflict").sum()))
        agg = agg.with_columns(
            safe=(pl.col("n_conflict") == 0)
            & (pl.col("n_multi") >= min_multi))
        return agg.to_arrow()

    partials = ds.map_batches(emit, batch_format="pyarrow",
                              batch_size=None)
    classes = hash_bucket_apply(partials, "bucket", merge_classes,
                                num_buckets=nb)
    return hash_bucket_apply(classes, "bucket2", merge_params,
                             num_buckets=nb)
