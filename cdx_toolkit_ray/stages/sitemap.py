"""Sitemap render / parse / discovery — the crawler's third URL
source next to seed lists and harvested outlinks.

The reference never fetches sitemaps (cdx_toolkit consumes CDX
indexes), but its own problem domain — Common-Crawl-style capture
tables — is produced by crawlers whose frontier is seeded from
exactly this chain: ``robots.txt`` names the sitemap
(``Sitemap: <url>`` lines, which the repo's robots renderer already
emits — pipelines/frontier.py render_robots_txt), the sitemap's
``<urlset>`` lists ``<url><loc>`` entries with optional
``<lastmod>``, and entries the crawler has never seen become
frontier candidates.

Everything here is stateless and vectorized (polars regex / string
kernels over whole batches); the only exchange is the host-bucket
group that assembles per-host XML in :func:`render_sitemaps` —
entries for one host must meet in one task to be numbered and
concatenated, so the stream it exchanges is the narrow
``(host, url, lastmod, order)`` projection, never document payloads.
At 10^10-URL scale each host's sitemap set is independent work; the
sitemap spec's 50k-URLs-per-file cap (``max_per_sitemap``) bounds
every rendered string.

XML escaping is real: crawl URLs contain ``&`` (query strings), so
render escapes the five XML entities and parse unescapes them —
``parse ∘ render`` must be the identity on arbitrary URL sets, which
is exactly what the ``sitemap_parse`` oracle checks (ground truth
stated directly from the seed formula, the parse_robots pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

# sitemaps.org protocol: escape these five in <loc> text. Order
# matters: '&' first on escape, last on unescape.
_XML_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
            ("'", "&apos;"), ('"', "&quot;")]

_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
_FOOTER = "</urlset>\n"


def _esc_expr(expr):
    for raw, ent in _XML_ESC:
        expr = expr.str.replace_all(raw, ent, literal=True)
    return expr


def _unesc_expr(expr):
    for raw, ent in reversed(_XML_ESC):
        expr = expr.str.replace_all(ent, raw, literal=True)
    return expr


def render_sitemaps(ds: ray.data.Dataset, *, host_col: str = "host",
                    url_col: str = "url",
                    lastmod_col: str | None = "lastmod",
                    order_col: str = "seed_order",
                    max_per_sitemap: int = 50_000,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """(host, url[, lastmod], order) rows -> one ``<urlset>`` XML body
    per (host, part), entries ordered by ``order_col`` and chunked at
    ``max_per_sitemap`` per file (the sitemaps.org 50k cap).

    One host-bucket exchange of the narrow projection; XML assembly is
    a vectorized polars pass per bucket (escape, concat, group join).
    Output: ``(host, part, n_urls, sitemap_xml)``.
    """
    from .exchange import hash_bucket_apply
    from ..canon import hash64_batch

    cols = [host_col, url_col, order_col]
    if lastmod_col is not None:
        cols.append(lastmod_col)
    proj = ds.map_batches(
        lambda b, c=cols: b.select(c).append_column(
            "_bkt", pa.array(
                hash64_batch(b[host_col].combine_chunks())
                % np.uint64(num_buckets), pa.int64())),
        batch_format="pyarrow", batch_size=None)

    def merge(tbl: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if tbl.num_rows == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64()),
                             "n_urls": pa.array([], pa.int64()),
                             "sitemap_xml": pa.array([], pa.string())})
        df = pl.from_arrow(tbl.drop_columns(["_bkt"])).sort(
            [host_col, order_col])
        lm = (pl.lit("") if lastmod_col is None else
              pl.when(pl.col(lastmod_col).is_not_null())
              .then("<lastmod>" + pl.col(lastmod_col) + "</lastmod>")
              .otherwise(pl.lit("")))
        df = df.with_columns(
            part=pl.int_range(pl.len()).over(host_col)
            // max_per_sitemap,
            entry="\n<url><loc>" + _esc_expr(pl.col(url_col))
            + "</loc>" + lm + "</url>")
        out = (df.group_by([host_col, "part"], maintain_order=True)
               .agg(n_urls=pl.len().cast(pl.Int64),
                    body=pl.col("entry").str.join(""))
               .with_columns(sitemap_xml=pl.lit(_HEADER)
                             + pl.col("body") + "\n" + pl.lit(_FOOTER))
               .drop("body"))
        t = out.to_arrow()
        return pa.table({
            "host": t[host_col].cast(pa.string()),
            "part": t["part"].cast(pa.int64()),
            "n_urls": t["n_urls"].cast(pa.int64()),
            "sitemap_xml": t["sitemap_xml"].cast(pa.string()),
        })

    return hash_bucket_apply(proj, "_bkt", merge,
                             num_buckets=num_buckets)


def parse_sitemap_batch(batch: pa.Table, *,
                        xml_col: str = "sitemap_xml",
                        keep_cols: tuple = ("host", "part")
                        ) -> pa.Table:
    """One ``<urlset>`` body per input row -> one output row per
    ``<url>`` entry: ``keep_cols + (url, lastmod)``.

    Vectorized: ``<url>...</url>`` blocks via one non-greedy
    ``extract_all`` + explode, then ``<loc>`` / optional ``<lastmod>``
    per block (missing ``<lastmod>`` -> null), entities unescaped.
    Malformed blocks (no ``<loc>``) are dropped, not errors — real
    sitemaps are hand-written often enough that a parser that throws
    is a parser that halts the crawl.
    """
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    keep = [c for c in keep_cols if c in batch.column_names]
    empty = pa.table(
        {**{c: pa.array([], batch.schema.field(c).type) for c in keep},
         "url": pa.array([], pa.string()),
         "lastmod": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    df = (pl.from_arrow(batch.select(keep + [xml_col]))
          .with_columns(_blk=pl.col(xml_col)
                        .str.extract_all(r"(?s)<url>.*?</url>"))
          .drop(xml_col)
          # empty match lists explode to null rows, dropped below
          # (explicit: the polars-2.0 default flips)
          .explode("_blk", empty_as_null=True)
          .drop_nulls("_blk"))
    if df.height == 0:
        return empty
    df = (df.with_columns(
        url=_unesc_expr(pl.col("_blk")
                        .str.extract(r"<loc>([^<]*)</loc>", 1)),
        lastmod=pl.col("_blk")
        .str.extract(r"<lastmod>([^<]*)</lastmod>", 1))
        .drop("_blk")
        .drop_nulls("url"))
    t = df.to_arrow()
    return pa.table(
        {**{c: t[c].cast(batch.schema.field(c).type) for c in keep},
         "url": t["url"].cast(pa.string()),
         "lastmod": t["lastmod"].cast(pa.string())})


def parse_sitemaps(ds: ray.data.Dataset, *,
                   xml_col: str = "sitemap_xml",
                   keep_cols: tuple = ("host", "part")
                   ) -> ray.data.Dataset:
    """Dataset wrapper over :func:`parse_sitemap_batch`."""
    return ds.map_batches(
        lambda b: parse_sitemap_batch(b, xml_col=xml_col,
                                      keep_cols=keep_cols),
        batch_format="pyarrow", batch_size=None)


_IDX_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n'
               '<sitemapindex '
               'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
_IDX_FOOTER = "</sitemapindex>\n"


def render_sitemap_index(ds: ray.data.Dataset, *,
                         host_col: str = "host",
                         part_col: str = "part",
                         scheme: str = "https",
                         num_buckets: int = 32) -> ray.data.Dataset:
    """(host, part, ...) rows — one per rendered sitemap file, i.e.
    :func:`render_sitemaps` output — -> one ``<sitemapindex>`` XML
    body per host naming every chunk as
    ``{scheme}://{host}/sitemap-{part}.xml`` in part order (the
    sitemaps.org nesting protocol for sites past the 50k-per-file
    cap; robots.txt then names ONE url, the index).

    Output: ``(host, n_sitemaps, index_xml)``. Same shape as
    :func:`render_sitemaps`: one host-bucket exchange of the narrow
    (host, part) projection, vectorized polars assembly per bucket.
    """
    from .exchange import hash_bucket_apply
    from ..canon import hash64_batch

    proj = ds.map_batches(
        lambda b: b.select([host_col, part_col]).append_column(
            "_bkt", pa.array(
                hash64_batch(b[host_col].combine_chunks())
                % np.uint64(num_buckets), pa.int64())),
        batch_format="pyarrow", batch_size=None)

    def merge(tbl: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if tbl.num_rows == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "n_sitemaps": pa.array([], pa.int64()),
                             "index_xml": pa.array([], pa.string())})
        df = (pl.from_arrow(tbl.drop_columns(["_bkt"]))
              .sort([host_col, part_col])
              .with_columns(
                  entry="\n<sitemap><loc>" + pl.lit(scheme + "://")
                  + _esc_expr(pl.col(host_col)) + "/sitemap-"
                  + pl.col(part_col).cast(pl.String)
                  + ".xml</loc></sitemap>"))
        out = (df.group_by(host_col, maintain_order=True)
               .agg(n_sitemaps=pl.len().cast(pl.Int64),
                    body=pl.col("entry").str.join(""))
               .with_columns(index_xml=pl.lit(_IDX_HEADER)
                             + pl.col("body") + "\n"
                             + pl.lit(_IDX_FOOTER))
               .drop("body"))
        t = out.to_arrow()
        return pa.table({
            "host": t[host_col].cast(pa.string()),
            "n_sitemaps": t["n_sitemaps"].cast(pa.int64()),
            "index_xml": t["index_xml"].cast(pa.string()),
        })

    return hash_bucket_apply(proj, "_bkt", merge,
                             num_buckets=num_buckets)


def parse_sitemap_index_batch(batch: pa.Table, *,
                              xml_col: str = "index_xml",
                              keep_cols: tuple = ("host",)
                              ) -> pa.Table:
    """One ``<sitemapindex>`` body per row -> one row per named
    sitemap: ``keep_cols + (sitemap_url,)``.  Same tolerance contract
    as :func:`parse_sitemap_batch`: blocks without a ``<loc>`` are
    dropped, entities unescape."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    keep = [c for c in keep_cols if c in batch.column_names]
    empty = pa.table(
        {**{c: pa.array([], batch.schema.field(c).type) for c in keep},
         "sitemap_url": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    df = (pl.from_arrow(batch.select(keep + [xml_col]))
          .with_columns(_blk=pl.col(xml_col)
                        .str.extract_all(r"(?s)<sitemap>.*?</sitemap>"))
          .drop(xml_col)
          .explode("_blk", empty_as_null=True)
          .drop_nulls("_blk")
          .with_columns(
              sitemap_url=_unesc_expr(
                  pl.col("_blk").str.extract(r"<loc>([^<]*)</loc>", 1)))
          .drop("_blk")
          .drop_nulls("sitemap_url"))
    if df.height == 0:
        return empty
    t = df.to_arrow()
    return pa.table(
        {**{c: t[c].cast(batch.schema.field(c).type) for c in keep},
         "sitemap_url": t["sitemap_url"].cast(pa.string())})


def extract_sitemap_urls_batch(batch: pa.Table, *,
                               host_col: str = "host",
                               text_col: str = "robots_txt"
                               ) -> pa.Table:
    """robots.txt bodies -> ``(host, sitemap_url)`` rows, one per
    ``Sitemap:`` line (the directive is case-insensitive per the
    robots RFC and may appear multiple times). Hosts whose robots
    names no sitemap emit no row."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if batch.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "sitemap_url": pa.array([], pa.string())})
    df = (pl.from_arrow(batch.select([host_col, text_col]))
          .with_columns(_sm=pl.col(text_col)
                        .str.extract_all(r"(?im)^sitemap:[ \t]*(\S+)"))
          .drop(text_col)
          .explode("_sm", empty_as_null=True)
          .drop_nulls("_sm")
          .with_columns(sitemap_url=pl.col("_sm")
                        .str.replace(r"(?i)^sitemap:[ \t]*", ""))
          .drop("_sm"))
    t = df.to_arrow()
    return pa.table({"host": t[host_col].cast(pa.string()),
                     "sitemap_url": t["sitemap_url"].cast(pa.string())})
