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

import re

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


def detect_traps(ds: ray.data.Dataset, *, url_col: str = "url",
                 host_col: str = "host", min_urls: int = 100,
                 num_buckets: int = 32) -> ray.data.Dataset:
    """Crawl-trap detection: flag (host, path-stem) groups spawning
    too many distinct URLs — calendars, session ids, faceted search —
    the unbounded URL spaces that eat a frontier's budget (the classic
    crawler-trap problem; the reference's only defense is its manual
    fgrep gates). A stem is the URL with query stripped and the last
    path segment removed; a stem carrying >= ``min_urls`` distinct
    URLs is a trap, and the frontier should cap or drop its tail.

    Output: ``(host, stem, n_urls, trap)``. Dataflow: per-block
    DISTINCT (host, stem, url-hash) partials (the url string itself
    never leaves its block), one stem-bucket exchange counts distinct
    hashes per group — run-length, never pairwise.
    """
    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nb = np.uint64(num_buckets)

    def emit(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        df = pl.DataFrame({
            "host": pl.from_arrow(batch[host_col].combine_chunks()
                                  .cast(pa.string())),
            "u": pl.from_arrow(batch[url_col].combine_chunks()
                               .cast(pa.string())),
        }).with_columns(
            noq=pl.col("u").fill_null("")
            .str.replace(r"\?.*$", ""))
        df = df.with_columns(
            stem=pl.col("noq").str.replace(r"/[^/]*$", "/"))
        uh = hash64_batch(df["u"].to_arrow()).astype(np.uint64)
        out = (df.select("host", "stem")
               .with_columns(uh=pl.Series(uh)).unique())
        sb = (hash64_batch(
            out.select(k=pl.col("host") + "\x00" + pl.col("stem"))
            ["k"].to_arrow()) % nb).astype(np.int64)
        return pa.table({
            "host": out["host"].to_arrow(),
            "stem": out["stem"].to_arrow(),
            "uh": pa.array(out["uh"].to_numpy(), pa.uint64()),
            "_sb": pa.array(sb),
        })

    def count_group(tbl: pa.Table) -> pa.Table:
        import polars as pl

        g = (pl.from_arrow(tbl).unique(["host", "stem", "uh"])
             .group_by("host", "stem")
             .agg(n_urls=pl.len().cast(pl.Int64)))
        return pa.table({
            "host": g["host"].to_arrow().cast(pa.string()),
            "stem": g["stem"].to_arrow().cast(pa.string()),
            "n_urls": g["n_urls"].to_arrow(),
            "trap": pa.array(
                (g["n_urls"].to_numpy() >= min_urls)),
        })

    pairs = ds.select_columns([host_col, url_col]).map_batches(
        emit, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(pairs, "_sb", count_group,
                             num_buckets=num_buckets)


TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref")


def strip_tracking_params(ds: ray.data.Dataset, *,
                          url_col: str = "url",
                          out_col: str = "clean_url") -> ray.data.Dataset:
    """Remove tracking query parameters (utm_*, fbclid, gclid,
    msclkid, ref) — the URL-identity normalization every web pipeline
    runs before dedup: two shares of the same page must collapse to
    one frontier entry. Parameters are FILTERED (split on '&', drop
    matching keys, rejoin), never regex-surgered in place, so
    separators stay well-formed; a query left empty drops its '?'; a
    fragment detaches first and re-appends, so the result is
    param-order independent. ``was_tracked`` is true whenever the URL
    changed — including degenerate queries (a bare trailing '?') that
    normalization removes. One stateless vectorized pass, zero
    shuffles. SURT canonicalization (canon.surt) then treats the
    cleaned URL exactly like any other."""

    def clean(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        pat = r"^(utm_[^=&]*|fbclid|gclid|msclkid|ref)="
        df = pl.DataFrame({"u": pl.from_arrow(
            batch[url_col].combine_chunks().cast(pa.string()))}) \
            .with_columns(
                frag=pl.col("u").fill_null("")
                .str.extract(r"(#.*)$", 1).fill_null(""),
                nofrag=pl.col("u").fill_null("")
                .str.replace(r"#.*$", ""))
        df = df.with_columns(
            base=pl.col("nofrag").str.replace(r"\?.*$", ""),
            q=pl.col("nofrag").str.extract(r"\?(.*)$", 1)
            .fill_null(""))
        df = df.with_columns(
            kept=pl.col("q").str.split("&")
            .list.eval(pl.element().filter(
                (pl.element() != "")
                & ~pl.element().str.contains(pat)))
            .list.join("&"))
        df = df.with_columns(
            clean=pl.when(pl.col("kept") == "")
            .then(pl.col("base") + pl.col("frag"))
            .otherwise(pl.col("base") + "?" + pl.col("kept")
                       + pl.col("frag")))
        changed = (df["clean"] != df["u"].fill_null("")).to_arrow()
        return batch.append_column(
            out_col, df["clean"].to_arrow().cast(pa.string())) \
            .append_column("was_tracked", changed)

    return ds.map_batches(clean, batch_format="pyarrow",
                          batch_size=None)


def spam_url_gate(*, lexicon: tuple = DEFAULT_LEXICON,
                  max_digits: int = 1, flag_query: bool = True,
                  url_col: str = "url"):
    """Batch-filter form of the spam gate for the crawl loop
    (``crawl_waves(url_gate=...)`` / ``run_crawl(url_gate=...,
    url_gate_tag='spamv1')``): drops rows whose URL trips the
    ``url_features`` verdict BEFORE the seen gate, so spam URLs are
    never offered, never fetched, and prune their subtrees. Stateless
    and deterministic — safe to re-apply on resume."""

    # NOTE: this predicate must stay equivalent to url_features'
    # verdict (contains('?') == n_params>0) — tests/test_crawl.py's
    # factory test and tests/test_urlfeat.py pin both

    def gate(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if batch.num_rows == 0:
            return batch
        lo = pl.Series(batch[url_col].combine_chunks()
                       .cast(pa.string())).fill_null("") \
            .str.to_lowercase()
        bad = sum((lo.str.contains(w, literal=True).cast(pl.Int64)
                   for w in lexicon),
                  start=pl.Series([0] * len(lo)))
        digits = lo.str.count_matches(r"[0-9]")
        params = lo.str.contains("?", literal=True)
        spam = (bad > 0) | ((digits > max_digits)
                            & (params if flag_query
                               else pl.Series([True] * len(lo))))
        return batch.filter(pa.array(~spam.to_numpy()))

    return gate


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 path normalization (scalar spec): ``.`` drops,
    ``..`` pops (clamped at root), a trailing dot segment leaves a
    trailing slash. Assumes a rooted path (leading ``/``)."""
    segs = path.split("/")
    out: list = []
    for s in segs:
        if s == ".":
            continue
        if s == "..":
            if len(out) > 1:  # never pop past the root ''
                out.pop()
            continue
        out.append(s)
    if segs and segs[-1] in (".", ".."):
        out.append("")
    return "/".join(out) or "/"


def strip_dot_segments(ds, *, url_col: str = "url",
                       out_col: str = "normalized_url"):
    """RFC 3986 dot-segment removal over a URL column — the
    URL-identity normalization SURT canonicalization (canon.surt)
    deliberately does not do (its oracle pins the no-path-rewrite
    spec): ``/a/./b`` and ``/a/x/../b`` must collapse to ``/a/b``
    before the frontier's exact dedup or the same page enters twice.

    Two-path kernel (the canon.py pattern): one vectorized polars scan
    flags the minority of URLs whose PATH contains a dot segment;
    clean rows pass through untouched, flagged rows route to the
    scalar RFC spec (query/fragment detach first and re-append —
    dots in query strings are data, not structure).
    """

    def kernel(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], pa.string()))
        u = pl.from_arrow(batch[url_col].combine_chunks()
                          .cast(pa.string()))
        # path = after the authority, before ?/#
        path = (u.str.replace(r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "")
                .str.replace(r"[?#].*$", ""))
        dirty = (path.str.contains(r"/\.\.?(/|$)")).fill_null(False)
        vals = u.to_numpy()
        out = vals.astype(object)
        for i in np.flatnonzero(dirty.to_numpy()):
            url = vals[i]
            m = re.match(r"^([a-z][a-z0-9+.\-]*://[^/?#]*)([^?#]*)(.*)$",
                         url)
            if not m:
                continue
            origin, p, tail = m.groups()
            out[i] = origin + remove_dot_segments(p or "/") + tail
        return batch.append_column(
            out_col, pa.array(out.tolist(), pa.string()))

    return ds.map_batches(kernel, batch_format="pyarrow",
                          batch_size=None)


# Toy public-suffix list: the well-known two-level suffixes the
# fixtures exercise. A production deployment swaps in the full PSL —
# the kernel below only reads this tuple.
TWO_LEVEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "net.au",
                      "co.jp", "ac.jp", "com.br", "co.in", "co.kr")


def registrable_domain_batch(batch: pa.Table, *,
                             host_col: str = "host",
                             out_col: str = "domain") -> pa.Table:
    """Host -> registrable domain (eTLD+1): the key crawl politeness
    and host-curation SHOULD group by — ``a.shop.co.uk`` and
    ``b.shop.co.uk`` are one owner, one budget (the reference's
    per-host intervals, myrequests.py:23-54, over-parallelize such
    sites). Suffix rule: a host ending in a known two-level suffix
    keeps three labels, anything else with a dot keeps two, a
    single-label host (localhost, intranet names) is its own domain.
    One vectorized polars pass: a single alternation regex for the
    suffix tier, a default capture for the rest."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if batch.num_rows == 0:
        return batch.append_column(out_col, pa.array([], pa.string()))
    alts = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
    h = pl.from_arrow(batch[host_col].combine_chunks()
                      .cast(pa.string()))
    df = pl.DataFrame({"h": h}).with_columns(
        two=pl.col("h").str.extract(
            r"([^.]+\.(?:" + alts + r"))$", 1),
        dflt=pl.col("h").str.extract(r"([^.]+\.[^.]+)$", 1))
    dom = (df.select(d=pl.coalesce(pl.col("two"), pl.col("dflt"),
                                   pl.col("h")))["d"]
           .to_arrow().cast(pa.string()))
    return batch.append_column(out_col, dom)


def url_templates(ds: ray.data.Dataset, *, url_col: str = "url",
                  digest_col: str = "digest",
                  num_buckets: int = 32) -> ray.data.Dataset:
    """URL template mining — collapse every digit run in the path to
    ``<n>`` and the query string to its sorted parameter keys, then
    profile each ``(host, template)`` class: ``(n_captures, n_urls,
    n_digests)``. The URL-space map a crawler budgets from: a
    template with millions of distinct urls but a handful of digests
    is a crawl trap (calendars, session mirrors); one url-per-digest
    templates are real content (the generalization step of DUST-style
    rule mining over path structure instead of parameters).

    Per block: one vectorized polars parse + fold to distinct
    ``(host, template, url, digest)`` rows with capture counts — the
    exchange then carries one row per distinct url per block, keyed
    by ``hash64(host\\x00template)``.
    """
    import polars as pl

    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def emit(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("_b", pa.int64()), ("host", pa.string()),
                         ("template", pa.string()), ("url", pa.string()),
                         ("digest", pa.string()), ("n", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        df = pl.from_arrow(batch.select([url_col, digest_col])).rename(
            {url_col: "url", digest_col: "digest"})
        df = df.with_columns(
            host=pl.col("url").str.extract(
                r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1),
            tpath=pl.col("url").str.extract(
                r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
            .str.replace_all(r"\d+", "<n>"),
            qs=pl.col("url").str.extract(r"\?([^#]*)", 1),
        ).filter(pl.col("host").is_not_null() & (pl.col("host") != ""))
        if not df.height:
            return sch.empty_table()
        df = df.with_columns(
            template=pl.col("tpath")
            + pl.when(pl.col("qs").is_not_null() & (pl.col("qs") != ""))
            .then("?" + pl.col("qs").str.split("&")
                  .list.eval(pl.element().str.extract(r"^([^=]*)", 1))
                  .list.sort().list.join("&"))
            .otherwise(pl.lit("")))
        part = (df.group_by("host", "template", "url", "digest")
                .agg(n=pl.len().cast(pl.Int64)))
        t = part.to_arrow()
        key = (part["host"] + "\x00" + part["template"]).to_arrow()
        h = hash64_batch(key)
        return t.append_column(
            "_b", pa.array((h % nbu).astype(np.int64), pa.int64())
        ).select(["_b", "host", "template", "url", "digest", "n"])

    def merge(t: pa.Table) -> pa.Table:
        agg = (pl.from_arrow(t)
               .group_by("host", "template")
               .agg(n_captures=pl.col("n").sum(),
                    n_urls=pl.col("url").n_unique().cast(pl.Int64),
                    n_digests=pl.col("digest").n_unique()
                    .cast(pl.Int64)))
        return agg.to_arrow()

    rows = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(rows, "_b", merge, num_buckets=num_buckets)
