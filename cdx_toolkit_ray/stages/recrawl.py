"""Change-rate-driven recrawl scheduling from capture history.

The crawl-side twin of the politeness scheduler: given the capture
history of each page (its CDX rows — timestamp + content digest, the
reference's (urlkey, timestamp, digest) triple, cdx_toolkit
README.md:207-212), estimate how often the page actually changes and
schedule the next fetch accordingly — the standard freshness policy
(Cho & Garcia-Molina 2003): pages that changed k times over an
observed span get revisited about every span/k; pages never observed
to change decay to the maximum interval.

Deterministic integer semantics (so the DuckDB oracle compares
bit-for-bit):

* per page key: ``n_caps`` captures, ``n_versions`` distinct digests,
  first/last capture time (µs)
* ``changes = n_versions - 1``
* ``interval_us = base`` when fewer than 2 captures or no observed
  change, else ``clamp((last - first) // changes, lo, hi)``
* ``next_fetch_us = last + interval_us``

Dataflow: per-block partial reduce to distinct (key, digest-hash)
rows carrying (count, min, max) — the shuffle moves one row per
distinct (page, version) per block, not one per capture — then one
key-bucket task-graph exchange whose kernel folds pairs to pages with
two run-length passes. Digests travel as FNV-1a 64 hashes (a collision
would undercount versions; at 64 bits that is negligible and the
fixture oracle counts the same strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..canon import hash64_batch


def _run_starts(sorted_codes: np.ndarray) -> np.ndarray:
    new = np.ones(len(sorted_codes), bool)
    new[1:] = sorted_codes[1:] != sorted_codes[:-1]
    return np.flatnonzero(new)


def recrawl_schedule(ds: ray.data.Dataset, *, key_col: str,
                     ts_col: str, digest_col: str,
                     base_interval_us: int = 7 * 86400 * 1_000_000,
                     min_interval_us: int = 86400 * 1_000_000,
                     max_interval_us: int = 30 * 86400 * 1_000_000,
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Capture history -> (key, n_caps, n_versions, last_us,
    interval_us, next_fetch_us). ``ts_col`` must be a timestamp[us]
    or int64-µs column."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        dig = hash64_batch(batch[digest_col]).astype(np.uint64)
        order = np.lexsort((dig, k))
        ks, ds_, tss = k[order], dig[order], ts[order]
        # run starts over the (key, digest) pair, vectorized
        new = np.ones(len(ks), bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(ks)])
        mins = np.minimum.reduceat(tss, starts)
        maxs = np.maximum.reduceat(tss, starts)
        return pa.table({
            "key": pa.array(ks[starts].astype(np.int64)),
            "dig": pa.array(ds_[starts], pa.uint64()),
            "n": pa.array(n.astype(np.int64)),
            "min_us": pa.array(mins, pa.int64()),
            "max_us": pa.array(maxs, pa.int64()),
            "_kb": pa.array((ks[starts].astype(np.uint64)
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    base, lo, hi = base_interval_us, min_interval_us, max_interval_us

    def reduce_pages(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("key", pa.int64()), ("n_caps", pa.int64()),
                         ("n_versions", pa.int64()),
                         ("last_us", pa.int64()),
                         ("interval_us", pa.int64()),
                         ("next_fetch_us", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        k = tbl["key"].to_numpy(zero_copy_only=False)
        dg = tbl["dig"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        mn = tbl["min_us"].to_numpy(zero_copy_only=False)
        mx = tbl["max_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dg, k))
        k, dg, n, mn, mx = (k[order], dg[order], n[order], mn[order],
                            mx[order])
        # fold cross-block duplicates of the same (key, digest) pair
        new = np.ones(len(k), bool)
        new[1:] = (k[1:] != k[:-1]) | (dg[1:] != dg[:-1])
        ps = np.flatnonzero(new)
        pk = k[ps]
        pn = np.add.reduceat(n, ps)
        pmn = np.minimum.reduceat(mn, ps)
        pmx = np.maximum.reduceat(mx, ps)
        # fold pairs to pages
        ks = _run_starts(pk)
        n_caps = np.add.reduceat(pn, ks)
        n_ver = np.diff(np.r_[ks, len(pk)])
        first = np.minimum.reduceat(pmn, ks)
        last = np.maximum.reduceat(pmx, ks)
        changes = n_ver - 1
        span = last - first
        with np.errstate(divide="ignore", invalid="ignore"):
            est = np.where(changes > 0, span // np.maximum(changes, 1),
                           base)
        interval = np.where((n_caps <= 1) | (changes == 0), base,
                            np.clip(est, lo, hi)).astype(np.int64)
        return pa.table({
            "key": pa.array(pk[ks].astype(np.int64)),
            "n_caps": pa.array(n_caps.astype(np.int64)),
            "n_versions": pa.array(n_ver.astype(np.int64)),
            "last_us": pa.array(last, pa.int64()),
            "interval_us": pa.array(interval),
            "next_fetch_us": pa.array(last + interval, pa.int64()),
        })

    from .exchange import hash_bucket_apply

    return hash_bucket_apply(partials, "_kb", reduce_pages,
                             num_buckets=num_buckets)


def revalidation_plan(ds: ray.data.Dataset, *, key_col: str,
                      ts_col: str, digest_col: str, cutoff_us: int,
                      base_interval_us: int = 7 * 86400 * 1_000_000,
                      min_interval_us: int = 86400 * 1_000_000,
                      max_interval_us: int = 30 * 86400 * 1_000_000,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """Conditional-fetch planning: capture history -> one row per page
    with the recrawl schedule PLUS the HTTP revalidation headers the
    next fetch should send — ``etag`` (the latest capture's digest,
    for ``If-None-Match``) and ``if_modified_since`` (the latest
    capture time as an RFC 9110 HTTP-date), and ``due`` = next_fetch
    <= ``cutoff_us``.  The reference fetches unconditionally
    (myrequests.py has no conditional-header support); a polite
    incremental crawler revalidates instead, turning unchanged pages
    into 304-sized responses.

    Latest capture = max ``(ts, digest)`` lexicographic (the
    crawl_delta rule, deterministic under ties).  One key-bucket
    exchange, same partial shape as :func:`recrawl_schedule` with the
    digest string carried per distinct (key, digest) pair — the
    shuffle moves versions, never captures.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("key", pa.int64()), ("dig", pa.uint64()),
                         ("dig_s", pa.string()), ("n", pa.int64()),
                         ("min_us", pa.int64()), ("max_us", pa.int64()),
                         ("_kb", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        k = batch[key_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        dig_s = batch[digest_col].to_numpy(zero_copy_only=False)
        dig = hash64_batch(batch[digest_col]).astype(np.uint64)
        order = np.lexsort((dig, k))
        ks, ds_, tss, dss = k[order], dig[order], ts[order], dig_s[order]
        new = np.ones(len(ks), bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(ks)])
        return pa.table({
            "key": pa.array(ks[starts].astype(np.int64)),
            "dig": pa.array(ds_[starts], pa.uint64()),
            "dig_s": pa.array(dss[starts].tolist(), pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "min_us": pa.array(np.minimum.reduceat(tss, starts),
                               pa.int64()),
            "max_us": pa.array(np.maximum.reduceat(tss, starts),
                               pa.int64()),
            "_kb": pa.array((ks[starts].astype(np.uint64)
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    base, lo, hi = base_interval_us, min_interval_us, max_interval_us

    def reduce_pages(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("key", pa.int64()), ("n_caps", pa.int64()),
                         ("n_versions", pa.int64()),
                         ("last_us", pa.int64()),
                         ("next_fetch_us", pa.int64()),
                         ("etag", pa.string()),
                         ("if_modified_since", pa.string()),
                         ("due", pa.bool_())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        k = tbl["key"].to_numpy(zero_copy_only=False)
        dg = tbl["dig"].to_numpy(zero_copy_only=False)
        dgs = tbl["dig_s"].to_numpy(zero_copy_only=False).astype(str)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        mn = tbl["min_us"].to_numpy(zero_copy_only=False)
        mx = tbl["max_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dg, k))
        k, dg, dgs, n, mn, mx = (k[order], dg[order], dgs[order],
                                 n[order], mn[order], mx[order])
        new = np.ones(len(k), bool)
        new[1:] = (k[1:] != k[:-1]) | (dg[1:] != dg[:-1])
        ps = np.flatnonzero(new)
        pk, pdgs = k[ps], dgs[ps]
        pn = np.add.reduceat(n, ps)
        pmn = np.minimum.reduceat(mn, ps)
        pmx = np.maximum.reduceat(mx, ps)
        ks = _run_starts(pk)
        n_caps = np.add.reduceat(pn, ks)
        n_ver = np.diff(np.r_[ks, len(pk)])
        first = np.minimum.reduceat(pmn, ks)
        last = np.maximum.reduceat(pmx, ks)
        # latest (ts, digest) pair per key: lexsort pairs by
        # (key, max_us, digest) and take each key's final row
        lorder = np.lexsort((pdgs, pmx, pk))
        lk = pk[lorder]
        is_last = np.ones(len(lk), bool)
        is_last[:-1] = lk[1:] != lk[:-1]
        etag = pdgs[lorder][is_last]
        changes = n_ver - 1
        span = last - first
        est = np.where(changes > 0, span // np.maximum(changes, 1), base)
        interval = np.where((n_caps <= 1) | (changes == 0), base,
                            np.clip(est, lo, hi)).astype(np.int64)
        nxt = last + interval
        # floor to seconds first: Arrow %S would print fractional
        # digits for a sub-second unit (DuckDB's %S truncates)
        ims = pc.strftime(
            pc.cast(pc.floor_temporal(
                pa.array(last, pa.timestamp("us")), unit="second"),
                pa.timestamp("s")),
            format="%a, %d %b %Y %H:%M:%S GMT")
        return pa.table({
            "key": pa.array(pk[ks].astype(np.int64)),
            "n_caps": pa.array(n_caps.astype(np.int64)),
            "n_versions": pa.array(n_ver.astype(np.int64)),
            "last_us": pa.array(last, pa.int64()),
            "next_fetch_us": pa.array(nxt, pa.int64()),
            "etag": pa.array(etag.tolist(), pa.string()),
            "if_modified_since": ims,
            "due": pa.array(nxt <= cutoff_us),
        })

    from .exchange import hash_bucket_apply

    return hash_bucket_apply(partials, "_kb", reduce_pages,
                             num_buckets=num_buckets)


def crawl_delta(a: ray.data.Dataset, b: ray.data.Dataset, *,
                key_col: str = "urlkey", ts_col: str = "timestamp",
                digest_col: str = "digest",
                num_buckets: int = 32) -> ray.data.Dataset:
    """Cross-crawl diff: compare the LATEST capture per key in snapshot
    ``a`` (the older crawl) vs snapshot ``b`` -> one row per key with
    ``status`` in {added, gone, changed, same} plus both digests (null
    on the absent side). The anti-join-flavored primitive of an
    incremental crawl: 'added' keys are the fetch list, 'changed' keys
    feed the recrawl scheduler.

    Latest = max ``(ts, digest)`` lexicographic (CDX 14-digit
    timestamps sort chronologically as strings; the digest tie-break
    makes equal-timestamp rows deterministic) — the same rule as the
    oracle's ``row_number() OVER (ORDER BY ts DESC, digest DESC)``.

    Dataflow: each block reduces to one latest row per key per side
    BEFORE the shuffle (the exchange moves one narrow row per distinct
    key per block, not one per capture), then one key-bucket exchange
    whose kernel re-folds per (key, side) and emits the comparison.
    """

    def partial(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            sch = pa.schema([("_kb", pa.int64()), ("key", pa.string()),
                             ("side", pa.int8()), ("ts", pa.string()),
                             ("dig", pa.string())])
            if batch.num_rows == 0:
                return sch.empty_table()
            k = batch[key_col].to_numpy(zero_copy_only=False)
            ts = batch[ts_col].to_numpy(zero_copy_only=False)
            dg = batch[digest_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((dg, ts, k))
            k, ts, dg = k[order], ts[order], dg[order]
            last = np.ones(len(k), bool)
            last[:-1] = k[1:] != k[:-1]
            li = np.flatnonzero(last)
            key = pa.array(k[li], pa.string())
            kb = (hash64_batch(key) % np.uint64(num_buckets)
                  ).astype(np.int64)
            return pa.table({
                "_kb": pa.array(kb, pa.int64()),
                "key": key,
                "side": pa.array(np.full(len(li), side, np.int8)),
                "ts": pa.array(ts[li], pa.string()),
                "dig": pa.array(dg[li], pa.string()),
            })
        return fn

    def compare(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("urlkey", pa.string()),
                         ("status", pa.string()),
                         ("digest_a", pa.string()),
                         ("digest_b", pa.string())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        k = tbl["key"].to_numpy(zero_copy_only=False)
        sd = tbl["side"].to_numpy(zero_copy_only=False)
        ts = tbl["ts"].to_numpy(zero_copy_only=False)
        dg = tbl["dig"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dg, ts, sd, k))
        k, sd, dg = k[order], sd[order], dg[order]
        # last row of each (key, side) run = that side's latest
        last = np.ones(len(k), bool)
        last[:-1] = (k[1:] != k[:-1]) | (sd[1:] != sd[:-1])
        li = np.flatnonzero(last)
        lk, ls, ld = k[li], sd[li], dg[li]
        ks = _run_starts(lk)
        cnt = np.diff(np.r_[ks, len(lk)])
        n = len(ks)
        dig_a = np.full(n, None, dtype=object)
        dig_b = np.full(n, None, dtype=object)
        status = np.empty(n, dtype=object)
        both = cnt == 2
        bi = ks[both]
        dig_a[both] = ld[bi]
        dig_b[both] = ld[bi + 1]
        status[both] = np.where(ld[bi] == ld[bi + 1], "same", "changed")
        only = ~both
        oi = ks[only]
        is_a = ls[oi] == 0
        dig_a[only] = np.where(is_a, ld[oi], None)
        dig_b[only] = np.where(is_a, None, ld[oi])
        status[only] = np.where(is_a, "gone", "added")
        return pa.table({
            "urlkey": pa.array(lk[ks], pa.string()),
            "status": pa.array(status, pa.string()),
            "digest_a": pa.array(dig_a, pa.string()),
            "digest_b": pa.array(dig_b, pa.string()),
        })

    from .exchange import hash_bucket_apply

    keyed = (a.map_batches(partial(0), batch_format="pyarrow",
                           batch_size=None)
             .union(b.map_batches(partial(1), batch_format="pyarrow",
                                  batch_size=None)))
    return hash_bucket_apply(keyed, "_kb", compare,
                             num_buckets=num_buckets)


def compact_captures(ds: ray.data.Dataset, *, key_col: str = "urlkey",
                     ts_col: str = "timestamp",
                     digest_col: str = "digest",
                     url_col: str = "url", status_col: str = "status",
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Capture-log compaction (the 'latest index' materialization of
    an incremental crawl): collapse the multi-crawl capture stream to
    ONE row per urlkey — the latest capture's payload plus history
    digests. Reference users build this by iterating captures sorted
    (urlkey, timestamp) and keeping the last per key (the O1 ordering
    contract, reference README.md:243-252); here it is a single
    bounded exchange.

    Output per key: ``(urlkey, timestamp, url, status, digest,
    n_captures, n_versions, first_ts)`` where latest = lexicographic
    max ``(timestamp, digest, url, status)`` (total order -> arrival-
    order independent; CDX 14-digit timestamps sort chronologically as
    strings), ``n_versions`` counts distinct digests and ``first_ts``
    is the earliest capture.

    Dataflow: each block folds to one row per distinct (key, digest)
    — capture count, min/max ts, and the payload of that digest's max
    row — BEFORE the shuffle, so the exchange moves O(distinct
    versions per block), not O(captures). One key-bucket exchange
    merges: counts sum, versions fold by run-length, the latest row
    wins by the same total order.
    """
    nbu = np.uint64(num_buckets)

    part_sch = pa.schema([
        ("_kb", pa.int64()), ("key", pa.string()), ("dig", pa.string()),
        ("cnt", pa.int64()), ("min_ts", pa.string()),
        ("max_ts", pa.string()), ("url", pa.string()),
        ("status", pa.string())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_sch.empty_table()
        k = batch[key_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        dg = batch[digest_col].to_numpy(zero_copy_only=False)
        u = batch[url_col].to_numpy(zero_copy_only=False)
        st = batch[status_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, u, ts, dg, k))
        k, ts, dg, u, st = (k[order], ts[order], dg[order], u[order],
                            st[order])
        new = np.ones(len(k), bool)
        new[1:] = (k[1:] != k[:-1]) | (dg[1:] != dg[:-1])
        starts = np.flatnonzero(new)
        last = np.append(starts[1:], len(k)) - 1
        cnt = np.diff(np.append(starts, len(k)))
        key = pa.array(k[starts], pa.string())
        kb = (hash64_batch(key) % nbu).astype(np.int64)
        return pa.table({
            "_kb": pa.array(kb, pa.int64()),
            "key": key,
            "dig": pa.array(dg[starts], pa.string()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "min_ts": pa.array(ts[starts], pa.string()),
            "max_ts": pa.array(ts[last], pa.string()),
            "url": pa.array(u[last], pa.string()),
            "status": pa.array(st[last], pa.string()),
        })

    out_sch = pa.schema([
        ("urlkey", pa.string()), ("timestamp", pa.string()),
        ("url", pa.string()), ("status", pa.string()),
        ("digest", pa.string()), ("n_captures", pa.int64()),
        ("n_versions", pa.int64()), ("first_ts", pa.string())])

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_sch.empty_table()
        k = tbl["key"].to_numpy(zero_copy_only=False)
        dg = tbl["dig"].to_numpy(zero_copy_only=False)
        cnt = tbl["cnt"].to_numpy(zero_copy_only=False)
        mts = tbl["min_ts"].to_numpy(zero_copy_only=False)
        xts = tbl["max_ts"].to_numpy(zero_copy_only=False)
        u = tbl["url"].to_numpy(zero_copy_only=False)
        st = tbl["status"].to_numpy(zero_copy_only=False)
        # latest per key by (max_ts, dig, url, status): sort so the
        # winner is the last row of each key run
        order = np.lexsort((st, u, dg, xts, k))
        k, dg, cnt, mts, xts, u, st = (k[order], dg[order], cnt[order],
                                       mts[order], xts[order], u[order],
                                       st[order])
        knew = np.ones(len(k), bool)
        knew[1:] = k[1:] != k[:-1]
        kstarts = np.flatnonzero(knew)
        klast = np.append(kstarts[1:], len(k)) - 1
        n_caps = np.add.reduceat(cnt, kstarts)
        first_ts = np.minimum.reduceat(mts, kstarts)
        # distinct digests per key: (key, dig) run-length over a
        # (key, dig)-sorted view
        dorder = np.lexsort((dg, k))
        kd_k, kd_d = k[dorder], dg[dorder]
        dnew = np.ones(len(kd_k), bool)
        dnew[1:] = (kd_k[1:] != kd_k[:-1]) | (kd_d[1:] != kd_d[:-1])
        # count distinct-(key,dig) runs per key
        kd_knew = np.ones(len(kd_k), bool)
        kd_knew[1:] = kd_k[1:] != kd_k[:-1]
        n_vers = np.add.reduceat(dnew.astype(np.int64),
                                 np.flatnonzero(kd_knew))
        return pa.table({
            "urlkey": pa.array(k[kstarts], pa.string()),
            "timestamp": pa.array(xts[klast], pa.string()),
            "url": pa.array(u[klast], pa.string()),
            "status": pa.array(st[klast], pa.string()),
            "digest": pa.array(dg[klast], pa.string()),
            "n_captures": pa.array(n_caps.astype(np.int64), pa.int64()),
            "n_versions": pa.array(n_vers.astype(np.int64), pa.int64()),
            "first_ts": pa.array(first_ts, pa.string()),
        })

    from .exchange import hash_bucket_apply

    cols = [key_col, ts_col, digest_col, url_col, status_col]
    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(partials, "_kb", merge,
                             num_buckets=num_buckets)


def crawl_report(ds: ray.data.Dataset, *, crawl_col: str = "crawl",
                 key_col: str = "urlkey", url_col: str = "url",
                 status_col: str = "status", mime_col: str = "mime",
                 num_buckets: int = 8) -> ray.data.Dataset:
    """Per-crawl operations report — the dashboard rollup a crawl
    operator reads after every run (reference users assemble it from
    `cdxt size --details` + ad-hoc scripts, reference cli.py:119-122):
    one row per crawl partition with ``n_captures``, ``n_urlkeys``
    (distinct), ``n_hosts`` (distinct url hosts), ``n_ok`` (status
    2xx), ``n_redirect`` (3xx), ``n_error`` (4xx/5xx), ``n_revisit``
    (mime == 'warc/revisit', the M13 marker).

    Scale shape: each block folds to one partial row per crawl for
    the additive counters plus distinct-key partial sets hashed to
    64-bit (so the exchange moves hashes, not urlkeys); one
    crawl-keyed exchange merges (counters sum, distinct sets fold by
    run-length over the hash stream).
    """
    from ..canon import hash64_batch

    nbu = np.uint64(num_buckets)

    part_sch = pa.schema([
        ("_cb", pa.int64()), ("crawl", pa.string()),
        ("kind", pa.int8()),            # 0 = counters, 1 = key, 2 = host
        ("h", pa.uint64()),             # hash for kind 1/2
        ("n_captures", pa.int64()), ("n_ok", pa.int64()),
        ("n_redirect", pa.int64()), ("n_error", pa.int64()),
        ("n_revisit", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_sch.empty_table()
        import pandas as pd
        import polars as pl

        crawl = batch[crawl_col].to_numpy(zero_copy_only=False)
        st = batch[status_col].to_numpy(zero_copy_only=False)
        mime = batch[mime_col].to_numpy(zero_copy_only=False)
        first = np.array([s[0] if s else "-" for s in st], dtype=object)
        ok = (first == "2").astype(np.int64)
        redir = (first == "3").astype(np.int64)
        err = ((first == "4") | (first == "5")).astype(np.int64)
        rev = (mime == "warc/revisit").astype(np.int64)

        codes, uniq = pd.factorize(crawl, sort=True)
        nc = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        agg = {
            "n_ok": np.bincount(codes, ok, len(uniq)).astype(np.int64),
            "n_redirect": np.bincount(codes, redir,
                                      len(uniq)).astype(np.int64),
            "n_error": np.bincount(codes, err,
                                   len(uniq)).astype(np.int64),
            "n_revisit": np.bincount(codes, rev,
                                     len(uniq)).astype(np.int64),
        }
        rows_crawl = [str(u) for u in uniq]
        zero = np.zeros(len(uniq), np.int64)
        tables = [pa.table({
            "_cb": pa.array((hash64_batch(np.array(rows_crawl,
                                                   dtype=object))
                             % nbu).astype(np.int64), pa.int64()),
            "crawl": pa.array(rows_crawl, pa.string()),
            "kind": pa.array(np.zeros(len(uniq), np.int8)),
            "h": pa.array(np.zeros(len(uniq), np.uint64), pa.uint64()),
            "n_captures": pa.array(nc, pa.int64()),
            "n_ok": pa.array(agg["n_ok"], pa.int64()),
            "n_redirect": pa.array(agg["n_redirect"], pa.int64()),
            "n_error": pa.array(agg["n_error"], pa.int64()),
            "n_revisit": pa.array(agg["n_revisit"], pa.int64()),
        })]
        # distinct (crawl, hash) partials for urlkeys and hosts
        host = (pl.DataFrame({"u": pl.from_arrow(
                    batch[url_col].combine_chunks().cast(pa.string()))})
                .select(pl.col("u").str.extract(r"://([^/]+)", 1))
                ["u"].to_numpy().astype(object))
        for kind, vals in ((1, batch[key_col]
                            .to_numpy(zero_copy_only=False)),
                           (2, host)):
            # null keys/hosts (e.g. a host-less dns: or malformed url)
            # are NOT distinct values — SQL's COUNT(DISTINCT ...)
            # ignores NULLs, so drop them before hashing rather than
            # aliasing them all onto hash64("")
            keep = vals != None  # noqa: E711
            kvals, kcodes = vals[keep], codes[keep]
            hv = hash64_batch(kvals.astype(object))
            order = np.lexsort((hv, kcodes))
            cs, hs = kcodes[order], hv[order]
            new = np.ones(len(cs), bool)
            new[1:] = (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1])
            idx = np.flatnonzero(new)
            cr = np.array(rows_crawl, dtype=object)[cs[idx]]
            nz = np.zeros(len(idx), np.int64)
            tables.append(pa.table({
                "_cb": pa.array((hash64_batch(cr) % nbu)
                                .astype(np.int64), pa.int64()),
                "crawl": pa.array(cr, pa.string()),
                "kind": pa.array(np.full(len(idx), kind, np.int8)),
                "h": pa.array(hs[idx], pa.uint64()),
                "n_captures": pa.array(nz, pa.int64()),
                "n_ok": pa.array(nz, pa.int64()),
                "n_redirect": pa.array(nz, pa.int64()),
                "n_error": pa.array(nz, pa.int64()),
                "n_revisit": pa.array(nz, pa.int64()),
            }))
        return pa.concat_tables(tables)

    out_sch = pa.schema([
        ("crawl", pa.string()), ("n_captures", pa.int64()),
        ("n_urlkeys", pa.int64()), ("n_hosts", pa.int64()),
        ("n_ok", pa.int64()), ("n_redirect", pa.int64()),
        ("n_error", pa.int64()), ("n_revisit", pa.int64())])

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_sch.empty_table()
        crawl = tbl["crawl"].to_numpy(zero_copy_only=False)
        kind = tbl["kind"].to_numpy(zero_copy_only=False)
        h = tbl["h"].to_numpy(zero_copy_only=False)
        uniq = np.unique(crawl)
        rows = []
        for c in uniq:
            m = crawl == c
            cnt = {n: int(tbl[n].to_numpy(zero_copy_only=False)[m]
                          [kind[m] == 0].sum())
                   for n in ("n_captures", "n_ok", "n_redirect",
                             "n_error", "n_revisit")}
            nk = len(np.unique(h[m & (kind == 1)]))
            nh = len(np.unique(h[m & (kind == 2)]))
            rows.append((c, cnt["n_captures"], nk, nh, cnt["n_ok"],
                         cnt["n_redirect"], cnt["n_error"],
                         cnt["n_revisit"]))
        cols = list(zip(*rows))
        return pa.table({
            "crawl": pa.array(cols[0], pa.string()),
            "n_captures": pa.array(cols[1], pa.int64()),
            "n_urlkeys": pa.array(cols[2], pa.int64()),
            "n_hosts": pa.array(cols[3], pa.int64()),
            "n_ok": pa.array(cols[4], pa.int64()),
            "n_redirect": pa.array(cols[5], pa.int64()),
            "n_error": pa.array(cols[6], pa.int64()),
            "n_revisit": pa.array(cols[7], pa.int64()),
        })

    from .exchange import hash_bucket_apply

    cols = [crawl_col, key_col, url_col, status_col, mime_col]
    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(partials, "_cb", merge,
                             num_buckets=num_buckets)


def revisit_resolve(ds: ray.data.Dataset, *, key_col: str = "urlkey",
                    ts_col: str = "timestamp", url_col: str = "url",
                    mime_col: str = "mime", digest_col: str = "digest",
                    num_buckets: int = 32) -> ray.data.Dataset:
    """Resolve every revisit record to the capture it revisits: the
    LATEST prior non-revisit capture of the same urlkey (strictly
    earlier timestamp). The reference resolves revisits lazily one at
    a time when content is fetched (cdx_toolkit/__init__.py:101-121 +
    warc.py's revisit handling); this is the batch twin over the whole
    capture log.

    Output: one row per revisit — ``(urlkey, timestamp, url,
    refers_to_timestamp, refers_to_digest, anomaly)`` with
    ``anomaly='revisit_orphan'`` when no prior response exists (the
    case the reference surfaces as an unresolvable revisit).

    Dataflow: blocks project to five narrow columns, one urlkey-hash
    bucket exchange co-locates each key's history, and the kernel is a
    single lexsort + cumulative-max scan per bucket (no per-key
    Python). The exchange moves O(captures) narrow rows — inherent:
    the link needs every capture of a key together; the wide payload
    columns never travel.
    """
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)
    out_sch = pa.schema([
        ("urlkey", pa.string()), ("timestamp", pa.string()),
        ("url", pa.string()), ("refers_to_timestamp", pa.string()),
        ("refers_to_digest", pa.string()), ("anomaly", pa.string())])

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # rows without a urlkey or timestamp cannot participate in
        # linking (and None breaks the object-array lexsort) — drop
        # them here, matching the oracle's inner-join semantics
        ok = pc.and_(pc.is_valid(batch[key_col]),
                     pc.is_valid(batch[ts_col]))
        batch = batch.filter(ok)
        kb = (hash64_batch(batch[key_col]) % nbu).astype(np.int64)
        return pa.table({
            "_kb": pa.array(kb, pa.int64()),
            "key": batch[key_col].cast(pa.string()),
            "ts": batch[ts_col].cast(pa.string()),
            "url": batch[url_col].cast(pa.string()),
            "mime": batch[mime_col].cast(pa.string()),
            "dig": batch[digest_col].cast(pa.string()),
        })

    def resolve(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_sch.empty_table()
        k = tbl["key"].to_numpy(zero_copy_only=False)
        ts = tbl["ts"].to_numpy(zero_copy_only=False)
        u = tbl["url"].to_numpy(zero_copy_only=False)
        mm = tbl["mime"].to_numpy(zero_copy_only=False)
        dg = tbl["dig"].to_numpy(zero_copy_only=False)
        # within an equal (key, ts) tie, revisits sort BEFORE
        # responses so the at-or-before scan below implements the
        # STRICTLY-earlier rule (oracle: p.timestamp < r.timestamp) —
        # without the flag, a same-timestamp response would resolve
        # the revisit or not depending on input row order
        resp0 = (mm != "warc/revisit").astype(np.int8)
        order = np.lexsort((resp0, ts, k))
        k, ts, u, mm, dg = (k[order], ts[order], u[order], mm[order],
                            dg[order])
        n = len(k)
        resp = mm != "warc/revisit"
        # latest response position at-or-before each row; a carry-over
        # from the previous key run is detected by key mismatch
        lastr = np.maximum.accumulate(
            np.where(resp, np.arange(n), -1))
        rev_idx = np.flatnonzero(~resp)
        if rev_idx.size == 0:
            return out_sch.empty_table()
        li = lastr[rev_idx]
        lic = np.clip(li, 0, n - 1)
        valid = (li >= 0) & (k[lic] == k[rev_idx])
        rts = np.where(valid, ts[lic], None)
        rdg = np.where(valid, dg[lic], None)
        anom = np.where(valid, None, "revisit_orphan")
        return pa.table({
            "urlkey": pa.array(k[rev_idx], pa.string()),
            "timestamp": pa.array(ts[rev_idx], pa.string()),
            "url": pa.array(u[rev_idx], pa.string()),
            "refers_to_timestamp": pa.array(rts, pa.string()),
            "refers_to_digest": pa.array(rdg, pa.string()),
            "anomaly": pa.array(anom, pa.string()),
        })

    cols = [key_col, ts_col, url_col, mime_col, digest_col]
    narrow = ds.select_columns(cols).map_batches(
        keyed, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(narrow, "_kb", resolve,
                             num_buckets=num_buckets)


def revisit_generate(ds: ray.data.Dataset, *, digest_col: str = "digest",
                     ts_col: str = "timestamp", url_col: str = "url",
                     key_col: str = "urlkey",
                     num_buckets: int = 32) -> ray.data.Dataset:
    """The WRITE side of revisit semantics (``revisit_resolve`` is the
    read side): given response captures with content digests, keep the
    chronologically FIRST capture of each digest as the stored
    response and rewrite every later identical-content capture into a
    ``revisit`` record pointing at it — how a crawler avoids storing
    the same bytes twice (Common Crawl's within-crawl digest dedup;
    the reference consumes these records, cdx_toolkit
    __init__.py:101-121 / README.md:233-235).

    Deterministic original rule: minimum ``(timestamp, urlkey, url)``
    per digest. Output: ``(urlkey, timestamp, url, digest, kind,
    refers_to_url, refers_to_ts)`` — kind ``response`` with null
    refers for originals, ``revisit`` otherwise.

    Dataflow: project to four narrow columns, ONE digest-bucket
    exchange co-locates each digest's captures, one sort + window
    first per bucket. Payload bytes never move — this stage decides
    what the writer stores, it does not carry content.
    """
    from ..canon import hash64_batch
    from .exchange import hash_bucket_apply

    nb = np.uint64(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        out = pa.table({
            "urlkey": batch[key_col],
            "timestamp": batch[ts_col],
            "url": batch[url_col],
            "digest": batch[digest_col],
        })
        db = (hash64_batch(batch[digest_col]) % nb).astype(np.int64)
        return out.append_column("_db", pa.array(db))

    def split_null_digest(batch: pa.Table) -> pa.Table:
        """A null digest means CONTENT UNKNOWN — such captures must
        never group as identical content (they would rewrite unrelated
        pages into revisits of each other = content loss). They pass
        through as stored responses."""
        import pyarrow.compute as pc

        nul = batch.filter(pc.is_null(batch[digest_col]))
        n = nul.num_rows
        return pa.table({
            "urlkey": nul[key_col].cast(pa.string()),
            "timestamp": nul[ts_col].cast(pa.string()),
            "url": nul[url_col].cast(pa.string()),
            "digest": nul[digest_col].cast(pa.string()),
            "kind": pa.array(["response"] * n, pa.string()),
            "refers_to_url": pa.array([None] * n, pa.string()),
            "refers_to_ts": pa.array([None] * n, pa.string()),
        })

    def per_digest(tbl: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(tbl)
              .sort(["digest", "timestamp", "urlkey", "url"])
              .with_columns(
                  rn=pl.int_range(pl.len()).over("digest"),
                  o_url=pl.col("url").first().over("digest"),
                  o_ts=pl.col("timestamp").first().over("digest")))
        first = df["rn"] == 0
        return pa.table({
            "urlkey": df["urlkey"].to_arrow().cast(pa.string()),
            "timestamp": df["timestamp"].to_arrow().cast(pa.string()),
            "url": df["url"].to_arrow().cast(pa.string()),
            "digest": df["digest"].to_arrow().cast(pa.string()),
            "kind": pa.array(
                np.where(first.to_numpy(), "response", "revisit")
                .tolist(), pa.string()),
            "refers_to_url": df.with_columns(
                r=pl.when(pl.col("rn") == 0).then(None)
                .otherwise(pl.col("o_url")))["r"].to_arrow()
            .cast(pa.string()),
            "refers_to_ts": df.with_columns(
                r=pl.when(pl.col("rn") == 0).then(None)
                .otherwise(pl.col("o_ts")))["r"].to_arrow()
            .cast(pa.string()),
        })

    narrow = ds.select_columns([key_col, ts_col, url_col, digest_col])

    def tag_nonnull(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tag(batch.filter(pc.is_valid(batch[digest_col])))

    tagged = narrow.map_batches(tag_nonnull, batch_format="pyarrow",
                                batch_size=None)
    grouped = hash_bucket_apply(tagged, "_db", per_digest,
                                num_buckets=num_buckets)
    passthrough = narrow.map_batches(split_null_digest,
                                     batch_format="pyarrow",
                                     batch_size=None)
    return grouped.union(passthrough)


def cache_freshness_batch(batch: pa.Table, *,
                          cc_col: str = "cache_control",
                          expires_col: str = "expires",
                          last_modified_col: str = "last_modified",
                          fetch_ms_col: str = "fetch_ms",
                          cutoff_ms: int | None = None,
                          heuristic_pct: int = 10) -> pa.Table:
    """RFC 9111 cache-freshness lifetime from response headers — the
    revalidation economics the reference skips entirely (it refetches
    unconditionally, myrequests.py has no cache awareness; a polite
    recrawler must honor what the server said about staleness).

    Precedence (RFC 9111 §4.2.1, response side):

    ``no-store`` / ``no-cache``  -> lifetime 0 (always revalidate)
    ``s-maxage=N``               -> N s (shared-cache override)
    ``max-age=N``                -> N s
    ``Expires`` HTTP-date        -> max(Expires - fetch, 0)
    heuristic (§4.2.2)           -> max((fetch - Last-Modified)
                                         * heuristic_pct // 100, 0)
    nothing                      -> 0

    One vectorized polars pass (regex token extract + strptime), zero
    shuffles; all arithmetic exact int64 ms so the DuckDB oracle
    states the same recurrence bit-for-bit. Date spans are assumed
    nonnegative (a Last-Modified in the future clamps through the
    GREATEST, but the floor-division rounding of negative spans is
    engine-specific — don't rely on it).

    Appends ``policy`` (which rule fired), ``fresh_ms``,
    ``expires_at_ms`` (= fetch + fresh) and, when ``cutoff_ms`` is
    given, ``due`` (stale at the cutoff).
    """
    import polars as pl

    df = pl.from_arrow(batch)
    cc = pl.col(cc_col).fill_null("").str.to_lowercase()
    smax = (cc.str.extract(r"(?:^|[\s,])s-maxage=(\d+)", 1)
            .cast(pl.Int64))
    mage = (cc.str.extract(r"(?:^|[\s,])max-age=(\d+)", 1)
            .cast(pl.Int64))
    fmt = "%a, %d %b %Y %H:%M:%S GMT"
    exp_ms = (pl.col(expires_col)
              .str.strptime(pl.Datetime("ms"), fmt, strict=False)
              .dt.epoch(time_unit="ms"))
    lm_ms = (pl.col(last_modified_col)
             .str.strptime(pl.Datetime("ms"), fmt, strict=False)
             .dt.epoch(time_unit="ms"))
    fetch = pl.col(fetch_ms_col).cast(pl.Int64)

    no_store = cc.str.contains("no-store", literal=True)
    no_cache = cc.str.contains("no-cache", literal=True)
    zero = pl.lit(0, pl.Int64)
    policy = (pl.when(no_store).then(pl.lit("no-store"))
              .when(no_cache).then(pl.lit("no-cache"))
              .when(smax.is_not_null()).then(pl.lit("s-maxage"))
              .when(mage.is_not_null()).then(pl.lit("max-age"))
              .when(exp_ms.is_not_null()).then(pl.lit("expires"))
              .when(lm_ms.is_not_null()).then(pl.lit("heuristic"))
              .otherwise(pl.lit("default")))
    fresh = (pl.when(no_store | no_cache).then(zero)
             .when(smax.is_not_null()).then(smax * 1000)
             .when(mage.is_not_null()).then(mage * 1000)
             .when(exp_ms.is_not_null())
             .then(pl.max_horizontal(exp_ms - fetch, zero))
             .when(lm_ms.is_not_null())
             .then(pl.max_horizontal(
                 (fetch - lm_ms) * heuristic_pct // 100, zero))
             .otherwise(zero)).cast(pl.Int64)
    out = df.with_columns(policy.alias("policy"),
                          fresh.alias("fresh_ms"))
    out = out.with_columns(
        (pl.col("fresh_ms") + fetch).alias("expires_at_ms"))
    if cutoff_ms is not None:
        out = out.with_columns(
            (pl.col("expires_at_ms") <= cutoff_ms).alias("due"))
    t = out.to_arrow()
    want = [(c, pa.string()) for c in
            (cc_col, expires_col, last_modified_col, "policy")]
    schema = pa.schema(
        [(f.name, pa.string() if (f.name, pa.string()) in want
          else f.type) for f in t.schema])
    return t.cast(schema)


def status_transitions(a: ray.data.Dataset, b: ray.data.Dataset, *,
                       key_col: str = "urlkey",
                       ts_col: str = "timestamp",
                       digest_col: str = "digest",
                       status_col: str = "status",
                       num_buckets: int = 32) -> ray.data.Dataset:
    """HTTP status transition matrix between two crawls — for each
    urlkey, the latest status in crawl ``a`` vs crawl ``b`` (absent
    side labeled ``'absent'``), rolled up to ``(status_from,
    status_to, n_urlkeys)`` counts. The Markov-style ops dashboard
    behind recrawl policy: a fat ``200 -> 404`` cell is link rot, a
    fat ``404 -> 200`` cell is premature pruning, ``absent -> 2xx``
    measures discovery.

    Latest = max ``(ts, digest, status)`` lexicographic (the
    crawl_delta rule plus a status tie-break so the carried status is
    deterministic). Per-block latest-fold BEFORE the key exchange;
    the merge kernel emits per-bucket partial matrix counts, so the
    second exchange carries only O(status²) rows.
    """
    from .. import canon
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def partial(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            sch = pa.schema([("_kb", pa.int64()), ("key", pa.string()),
                             ("side", pa.int8()), ("ts", pa.string()),
                             ("dig", pa.string()), ("st", pa.string())])
            if batch.num_rows == 0:
                return sch.empty_table()
            k = batch[key_col].to_numpy(zero_copy_only=False)
            ts = batch[ts_col].to_numpy(zero_copy_only=False)
            dg = batch[digest_col].to_numpy(zero_copy_only=False)
            st = batch[status_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((st, dg, ts, k))
            k, ts, dg, st = k[order], ts[order], dg[order], st[order]
            last = np.ones(len(k), bool)
            last[:-1] = k[1:] != k[:-1]
            li = np.flatnonzero(last)
            key = pa.array(k[li], pa.string())
            kb = (canon.hash64_batch(key) % nbu).astype(np.int64)
            return pa.table({
                "_kb": pa.array(kb, pa.int64()),
                "key": key,
                "side": pa.array(np.full(len(li), side, np.int8)),
                "ts": pa.array(ts[li], pa.string()),
                "dig": pa.array(dg[li], pa.string()),
                "st": pa.array(st[li], pa.string()),
            })
        return fn

    def compare(tbl: pa.Table) -> pa.Table:
        import polars as pl

        sch = pa.schema([("_mb", pa.int64()),
                         ("status_from", pa.string()),
                         ("status_to", pa.string()),
                         ("n", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        df = (pl.from_arrow(tbl)
              .sort(["key", "side", "ts", "dig", "st"])
              .group_by("key", "side", maintain_order=True)
              .agg(st=pl.col("st").last()))
        wide = df.pivot(on="side", index="key", values="st")
        for c in ("0", "1"):
            if c not in wide.columns:
                wide = wide.with_columns(
                    pl.lit(None, pl.String).alias(c))
        mat = (wide.with_columns(
            status_from=pl.col("0").fill_null("absent"),
            status_to=pl.col("1").fill_null("absent"))
            .group_by("status_from", "status_to")
            .agg(n=pl.len().cast(pl.Int64)))
        t = mat.to_arrow()
        key = (mat["status_from"] + "\x00" + mat["status_to"]).to_arrow()
        h = canon.hash64_batch(key)
        return t.append_column(
            "_mb", pa.array((h % np.uint64(4)).astype(np.int64),
                            pa.int64())).select(
            ["_mb", "status_from", "status_to", "n"])

    def rollup(tbl: pa.Table) -> pa.Table:
        import polars as pl

        agg = (pl.from_arrow(tbl)
               .group_by("status_from", "status_to")
               .agg(n_urlkeys=pl.col("n").sum()))
        return agg.to_arrow()

    keyed = (a.map_batches(partial(0), batch_format="pyarrow",
                           batch_size=None)
             .union(b.map_batches(partial(1), batch_format="pyarrow",
                                  batch_size=None)))
    parts = hash_bucket_apply(keyed, "_kb", compare,
                              num_buckets=num_buckets)
    return hash_bucket_apply(parts, "_mb", rollup, num_buckets=4)


def revisit_rewrite(ds: ray.data.Dataset, *,
                    key_col: str = "urlkey",
                    ts_col: str = "timestamp",
                    digest_col: str = "digest",
                    num_buckets: int = 32) -> ray.data.Dataset:
    """WARC-writer dedup: rewrite repeat-content captures as revisit
    records. Within the input capture set, the FIRST capture of each
    digest (by ``(timestamp, urlkey)`` ascending) stays a full
    ``response`` record; every later capture of the same digest
    becomes a ``revisit`` that references the original's (urlkey,
    timestamp) — exactly the ``WARC-Refers-To-Target-URI/-Date``
    contract of warcprox-style digest dedup, and the producer side of
    the reference's revisit handling (cdx_toolkit/__init__.py:101-105
    ``is_revisit``; warc.py:34-95 reconciles such records on read).

    Returns ``(urlkey, timestamp, digest, kind, orig_urlkey,
    orig_timestamp)`` with the orig columns null on responses.

    Dataflow: one digest-bucket exchange of narrow key rows (content
    never travels — the writer later fetches payload bytes only for
    ``response`` rows, which is the whole point of the rewrite);
    the kernel sorts each digest group once and broadcasts its first
    row with a searchsorted gather.
    """
    from .. import canon
    from .exchange import hash_bucket_apply

    nbu = np.uint64(num_buckets)

    def key_rows(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col, digest_col])
        dig = t[digest_col]
        h = canon.hash64_batch(dig)
        return t.append_column(
            "_db", pa.array((h % nbu).astype(np.int64), pa.int64()))

    def assign(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(t.select([key_col, ts_col, digest_col]))
              .sort([digest_col, ts_col, key_col]))
        first = (df.group_by(digest_col, maintain_order=True)
                 .agg(orig_urlkey=pl.col(key_col).first(),
                      orig_timestamp=pl.col(ts_col).first()))
        out = (df.join(first, on=digest_col)
               .with_columns(
                   kind=pl.when(
                       (pl.col(key_col) == pl.col("orig_urlkey"))
                       & (pl.col(ts_col) == pl.col("orig_timestamp")))
                   .then(pl.lit("response"))
                   .otherwise(pl.lit("revisit"))))
        # the original row itself: null out the self-reference
        out = out.with_columns(
            orig_urlkey=pl.when(pl.col("kind") == "response")
            .then(pl.lit(None, pl.String))
            .otherwise(pl.col("orig_urlkey")),
            orig_timestamp=pl.when(pl.col("kind") == "response")
            .then(pl.lit(None, pl.String))
            .otherwise(pl.col("orig_timestamp")))
        return out.select([key_col, ts_col, digest_col, "kind",
                           "orig_urlkey", "orig_timestamp"]).to_arrow()

    keyed = ds.map_batches(key_rows, batch_format="pyarrow",
                           batch_size=None)
    return hash_bucket_apply(keyed, "_db", assign,
                             num_buckets=num_buckets)
