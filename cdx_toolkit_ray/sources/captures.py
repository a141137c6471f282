"""Captures-table source: the CDX query engine over partitioned Parquet.

Re-expresses the reference's capture-iteration surface
(cocrawler/cdx_toolkit cdx_toolkit/__init__.py:260-384 — get / iter /
get_size_estimate, endpoint walk, limit decrement) as a lazily-executed
``ray.data.Dataset`` pipeline:

* one hive partition ``crawl=CC-MAIN-YYYY-WW/`` of the captures table
  stands in for one per-crawl CDX endpoint (SURVEY.md §1.2)
* crawl selection + ordering happen at PLAN time (partition pruning —
  no byte of a non-selected crawl is read)
* the url match, time window, and filter language run as vectorized
  pyarrow.compute kernels inside ``map_batches``
* the cross-crawl ordering contract (ascending (urlkey, timestamp)
  within a crawl; crawls concatenated in cc_sort order,
  README.md:243-252) is preserved by per-partition reads + union with
  ``preserve_order``
* ``limit`` streams through ``Dataset.limit`` (executor early-stop) —
  the reference's decrement-and-break (__init__.py:291-294)

Scale notes: each crawl partition reads independently (no shuffle
anywhere in this pipeline); column pruning keeps only predicate +
requested columns; at 100 TB the only wide operation a query can
trigger is the optional ``resort`` (off by default because CDX
partitions are sorted on disk).
"""

from __future__ import annotations

import math
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..filters import apply_filters, compile_filters
from ..planner import (
    UrlMatch,
    pad_timestamp,
    pad_timestamp_up,
    resolve_query_params,
    select_crawls,
    url_to_match,
)
from ..timeutils import timestamps_to_epoch

LINES_PER_PAGE = 3000  # parity: cdx_toolkit/__init__.py:29

# collinfo-cache parity (cdx_toolkit/commoncrawl.py:42-70): the crawl
# list refreshes at most once per TTL; within the TTL the memo answers
# without touching storage.
COLLINFO_TTL_SEC = 86400.0
_PARTITIONS_CACHE: dict[str, tuple[float, dict[str, str]]] = {}


def list_crawl_partitions(captures_root: str, *, now: float | None = None,
                          ttl: float = COLLINFO_TTL_SEC) -> dict[str, str]:
    """Discover hive partitions: {crawl_name: partition_dir}.

    Results are memoized per root with the reference's 24h collinfo
    TTL; pass ``ttl=0`` (or a ``now`` past the entry) to force a
    re-scan. ``now`` is injectable so the TTL contract is testable
    without wall-clock sleeps.
    """
    import time

    t = time.time() if now is None else now
    hit = _PARTITIONS_CACHE.get(captures_root)
    if hit is not None and t - hit[0] < ttl:
        return hit[1]
    out = {}
    for entry in sorted(os.listdir(captures_root)):
        m = re.match(r"crawl=(.+)$", entry)
        if m:
            out[m.group(1)] = os.path.join(captures_root, entry)
    _PARTITIONS_CACHE[captures_root] = (t, out)
    return out


def _url_mask(batch: pa.Table, um: UrlMatch) -> pa.ChunkedArray:
    key = pc.cast(batch["urlkey"], pa.string())
    if um.match_type == "exact":
        return pc.equal(key, um.key)
    if um.match_type == "prefix":
        return pc.starts_with(key, um.key)
    if um.match_type == "host":
        return pc.starts_with(key, um.key + ")")
    # domain: the host itself or any subdomain of it
    return pc.or_(pc.starts_with(key, um.key + ")"),
                  pc.starts_with(key, um.key + ","))


class CaptureMatcher:
    """map_batches callable: url match + time window + filter language.

    All three predicates are vectorized Arrow kernels compiled once per
    actor (the filter regexes especially), ANDed per batch.
    """

    def __init__(self, um: UrlMatch | None, from_ts: str | None,
                 to: str | None, filters, source: str = "cc"):
        self.um = um
        self.lo = pad_timestamp(from_ts) if from_ts else None
        self.hi = pad_timestamp_up(to) if to else None
        self.compiled = compile_filters(filters, source)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = None
        if self.um is not None:
            mask = _url_mask(batch, self.um)
        if self.lo is not None or self.hi is not None:
            ts = pc.cast(batch["timestamp"], pa.string())
        if self.lo is not None:
            m = pc.greater_equal(ts, self.lo)
            mask = m if mask is None else pc.and_(mask, m)
        if self.hi is not None:
            m = pc.less_equal(ts, self.hi)
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            batch = batch.filter(pc.fill_null(mask, False))
        return apply_filters(batch, self.compiled)


def _partition_schema_names(part_dir: str) -> list[str]:
    """Column names of one crawl partition (footer metadata of the
    first file — no data read)."""
    import glob as _glob

    if os.path.isfile(part_dir):
        return pq.read_schema(part_dir).names
    files = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
    if not files:
        return []
    return pq.read_schema(files[0]).names


def plan_query(captures_root: str, url: str | None = None, source: str = "cc",
               cc_sort: str = "mixed", crawl=None, now: float | None = None,
               **kwargs) -> tuple[list[str], dict]:
    """Resolve params and prune partitions; returns (ordered_dirs, params)."""
    params = resolve_query_params(url or "", source=source, crawl=crawl,
                                  now=now, **kwargs)
    if source == "custom":
        # arbitrary-endpoint source (reference source=<URL> analog): the
        # whole table is ONE endpoint — pywb dialect, no crawl pruning
        return [captures_root], params
    parts = list_crawl_partitions(captures_root)
    available = sorted(parts)
    if source == "cc":
        chosen = select_crawls(available, cc_sort, params)
    else:
        chosen = available
    return [parts[c] for c in chosen], params


def query_captures(captures_root: str, url: str | None = None,
                   source: str = "cc", cc_sort: str = "mixed", crawl=None,
                   fields: list[str] | None = None, resort: bool = False,
                   now: float | None = None, **kwargs) -> ray.data.Dataset:
    """Build the lazy capture-iteration Dataset (reference .iter parity).

    kwargs: from_ts, to, closest, limit, filter, matchType — the
    reference's param vocabulary (__init__.py:261-262).
    """
    match_type = kwargs.pop("matchType", None)
    limit = kwargs.pop("limit", None)
    closest = kwargs.get("closest")
    filters = kwargs.pop("filter", None)

    part_dirs, params = plan_query(captures_root, url=url, source=source,
                                   cc_sort=cc_sort, crawl=crawl, now=now,
                                   **kwargs)
    um = url_to_match(url, match_type) if url else None

    matcher = CaptureMatcher(um, params.get("from_ts"), params.get("to"),
                             filters, source)

    # Column pushdown: when an explicit field list is given, read only
    # fields + predicate columns (url match key, timestamp window,
    # filter fields) — on a wide capture table this is the difference
    # between scanning metadata and scanning everything. Fields a
    # partition's schema doesn't carry are skipped (dynamic-schema
    # parity: a missing positive-filter field matches nothing, which
    # the matcher already handles).
    read_columns = None
    if fields:
        need = set(fields)
        if um is not None:
            need.add("urlkey")
        if params.get("from_ts") or params.get("to") \
                or closest is not None:
            need.add("timestamp")
        for cf in matcher.compiled:
            need.add(cf.field)
        # sort keys: the per-partition (urlkey, timestamp) resort and
        # the closest ranking sort reference these columns at
        # execution — omitting them from the pruned read fails the
        # whole query downstream
        if resort or closest is not None:
            need.update(("urlkey", "timestamp"))
        read_columns = sorted(need)

    # The iteration-order contract (ascending within crawl, crawls
    # concatenated in cc_sort order) requires deterministic block order
    # through the union under streaming execution. A Dataset captures
    # the DataContext at ROOT creation and derived datasets inherit it,
    # so the flag is scoped to this query's read roots and restored —
    # unrelated pipelines built later keep full scheduling freedom.
    exec_opts = ray.data.DataContext.get_current().execution_options
    saved = exec_opts.preserve_order
    exec_opts.preserve_order = True
    try:
        pieces = []
        for d in part_dirs:
            cols = read_columns
            if cols is not None:
                present = set(_partition_schema_names(d))
                cols = [c for c in cols if c in present]
            ds = ray.data.read_parquet(d, columns=cols)
            if resort:
                ds = ds.sort(["urlkey", "timestamp"])
            pieces.append(ds)
        if not pieces:
            return ray.data.from_arrow(pa.table({n: [] for n in ["urlkey"]}))
        ds = pieces[0]
        if len(pieces) > 1:
            ds = ds.union(*pieces[1:])
    finally:
        exec_opts.preserve_order = saved

    ds = ds.map_batches(matcher, batch_format="pyarrow")

    if closest is not None:
        target = timestamps_to_epoch(
            pa.array([pad_timestamp(str(closest))]))[0].as_py()

        def _delta(batch: pa.Table) -> pa.Table:
            ep = timestamps_to_epoch(batch["timestamp"])
            d = pc.abs(pc.subtract(ep, target))
            return batch.append_column("closest_delta", d)

        ds = ds.map_batches(_delta, batch_format="pyarrow")
        ds = ds.sort(["closest_delta", "timestamp", "urlkey"])

    if limit is not None:
        ds = ds.limit(int(limit))
    if fields:
        ds = ds.select_columns(fields)
    return ds


def pages_to_samples(pages: int) -> int:
    """Page-count -> sample-count adjustment (parity __init__.py:43-50)."""
    p = float(pages)
    if p > 1:
        p -= 1.0
    elif p >= 1:
        p -= 0.5
    return int(p * LINES_PER_PAGE)


def size_estimate(captures_root: str, url: str | None = None,
                  source: str = "cc", cc_sort: str = "mixed", crawl=None,
                  as_pages: bool = False, details: bool = False,
                  now: float | None = None, **kwargs):
    """Approximate result-size estimate (reference get_size_estimate
    parity, __init__.py:344-384): per-crawl matching row counts ->
    pages of 3,000 -> pages_to_samples, summed with early break past
    ``limit``.

    Counting is metadata-only (Parquet row counts) when there is no
    predicate; otherwise a column-pruned count per partition.
    """
    match_type = kwargs.pop("matchType", None)
    limit = kwargs.pop("limit", None)
    filters = kwargs.pop("filter", None)
    kwargs.pop("closest", None)

    part_dirs, params = plan_query(captures_root, url=url, source=source,
                                   cc_sort=cc_sort, crawl=crawl, now=now,
                                   **kwargs)
    um = url_to_match(url, match_type) if url else None
    matcher = CaptureMatcher(um, params.get("from_ts"), params.get("to"),
                             filters, source)
    unfiltered = um is None and not filters and not params.get("from_ts") \
        and not params.get("to")

    total_pages = 0
    total_samples = 0
    per_crawl = []
    for d in part_dirs:
        if unfiltered:
            # metadata-only count: no scan at all. Handles every shape
            # a partition "dir" can take: a single parquet FILE (a
            # --source custom table), a flat directory, or a nested
            # hive layout (recursive walk).
            if os.path.isfile(d):
                n = pq.read_metadata(d).num_rows
            else:
                n = sum(pq.read_metadata(os.path.join(root_, f)).num_rows
                        for root_, _, files in os.walk(d)
                        for f in files if f.endswith(".parquet"))
        else:
            # distributed column-pruned count (never drags rows to the
            # driver; a 100 GB partition counts in parallel tasks)
            cols = ["urlkey", "timestamp", "mime", "status", "url"]
            n = (ray.data.read_parquet(d, columns=cols)
                 .map_batches(matcher, batch_format="pyarrow")
                 .count())
        pages = math.ceil(n / LINES_PER_PAGE)
        samples = pages_to_samples(pages)
        total_pages += pages
        total_samples += samples
        per_crawl.append((os.path.basename(d), samples))
        if limit is not None and samples > limit:
            break

    if details:
        return (total_pages if as_pages else total_samples), per_crawl
    return total_pages if as_pages else total_samples
