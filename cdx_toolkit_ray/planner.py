"""Plan-time query resolution: time windows, crawl selection, URL match.

These are the driver-side (pre-execution) pieces of the query engine:
given user params they decide WHICH hive partitions (crawls) of the
captures table to read, in WHAT order, with WHAT compiled predicates —
so pruning happens at ``read_parquet`` time, before any byte is
scanned.

Semantics parity with the reference's index-selection layer
(cocrawler/cdx_toolkit cdx_toolkit/commoncrawl.py:24-280), verified
against its unit truth tables (tests/unit/test_cc.py:16-160):

* ``normalize_crawl``     — comma splitting + the int-means-latest-N rule
* ``apply_cc_defaults``   — closest => ±3*30d window; else default
                            1-year lookback; to-only => from = to-365d
* ``match_crawls``        — substring containment semi-join, warn-on-miss
* ``crawl_to_end_time``   — CC-MAIN-YYYY-WW ISO-week end-time parse
                            (+ special pre-2013 names)
* ``bisect_window``       — keeps ONE crawl before `from` (crawl names
                            mark END times, so the preceding crawl can
                            still contain in-window captures) and one
                            extra after `to`
* ``order_crawls``        — cc_sort 'mixed' (newest crawl first) vs
                            'ascending'
* ``url_to_match``        — `*.example.com` => domain, `example.com/*`
                            => prefix, else exact, compiled to SURT-key
                            predicates
"""

from __future__ import annotations

import bisect
import logging
import re
from dataclasses import dataclass, field

from .canon import surt
from .timeutils import (
    cc_index_to_time,
    cc_index_to_time_special,
    pad_timestamp,
    pad_timestamp_up,
    time_to_timestamp,
    timestamp_to_time,
    validate_timestamps,
)

LOGGER = logging.getLogger(__name__)

THREE_MONTHS_S = 3 * 30 * 86400
ONE_YEAR_S = 365 * 86400


def normalize_crawl(crawl: list[str]) -> list[str]:
    """Split comma-joined crawl args; a lone integer means 'latest N'."""
    names: list[str] = []
    for c in crawl:
        names.extend(c.split(",")) if "," in c else names.append(c)
    if len(names) > 1 and any(x.isdigit() for x in names):
        raise ValueError("If you specify an integer, only one crawl is allowed")
    return names


def apply_cc_defaults(params: dict, crawl_present: bool = False, now: float | None = None) -> None:
    """Fill in the default time window, in place (reference truth table:
    cocrawler/cdx_toolkit tests/unit/test_cc.py:32-60)."""
    if params.get("closest") is not None:
        center = timestamp_to_time(params["closest"])
        if params.get("from_ts") is None:
            params["from_ts"] = time_to_timestamp(center - THREE_MONTHS_S)
        if params.get("to") is None:
            params["to"] = time_to_timestamp(center + THREE_MONTHS_S)
    elif not crawl_present:
        if params.get("from_ts") is not None:
            pass  # explicit from, open-ended to: leave as-is
        elif params.get("to") is not None:
            upper = pad_timestamp_up(params["to"])
            params["from_ts"] = time_to_timestamp(timestamp_to_time(upper) - ONE_YEAR_S)
        else:
            import time as _time

            now = _time.time() if now is None else now
            params["from_ts"] = time_to_timestamp(now - ONE_YEAR_S)


def match_crawls(crawls: list[str] | None, available: list[str]) -> list[str]:
    """Semi-join requested crawl names against the available list.

    Substring containment; a single integer selects the latest N; misses
    warn, zero matches raise.
    """
    if crawls is None:
        return available
    if len(crawls) == 1 and crawls[0].isdigit():
        return available[-int(crawls[0]):]
    hit_names = set()
    used_args = set()
    for asked in crawls:
        for name in available:
            if asked in name:
                used_args.add(asked)
                hit_names.add(name)
    if not used_args:
        raise ValueError("No matches for crawls " + ",".join(crawls))
    missed = set(crawls) - used_args
    if missed:
        LOGGER.warning("No matches for these crawl args: %s", ",".join(missed))
    return sorted(hit_names)


_CRAWL_WEEK_RE = re.compile(r"CC-MAIN-(\d\d\d\d-\d\d)(?:-|$)")
_CRAWL_SPECIAL_RE = re.compile(r"CC-MAIN-(\d\d\d\d-\d\d\d\d)(?:-|$)")
_CRAWL_YEAR_RE = re.compile(r"CC-MAIN-(\d\d\d\d)(?:-i|$)")


def crawl_to_end_time(name: str) -> float | None:
    """Crawl name / endpoint URL -> unixtime its data ends at."""
    m = _CRAWL_WEEK_RE.search(name)
    if m:
        return cc_index_to_time(m.group(1))
    m = _CRAWL_SPECIAL_RE.search(name)
    if m:
        return cc_index_to_time_special(m.group(1))
    m = _CRAWL_YEAR_RE.search(name)
    if m:
        return cc_index_to_time_special(m.group(1))
    LOGGER.error("unable to parse date out of %s", name)
    return None


def make_crawl_maps(names: list[str]) -> tuple[dict[float, str], list[float]]:
    """Crawl names -> ({end_time: name}, sorted end_times)."""
    cmap: dict[float, str] = {}
    for name in names:
        t = crawl_to_end_time(name)
        if t is not None:
            cmap[t] = name
    return cmap, sorted(cmap)


def resolve_window(params: dict) -> tuple[float, float | None]:
    """Resolve (from_ts_t, to_t) unixtimes from padded params."""
    if "closest" in params:
        if params.get("from_ts") is None or params.get("to") is None:
            raise ValueError("closest requires from_ts and to (defaults set them)")
        return timestamp_to_time(params["from_ts"]), timestamp_to_time(params["to"])
    if params.get("from_ts") is None:
        raise ValueError("from_ts must be set (defaults guarantee it)")
    from_t = timestamp_to_time(params["from_ts"])
    if params.get("to") is not None:
        return from_t, timestamp_to_time(pad_timestamp_up(params["to"]))
    return from_t, None


def bisect_window(cmap: dict[float, str], times: list[float],
                  from_t: float, to_t: float | None) -> list[str]:
    """Pick crawls whose data may overlap [from_t, to_t].

    Keeps one crawl BEFORE from_t (names mark end times) and one extra
    after to_t — the reference's deliberate off-by-one window
    (cdx_toolkit/commoncrawl.py:223-232, tests/unit/test_cc.py:123-154).
    """
    lo = max(0, bisect.bisect_left(times, from_t) - 1)
    hi = min(len(times), bisect.bisect_right(times, to_t) + 1) if to_t is not None else len(times)
    return [cmap[t] for t in times[lo:hi]]


def select_crawls(available: list[str], cc_sort: str, params: dict) -> list[str]:
    """Full crawl-selection: explicit names or time-window bisect, then
    cc_sort ordering ('mixed' = newest crawl first, rows still ascending
    within each crawl)."""
    if "crawl" in params:
        crawls = params.pop("crawl")
        chosen = match_crawls(crawls, available)
    else:
        cmap, times = make_crawl_maps(available)
        from_t, to_t = resolve_window(params)
        chosen = bisect_window(cmap, times, from_t, to_t)
        params["from_ts"] = time_to_timestamp(from_t)
        if to_t is not None:
            params["to"] = time_to_timestamp(to_t)

    if cc_sort == "ascending":
        pass
    elif cc_sort == "mixed":
        chosen = list(reversed(chosen))
    else:
        raise ValueError("unknown cc_sort arg of " + cc_sort)
    return chosen


# ---------------------------------------------------------------------------
# URL wildcard -> match predicate (reference README.md:194-198)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UrlMatch:
    """Compiled URL match: a predicate over the SURT ``urlkey`` column."""
    match_type: str       # 'exact' | 'prefix' | 'domain' | 'host'
    key: str              # surt key or surt host prefix


def url_to_match(url: str, match_type: str | None = None) -> UrlMatch:
    """Wildcarded URL -> (matchType, surt key prefix).

    ``*.example.com`` -> domain (urlkey starts with ``com,example`` as a
    host or host suffix); ``example.com/path/*`` -> prefix; else exact.
    """
    if match_type is None:
        if url.startswith("*."):
            match_type = "domain"
            url = url[2:]
        elif url.endswith("*"):
            match_type = "prefix"
            url = url.rstrip("*")
        else:
            match_type = "exact"

    key = surt(url)
    if match_type in ("domain", "host"):
        # strip the )/path part, keep the reversed-host prefix
        key = key.split(")", 1)[0]
    return UrlMatch(match_type=match_type, key=key)


def resolve_query_params(url: str, source: str = "cc",
                         crawl: list[str] | None = None,
                         now: float | None = None, **kwargs) -> dict:
    """Validate + default the full param dict (plan-time entry point)."""
    params = dict(kwargs)
    validate_timestamps(params)
    params["url"] = url
    if crawl is not None and "crawl" not in params:
        params["crawl"] = crawl
    if source == "cc":
        apply_cc_defaults(params, crawl_present=bool(params.get("crawl")), now=now)
    return params
