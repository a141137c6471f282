"""CDX 14-digit timestamp algebra.

Semantics-parity module: reproduces the observable behavior of the
reference's timestamp helpers (cdx_toolkit/timeutils.py:11-111 in
cocrawler/cdx_toolkit) — padding down/up with the Feb-28 clamp,
timestamp<->unixtime conversion with the unixtime-hint error, crawl-name
to end-time parsing, and parameter validation — re-implemented from the
documented behavior plus vectorized pyarrow/numpy kernels for use inside
``Dataset.map_batches``.

A CDX timestamp is a UTC digit string ``YYYYMMDDHHMMSS`` that may be
truncated at any prefix length (``'1998'``, ``'199802'``, ...).
"""

from __future__ import annotations

import calendar
import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CDX_FMT = "%Y%m%d%H%M%S"
_PAD_LOW = "19780101000000"
_PAD_HIGH = "29991231235959"

# Upward padding clamps February to the 28th regardless of leap years
# (reference behavior: cdx_toolkit/timeutils.py:15-16).
_MONTH_MAX_DAY = {
    1: 31, 2: 28, 3: 31, 4: 30, 5: 31, 6: 30,
    7: 31, 8: 31, 9: 30, 10: 31, 11: 30, 12: 31,
}

# The web's birth era, used to detect a unixtime passed where a CDX
# timestamp was expected (reference: cdx_toolkit/timeutils.py:49-52).
_UNIXTIME_HINT_LO = 605664000      # ~ 1989-03-12
_UNIXTIME_HINT_HI = 1989031200


def pad_timestamp(ts: str) -> str:
    """Pad a truncated timestamp DOWN to the earliest instant it covers.

    >>> pad_timestamp('1998')
    '19980101000000'
    >>> pad_timestamp('20240315')
    '20240315000000'
    """
    return ts + _PAD_LOW[len(ts):]


def pad_timestamp_up(ts: str) -> str:
    """Pad a truncated timestamp UP to the latest instant it covers.

    The day-of-month is clamped to the month's max day, with February
    always clamped to 28 (even in leap years — parity quirk).

    >>> pad_timestamp_up('199802')
    '19980228235959'
    >>> pad_timestamp_up('2024')
    '20241231235959'
    """
    full = ts + _PAD_HIGH[len(ts):]
    month = int(full[4:6])
    return full[:6] + str(_MONTH_MAX_DAY[month]) + full[8:]


def timestamp_to_time(ts: str) -> float:
    """Truncated CDX timestamp -> unix time (float seconds, UTC).

    >>> timestamp_to_time('1999')
    915148800.0
    """
    padded = pad_timestamp(ts)
    try:
        parsed = _dt.datetime.strptime(padded, CDX_FMT)
    except ValueError:
        if ts.isdigit() and _UNIXTIME_HINT_LO < int(ts) < _UNIXTIME_HINT_HI:
            raise ValueError(
                "cannot parse timestamp, cdx timestamps are not unix "
                "timestamps: " + ts
            ) from None
        raise ValueError(
            "cannot parse timestamp, is it a valid cdx timestamp?: " + ts
        ) from None
    return parsed.replace(tzinfo=_dt.timezone.utc).timestamp()


def time_to_timestamp(t: float) -> str:
    """Unix time -> 14-digit CDX timestamp (UTC).

    >>> time_to_timestamp(915148800.0)
    '19990101000000'
    """
    return _dt.datetime.fromtimestamp(t, tz=_dt.timezone.utc).strftime(CDX_FMT)


def validate_timestamps(params: dict) -> None:
    """Reject non-digit-string / non-int ``from_ts`` / ``to`` / ``closest``.

    Parity with reference cdx_toolkit/timeutils.py:100-111.
    """
    for key in ("from_ts", "to", "closest"):
        if key not in params:
            continue
        v = params[key]
        if isinstance(v, int):
            continue
        if isinstance(v, str) and v.isdigit():
            continue
        raise ValueError("invalid parameter {} {!r}".format(key, v))


# ---------------------------------------------------------------------------
# Crawl-name -> end-time parsing (reference cdx_toolkit/timeutils.py:65-97)
# ---------------------------------------------------------------------------

_CC_WEEK_FMT = "%Y-%W-%w"

# End times for pre-2013 "special" crawls, keyed by the name fragment.
_SPECIAL_CRAWL_END = {
    "2012": "201206",
    "2009-2010": "201009",
    "2008-2009": "200901",
}


def cc_index_to_time(cc: str) -> float:
    """``YYYY-WW`` ISO-week crawl name -> unixtime of that week's Sunday.

    >>> cc_index_to_time('2018-02')
    1515888000.0
    """
    d = _dt.datetime.strptime(cc + "-0", _CC_WEEK_FMT)
    return d.replace(tzinfo=_dt.timezone.utc).timestamp()


def cc_index_to_time_special(cc: str) -> float | None:
    """Early-era crawl name -> fixed end time, or None when unknown.

    >>> cc_index_to_time_special('2012')
    1338508800.0
    >>> cc_index_to_time_special('2009-2010')
    1283299200.0
    """
    frag = _SPECIAL_CRAWL_END.get(cc)
    if frag is None:
        return None
    return timestamp_to_time(frag)


# ---------------------------------------------------------------------------
# WARC header date helpers (reference cdx_toolkit/timeutils.py:119-139)
# ---------------------------------------------------------------------------

_ISO_DT = "%Y-%m-%dT%H:%M:%SZ"


def http_date_to_datetime(s: str) -> _dt.datetime:
    """RFC-2822 HTTP date -> naive datetime.

    >>> http_date_to_datetime('Thu, 26 Dec 2013 09:50:10 GMT')
    datetime.datetime(2013, 12, 26, 9, 50, 10)
    """
    from email.utils import parsedate

    fields = parsedate(s)
    if fields is None:
        raise ValueError("cannot parse http date: " + s)
    return _dt.datetime(*fields[:6])


def datetime_to_iso_date(d: _dt.datetime) -> str:
    """Naive datetime -> WARC ISO-8601 'Z' string.

    >>> datetime_to_iso_date(_dt.datetime(2013, 12, 26, 10, 11, 12))
    '2013-12-26T10:11:12Z'
    """
    return d.strftime(_ISO_DT)


# ---------------------------------------------------------------------------
# Vectorized kernels (for map_batches over Arrow batches)
# ---------------------------------------------------------------------------

def timestamps_to_epoch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized 14-digit timestamp column -> float64 unix seconds.

    Assumes fully-padded 14-digit strings (the on-disk captures table
    always stores full timestamps).
    """
    ts = pc.strptime(arr, format=CDX_FMT, unit="us")
    # strptime yields timezone-naive timestamps which we define as UTC.
    micros = pc.cast(ts, pa.int64())
    return pc.divide(pc.cast(micros, pa.float64()), 1_000_000.0)


def epoch_to_timestamps(arr: np.ndarray) -> np.ndarray:
    """Vectorized unix seconds -> 14-digit timestamp strings (numpy)."""
    dts = (arr.astype("int64") * 1_000_000).astype("datetime64[us]")
    iso = np.datetime_as_string(dts, unit="s")  # 'YYYY-MM-DDTHH:MM:SS'
    out = np.char.translate(iso, str.maketrans("", "", "-:T"))
    return out


def month_floor_ts(epoch_s: float) -> str:
    """Unix time -> the 6-digit YYYYMM bucket it falls in (UTC)."""
    d = _dt.datetime.fromtimestamp(epoch_s, tz=_dt.timezone.utc)
    return "%04d%02d" % (d.year, d.month)


if __name__ == "__main__":  # pragma: no cover
    import doctest

    doctest.testmod()
