"""Crawl-selection / default-window truth tables, semantics lifted from
cocrawler/cdx_toolkit tests/unit/test_cc.py:16-160."""

import pytest

from cdx_toolkit_ray import planner
from cdx_toolkit_ray.timeutils import timestamp_to_time

ENDPOINTS = [
    "https://index.commoncrawl.org/CC-MAIN-2008-2009-index",
    "https://index.commoncrawl.org/CC-MAIN-2009-2010-index",
    "https://index.commoncrawl.org/CC-MAIN-2012-index",
    "https://index.commoncrawl.org/CC-MAIN-2013-20-index",
    "https://index.commoncrawl.org/CC-MAIN-2017-51-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-05-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-09-index",
    "https://index.commoncrawl.org/CC-MAIN-2018-13-index",
]


def test_normalize_crawl():
    cases = [
        (["1"], ["1"]),
        (["a"], ["a"]),
        (["a", "b"], ["a", "b"]),
        (["a,b", "c"], ["a", "b", "c"]),
        (["a,b,c,d"], ["a", "b", "c", "d"]),
        (["a", "b,c"], ["a", "b", "c"]),
    ]
    for arg, want in cases:
        assert planner.normalize_crawl(arg) == want
    with pytest.raises(ValueError):
        planner.normalize_crawl(["1", "2"])


def test_apply_cc_defaults():
    now = 1524962339.157388  # 20180429003859
    cases = [
        ({"crawl": "foo"}, {}),
        ({"closest": "20180101"},
         {"from_ts": "20171003000000", "to": "20180401000000"}),
        ({"closest": "20180101", "to": "20181201"},
         {"from_ts": "20171003000000"}),
        ({"to": "20180101"}, {"from_ts": "20170131235959"}),
        ({}, {"from_ts": "20170429003859"}),
        ({"from_ts": "20100101", "closest": "20150301"},
         {"to": "20150530000000"}),
        ({"from_ts": "20100101"}, {}),
    ]
    for params, extra in cases:
        crawl_present = bool(params.pop("crawl", None))
        want = dict(params)
        want.update(extra)
        planner.apply_cc_defaults(params, crawl_present=crawl_present, now=now)
        assert params == want


def test_match_crawls():
    cases = [
        (["CC-MAIN-2013-20"], [ENDPOINTS[3]]),
        (["CC-MAIN-2017"], [ENDPOINTS[4]]),
        (["CC-MAIN-2018"], ENDPOINTS[5:8]),
        (["CC-MAIN-2013", "CC-MAIN-2017"], [ENDPOINTS[3], ENDPOINTS[4]]),
        (["CC-MAIN-2013-20", "no match"], [ENDPOINTS[3]]),
        (["2"], ENDPOINTS[-2:]),
        (None, ENDPOINTS),
    ]
    for arg, want in cases:
        assert planner.match_crawls(arg, ENDPOINTS) == want
    with pytest.raises(ValueError):
        planner.match_crawls(["no match"], ENDPOINTS)


def test_make_crawl_maps():
    cmap, times = planner.make_crawl_maps(ENDPOINTS)
    assert cmap[times[0]] == ENDPOINTS[0]
    assert cmap[times[-1]] == ENDPOINTS[-1]
    assert times == sorted(times)
    assert len(times) == len(ENDPOINTS)


def test_resolve_window_raises():
    for params in [
        {"closest": "2010", "to": "2010"},
        {"closest": "2010", "from_ts": "2010"},
        {"to": "2010"},
        {},
    ]:
        with pytest.raises(ValueError):
            planner.resolve_window(params)


def test_bisect_window():
    cmap, times = planner.make_crawl_maps(ENDPOINTS)
    cases = [
        (("201801", "201804"), ("2017-51", "2018-13", 4)),
        (("20180214", "201804"), ("2018-05", "2018-13", 3)),
        (("20180429", "20180430"), ("2018-13", "2018-13", 1)),
    ]
    for (lo, hi), (first, last, count) in cases:
        got = planner.bisect_window(cmap, times,
                                    timestamp_to_time(lo), timestamp_to_time(hi))
        assert got[0].endswith(first + "-index")
        assert got[-1].endswith(last + "-index")
        assert len(got) == count
        # open-ended to: runs to the newest crawl
        got2 = planner.bisect_window(cmap, times, timestamp_to_time(lo), None)
        assert got2[0] == got[0] and got2[-1] == ENDPOINTS[-1]


def test_select_crawls_ordering():
    params = {"from_ts": "20180101000000", "to": "20180401000000"}
    asc = planner.select_crawls(list(ENDPOINTS), "ascending", dict(params))
    mixed = planner.select_crawls(list(ENDPOINTS), "mixed", dict(params))
    assert mixed == list(reversed(asc))
    with pytest.raises(ValueError):
        planner.select_crawls(list(ENDPOINTS), "bogus", dict(params))


def test_url_to_match():
    m = planner.url_to_match("*.example.com")
    assert m.match_type == "domain" and m.key == "com,example"
    m = planner.url_to_match("example.com/blog/*")
    assert m.match_type == "prefix" and m.key == "com,example)/blog/"
    m = planner.url_to_match("https://www.example.com/a?z=1&b=2")
    assert m.match_type == "exact" and m.key == "com,example)/a?b=2&z=1"
