"""Capture-iteration pipeline vs a DuckDB oracle on the fixture corpus.

Checks the reference's ordering/limit/filter contracts
(cocrawler/cdx_toolkit README.md:243-252, __init__.py:260-384) hold for
the Ray Data implementation.
"""

import glob
import os

import duckdb
import pytest

from cdx_toolkit_ray.sources.captures import (
    list_crawl_partitions,
    pages_to_samples,
    query_captures,
    size_estimate,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _con(fixture_dir):
    con = duckdb.connect()
    pat = os.path.join(fixture_dir["captures"], "crawl=*", "*.parquet")
    con.execute(
        "CREATE VIEW captures AS SELECT * FROM read_parquet('%s', "
        "hive_partitioning=true)" % pat)
    return con


def test_within_crawl_ordering_ascending(fixture_dir):
    ds = query_captures(fixture_dir["captures"], url="*.big-portal.example",
                        cc_sort="ascending", from_ts="2021", to="2024")
    rows = ds.select_columns(["urlkey", "timestamp"]).take_all()
    got = [(r["urlkey"], r["timestamp"]) for r in rows]
    # crawl partitions are walked oldest-first; within each crawl rows
    # ascend by (urlkey, timestamp). Verify piecewise sortedness per crawl
    # by reconstructing the expected concatenation from the oracle.
    con = _con(fixture_dir)
    want = []
    for crawl in sorted(list_crawl_partitions(fixture_dir["captures"])):
        part = con.execute(
            "SELECT urlkey, timestamp FROM captures WHERE crawl=? AND "
            "(urlkey LIKE 'example,big-portal)%' OR urlkey LIKE 'example,big-portal,%') "
            "ORDER BY urlkey, timestamp", [crawl]).fetchall()
        want.extend(part)
    assert got == want


def test_mixed_ordering_reverses_crawls(fixture_dir):
    asc = query_captures(fixture_dir["captures"], url="*.news-hub.example",
                         cc_sort="ascending", from_ts="2021", to="2024")
    mix = query_captures(fixture_dir["captures"], url="*.news-hub.example",
                         cc_sort="mixed", from_ts="2021", to="2024")
    a = [r["timestamp"] for r in asc.select_columns(["timestamp"]).take_all()]
    m = [r["timestamp"] for r in mix.select_columns(["timestamp"]).take_all()]
    assert sorted(a) == sorted(m)
    assert a != m  # different concatenation order (multiple crawls hit)
    # mixed = newest crawl first: its first row is from the newest crawl
    con = _con(fixture_dir)
    newest = con.execute(
        "SELECT max(crawl) FROM captures WHERE urlkey LIKE 'example,news-hub%'"
    ).fetchone()[0]
    first_crawl = con.execute(
        "SELECT crawl FROM captures WHERE timestamp=? AND "
        "urlkey LIKE 'example,news-hub%' LIMIT 1", [m[0]]).fetchone()[0]
    assert first_crawl == newest


def test_filter_and_window_vs_oracle(fixture_dir):
    ds = query_captures(fixture_dir["captures"], url="*.shop.example",
                        cc_sort="ascending", from_ts="20220101",
                        to="20231001", filter=["=status:200", "mime:html"])
    got = sorted((r["urlkey"], r["timestamp"])
                 for r in ds.select_columns(["urlkey", "timestamp"]).take_all())
    con = _con(fixture_dir)
    want = sorted(con.execute(
        "SELECT urlkey, timestamp FROM captures WHERE "
        "(urlkey LIKE 'example,shop)%' OR urlkey LIKE 'example,shop,%') "
        "AND status='200' AND mime LIKE '%html%' "
        "AND timestamp >= '20220101000000' AND timestamp <= '20231001235959'"
    ).fetchall())
    assert got == want
    assert len(got) > 0


def test_limit_streams(fixture_dir):
    ds = query_captures(fixture_dir["captures"], url="*.big-portal.example",
                        cc_sort="ascending", from_ts="2021", to="2024", limit=7)
    assert ds.count() == 7


def test_closest_ordering(fixture_dir):
    target = "20230301000000"
    ds = query_captures(fixture_dir["captures"], url="*.big-portal.example",
                        closest=target, limit=10)
    rows = ds.take_all()
    deltas = [r["closest_delta"] for r in rows]
    assert deltas == sorted(deltas)
    assert len(rows) == 10


def test_fields_projection(fixture_dir):
    ds = query_captures(fixture_dir["captures"], url="*.wiki-beta.example",
                        cc_sort="ascending", from_ts="2021", to="2024",
                        fields=["url", "status", "timestamp"])
    row = ds.take(1)[0]
    assert set(row) == {"url", "status", "timestamp"}


def test_size_estimate_math(fixture_dir):
    assert pages_to_samples(0) == 0
    assert pages_to_samples(1) == 1500
    assert pages_to_samples(2) == 3000
    assert pages_to_samples(5) == 12000
    n = size_estimate(fixture_dir["captures"], url="*.big-portal.example",
                      from_ts="2021", to="2024")
    # every matching crawl contributes >=1 page -> >=1500 samples
    assert n >= 1500
    pages = size_estimate(fixture_dir["captures"], url="*.big-portal.example",
                          from_ts="2021", to="2024", as_pages=True)
    assert pages >= 1


def test_crawl_name_selection(fixture_dir):
    ds = query_captures(fixture_dir["captures"], crawl=["CC-MAIN-2022-05"])
    con = _con(fixture_dir)
    want = con.execute(
        "SELECT count(*) FROM captures WHERE crawl='CC-MAIN-2022-05'"
    ).fetchone()[0]
    assert ds.count() == want


def test_preserve_order_scoped_to_query(fixture_dir):
    """query_captures must not leak preserve_order into the global
    DataContext: the returned dataset keeps it (captured at root
    creation), while unrelated datasets built afterwards do not."""
    import ray.data

    ds = query_captures(fixture_dir["captures"], "*.big-portal.example",
                        from_ts="2021", to="2024", limit=5)
    assert ds.context.execution_options.preserve_order is True
    assert (ray.data.DataContext.get_current()
            .execution_options.preserve_order is False)
    fresh = ray.data.range(4)
    assert fresh.context.execution_options.preserve_order is False
    assert ds.count() == 5  # still executes with ordering intact
