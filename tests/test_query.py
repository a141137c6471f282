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


def test_fields_push_column_pruning_into_read(fixture_dir, monkeypatch):
    """With --fields given, the parquet read itself is pruned to
    fields + predicate columns (urlkey/timestamp/filter fields) — on a
    wide capture table this is the metadata-vs-everything difference."""
    import ray.data as rd

    seen_cols = []
    real = rd.read_parquet

    def spy(path, columns=None, **kw):
        seen_cols.append(columns)
        return real(path, columns=columns, **kw)

    monkeypatch.setattr(rd, "read_parquet", spy)
    ds = query_captures(fixture_dir["captures"], url="*.wiki-beta.example",
                        from_ts="2021", to="2024",
                        filter=["=status:200"],
                        fields=["url", "mime"])
    assert seen_cols and all(c is not None for c in seen_cols)
    for c in seen_cols:
        assert set(c) == {"url", "mime", "urlkey", "timestamp", "status"}
    # pruned read returns the same rows as the unpruned path
    monkeypatch.setattr(rd, "read_parquet", real)
    full = query_captures(fixture_dir["captures"],
                          url="*.wiki-beta.example",
                          from_ts="2021", to="2024",
                          filter=["=status:200"]) \
        .to_pandas()[["url", "mime"]].sort_values(["url", "mime"])
    got = ds.to_pandas().sort_values(["url", "mime"])
    assert got.reset_index(drop=True).equals(full.reset_index(drop=True))
    # no-fields queries keep reading the full dynamic schema
    seen_cols.clear()
    monkeypatch.setattr(rd, "read_parquet", spy)
    query_captures(fixture_dir["captures"], url="*.wiki-beta.example")
    assert seen_cols and all(c is None for c in seen_cols)


def test_over_budget_pages_table_never_builds_driver_dict(fixture_dir,
                                                          monkeypatch):
    """Above the driver-index byte budget the interactive veneer must
    resolve content per url (predicate-pushdown reads), never a dict of
    the whole pages table — and return byte-identical content."""
    import cdx_toolkit_ray as ctr
    from cdx_toolkit_ray.api import _LazyContentIndex

    def fetch(budget):
        cdx = ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                             pages_path=fixture_dir["pages"])
        monkeypatch.setattr(type(cdx), "INDEX_BUDGET_BYTES", budget)
        objs = list(cdx.iter("*.big-portal.example", limit=5,
                             from_ts="2021", to="2024",
                             filter=["=status:200"]))
        return cdx._index(), [(o["url"], o.content) for o in objs]

    idx_lazy, lazy = fetch(0)              # everything over budget
    idx_dict, full = fetch(1 << 40)        # everything under budget
    assert isinstance(idx_lazy, _LazyContentIndex)
    assert isinstance(idx_dict, dict)
    assert lazy == full and len(lazy) == 5
    assert all(isinstance(c, bytes) for _, c in lazy)


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


def test_pushdown_keeps_sort_keys(ray_session, fixture_dir):
    """fields= pruning must still read the resort/closest sort keys."""
    from cdx_toolkit_ray.sources.captures import query_captures

    root = fixture_dir["captures"]
    out = query_captures(root, url="*.big-portal.example",
                         from_ts="2021", to="2024",
                         fields=["url"], resort=True).to_pandas()
    assert len(out) > 0
    out2 = query_captures(root, url=None, closest="20220601000000",
                          from_ts="2021", to="2024", limit=5,
                          fields=["url"]).to_pandas()
    assert len(out2) > 0


def test_size_estimate_on_file_source(ray_session, fixture_dir):
    """A --source FILE table (no crawl= partitions) must estimate via
    parquet metadata, not crash on os.listdir."""
    from cdx_toolkit_ray.sources.captures import size_estimate

    pages = fixture_dir["pages"]  # a single parquet FILE
    n = size_estimate(pages, source="custom")
    assert n > 0
