"""Content pipeline: join, byte-identical text, fgrep gates, segments."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from cdx_toolkit_ray.pipelines.warcout import (
    SegmentedParquetWriter,
    extract_content,
    get_writer,
    load_pages_index,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_byte_identical_text(fixture_dir):
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.big-portal.example", cc_sort="ascending",
                         from_ts="2021", to="2024", limit=50)
    rows = ds.take_all()
    assert len(rows) > 0
    for r in rows:
        assert r["text"] == r["html"].decode("utf-8", errors="replace")
    # fixture guarantees some rows carry invalid UTF-8 -> replacement char
    pages = pq.read_table(fixture_dir["pages"], columns=["html"])
    assert any(b"\xff\xfe" in h.as_py() for h in pages["html"])


def test_miss_rows_skipped(fixture_dir):
    # unknown-host seeds have no pages rows; extract over all captures
    # only returns rows whose url exists in pages (404-skip parity)
    idx = load_pages_index(fixture_dir["pages"])
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.news-hub.example", cc_sort="ascending",
                         from_ts="2021", to="2024")
    for r in ds.select_columns(["url"]).take_all():
        assert r["url"] in idx


def test_fgrep_gates(fixture_dir):
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.shop.example", cc_sort="ascending",
                         from_ts="2021", to="2024", url_fgrep="/p/")
    urls = [r["url"] for r in ds.select_columns(["url"]).take_all()]
    assert urls and all("/p/" in u for u in urls)
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.shop.example", cc_sort="ascending",
                         from_ts="2021", to="2024", url_fgrepv="/p/")
    urls = [r["url"] for r in ds.select_columns(["url"]).take_all()]
    assert all("/p/" not in u for u in urls)


def test_segmented_writer_rotation(fixture_dir, tmp_path):
    prefix = str(tmp_path / "TEST")
    w = get_writer(prefix, "sub", {"software": "cdx_toolkit_ray"},
                   size=20_000)
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.big-portal.example", cc_sort="ascending",
                         from_ts="2021", to="2024")
    w.write_dataset(ds, batch_size=64)
    segs = sorted(glob.glob(prefix + "-sub-*.extracted.parquet"))
    assert len(segs) >= 2  # rotation happened
    total = sum(pq.read_metadata(s).num_rows for s in segs)
    assert total == ds.count()
    # info sidecar
    with open(prefix + "-sub.warcinfo.json") as fd:
        info = json.load(fd)
    assert info["software"] == "cdx_toolkit_ray"
    # restart safety: a new writer must not clobber existing segments
    mtimes = {s: os.path.getmtime(s) for s in segs}
    w2 = SegmentedParquetWriter(prefix, "sub", size=20_000)
    import pyarrow as pa

    w2.write_batch(pa.table({"x": [1]}))
    w2.close()
    for s, m in mtimes.items():
        assert os.path.getmtime(s) == m
    assert len(glob.glob(prefix + "-sub-*.extracted.parquet")) == len(segs) + 1
