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


def test_wb_redir_to_original():
    from cdx_toolkit_ray.pipelines.warcout import wb_redir_to_original

    assert (wb_redir_to_original(
        "https://web.archive.org/web/2015id_/http://x.example/p")
        == "http://x.example/p")
    assert (wb_redir_to_original("/web/20221201id_/https://y.example/")
            == "https://y.example/")


def test_synthesize_wb_record_branches():
    """Reference fake_wb_warc reconciliation + header munge rules
    (cdx_toolkit/warc.py:34-95)."""
    from cdx_toolkit_ray.pipelines.warcout import synthesize_wb_record

    hdrs = [("X-Archive-Orig-Date", "Thu, 01 Dec 2022 16:00:00 GMT"),
            ("X-Archive-Orig-Server", "nginx"),
            ("Content-Type", "text/html"),
            ("Location", "https://wb.example/web/2022id_/http://t.example/x"),
            ("Cache-Control", "no-store")]

    # wayback 302 on an archived 301 -> capture status restored
    rec = synthesize_wb_record({"url": "u", "timestamp": "t",
                                "status": "301"},
                               302, "Found", hdrs, "WBURL", "2023-01-01")
    assert rec["statusline"] == "301 Moved Permanently"
    assert rec["anomaly"] is None
    hh = dict(rec["http_headers"])
    assert hh["Date"] == "Thu, 01 Dec 2022 16:00:00 GMT"
    assert hh["Server"] == "nginx"
    assert hh["Content-Type"] == "text/html"
    assert hh["Location"] == "http://t.example/x"
    assert hh["X-Archive-Cache-Control"] == "no-store"
    assert rec["warc_headers"]["WARC-Date"] == "2022-12-01T16:00:00Z"
    assert rec["warc_headers"]["WARC-Source-URI"] == "WBURL"

    # revisit vivified: 200 for a '-' capture keeps 200 but is flagged
    rec = synthesize_wb_record({"url": "u", "timestamp": "t", "status": "-"},
                               200, "OK", [], "W", "2023-01-01")
    assert rec["statusline"] == "200 OK"
    assert rec["anomaly"] == "revisit_vivified"

    # matching status: untouched, no anomaly
    rec = synthesize_wb_record({"url": "u", "timestamp": "t",
                                "status": "200"},
                               200, "OK", [], "W", "2023-01-01")
    assert rec["anomaly"] is None


def test_wb_synthesis_query_runs(ray_session):
    from cdx_toolkit_ray.queries import q_wb_synthesis

    df = q_wb_synthesis("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"urlkey", "timestamp", "statusline",
                               "warc_headers_json", "anomaly"}
    assert (df.statusline.str.len() > 0).all()


def test_bucket_join_matches_broadcast(fixture_dir):
    """The hash-bucket content join (large-pages scale path) must
    return exactly the broadcast path's rows and bytes — including the
    deterministic winner for urls with multiple distinct pages rows."""
    kw = dict(url="*.example", from_ts="2021", to="2024")
    bc = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         join_strategy="broadcast", **kw)
    bk = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         join_strategy="bucket", **kw)
    cols = ["urlkey", "timestamp", "url", "text"]
    a = (bc.select_columns(cols).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    b = (bk.select_columns(cols).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert a.equals(b)
    # byte-identity holds through the bucket path too
    for r in bk.take(20):
        assert r["text"] == r["html"].decode("utf-8", errors="replace")


def test_extract_content_auto_selects_bucket(fixture_dir):
    """auto strategy flips to the bucket join once the pages table
    exceeds the broadcast budget."""
    ds = extract_content(fixture_dir["captures"], fixture_dir["pages"],
                         url="*.big-portal.example", from_ts="2021",
                         to="2024", broadcast_budget_bytes=1)
    assert ds.count() > 0


def test_content_stream_and_writer_knobs(fixture_dir):
    import cdx_toolkit_ray as ctr

    cdx = ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                         pages_path=fixture_dir["pages"])
    objs = cdx.get("*.big-portal.example", from_ts="2021", to="2024",
                   limit=3)
    assert objs
    o = objs[0]
    # reference examples/iter-and-warc.py loop shape: stream then read
    assert o.content_stream.read() == o.content
    w = get_writer("/tmp/knobs-test", None, {"software": "x"},
                   gzip=False, warc_version="1.0")
    assert w.gzip is False and w.warc_version == "1.0"
    w.close()


def test_reference_example_loop_shape(fixture_dir, tmp_path):
    """The reference's examples/iter-and-warc.py:7-34 loop, ported by
    changing only the package name and the source arguments."""
    import cdx_toolkit_ray

    cdx = cdx_toolkit_ray.CDXFetcher(
        captures_root=fixture_dir["captures"],
        pages_path=fixture_dir["pages"])
    url = "*.big-portal.example"

    warcinfo = {
        "software": "cdx_toolkit_ray iter-and-warc example",
        "isPartOf": "EXAMPLE-COMMONCRAWL",
        "description": "warc extraction",
        "format": "WARC file version 1.0",
    }
    import cdx_toolkit_ray.warc

    writer = cdx_toolkit_ray.warc.get_writer(
        str(tmp_path / "EXAMPLE"), "COMMONCRAWL", warcinfo,
        warc_version="1.0")

    wrote = 0
    for obj in cdx.iter(url, limit=10, from_ts="2021", to="2024"):
        status = obj["status"]
        if status != "200":
            continue
        try:
            record = obj.fetch_warc_record()
        except RuntimeError:
            continue
        writer.write_record(record)
        wrote += 1
    writer.close()
    assert wrote > 0
    segs = glob.glob(str(tmp_path / "EXAMPLE-COMMONCRAWL-*.parquet"))
    assert segs
    total = sum(pq.read_metadata(s).num_rows for s in segs)
    assert total == wrote
    with open(str(tmp_path / "EXAMPLE-COMMONCRAWL.warcinfo.json")) as fd:
        assert json.load(fd)["isPartOf"] == "EXAMPLE-COMMONCRAWL"


def test_segment_plan_exact_binning_and_resume_property():
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.pipelines.warcout import segment_plan

    rows = [("k%02d" % i, "2022010100%04d" % i, "d%02d" % i, ln)
            for i, ln in enumerate([400, 400, 400, 100, 900, 50])]
    ds = ray.data.from_arrow(pa.table({
        "urlkey": pa.array([r[0] for r in rows], pa.string()),
        "timestamp": pa.array([r[1] for r in rows], pa.string()),
        "digest": pa.array([r[2] for r in rows], pa.string()),
        "length": pa.array([r[3] for r in rows], pa.int64())}))
    df = (segment_plan(ds, size=1000).to_pandas()
          .sort_values("urlkey").reset_index(drop=True))
    # prefix:    0    400  800  1200 1300 2200
    assert list(df["seg_id"]) == [0, 0, 0, 1, 1, 2]
    assert list(df["offset_in_seg"]) == [0, 400, 800, 200, 300, 200]
    # resumability: every segment's rows are contiguous in the order
    segs = df["seg_id"].to_numpy()
    assert (segs[1:] >= segs[:-1]).all()
