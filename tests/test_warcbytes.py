"""Real WARC/1.0 byte output (pipelines/warcbytes.py): rendering,
segment rotation/naming parity with the reference writer
(cdx_toolkit/warc.py:159-209), round-trip re-parse, and ingest."""

import gzip
import zlib

import pytest

from cdx_toolkit_ray.pipelines.warcbytes import (SegmentedWARCWriter,
                                                 get_warc_writer,
                                                 parse_warc,
                                                 render_warc_record,
                                                 render_warcinfo)


def _gzip_member_count(data: bytes) -> int:
    """Walk the multi-member gzip stream member by member."""
    count = 0
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        d.decompress(data[pos:])
        count += 1
        rest = d.unused_data
        pos = len(data) - len(rest)
        if not rest:
            break
    return count


def test_render_parse_roundtrip_structure():
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>\xff"
    raw = render_warc_record(
        "response",
        [("WARC-Record-ID", "<urn:uuid:x>"),
         ("WARC-Date", "2026-01-01T00:00:00Z"),
         ("WARC-Target-URI", "https://a.example/")],
        body)
    assert raw.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert raw.endswith(body + b"\r\n\r\n")
    recs = parse_warc(raw)
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "response"
    assert r["version"] == "WARC/1.0"
    assert r["headers"]["WARC-Target-URI"] == "https://a.example/"
    assert int(r["headers"]["Content-Length"]) == len(body)
    assert r["content"] == body            # byte identity, invalid utf8 too


def test_warcinfo_fields_sorted_and_named():
    raw = render_warcinfo("/x/OUT-000000.extracted.warc.gz",
                          {"b": "2", "a": "1"}, "2026-01-01T00:00:00Z")
    r = parse_warc(raw)[0]
    assert r["warc_type"] == "warcinfo"
    assert r["headers"]["WARC-Filename"] == "OUT-000000.extracted.warc.gz"
    assert r["headers"]["Content-Type"] == "application/warc-fields"
    assert r["content"] == b"a: 1\r\nb: 2\r\n"


def _records(n, size=400):
    return [{"warc_type": "response",
             "warc_target_uri": "https://h%d.example/p" % i,
             "warc_source_uri": "crawl/seg/file%d.warc.gz" % i,
             "warc_source_range": "bytes=0-99",
             "payload": ("payload %d " % i).encode() + b"x" * size,
             "status": "200", "mime": "text/html"} for i in range(n)]


def test_segment_rotation_naming_and_roundtrip(tmp_path):
    prefix = str(tmp_path / "OUT")
    w = SegmentedWARCWriter(prefix, "SUB", {"isPartOf": "OUT-SUB"},
                            size=2000, gzip=True)
    for rec in _records(12):
        w.write_record(rec)
    w.close()
    segs = sorted(p.name for p in tmp_path.iterdir())
    assert segs[0] == "OUT-SUB-000000.extracted.warc.gz"
    assert len(segs) > 1                       # rotation happened
    # every segment: gzip multi-member, warcinfo first, then responses
    seen_urls = []
    for s in segs:
        data = (tmp_path / s).read_bytes()
        assert _gzip_member_count(data) >= 2   # one member PER record
        recs = parse_warc(data)
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["headers"]["WARC-Filename"] == s
        assert b"isPartOf: OUT-SUB" in recs[0]["content"]
        for r in recs[1:]:
            assert r["warc_type"] == "response"
            assert r["content"].startswith(b"HTTP/1.1 200 OK\r\n")
            assert r["headers"]["WARC-Source-Range"] == "bytes=0-99"
            seen_urls.append(r["headers"]["WARC-Target-URI"])
    assert seen_urls == ["https://h%d.example/p" % i for i in range(12)]


def test_restart_safe_name_probing(tmp_path):
    prefix = str(tmp_path / "OUT")
    (tmp_path / "OUT-000000.extracted.warc.gz").write_bytes(b"old")
    w = SegmentedWARCWriter(prefix, None, {}, size=10**9)
    w.write_record(_records(1)[0])
    w.close()
    assert (tmp_path / "OUT-000001.extracted.warc.gz").exists()
    assert (tmp_path / "OUT-000000.extracted.warc.gz").read_bytes() == b"old"


def test_deterministic_bytes(tmp_path):
    outs = []
    for d in ("a", "b"):
        prefix = str(tmp_path / d / "OUT")
        (tmp_path / d).mkdir()
        w = get_warc_writer(prefix, None, {"k": "v"}, size=10**9)
        for rec in _records(3):
            w.write_record(rec)
        w.close()
        outs.append((tmp_path / d / "OUT-000000.extracted.warc.gz")
                    .read_bytes())
    assert outs[0] == outs[1]


def test_plain_uncompressed_roundtrip(tmp_path):
    prefix = str(tmp_path / "OUT")
    w = SegmentedWARCWriter(prefix, None, {}, size=10**9, gzip=False)
    recs = _records(2)
    for rec in recs:
        w.write_record(rec)
    w.close()
    data = (tmp_path / "OUT-000000.extracted.warc").read_bytes()
    parsed = parse_warc(data)
    assert [r["warc_type"] for r in parsed] == ["warcinfo", "response",
                                                "response"]
    # payload byte-identity through the HTTP block
    assert parsed[1]["content"].endswith(recs[0]["payload"])


def test_full_http_payload_passes_through_untouched(tmp_path):
    prefix = str(tmp_path / "OUT")
    w = SegmentedWARCWriter(prefix, None, {}, size=10**9, gzip=False)
    msg = b"HTTP/1.1 301 Moved Permanently\r\nLocation: /x\r\n\r\nbody"
    w.write_record({"warc_target_uri": "https://a.example/",
                    "payload": msg})
    w.close()
    parsed = parse_warc(
        (tmp_path / "OUT-000000.extracted.warc").read_bytes())
    assert parsed[1]["content"] == msg


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC\r\n\r\n")


def test_read_warc_dataset_roundtrip(ray_session, tmp_path):
    from cdx_toolkit_ray.pipelines.warcbytes import read_warc

    prefix = str(tmp_path / "OUT")
    w = SegmentedWARCWriter(prefix, None, {}, size=10**9)
    recs = _records(5)
    for rec in recs:
        w.write_record(rec)
    w.close()
    df = read_warc(str(tmp_path / "OUT-000000.extracted.warc.gz")) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 5                        # warcinfo skipped
    assert list(df["url"]) == sorted(r["warc_target_uri"] for r in recs)
    assert (df["status"] == "200").all()
    by_url = {r["warc_target_uri"]: r["payload"] for r in recs}
    for _, row in df.iterrows():
        assert bytes(row["payload"]) == by_url[row["url"]]


def test_cli_warc_default_writes_real_warc(ray_session, fixture_dir,
                                           tmp_path):
    import pyarrow.parquet as pq

    from cdx_toolkit_ray.cli import main

    prefix = str(tmp_path / "OUT")
    main(["--captures-root", fixture_dir["captures"],
          "--pages", fixture_dir["pages"],
          "--from", "2021", "--to", "2024",
          "warc", "--prefix", prefix, "--size", "200000",
          "--url-fgrep", "/p/", "*.example"])
    segs = sorted(p for p in tmp_path.iterdir()
                  if p.name.endswith(".extracted.warc.gz"))
    assert segs, "no WARC segments written"
    pages = pq.read_table(fixture_dir["pages"], columns=["url", "html"])
    # duplicate pages rows resolve to the lexicographically greatest
    # html (extract_content's deterministic winner rule)
    html_by_url: dict = {}
    for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        if u not in html_by_url or h > html_by_url[u]:
            html_by_url[u] = h
    n_responses = 0
    for s in segs:
        recs = parse_warc(s.read_bytes())
        assert recs[0]["warc_type"] == "warcinfo"
        assert b"software: cdx_toolkit_ray" in recs[0]["content"]
        for r in recs[1:]:
            assert r["warc_type"] == "response"
            url = r["headers"]["WARC-Target-URI"]
            assert "/p/" in url
            body = r["content"][r["content"].index(b"\r\n\r\n") + 4:]
            assert body == html_by_url[url]    # byte-identical content
            n_responses += 1
    assert n_responses > 0


def test_index_warc_and_byte_range_replay(ray_session, tmp_path):
    """CDX indexing contract: every indexed (offset, length) span,
    fetched as a raw byte range, replays exactly the record it indexes
    (the reference's Range-GET semantics, warc.py:123-137) — gzip
    member spans and plain record spans both."""
    import hashlib

    from cdx_toolkit_ray.pipelines.warcbytes import (fetch_record_range,
                                                     index_warc)

    for gz in (True, False):
        prefix = str(tmp_path / ("G" if gz else "P"))
        w = SegmentedWARCWriter(prefix, None, {}, size=1500, gzip=gz)
        recs = _records(9, size=300)
        for rec in recs:
            w.write_record(rec)
        w.close()
        import glob
        segs = sorted(glob.glob(prefix + "-*.extracted.warc*"))
        assert len(segs) > 1                    # rotation exercised
        idx = index_warc(segs).to_pandas()
        assert len(idx) == 9                    # warcinfo rows excluded
        by_url = {r["warc_target_uri"]: r["payload"] for r in recs}
        seg_by_name = {p.split("/")[-1]: p for p in segs}
        for _, row in idx.iterrows():
            rec = fetch_record_range(seg_by_name[row["filename"]],
                                     int(row["offset"]),
                                     int(row["length"]))
            assert rec["warc_type"] == "response"
            assert rec["headers"]["WARC-Target-URI"] == row["url"]
            body = rec["content"][rec["content"].index(b"\r\n\r\n") + 4:]
            assert body == by_url[row["url"]]   # byte-identical replay
            assert row["digest"] == "sha256:" + \
                hashlib.sha256(body).hexdigest()
            assert row["status"] == "200"
            assert row["mime"] == "text/html"
            assert row["timestamp"] == "20260101000000"
            assert row["urlkey"]                # SURT computed


def test_fetch_record_range_rejects_bad_span(tmp_path):
    from cdx_toolkit_ray.pipelines.warcbytes import fetch_record_range

    prefix = str(tmp_path / "OUT")
    w = SegmentedWARCWriter(prefix, None, {}, size=10**9)
    w.write_record(_records(1)[0])
    w.close()
    path = prefix + "-000000.extracted.warc.gz"
    with pytest.raises(ValueError):
        fetch_record_range(path, 0, 10**9)      # short read


def test_wet_conversion_records_roundtrip(ray_session, tmp_path):
    """WET export: (url, text) -> conversion records -> read back with
    byte-identical text, rotation + warcinfo intact."""
    import glob

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.pipelines.warcbytes import read_warc, write_wet

    rows = pa.table({
        "url": pa.array(["https://h%d.example/p" % i for i in range(8)]),
        "text": pa.array(["text %d é\n" % i + "x" * 400
                          for i in range(8)]),
    })
    prefix = str(tmp_path / "WET")
    written = write_wet(ray.data.from_arrow(rows), prefix, size=1200)
    segs = sorted(glob.glob(prefix + "-*.extracted.warc.gz"))
    assert len(segs) > 1 and set(written) <= set(segs)
    # parse level: conversion records, text/plain, no HTTP block
    recs = parse_warc(open(segs[0], "rb").read())
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[1]["warc_type"] == "conversion"
    assert recs[1]["headers"]["Content-Type"] == "text/plain"
    assert not recs[1]["content"].startswith(b"HTTP/")
    # dataset level: byte-identical text per url
    df = read_warc(segs, record_types=("conversion",)).to_pandas()
    assert len(df) == 8
    want = dict(zip(rows["url"].to_pylist(), rows["text"].to_pylist()))
    for _, r in df.iterrows():
        assert bytes(r["payload"]).decode("utf-8") == want[r["url"]]
    # response-only reads skip conversion records entirely
    assert read_warc(segs).count() == 0


def test_cdxfetcher_content_via_warc_byte_range(ray_session, tmp_path):
    """Self-hosting loop: write WARC -> index_warc -> captures table ->
    CDXFetcher(warc_dir=) resolves .content by reading EXACTLY the
    indexed byte span (the reference's real fetch path) — no pages
    table anywhere."""
    import glob

    import pyarrow.parquet as pq

    import cdx_toolkit_ray as ctr
    from cdx_toolkit_ray.pipelines.warcbytes import index_warc

    prefix = str(tmp_path / "SEG")
    w = SegmentedWARCWriter(prefix, None, {}, size=1500)
    recs = _records(7, size=300)
    for rec in recs:
        w.write_record(rec)
    w.close()
    segs = sorted(glob.glob(prefix + "-*.extracted.warc.gz"))
    idx = index_warc(segs).to_pandas()
    # index -> a captures table (single custom endpoint)
    cap_path = str(tmp_path / "captures.parquet")
    pq.write_table(pa_from_pandas(idx), cap_path)

    cdx = ctr.CDXFetcher(source=cap_path, warc_dir=str(tmp_path))
    objs = list(cdx.iter(None, limit=10))
    assert len(objs) == 7
    by_url = {r["warc_target_uri"]: r["payload"] for r in recs}
    for o in objs:
        assert o.content == by_url[o["url"]]
        assert o.text == o.content.decode("utf-8", errors="replace")


def pa_from_pandas(df):
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False)


def test_header_injection_sanitized():
    from cdx_toolkit_ray.pipelines.warcbytes import (parse_warc,
                                                     render_warc_record)

    evil = "http://h/x\r\nWARC-Type: warcinfo\r\n\r\nforged"
    rec = render_warc_record(
        "response",
        [("WARC-Target-URI", evil),
         ("WARC-Date", "2023-01-01T00:00:00Z")],
        b"HTTP/1.1 200 OK\r\n\r\nbody")
    parsed = parse_warc(rec)
    assert len(parsed) == 1
    assert parsed[0]["warc_type"] == "response"
    uri = parsed[0]["headers"]["WARC-Target-URI"]
    assert "\r" not in uri and "\n" not in uri
    assert "%0D%0AWARC-Type" in uri  # encoded, not interpreted


def test_wat_roundtrip_and_rotation(tmp_path, ray_session):
    import glob

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.pipelines.warcbytes import (parse_wat_batch,
                                                     read_warc,
                                                     write_wat)

    rows = pa.table({
        "url": pa.array(["https://a.example/%d" % i for i in range(40)],
                        pa.string()),
        "title": pa.array(["t %d" % i if i % 3 else "" for i in range(40)],
                          pa.string()),
        "n_links": pa.array(list(range(40)), pa.int64()),
        "content_len": pa.array([100 + i for i in range(40)], pa.int64()),
        "plain_len": pa.array([50 + i for i in range(40)], pa.int64()),
    })
    segs = write_wat(ray.data.from_arrow(rows),
                     str(tmp_path / "WAT"), size=2_000)
    assert len(segs) > 1, "size rotation did not split segments"
    files = sorted(glob.glob(str(tmp_path) + "/WAT-*.extracted.warc.gz"))
    back = (read_warc(files, record_types=("metadata",))
            .map_batches(parse_wat_batch, batch_format="pyarrow",
                         batch_size=None).to_pandas()
            .sort_values("url").reset_index(drop=True))
    want = rows.to_pandas().sort_values("url").reset_index(drop=True)
    assert back.equals(want)
