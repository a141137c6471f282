"""Distributed segmented WARC/WET/WAT writer (VERDICT r4 item 1):
byte-parity with the serial ``SegmentedWARCWriter`` on multi-segment,
multi-block output, plus the resume contract. The serial writer is the
reference-semantics twin (cdx_toolkit/warc.py:159-209), so file-level
byte identity here proves the distributed path preserves the
reference's rotation/naming/warcinfo contract exactly."""

import os

import pytest
import pyarrow as pa

from cdx_toolkit_ray.pipelines.warcbytes import (
    SegmentedWARCWriter, parse_warc, write_dataset_distributed,
    write_warc_distributed, write_wat_distributed, write_wet,
    write_wet_distributed, write_wat)


def _content_table(n, pad=300):
    return pa.table({
        "url": ["https://h%d.example/p%d" % (i % 7, i) for i in range(n)],
        "html": [("<html>doc %d " % i).encode() + b"y" * (pad + i % 97)
                 for i in range(n)],
        "status": ["200"] * n,
        "mime": ["text/html"] * n,
        "filename": ["crawl/seg/file%d.warc.gz" % i for i in range(n)],
    })


def _read_all(root):
    return {p: open(os.path.join(root, p), "rb").read()
            for p in sorted(os.listdir(root))
            if ".inprogress" not in p}


def _assert_dir_parity(serial_dir, dist_dir):
    a, b = _read_all(str(serial_dir)), _read_all(str(dist_dir))
    assert sorted(a) == sorted(b)
    for name in a:
        assert a[name] == b[name], "segment %s differs" % name


@pytest.mark.parametrize("gzip_on", [True, False])
def test_warc_parity_multiblock_multisegment(ray_session, tmp_path,
                                             gzip_on):
    import ray.data

    t = _content_table(60)
    sdir, ddir = tmp_path / "serial", tmp_path / "dist"
    sdir.mkdir(), ddir.mkdir()
    info = {"isPartOf": "PAR", "operator": "test"}

    w = SegmentedWARCWriter(str(sdir / "OUT"), "SUB", info, size=3000,
                            gzip=gzip_on)
    serial_paths = w.write_dataset(ray.data.from_arrow(t))

    ds = ray.data.from_arrow(t).repartition(7)  # cross-block segments
    dist_paths = write_dataset_distributed(
        ds, str(ddir / "OUT"), "SUB", info, mode="warc", size=3000,
        gzip=gzip_on)
    assert len(serial_paths) > 2               # rotation actually hit
    assert [os.path.basename(p) for p in sorted(serial_paths)] == \
           [os.path.basename(p) for p in sorted(dist_paths)]
    _assert_dir_parity(sdir, ddir)
    # and the output is well-formed WARC with the planned record count
    recs = [r for p in dist_paths
            for r in parse_warc(open(p, "rb").read())]
    assert sum(r["warc_type"] == "response" for r in recs) == 60
    assert sum(r["warc_type"] == "warcinfo" for r in recs) == \
           len(dist_paths)


def test_wet_and_wat_parity(ray_session, tmp_path):
    import ray.data

    wet_rows = pa.table({
        "url": ["https://w%d.example/" % i for i in range(40)],
        "text": ["text %d " % i + "z" * (200 + 13 * i) for i in range(40)],
    })
    wat_rows = pa.table({
        "url": ["https://w%d.example/" % i for i in range(40)],
        "title": ["T%d" % i for i in range(40)],
        "n_links": list(range(40)),
        "content_len": [1000 + i for i in range(40)],
        "plain_len": [500 + i for i in range(40)],
    })
    for name, rows, serial_fn, dist_fn, cap in [
            ("WET", wet_rows, write_wet, write_wet_distributed, 2500),
            ("WAT", wat_rows, write_wat, write_wat_distributed, 2500)]:
        sdir, ddir = tmp_path / ("s" + name), tmp_path / ("d" + name)
        sdir.mkdir(), ddir.mkdir()
        sp = serial_fn(ray.data.from_arrow(rows), str(sdir / name),
                       None, {"isPartOf": name}, size=cap)
        dp = dist_fn(ray.data.from_arrow(rows).repartition(5),
                     str(ddir / name), None, {"isPartOf": name},
                     size=cap)
        assert len(sp) > 1 and len(sp) == len(dp)
        _assert_dir_parity(sdir, ddir)


def test_single_record_overflows_fresh_segment(ray_session, tmp_path):
    """A record bigger than the cap still lands in its own segment
    (serial writes then rotates; the planner's searchsorted clamp)."""
    import ray.data

    rng = __import__("numpy").random.RandomState(11)
    t = pa.table({"url": ["https://big.example/%d" % i for i in range(5)],
                  "html": [rng.bytes(5000) for _ in range(5)]})
    sdir, ddir = tmp_path / "s", tmp_path / "d"
    sdir.mkdir(), ddir.mkdir()
    w = SegmentedWARCWriter(str(sdir / "BIG"), None, {}, size=1000)
    sp = w.write_dataset(ray.data.from_arrow(t))
    dp = write_warc_distributed(ray.data.from_arrow(t).repartition(3),
                                str(ddir / "BIG"), None, {}, size=1000)
    assert len(sp) == 5 == len(dp)
    _assert_dir_parity(sdir, ddir)


def test_empty_dataset_writes_nothing(ray_session, tmp_path):
    import ray.data

    out = write_warc_distributed(
        ray.data.from_arrow(_content_table(0)), str(tmp_path / "E"),
        None, {})
    assert out == []
    assert list(tmp_path.iterdir()) == []


def test_resume_skips_finished_segments(ray_session, tmp_path):
    import ray.data

    t = _content_table(60)
    ds = ray.data.from_arrow(t).repartition(4)
    first = write_warc_distributed(ds, str(tmp_path / "R"), None, {},
                                   size=3000)
    assert len(first) > 2
    bytes_before = _read_all(str(tmp_path))
    # simulate a crashed run: one finished segment missing
    os.unlink(first[1])
    again = write_warc_distributed(ds, str(tmp_path / "R"), None, {},
                                   size=3000, resume=True)
    assert sorted(again) == sorted(first)
    assert _read_all(str(tmp_path)) == bytes_before


def test_existing_segment_without_resume_raises(ray_session, tmp_path):
    import ray.data

    t = _content_table(10)
    # serial-probe parity: planned name 0 taken -> plan starts at 1 for
    # a contiguous prefix; a file appearing mid-plan raises
    (tmp_path / "X-000000.extracted.warc.gz").write_bytes(b"old")
    out = write_warc_distributed(ray.data.from_arrow(t),
                                 str(tmp_path / "X"), None, {},
                                 size=10**9)
    assert [os.path.basename(p) for p in out] == \
           ["X-000001.extracted.warc.gz"]
