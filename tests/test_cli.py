"""CLI surface parity tests (reference tests/test_cli.py model:
run main(args=...) and assert on stdout line counts / shapes)."""

import io
import json

import pytest

from cdx_toolkit_ray import cli


def run_cli(args, fixture_dir):
    parser = cli.make_parser()
    cmd = parser.parse_args(args=args)
    out = io.StringIO()
    cmd.func(cmd, out=out)
    return out.getvalue()


def base_args(fixture_dir):
    return ["--captures-root", fixture_dir["captures"],
            "--pages", fixture_dir["pages"]]


def test_iter_kv_lines(ray_session, fixture_dir):
    text = run_cli(base_args(fixture_dir)
                   + ["--limit", "7", "--from", "2021", "--to", "2024",
                      "iter", "*.big-portal.example"], fixture_dir)
    lines = [ln for ln in text.splitlines() if ln]
    assert len(lines) == 7
    # default fields url,status,timestamp as sorted "k v" pairs
    assert all(ln.startswith("status ") for ln in lines)
    assert all("timestamp " in ln and "url " in ln for ln in lines)


def test_iter_jsonl_and_filter(ray_session, fixture_dir):
    text = run_cli(base_args(fixture_dir)
                   + ["--limit", "5", "--from", "2021", "--to", "2024",
                      "--filter", "=status:200",
                      "iter", "--jsonl", "*.big-portal.example"],
                   fixture_dir)
    rows = [json.loads(ln) for ln in text.splitlines() if ln]
    assert rows and all(r["status"] == "200" for r in rows)
    assert set(rows[0]) == {"url", "status", "timestamp"}


def test_iter_csv_all_fields(ray_session, fixture_dir):
    text = run_cli(base_args(fixture_dir)
                   + ["--limit", "3", "--from", "2021", "--to", "2024",
                      "iter", "--csv", "--fields", "urlkey,digest",
                      "*.big-portal.example"], fixture_dir)
    lines = text.splitlines()
    assert lines[0] == "digest,urlkey"
    assert len(lines) == 4


def test_size(ray_session, fixture_dir):
    text = run_cli(base_args(fixture_dir)
                   + ["--from", "2021", "--to", "2024",
                      "size", "*.big-portal.example"], fixture_dir)
    assert int(text.strip()) >= 0


def test_size_details(ray_session, fixture_dir):
    text = run_cli(base_args(fixture_dir)
                   + ["--from", "2021", "--to", "2024",
                      "size", "--details", "*.example"], fixture_dir)
    lines = text.splitlines()
    assert len(lines) >= 2  # total + per-crawl lines


def test_warc_segments(ray_session, fixture_dir, tmp_path):
    prefix = str(tmp_path / "OUT")
    run_cli(base_args(fixture_dir)
            + ["--from", "2021", "--to", "2024",
               "warc", "--prefix", prefix, "--size", "20000",
               "--format", "parquet",
               "--url-fgrep", "/p/", "*.example"], fixture_dir)
    segs = sorted(p.name for p in tmp_path.iterdir())
    assert any(n.endswith(".extracted.parquet") for n in segs)
    assert any(n.endswith(".warcinfo.json") for n in segs)
    info = json.load(open(str(tmp_path / "OUT.warcinfo.json")))
    assert info["isPartOf"].endswith("OUT")


def test_cli_report(fixture_dir, capsys):
    from cdx_toolkit_ray.cli import main

    main(["--captures-root", fixture_dir["captures"], "report"])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(lines) >= 2                      # several crawls
    cols = lines[0].split()
    assert len(cols) == 8
    assert cols[0].startswith("CC-MAIN-")
    n_caps, n_keys = int(cols[1]), int(cols[2])
    assert n_caps >= n_keys > 0

    main(["--captures-root", fixture_dir["captures"], "report",
          "--jsonl"])
    import json
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.splitlines() if ln]
    assert {"crawl", "n_captures", "n_urlkeys", "n_hosts", "n_ok",
            "n_redirect", "n_error", "n_revisit"} <= set(rows[0])


def test_cli_version(capsys):
    from cdx_toolkit_ray import __version__
    from cdx_toolkit_ray.cli import main

    with pytest.raises(SystemExit) as ei:
        main(["--version"])
    assert ei.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_cli_requires_some_table(capsys):
    from cdx_toolkit_ray.cli import main

    with pytest.raises(SystemExit):
        main(["iter", "*.example"])


def test_source_path_is_single_endpoint(ray_session, fixture_dir):
    """source=<table path> (the reference's arbitrary --source URL,
    localized): one endpoint, pywb dialect, no crawl-window pruning —
    same rows as the cc dialect with no window."""
    import cdx_toolkit_ray as ctr

    custom = ctr.CDXFetcher(source=fixture_dir["captures"],
                            pages_path=fixture_dir["pages"])
    assert custom.source == "custom"
    got = [o["url"] for o in custom.iter("*.big-portal.example",
                                         limit=20)]
    assert len(got) == 20 and all("big-portal" in u for u in got)


def test_source_resolution_parity_errors(fixture_dir):
    import cdx_toolkit_ray as ctr

    with pytest.raises(ValueError, match="both wb and"):
        ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                       wb="X", warc_download_prefix="Y")
    with pytest.raises(ValueError, match="wb= for source=cc"):
        ctr.CDXFetcher(captures_root=fixture_dir["captures"], wb="X")
    with pytest.raises(ValueError, match="could not understand"):
        ctr.CDXFetcher(source="nonsense-neither-path-nor-dialect")
    with pytest.raises(ValueError, match="unreachable"):
        ctr.CDXFetcher(source="https://example.com/cdx")
    # ia defaults the wayback prefix (reference __init__.py:233-235)
    ia = ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                        source="ia")
    assert ia.wb == "https://web.archive.org/web"
    # cc defaults the download prefix
    cc = ctr.CDXFetcher(captures_root=fixture_dir["captures"])
    assert cc.warc_download_prefix == "https://data.commoncrawl.org"


def test_warc_source_uri_stamping(ray_session, fixture_dir):
    """fetch_warc_record stamps WARC-Source-URI with the download
    prefix (cc) or the wayback replay url (wb) — warc.py:107,126
    parity."""
    import cdx_toolkit_ray as ctr

    cc = ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                        pages_path=fixture_dir["pages"])
    obj = next(cc.iter("*.big-portal.example", limit=1,
                       from_ts="2021", to="2024",
                       filter=["=status:200"]))
    rec = obj.fetch_warc_record()
    assert rec["warc_source_uri"].startswith(
        "https://data.commoncrawl.org/")

    wb = ctr.CDXFetcher(captures_root=fixture_dir["captures"],
                        pages_path=fixture_dir["pages"], source="ia")
    obj = next(wb.iter("*.big-portal.example", limit=1,
                       from_ts="2021", to="2024",
                       filter=["statuscode:200"]))
    rec = obj.fetch_warc_record()
    assert rec["warc_source_uri"].startswith(
        "https://web.archive.org/web/")
    assert rec["warc_source_uri"].endswith("id_/" + obj["url"])


def test_cc_mirror_is_alternate_root(ray_session, fixture_dir,
                                     tmp_path):
    import os

    import cdx_toolkit_ray as ctr

    mirror = str(tmp_path / "mirror")
    os.symlink(fixture_dir["captures"], mirror)
    cdx = ctr.CDXFetcher(cc_mirror=mirror)
    assert cdx.captures_root == mirror
    assert cdx.get_size_estimate("*.big-portal.example",
                                 from_ts="2021", to="2024") > 0


def test_cli_crawl_resumable(ray_session, fixture_dir, tmp_path):
    out_dir = str(tmp_path / "cli_crawl")
    text = run_cli(["--pages", fixture_dir["pages"],
                    "crawl", "--out", out_dir,
                    "--max-waves", "1", "--delay-ms", "500"],
                   fixture_dir)
    r = json.loads(text)
    assert r["ran_waves"] == [0, 1] and r["skipped_waves"] == []
    assert r["counters"]["0"]["rows"] > 0
    # rerun skips everything
    text2 = run_cli(["--pages", fixture_dir["pages"],
                     "crawl", "--out", out_dir,
                     "--max-waves", "1", "--delay-ms", "500"],
                    fixture_dir)
    r2 = json.loads(text2)
    assert r2["ran_waves"] == [] and r2["skipped_waves"] == [0, 1]


def test_cli_crawl_requires_pages(capsys):
    with pytest.raises(SystemExit):
        cli.main(["crawl", "--out", "/tmp/x"])
    assert "requires --pages" in capsys.readouterr().err


def test_cli_curate(ray_session, tmp_path, capsys):
    import json

    from cdx_toolkit_ray.cli import main

    out = str(tmp_path / "curated")
    main(["curate", "--sf-dir", "/root/testdata/sf0.001",
          "--out", out])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] > 0 and rec["tokens"] > 0
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert set(t.column_names) == {"doc_id", "source", "n_tok",
                                   "cum_before"}
