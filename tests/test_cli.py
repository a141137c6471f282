"""CLI surface parity tests (reference tests/test_cli.py model:
run main(args=...) and assert on stdout line counts / shapes)."""

import io
import json

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
