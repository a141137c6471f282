"""Sitemap render/parse/discovery (stages/sitemap.py): roundtrip
identity incl. XML escaping, 50k-cap chunking, malformed-block
tolerance, robots ``Sitemap:`` line extraction."""

import pyarrow as pa
import ray.data

from cdx_toolkit_ray.stages.sitemap import (
    extract_sitemap_urls_batch, parse_sitemap_batch, parse_sitemaps,
    render_sitemaps)


def _roundtrip(rows, **render_kw):
    tbl = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "seed_order": pa.array(range(len(rows)), pa.int64()),
        "lastmod": pa.array([r[2] for r in rows], pa.string()),
    })
    sm = render_sitemaps(ray.data.from_arrow(tbl), **render_kw)
    return sm, parse_sitemaps(sm).to_pandas()


def test_roundtrip_identity_with_escaping(ray_session):
    rows = [
        ("a.example", "https://a.example/?b=2&a=1", "2023-01-02"),
        ("a.example", "https://a.example/<odd>'\"&", None),
        ("b.example", "https://b.example/", "2023-12-31"),
    ]
    sm, out = _roundtrip(rows)
    got = {(r.host, r.url, None if pa.compute.is_null(pa.scalar(r.lastmod)).as_py() else r.lastmod)
           for r in out.itertuples()}
    assert got == set(rows)
    # the rendered XML itself must escape & and <
    xml = sm.to_pandas().set_index("host").sitemap_xml["a.example"]
    assert "&amp;" in xml and "&lt;odd&gt;" in xml
    assert "?b=2&a=1" not in xml


def test_chunking_and_order(ray_session):
    rows = [("h.example", "https://h.example/p/%d" % i, None)
            for i in range(25)]
    sm, out = _roundtrip(rows, max_per_sitemap=10)
    smp = sm.to_pandas()
    assert dict(zip(smp.part, smp.n_urls)) == {0: 10, 1: 10, 2: 5}
    # entries stay in seed_order across parts: part of row i is i//10
    part_of = dict(zip(out.url, out.part))
    for i in range(25):
        assert part_of["https://h.example/p/%d" % i] == i // 10


def test_lastmod_optional_and_null(ray_session):
    rows = [("x.example", "https://x.example/a", None),
            ("x.example", "https://x.example/b", "2024-02-28")]
    _, out = _roundtrip(rows)
    by_url = out.set_index("url").lastmod
    assert by_url["https://x.example/b"] == "2024-02-28"
    assert by_url.isna()["https://x.example/a"]


def test_malformed_blocks_dropped():
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>https://ok.example/</loc></url>"
           "<url><lastmod>2020-01-01</lastmod></url>"  # no <loc>
           "<url>junk</url>"
           "</urlset>")
    out = parse_sitemap_batch(pa.table({
        "host": pa.array(["h"], pa.string()),
        "sitemap_xml": pa.array([xml], pa.string())}),
        keep_cols=("host",))
    assert out["url"].to_pylist() == ["https://ok.example/"]


def test_parse_empty_and_no_blocks():
    empty = pa.table({"host": pa.array([], pa.string()),
                      "sitemap_xml": pa.array([], pa.string())})
    assert parse_sitemap_batch(empty).num_rows == 0
    none = pa.table({"host": pa.array(["h"], pa.string()),
                     "sitemap_xml": pa.array(["<urlset></urlset>"],
                                             pa.string())})
    assert parse_sitemap_batch(none).num_rows == 0


def test_extract_sitemap_lines():
    body_a = ("User-agent: *\nDisallow: /x\n"
              "Sitemap: https://a.example/sitemap.xml\n"
              "sitemap:\thttps://a.example/sitemap2.xml\n")
    body_b = "User-agent: *\nAllow: /\n"  # none declared
    out = extract_sitemap_urls_batch(pa.table({
        "host": pa.array(["a.example", "b.example"], pa.string()),
        "robots_txt": pa.array([body_a, body_b], pa.string())}))
    assert out["host"].to_pylist() == ["a.example", "a.example"]
    assert out["sitemap_url"].to_pylist() == [
        "https://a.example/sitemap.xml",
        "https://a.example/sitemap2.xml"]


def test_sitemap_index_roundtrip(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.sitemap import (parse_sitemap_index_batch,
                                                render_sitemap_index)

    # two hosts, 3 and 1 chunks; parts arrive out of order
    rows = [{"host": "b.example", "part": 2},
            {"host": "a.example", "part": 0},
            {"host": "b.example", "part": 0},
            {"host": "b.example", "part": 1}]
    idx = render_sitemap_index(
        ray.data.from_arrow(pa.Table.from_pylist(rows))).take_all()
    by_host = {r["host"]: r for r in idx}
    assert by_host["b.example"]["n_sitemaps"] == 3
    assert by_host["a.example"]["n_sitemaps"] == 1
    xml = by_host["b.example"]["index_xml"]
    assert xml.startswith('<?xml version="1.0"')
    assert "<sitemapindex" in xml and xml.endswith("</sitemapindex>\n")
    # part order inside the body
    assert xml.index("sitemap-0.xml") < xml.index("sitemap-1.xml") \
        < xml.index("sitemap-2.xml")

    out = parse_sitemap_index_batch(pa.Table.from_pylist(idx))
    got = sorted((r["host"], r["sitemap_url"])
                 for r in out.to_pylist())
    assert got == [
        ("a.example", "https://a.example/sitemap-0.xml"),
        ("b.example", "https://b.example/sitemap-0.xml"),
        ("b.example", "https://b.example/sitemap-1.xml"),
        ("b.example", "https://b.example/sitemap-2.xml")]


def test_sitemap_index_parse_tolerance():
    from cdx_toolkit_ray.stages.sitemap import parse_sitemap_index_batch

    xml = ('<?xml version="1.0"?><sitemapindex>'
           "<sitemap><bad/></sitemap>"  # no <loc> -> dropped
           "<sitemap><loc>https://x.example/s&amp;1.xml</loc></sitemap>"
           "</sitemapindex>")
    out = parse_sitemap_index_batch(pa.table({
        "host": pa.array(["x.example"], pa.string()),
        "index_xml": pa.array([xml], pa.string())}))
    assert out["sitemap_url"].to_pylist() == ["https://x.example/s&1.xml"]

    empty = pa.table({"host": pa.array([], pa.string()),
                      "index_xml": pa.array([], pa.string())})
    assert parse_sitemap_index_batch(empty).num_rows == 0
