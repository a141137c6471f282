"""URL spam features (stages/urlfeat.py): feature truth table, lexicon
hits, gate composition."""

import pyarrow as pa
import ray.data

from cdx_toolkit_ray.stages.urlfeat import url_features


def _run(urls, **kw):
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string())}))
    return url_features(ds, **kw).to_pandas()


def test_feature_truth_table(ray_session):
    out = _run([
        "https://a.example/x/y/z?p=1&q=2",
        "http://b.example/",
        "https://c.example/page12345",
    ])
    r0 = out.iloc[0]
    assert r0.url_len == len("https://a.example/x/y/z?p=1&q=2")
    assert r0.n_digits == 2 and r0.depth == 3 and r0.n_params == 2
    r1 = out.iloc[1]
    assert r1.n_params == 0 and r1.depth == 1 and r1.n_digits == 0
    r2 = out.iloc[2]
    assert r2.n_digits == 5 and r2.n_params == 0


def test_lexicon_hits_case_insensitive(ray_session):
    out = _run([
        "https://best-CASINO-pills.example/win",
        "https://clean.example/about",
    ])
    assert out.iloc[0].bad_hits == 2 and bool(out.iloc[0].spam)
    assert out.iloc[1].bad_hits == 0 and not out.iloc[1].spam


def test_digit_query_gate(ray_session):
    # digits alone don't flag when flag_query=True; digits + params do
    out = _run([
        "https://a.example/page99",
        "https://a.example/page99?s=1",
    ], max_digits=1, flag_query=True)
    assert not out.iloc[0].spam
    assert bool(out.iloc[1].spam)
    # flag_query=False: digits alone flag
    out2 = _run(["https://a.example/page99"], flag_query=False)
    assert bool(out2.iloc[0].spam)


def test_null_url_is_not_spam(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([None, "https://x.example/"], pa.string())}))
    out = url_features(ds).to_pandas()
    assert out.iloc[0].url_len == 0 and not out.iloc[0].spam


def test_detect_traps_threshold(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import detect_traps

    urls = (["https://h.example/cal/%d" % i for i in range(6)]
            + ["https://h.example/about/team"]
            + ["https://h.example/cal/3?sess=%d" % i for i in range(3)])
    hosts = ["h.example"] * len(urls)
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string())}))
    out = detect_traps(ds, min_urls=5, num_buckets=4).to_pandas() \
        .set_index("stem").sort_index()
    # /cal/ has 6 plain + 3 parameterized distinct urls = 9 -> trap
    assert out.loc["https://h.example/cal/", "n_urls"] == 9
    assert bool(out.loc["https://h.example/cal/", "trap"])
    assert out.loc["https://h.example/about/", "n_urls"] == 1
    assert not out.loc["https://h.example/about/", "trap"]


def test_detect_traps_dedups_repeat_urls(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import detect_traps

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://h.example/a/1"] * 10, pa.string()),
        "host": pa.array(["h.example"] * 10, pa.string())}))
    out = detect_traps(ds, min_urls=5, num_buckets=2).to_pandas()
    assert len(out) == 1 and out.iloc[0].n_urls == 1
    assert not out.iloc[0].trap


def test_strip_tracking_params(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import strip_tracking_params

    urls = [
        "https://a.x/p?utm_source=nl&id=7",      # mixed -> keep id
        "https://a.x/p?utm_campaign=x",          # only tracking -> no '?'
        "https://a.x/p?b=2&a=1",                 # untouched
        "https://a.x/p",                         # no query
        "https://a.x/p?fbclid=1&gclid=2&ref=h",  # all tracked
        "https://a.x/p?refresh=1",               # 'ref' must not match prefix
        None,
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = strip_tracking_params(ds).to_pandas()
    assert out.clean_url.tolist() == [
        "https://a.x/p?id=7",
        "https://a.x/p",
        "https://a.x/p?b=2&a=1",
        "https://a.x/p",
        "https://a.x/p",
        "https://a.x/p?refresh=1",
        "",
    ]
    assert out.was_tracked.tolist() == [True, True, False, False,
                                        True, False, False]


def test_strip_tracking_fragment_order_independent(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import strip_tracking_params

    ds = ray.data.from_arrow(pa.table({"url": pa.array([
        "http://a/p?x=1&utm_s=1#frag",
        "http://a/p?utm_s=1&x=1#frag",
        "http://a/p#only",
        "http://a/p?utm_s=1#f",
    ], pa.string())}))
    out = strip_tracking_params(ds).to_pandas()
    assert out.clean_url.tolist() == [
        "http://a/p?x=1#frag",
        "http://a/p?x=1#frag",   # same page -> same clean url
        "http://a/p#only",
        "http://a/p#f",
    ]
    assert out.was_tracked.tolist() == [True, True, False, True]


def test_remove_dot_segments_spec():
    from cdx_toolkit_ray.stages.urlfeat import remove_dot_segments

    cases = [
        ("/a/b/c", "/a/b/c"),
        ("/a/./b", "/a/b"),
        ("/a/../b", "/b"),
        ("/a/b/../../c", "/c"),
        ("/../a", "/a"),          # root clamp
        ("/a/b/..", "/a/"),       # trailing pop keeps the slash
        ("/a/b/.", "/a/b/"),      # trailing dot keeps the slash
        ("/..", "/"),
        ("/.", "/"),
        ("/", "/"),
        ("/a/../../../b", "/b"),  # repeated clamp
    ]
    for path, want in cases:
        assert remove_dot_segments(path) == want, path


def test_strip_dot_segments_two_path(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import strip_dot_segments

    urls = [
        "http://h.example/a/b",                    # clean passthrough
        "http://h.example/a/./b?q=1.2#f",          # query/fragment ride
        "http://h.example/a/x/../b",
        "http://h.example/..",                      # root clamp
        "http://h.example/a/b?x=/../evil",          # dots in query only
    ]
    want = [
        "http://h.example/a/b",
        "http://h.example/a/b?q=1.2#f",
        "http://h.example/a/b",
        "http://h.example/",
        "http://h.example/a/b?x=/../evil",
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    out = [r["normalized_url"] for r in strip_dot_segments(ds).take_all()]
    assert out == want


def test_registrable_domain_rules():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.urlfeat import registrable_domain_batch

    cases = [
        ("www.shop.co.uk", "shop.co.uk"),
        ("deep.a.b.example.ac.jp", "example.ac.jp"),
        ("a.b.site.com", "site.com"),
        ("news.com.au", "news.com.au"),   # already registrable
        ("x.y.z.example", "z.example"),   # default two labels
        ("localhost", "localhost"),       # single label
        ("co.uk", "co.uk"),               # bare suffix stays itself
    ]
    b = pa.table({"host": pa.array([c[0] for c in cases], pa.string())})
    out = registrable_domain_batch(b)["domain"].to_pylist()
    assert out == [c[1] for c in cases]
    empty = b.slice(0, 0)
    assert registrable_domain_batch(empty).num_rows == 0


def test_url_templates_collapse_and_counts():
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.urlfeat import url_templates

    rows = [
        # calendar trap: 3 urls, 1 digest, one template
        ("http://t.example/cal/2023/01", "d0"),
        ("http://t.example/cal/2023/02", "d0"),
        ("http://t.example/cal/2024/12", "d0"),
        # real content: distinct digests
        ("http://t.example/post/7", "d1"),
        ("http://t.example/post/8", "d2"),
        # query params reduce to sorted keys; values collapse
        ("http://t.example/item?b=2&a=1", "d3"),
        ("http://t.example/item?a=9&b=8", "d3"),
        # duplicate capture of the same url counts twice in n_captures
        ("http://t.example/post/7", "d1"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "digest": pa.array([r[1] for r in rows], pa.string())}))
    df = url_templates(ds, num_buckets=4).to_pandas()
    got = {r.template: (r.n_captures, r.n_urls, r.n_digests)
           for r in df.itertuples()}
    assert got["/cal/<n>/<n>"] == (3, 3, 1)
    assert got["/post/<n>"] == (3, 2, 2)
    assert got["/item?a&b"] == (2, 2, 1)
