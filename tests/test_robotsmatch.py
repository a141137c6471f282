"""RFC 9309 wildcard robots matching: rule compilation, precedence
truth table, tie semantics, defaults, broadcast budget."""

import pyarrow as pa
import pytest


def test_compile_rule_translation():
    import re

    from cdx_toolkit_ray.stages.robotsmatch import compile_rule

    cases = [
        # (pattern, path, matches)
        ("/p/1*", "/p/13", True),
        ("/p/1*", "/p/1", True),          # * matches empty
        ("/p/1*", "/q/13", False),
        ("*.tmp$", "/a/b.tmp", True),
        ("*.tmp$", "/a/b.tmpx", False),   # $ anchors the end
        ("*.tmp$", "/a.tmp/b", False),
        ("/a.b", "/a.b", True),
        ("/a.b", "/aXb", False),          # '.' is literal, not regex
        ("/fish*.php$", "/fishheads/catfish.php", True),
        ("/fish*.php$", "/fish.php?x=1", False),
        ("/", "/anything", True),         # prefix match, not full
    ]
    for pat, path, want in cases:
        rx = compile_rule(pat)
        assert bool(re.search(rx, path)) == want, (pat, path, rx)


def _gate(urls, rules, **kw):
    import ray.data

    from cdx_toolkit_ray.stages.robotsmatch import robots_wildcard_gate

    u = ray.data.from_arrow(pa.Table.from_pylist(urls))
    r = ray.data.from_arrow(pa.Table.from_pylist(rules))
    return {(row["host"], row["path"]): (row["allowed"], row["rule"])
            for row in robots_wildcard_gate(u, r, **kw).take_all()}


RULES = [
    {"host": "a", "rule": "/p/1*", "allow": False},
    {"host": "a", "rule": "/p/10*", "allow": True},
    {"host": "a", "rule": "*.tmp$", "allow": False},
    {"host": "a", "rule": "/t/*", "allow": True},
    {"host": "a", "rule": "/t/*", "allow": False},  # exact tie
    {"host": "b", "rule": "/", "allow": False},     # b blocks all
]


def test_precedence_truth_table(ray_session):
    urls = [{"host": "a", "path": p} for p in
            ["/p/13", "/p/10", "/p/105", "/x/1", "/t/9", "/t/9.tmp",
             "/p/10.tmp"]] + [{"host": "b", "path": "/p/13"}]
    got = _gate(urls, RULES)
    assert got[("a", "/p/13")] == (False, "/p/1*")
    assert got[("a", "/p/10")] == (True, "/p/10*")     # longer allow wins
    assert got[("a", "/p/105")] == (True, "/p/10*")
    assert got[("a", "/x/1")] == (True, None)          # no rule -> allowed
    assert got[("a", "/t/9")] == (True, "/t/*")        # tie -> allow wins
    assert got[("a", "/t/9.tmp")] == (False, "*.tmp$")  # 6 beats 4
    # same length (6), allow vs disallow -> allow wins the tie
    assert got[("a", "/p/10.tmp")] == (True, "/p/10*")
    assert got[("b", "/p/13")] == (False, "/")         # per-host isolation


def test_keep_cols_and_empty_rules(ray_session):
    urls = [{"host": "a", "path": "/x", "doc_id": 7}]
    got = _gate(urls, [{"host": "z", "rule": "/", "allow": False}],
                keep_cols=("doc_id",))
    assert got[("a", "/x")] == (True, None)


def test_rules_budget_raises(ray_session):
    urls = [{"host": "a", "path": "/x"}]
    rules = [{"host": "a", "rule": "/r%d" % i, "allow": False}
             for i in range(5)]
    with pytest.raises(ValueError, match="broadcast budget"):
        _gate(urls, rules, rules_budget_rows=3)


def test_null_path_never_matches(ray_session):
    got = _gate([{"host": "b", "path": None}], RULES)
    assert got[("b", None)] == (True, None)


def test_robots_url_gate_in_crawl_shape(ray_session):
    import pyarrow as pa

    from cdx_toolkit_ray.stages.robotsmatch import robots_url_gate

    rules = [
        {"host": "a.example", "rule": "/private*", "allow": False},
        {"host": "a.example", "rule": "/private/ok*", "allow": True},
        {"host": "b.example", "rule": "*.tmp$", "allow": False},
    ]
    gate = robots_url_gate(rules)
    batch = pa.table({"url": pa.array([
        "http://a.example/private/x",       # blocked
        "http://a.example/private/ok/y",    # longer allow wins
        "http://a.example/pub",             # no rule -> kept
        "http://b.example/f.tmp",           # $-anchored block
        "http://b.example/f.tmpx",          # anchor miss -> kept
        "http://c.example/anything",        # host without rules
        "http://a.example",                 # bare host -> path '/'
        "not-a-url",                        # unparseable -> kept
    ], pa.string())})
    kept = gate(batch)["url"].to_pylist()
    assert kept == [
        "http://a.example/private/ok/y",
        "http://a.example/pub",
        "http://b.example/f.tmpx",
        "http://c.example/anything",
        "http://a.example",
        "not-a-url",
    ]
    assert gate(batch.slice(0, 0)).num_rows == 0


def test_robots_url_gate_through_crawl_waves(ray_session, tmp_path):
    """The wildcard gate plugs into the crawl loop exactly like the
    spam gate: gated URLs never fetch and prune their subtrees."""
    import pyarrow.parquet as pqt

    import ray.data

    from cdx_toolkit_ray.pipelines.crawl import crawl_waves
    from cdx_toolkit_ray.stages.robotsmatch import robots_url_gate

    # tiny web: seed -> /a -> /blocked/x -> /deep (deep only reachable
    # through the blocked page)
    def page(url, links):
        body = "".join(f"<a href='{u}'>x</a>" for u in links)
        return {"url": url, "warc_ts": 1_700_000_000_000_000,
                "html": body.encode(), "text": body, "lang": "en"}

    # url names chosen so every page's fault schedule (FAULT_STATUSES,
    # attempt 0-indexed) reaches an ok status within max_attempts —
    # the gate, not a fetch outcome, must explain every absence
    H = "http://w.example"
    rows = [
        page(f"{H}/root", [f"{H}/blocked/q", f"{H}/ok"]),
        page(f"{H}/blocked/q", [f"{H}/deep"]),
        page(f"{H}/ok", []),
        page(f"{H}/deep", []),
    ]
    p = str(tmp_path / "pages.parquet")
    pqt.write_table(pa.Table.from_pylist(rows), p)
    seeds = ray.data.from_arrow(
        pa.table({"url": pa.array([f"{H}/root"], pa.string())}))

    # without the gate the whole web is reachable
    base = set(crawl_waves(p, seeds=seeds, max_waves=4)
               .to_pandas()["url"])
    assert base == {f"{H}/root", f"{H}/blocked/q", f"{H}/ok",
                    f"{H}/deep"}

    gate = robots_url_gate(
        [{"host": "w.example", "rule": "/blocked*", "allow": False}])
    got = set(crawl_waves(p, seeds=seeds, max_waves=4,
                          url_gate=gate).to_pandas()["url"])
    assert got == {f"{H}/root", f"{H}/ok"}  # /deep pruned transitively


import pyarrow as pa  # noqa: E402  (used by the new tests above)


def test_wildcard_robots_render_parse_roundtrip():
    from cdx_toolkit_ray.stages.robotsmatch import (
        parse_wildcard_robots_batch, render_wildcard_robots_batch)

    batch = pa.table({
        "host": pa.array(["a.example", "empty.example"]),
        "rules": pa.array([
            [{"rule": "/p*", "allow": False},
             {"rule": "/p/ok*", "allow": True},
             {"rule": "*.tmp$", "allow": False}],
            [],
        ]),
    })
    bodies = render_wildcard_robots_batch(batch)
    txt = bodies["robots_txt"][0].as_py()
    assert "User-agent: *" in txt and "Sitemap:" in txt
    out = parse_wildcard_robots_batch(bodies).to_pylist()
    assert out == [
        {"host": "a.example", "rule": "/p*", "allow": False},
        {"host": "a.example", "rule": "/p/ok*", "allow": True},
        {"host": "a.example", "rule": "*.tmp$", "allow": False},
    ]
    # noise tolerance: lowercase directives, empty Disallow dropped
    noisy = pa.table({
        "host": pa.array(["n.example"]),
        "robots_txt": pa.array([
            "# c\nuser-agent: *\nallow: /a\nDisallow:\n"
            "disallow: /b$\nCrawl-delay: 2\n"]),
    })
    got = parse_wildcard_robots_batch(noisy).to_pylist()
    assert got == [
        {"host": "n.example", "rule": "/a", "allow": True},
        {"host": "n.example", "rule": "/b$", "allow": False},
    ]
    empty = noisy.slice(0, 0)
    assert parse_wildcard_robots_batch(empty).num_rows == 0
