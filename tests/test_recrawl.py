"""Change-rate recrawl scheduling (stages/recrawl)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cdx_toolkit_ray.stages.recrawl import recrawl_schedule

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86400 * 1_000_000
BASE, LO, HI = 7 * DAY, DAY, 30 * DAY


def _hist(rows):
    t0 = np.datetime64("2024-01-01", "us").view(np.int64)
    items = [{"page": k, "ts": int(t0 + off), "digest": d}
             for k, off, d in rows]
    return ray.data.from_items(items, override_num_blocks=4)


def _sched(ds, **kw):
    out = recrawl_schedule(ds, key_col="page", ts_col="ts",
                           digest_col="digest", **kw).to_pandas()
    return out.set_index("key")


def test_recrawl_policies():
    rows = []
    # page 1: never changes across 10 captures -> base interval
    rows += [(1, i * 3 * DAY, "same") for i in range(10)]
    # page 2: changes every capture, hourly -> clamped to LO
    rows += [(2, i * DAY // 24, "v%d" % i) for i in range(8)]
    # page 3: two versions over 20 days -> span//1 clamped to HI? no,
    # 20 days < HI -> exactly 20 days
    rows += [(3, 0, "a"), (3, 20 * DAY, "b")]
    # page 4: single capture -> base
    rows += [(4, 5 * DAY, "x")]
    # page 5: two versions over 200 days -> clamped to HI
    rows += [(5, 0, "a"), (5, 200 * DAY, "b")]
    s = _sched(_hist(rows))
    assert s.loc[1, "interval_us"] == BASE and s.loc[1, "n_versions"] == 1
    assert s.loc[2, "interval_us"] == LO
    assert s.loc[3, "interval_us"] == 20 * DAY
    assert s.loc[4, "interval_us"] == BASE and s.loc[4, "n_caps"] == 1
    assert s.loc[5, "interval_us"] == HI
    # next fetch = last + interval, everywhere
    assert (s["next_fetch_us"] == s["last_us"] + s["interval_us"]).all()


def test_recrawl_cross_block_merge_and_counts():
    # same page's captures scattered across many blocks
    rows = [(7, i * DAY, "v%d" % (i % 3)) for i in range(30)]
    ds = _hist(rows)
    s = _sched(ds)
    assert s.loc[7, "n_caps"] == 30
    assert s.loc[7, "n_versions"] == 3
    # interval = span // changes = 29 days // 2, within [LO, HI]
    assert s.loc[7, "interval_us"] == 29 * DAY // 2


def test_recrawl_matches_pandas_reference():
    rng = np.random.default_rng(3)
    rows = [(int(rng.integers(0, 25)), int(rng.integers(0, 60) * DAY),
             "d%d" % rng.integers(0, 4)) for _ in range(600)]
    s = _sched(_hist(rows))
    import pandas as pd

    df = pd.DataFrame(rows, columns=["page", "off", "digest"])
    t0 = np.datetime64("2024-01-01", "us").view(np.int64)
    df["ts"] = t0 + df["off"]
    g = df.groupby("page").agg(n=("ts", "size"),
                               d=("digest", "nunique"),
                               first=("ts", "min"), last=("ts", "max"))
    for page, r in g.iterrows():
        want = (BASE if (r.n <= 1 or r.d <= 1)
                else int(np.clip((r["last"] - r["first"]) // (r.d - 1),
                                 LO, HI)))
        assert s.loc[page, "interval_us"] == want, page
        assert s.loc[page, "n_caps"] == r.n
        assert s.loc[page, "n_versions"] == r.d


def _snap(rows):
    return ray.data.from_arrow(pa.table({
        "urlkey": pa.array([r[0] for r in rows], pa.string()),
        "timestamp": pa.array([r[1] for r in rows], pa.string()),
        "digest": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_crawl_delta_statuses():
    from cdx_toolkit_ray.stages.recrawl import crawl_delta

    a = _snap([("u1", "20230101000000", "D1"),
               ("u2", "20230101000000", "D2"),
               ("u3", "20230101000000", "D3"),
               # u4 has two captures in A: latest (by ts) wins
               ("u4", "20230101000000", "OLD"),
               ("u4", "20230201000000", "D4")])
    b = _snap([("u1", "20230601000000", "D1"),       # same
               ("u2", "20230601000000", "D2x"),      # changed
               ("u4", "20230601000000", "D4"),       # same (latest A)
               ("u5", "20230601000000", "D5")])      # added
    df = crawl_delta(a, b, num_buckets=4).to_pandas()
    got = dict(zip(df["urlkey"], df["status"]))
    assert got == {"u1": "same", "u2": "changed", "u3": "gone",
                   "u4": "same", "u5": "added"}
    row = df[df["urlkey"] == "u2"].iloc[0]
    assert (row["digest_a"], row["digest_b"]) == ("D2", "D2x")
    gone = df[df["urlkey"] == "u3"].iloc[0]
    assert gone["digest_b"] is None and gone["digest_a"] == "D3"


def test_crawl_delta_equal_ts_digest_tiebreak():
    from cdx_toolkit_ray.stages.recrawl import crawl_delta

    # two captures with the SAME timestamp: max digest wins on both
    # sides (the deterministic rule the SQL oracle replicates)
    a = _snap([("u", "20230101000000", "AAA"),
               ("u", "20230101000000", "ZZZ")])
    b = _snap([("u", "20230601000000", "ZZZ")])
    df = crawl_delta(a, b, num_buckets=2).to_pandas()
    assert df.iloc[0]["status"] == "same"


def _cap_corpus(seed=4, n=3000, keys=400):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n)
    return pd.DataFrame({
        "urlkey": [f"example,k{v})/" for v in k],
        "timestamp": [f"2023{rng.integers(1, 13):02d}"
                      f"{rng.integers(1, 28):02d}000000" for _ in range(n)],
        "url": [f"https://k{v}.example/{rng.integers(0, 3)}" for v in k],
        "status": rng.choice(["200", "301", "-"], n),
        "digest": [f"D{rng.integers(0, 4)}" for _ in range(n)],
    })


def _compact_ref(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for key, g in df.groupby("urlkey"):
        g2 = g.sort_values(["timestamp", "digest", "url", "status"])
        last = g2.iloc[-1]
        rows.append({
            "urlkey": key, "timestamp": last.timestamp, "url": last.url,
            "status": last.status, "digest": last.digest,
            "n_captures": len(g), "n_versions": g.digest.nunique(),
            "first_ts": g.timestamp.min(),
        })
    return pd.DataFrame(rows).sort_values("urlkey").reset_index(drop=True) \
        .astype({"n_captures": "int64", "n_versions": "int64"})


def test_compact_captures_matches_pandas_reference():
    from cdx_toolkit_ray.stages.recrawl import compact_captures

    df = _cap_corpus()
    got = compact_captures(ray.data.from_pandas(df).repartition(7),
                           num_buckets=5).to_pandas() \
        .sort_values("urlkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _compact_ref(df))


def test_compact_captures_partition_independent():
    from cdx_toolkit_ray.stages.recrawl import compact_captures

    df = _cap_corpus(seed=9, n=800, keys=60)
    a = compact_captures(ray.data.from_pandas(df).repartition(1)) \
        .to_pandas().sort_values("urlkey").reset_index(drop=True)
    b = compact_captures(
        ray.data.from_pandas(df.sample(frac=1, random_state=0))
        .repartition(11)).to_pandas() \
        .sort_values("urlkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_compact_captures_tie_break_total_order():
    from cdx_toolkit_ray.stages.recrawl import compact_captures

    df = pd.DataFrame({
        "urlkey": ["k)/"] * 3,
        "timestamp": ["20230101000000"] * 3,
        "url": ["https://a", "https://b", "https://b"],
        "status": ["200", "200", "301"],
        "digest": ["D1", "D1", "D1"],
    })
    got = compact_captures(ray.data.from_pandas(df)).to_pandas()
    # same (ts, digest): url DESC then status DESC decides
    assert got.iloc[0].url == "https://b" and got.iloc[0].status == "301"
    assert got.iloc[0].n_captures == 3 and got.iloc[0].n_versions == 1


def test_crawl_report_reference():
    from cdx_toolkit_ray.stages.recrawl import crawl_report

    df = pd.DataFrame({
        "crawl": ["A", "A", "A", "B", "B"],
        "urlkey": ["k1", "k1", "k2", "k1", "k3"],
        "url": ["https://x.example/1", "https://x.example/1",
                "https://y.example/2", "https://x.example/1",
                "https://z.example/3"],
        "status": ["200", "301", "404", "-", "503"],
        "mime": ["text/html", "warc/revisit", "text/html",
                 "warc/revisit", "text/html"],
    })
    got = crawl_report(ray.data.from_pandas(df).repartition(3),
                       num_buckets=2).to_pandas().set_index("crawl")
    a = got.loc["A"]
    assert tuple(a[["n_captures", "n_urlkeys", "n_hosts"]]) == (3, 2, 2)
    assert tuple(a[["n_ok", "n_redirect", "n_error", "n_revisit"]]) \
        == (1, 1, 1, 1)
    b = got.loc["B"]
    assert tuple(b[["n_captures", "n_urlkeys", "n_hosts"]]) == (2, 2, 2)
    assert tuple(b[["n_ok", "n_redirect", "n_error", "n_revisit"]]) \
        == (0, 0, 1, 1)


def test_crawl_report_hostless_urls_not_counted_as_a_host():
    """dns:/malformed urls extract NULL hosts; SQL COUNT(DISTINCT ...)
    ignores NULLs, so n_hosts must too (ADVICE regression)."""
    from cdx_toolkit_ray.stages.recrawl import crawl_report

    df = pd.DataFrame({
        "crawl": ["A"] * 4,
        "urlkey": ["k1", "k2", "k3", "k4"],
        "url": ["https://x.example/1", "dns:y.example",
                "not-a-url", "https://z.example/2"],
        "status": ["200"] * 4,
        "mime": ["text/html"] * 4,
    })
    got = crawl_report(ray.data.from_pandas(df).repartition(2),
                       num_buckets=2).to_pandas().set_index("crawl")
    # only x.example and z.example have '://host' form
    assert int(got.loc["A", "n_hosts"]) == 2
    assert int(got.loc["A", "n_urlkeys"]) == 4


def test_revisit_resolve_links_and_orphans(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_resolve

    rows = [
        # key a: response, revisit (links to it), later response,
        # then a revisit that must link to the LATER response
        ("a)/", "20220101000000", "u1", "text/html", "D1"),
        ("a)/", "20220201000000", "u1", "warc/revisit", "X1"),
        ("a)/", "20220301000000", "u1", "text/html", "D2"),
        ("a)/", "20220401000000", "u1", "warc/revisit", "X2"),
        # key b: revisit BEFORE any response -> orphan
        ("b)/", "20220101000000", "u2", "warc/revisit", "X3"),
        ("b)/", "20220201000000", "u2", "text/html", "D3"),
    ]
    t = pa.table({
        "urlkey": pa.array([r[0] for r in rows]),
        "timestamp": pa.array([r[1] for r in rows]),
        "url": pa.array([r[2] for r in rows]),
        "mime": pa.array([r[3] for r in rows]),
        "digest": pa.array([r[4] for r in rows]),
    })
    out = revisit_resolve(ray.data.from_arrow(t)).to_pandas()
    got = {(r.urlkey, r.timestamp):
           (r.refers_to_timestamp, r.refers_to_digest, r.anomaly)
           for r in out.itertuples()}
    assert got == {
        ("a)/", "20220201000000"): ("20220101000000", "D1", None),
        ("a)/", "20220401000000"): ("20220301000000", "D2", None),
        ("b)/", "20220101000000"): (None, None, "revisit_orphan"),
    }


def test_revisit_generate_truth_table(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_generate

    tbl = pa.table({
        "urlkey": pa.array(["k1", "k2", "k3", "k4", "k5"], pa.string()),
        "timestamp": pa.array(["20230101000000", "20230102000000",
                               "20230103000000", "20230101000000",
                               "20230104000000"], pa.string()),
        "url": pa.array(["u1", "u2", "u3", "u4", "u5"], pa.string()),
        "digest": pa.array(["A", "A", "A", "B", "B"], pa.string()),
    })
    out = revisit_generate(ray.data.from_arrow(tbl), num_buckets=4) \
        .to_pandas().sort_values(["digest", "timestamp"]) \
        .reset_index(drop=True)
    # digest A: k1 is first -> response; k2/k3 revisit it
    assert out.loc[0, "kind"] == "response"
    assert out.loc[0, "refers_to_url"] is None
    assert (out.loc[1, "kind"], out.loc[1, "refers_to_url"],
            out.loc[1, "refers_to_ts"]) == ("revisit", "u1",
                                            "20230101000000")
    assert out.loc[2, "refers_to_url"] == "u1"
    # digest B: k4 first -> response, k5 revisit
    assert out.loc[3, "kind"] == "response"
    assert (out.loc[4, "kind"], out.loc[4, "refers_to_url"]) \
        == ("revisit", "u4")


def test_revisit_generate_ts_tie_breaks_on_urlkey(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_generate

    tbl = pa.table({
        "urlkey": pa.array(["kb", "ka"], pa.string()),
        "timestamp": pa.array(["20230101000000"] * 2, pa.string()),
        "url": pa.array(["ub", "ua"], pa.string()),
        "digest": pa.array(["D", "D"], pa.string()),
    })
    out = revisit_generate(ray.data.from_arrow(tbl), num_buckets=2) \
        .to_pandas().set_index("urlkey")
    assert out.loc["ka", "kind"] == "response"
    assert out.loc["kb", "refers_to_url"] == "ua"


def test_revisit_resolve_same_timestamp_is_orphan(ray_session):
    """Strictly-earlier rule: a response at the SAME timestamp must
    not resolve the revisit, regardless of input row order."""
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_resolve

    rows = {
        "urlkey": pa.array(["k", "k"], pa.string()),
        "timestamp": pa.array(["20220101000000"] * 2, pa.string()),
        "url": pa.array(["u1", "u2"], pa.string()),
        "mime": pa.array(["text/html", "warc/revisit"], pa.string()),
        "digest": pa.array(["D", "-"], pa.string()),
    }
    for order in ([0, 1], [1, 0]):
        t = pa.table({c: v.take(order) for c, v in rows.items()})
        out = revisit_resolve(ray.data.from_arrow(t),
                              num_buckets=2).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].anomaly == "revisit_orphan"


def test_revisit_resolve_null_keys_dropped(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_resolve

    t = pa.table({
        "urlkey": pa.array([None, "k", "k"], pa.string()),
        "timestamp": pa.array(["20220101000000", "20220101000000",
                               "20220102000000"], pa.string()),
        "url": pa.array(["u0", "u1", "u2"], pa.string()),
        "mime": pa.array(["warc/revisit", "text/html",
                          "warc/revisit"], pa.string()),
        "digest": pa.array(["-", "D", "-"], pa.string()),
    })
    out = revisit_resolve(ray.data.from_arrow(t),
                          num_buckets=2).to_pandas()
    assert len(out) == 1  # the null-key revisit is dropped, not fatal
    assert out.iloc[0].refers_to_digest == "D"


def test_revisit_generate_null_digests_pass_through(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_generate

    t = pa.table({
        "urlkey": pa.array(["a", "b", "c"], pa.string()),
        "timestamp": pa.array(["20220101000000", "20220102000000",
                               "20220103000000"], pa.string()),
        "url": pa.array(["ua", "ub", "uc"], pa.string()),
        "digest": pa.array([None, None, "D"], pa.string()),
    })
    out = revisit_generate(ray.data.from_arrow(t),
                           num_buckets=2).to_pandas() \
        .set_index("urlkey")
    # unknown-content captures never collapse into each other
    assert out.loc["a", "kind"] == "response"
    assert out.loc["b", "kind"] == "response"
    assert out.loc["b", "refers_to_url"] is None
    assert out.loc["c", "kind"] == "response"


def test_revalidation_plan_vs_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revalidation_plan

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "key": rng.randint(0, 25, n),
        "ts": np.sort(rng.randint(1_700_000_000_000_000,
                                  1_705_000_000_000_000, n)),
        "dig": np.array(["d%d" % v for v in rng.randint(0, 4, n)]),
    })
    # force an equal-timestamp tie on one key
    df.loc[0, ["key", "ts", "dig"]] = [99, 1_700_000_000_000_000, "a"]
    df = pd.concat([df, pd.DataFrame(
        [{"key": 99, "ts": 1_700_000_000_000_000, "dig": "b"}])],
        ignore_index=True)

    cutoff = 1_704_000_000_000_000
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = {r["key"]: r for r in revalidation_plan(
        ds, key_col="key", ts_col="ts", digest_col="dig",
        cutoff_us=cutoff).take_all()}

    base, lo, hi = 7 * 86400 * 10**6, 86400 * 10**6, 30 * 86400 * 10**6
    for key, g in df.groupby("key"):
        n_caps = len(g)
        n_ver = g["dig"].nunique()
        first, last = int(g["ts"].min()), int(g["ts"].max())
        interval = base if (n_caps <= 1 or n_ver <= 1) else \
            min(max((last - first) // (n_ver - 1), lo), hi)
        # latest = max (ts, digest)
        etag = g.sort_values(["ts", "dig"]).iloc[-1]["dig"]
        r = out[key]
        assert (r["n_caps"], r["n_versions"], r["last_us"]) == \
            (n_caps, n_ver, last), key
        assert r["next_fetch_us"] == last + interval
        assert r["etag"] == etag, key
        assert r["due"] == (last + interval <= cutoff)
        assert r["if_modified_since"].endswith(" GMT") and \
            "," in r["if_modified_since"]
    assert out[99]["etag"] == "b"  # digest breaks the exact-ts tie


def test_cache_freshness_truth_table():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.recrawl import cache_freshness_batch

    F = 1_700_000_000_000  # fetch, whole seconds
    DATE = "Tue, 14 Nov 2023 22:14:20 GMT"   # F + 60_000 ms
    PAST = "Tue, 14 Nov 2023 22:12:20 GMT"   # F - 60_000 ms
    LM = "Mon, 13 Nov 2023 22:13:20 GMT"     # F - 86_400_000 ms
    rows = [
        # cc, expires, last_modified -> policy, fresh_ms
        ("max-age=120", None, None, "max-age", 120_000),
        ("public, max-age=120", DATE, LM, "max-age", 120_000),
        ("s-maxage=30, max-age=120", None, None, "s-maxage", 30_000),
        ("no-store, max-age=600", DATE, LM, "no-store", 0),
        ("no-cache", None, None, "no-cache", 0),
        ("private", DATE, None, "expires", 60_000),
        (None, PAST, None, "expires", 0),          # stale Expires clamps
        (None, "not a date", LM, "heuristic", 8_640_000),  # 10% of 24h
        (None, None, LM, "heuristic", 8_640_000),
        (None, None, None, "default", 0),
        ("stale-while-revalidate=30", None, None, "default", 0),
    ]
    batch = pa.table({
        "cache_control": pa.array([r[0] for r in rows], pa.string()),
        "expires": pa.array([r[1] for r in rows], pa.string()),
        "last_modified": pa.array([r[2] for r in rows], pa.string()),
        "fetch_ms": pa.array([F] * len(rows), pa.int64()),
    })
    out = cache_freshness_batch(batch, cutoff_ms=F + 60_000)
    got = list(zip(out["policy"].to_pylist(),
                   out["fresh_ms"].to_pylist(),
                   out["due"].to_pylist()))
    for (cc, _e, _l, pol, fresh), (gp, gf, gd) in zip(rows, got):
        assert (gp, gf) == (pol, fresh), (cc, gp, gf)
        assert gd == (F + fresh <= F + 60_000), cc
    assert out["expires_at_ms"].to_pylist() == \
        [F + r[4] for r in rows]


def test_status_transitions_matrix():
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import status_transitions

    def t(rows):
        return ray.data.from_arrow(pa.table({
            "urlkey": pa.array([r[0] for r in rows], pa.string()),
            "timestamp": pa.array([r[1] for r in rows], pa.string()),
            "digest": pa.array([r[2] for r in rows], pa.string()),
            "status": pa.array([r[3] for r in rows], pa.string())}))

    # k1: latest in A is 200 (ts tie broken by digest), becomes 404
    # k2: only in A (gone); k3: only in B (discovered)
    a = t([("k1", "20230101000000", "d1", "301"),
           ("k1", "20230102000000", "d2", "200"),
           ("k2", "20230101000000", "d3", "200")])
    b = t([("k1", "20230601000000", "d4", "404"),
           ("k3", "20230601000000", "d5", "200")])
    df = status_transitions(a, b, num_buckets=4).to_pandas()
    got = {(r.status_from, r.status_to): r.n_urlkeys
           for r in df.itertuples()}
    assert got == {("200", "404"): 1, ("200", "absent"): 1,
                   ("absent", "200"): 1}


def test_revisit_rewrite_first_keeps_content():
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_rewrite

    rows = [
        ("k2", "20220102000000", "dA"),   # later copy -> revisit
        ("k1", "20220101000000", "dA"),   # first -> response
        ("k3", "20220103000000", "dA"),   # revisit
        ("k4", "20220101000000", "dB"),   # unique digest -> response
    ]
    ds = ray.data.from_arrow(pa.table({
        "urlkey": pa.array([r[0] for r in rows], pa.string()),
        "timestamp": pa.array([r[1] for r in rows], pa.string()),
        "digest": pa.array([r[2] for r in rows], pa.string())}))
    df = revisit_rewrite(ds, num_buckets=4).to_pandas()
    got = {r.urlkey: (r.kind, r.orig_urlkey, r.orig_timestamp)
           for r in df.itertuples()}
    assert got["k1"] == ("response", None, None)
    assert got["k2"] == ("revisit", "k1", "20220101000000")
    assert got["k3"] == ("revisit", "k1", "20220101000000")
    assert got["k4"] == ("response", None, None)


def test_revisit_rewrite_ts_tie_breaks_by_urlkey():
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.recrawl import revisit_rewrite

    rows = [("kb", "20220101000000", "d"),
            ("ka", "20220101000000", "d")]
    ds = ray.data.from_arrow(pa.table({
        "urlkey": pa.array([r[0] for r in rows], pa.string()),
        "timestamp": pa.array([r[1] for r in rows], pa.string()),
        "digest": pa.array([r[2] for r in rows], pa.string())}))
    df = revisit_rewrite(ds, num_buckets=2).to_pandas()
    got = {r.urlkey: r.kind for r in df.itertuples()}
    assert got == {"ka": "response", "kb": "revisit"}
