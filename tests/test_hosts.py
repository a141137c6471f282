"""Host-level curation (stages/hosts.py): integer cross-multiply
verdicts vs a serial reference, filter complement, edge cases."""

import numpy as np
import pyarrow as pa
import ray.data


def _mk(hosts, scores):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(hosts))), pa.int64()),
        "host": pa.array(hosts, pa.string()),
        "score": pa.array(scores, pa.int64()),
    }))


def test_stats_match_serial(ray_session):
    from cdx_toolkit_ray.stages.hosts import host_quality_stats

    rng = np.random.default_rng(11)
    hosts = ["h%d.example" % (i % 7) for i in range(300)]
    scores = rng.integers(0, 500, 300).tolist()
    got = host_quality_stats(_mk(hosts, scores), num_buckets=4) \
        .to_pandas().set_index("host").sort_index()
    gs, gc = sum(scores), len(scores)
    import collections
    agg = collections.defaultdict(lambda: [0, 0])
    for h, s in zip(hosts, scores):
        agg[h][0] += s
        agg[h][1] += 1
    assert len(got) == len(agg)
    for h, (ss, nd) in agg.items():
        row = got.loc[h]
        assert row["score_sum"] == ss and row["n_docs"] == nd
        assert row["mean_1e6"] == ss * 1_000_000 // nd
        assert bool(row["blocked"]) == (ss * gc < gs * nd)


def test_filter_is_exact_complement(ray_session):
    from cdx_toolkit_ray.stages.hosts import (filter_blocked_hosts,
                                              host_quality_stats)

    hosts = ["good.example"] * 5 + ["bad.example"] * 5
    scores = [100] * 5 + [1] * 5
    ds = _mk(hosts, scores)
    stats = host_quality_stats(ds, num_buckets=4)
    kept = filter_blocked_hosts(ds, stats).to_pandas()
    assert set(kept["host"]) == {"good.example"}
    assert len(kept) == 5


def test_no_hosts_blocked_when_uniform(ray_session):
    from cdx_toolkit_ray.stages.hosts import (filter_blocked_hosts,
                                              host_quality_stats)

    ds = _mk(["a", "b", "c"], [7, 7, 7])
    stats = host_quality_stats(ds, num_buckets=2)
    assert not stats.to_pandas()["blocked"].any()
    assert len(filter_blocked_hosts(ds, stats).to_pandas()) == 3


def test_adaptive_delays_clamp(ray_session):
    from cdx_toolkit_ray.stages.hosts import (adaptive_delays,
                                              host_quality_stats)

    # fast host mean=100 -> 3*100=300 -> floor 500; slow mean=5000 ->
    # 15000 -> ceiling 10000; middle mean=400 -> 1200
    hosts = ["fast"] * 4 + ["slow"] * 2 + ["mid"] * 3
    lats = [100] * 4 + [5000] * 2 + [400] * 3
    out = adaptive_delays(host_quality_stats(
        _mk(hosts, lats), num_buckets=2)).to_pandas() \
        .set_index("host")
    assert out.loc["fast", "adaptive_delay_ms"] == 500
    assert out.loc["slow", "adaptive_delay_ms"] == 10000
    assert out.loc["mid", "adaptive_delay_ms"] == 1200
    assert out.loc["mid", "mean_ms"] == 400
    assert out.loc["fast", "n_obs"] == 4


def test_replace_delays_lut_and_default(ray_session):
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.hosts import (adaptive_delays,
                                              host_quality_stats,
                                              replace_delays)

    delays = adaptive_delays(host_quality_stats(
        _mk(["a", "a", "b"], [400, 600, 2000]), num_buckets=2))
    rows = ray.data.from_arrow(pa.table({
        "host": pa.array(["a", "b", "unknown"], pa.string()),
        "crawl_delay_ms": pa.array([1, 1, 1], pa.int64()),
    }))
    out = replace_delays(rows, delays, default_ms=777).to_pandas() \
        .set_index("host")["crawl_delay_ms"]
    assert out["a"] == 1500       # mean 500 * 3
    assert out["b"] == 6000       # mean 2000 * 3
    assert out["unknown"] == 777  # no observation -> default


def test_adaptive_schedule_spacing_invariant(ray_session):
    """Property: a schedule driven by adaptive delays never places two
    same-host fetches closer than that host's adaptive delay."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cdx_toolkit_ray.pipelines.frontier import schedule_politeness
    from cdx_toolkit_ray.stages.hosts import (adaptive_delays,
                                              host_quality_stats,
                                              replace_delays)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 4),
                              st.integers(50, 4000)),
                    min_size=1, max_size=40))
    def check(obs):
        hosts = ["h%d.example" % h for h, _ in obs]
        lats = [l for _, l in obs]
        delays = adaptive_delays(host_quality_stats(
            _mk(hosts, lats), num_buckets=4))
        dmap = delays.to_pandas().set_index("host")[
            "adaptive_delay_ms"].to_dict()
        # one frontier row per observation row (dup urls fine here)
        rows = ray.data.from_arrow(pa.table({
            "urlkey": pa.array(["k%d" % i for i in range(len(obs))],
                               pa.string()),
            "host": pa.array(hosts, pa.string()),
            "priority": pa.array([0] * len(obs), pa.int32()),
            "seed_order": pa.array(list(range(len(obs))), pa.int64()),
            "crawl_delay_ms": pa.array([1] * len(obs), pa.int64()),
            "robots_blocked": pa.array([False] * len(obs)),
        }))
        sched = schedule_politeness(
            replace_delays(rows, delays), num_buckets=4).to_pandas()
        for h, grp in sched.groupby("host"):
            ts = np.sort(grp.fetch_ms.to_numpy())
            if len(ts) > 1:
                assert (np.diff(ts) >= dmap[h]).all(), (h, ts, dmap[h])

    check()


def test_blocklist_exact_beyond_int64(ray_session):
    """Products that would wrap int64 take the big-int path and stay
    exact (the verdict inverts if computed in wrapping int64)."""
    from cdx_toolkit_ray.stages.hosts import host_quality_stats

    big = 4_000_000_000_000_000_000  # 4e18: ss*2 wraps int64
    ds = _mk(["giant", "tiny"], [big, 1])
    out = host_quality_stats(ds, num_buckets=2).to_pandas() \
        .set_index("host")
    assert not bool(out.loc["giant", "blocked"])
    assert bool(out.loc["tiny", "blocked"])
    # true micro-mean exceeds int64 -> saturates; verdict stays exact
    assert out.loc["giant", "mean_1e6"] == (1 << 63) - 1
