"""resolve_redirects: pointer-doubling chain resolution vs a serial
walker, hop-cap boundary semantics, cycles, duplicate-map guard."""

import numpy as np
import pyarrow as pa
import pytest


def _serial(rmap, url, cap):
    cur, hops = url, 0
    while hops <= cap:
        nxt = rmap.get(cur)
        if nxt is None:
            return cur, hops, True
        cur = nxt
        hops += 1
    return None, None, False


def _resolve(edges_tbl, **kw):
    import ray.data

    from cdx_toolkit_ray.stages.redirects import resolve_redirects

    ds = ray.data.from_arrow(edges_tbl)
    return {r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(ds, **kw).take_all()}


def test_parity_vs_serial_walker(ray_session):
    # the catalog derivation: chains of 0-7 hops, a 3-cycle with
    # upstream feeders, terminal-by-absence past the table edge
    def u(d):
        return f"http://h{d % 10}.example/r/{d}"

    rows = []
    for d in range(500):
        if d % 48 == 0:
            red = u(d + 2)
        elif d % 8 != 0:
            red = u(d - 1)
        else:
            red = None
        rows.append({"url": u(d), "redirect": red})
    rmap = {r["url"]: r["redirect"] for r in rows}

    got = _resolve(pa.Table.from_pylist(rows), max_hops=20)
    assert len(got) == 500
    for r in rows:
        assert got[r["url"]] == _serial(rmap, r["url"], 20), r["url"]
    # the cycle family actually exhausts and chains actually resolve
    assert any(not v[2] for v in got.values())
    assert any(v[2] and v[1] == 7 for v in got.values())


def test_hop_cap_boundary(ray_session):
    # linear chain u0 -> u1 -> ... -> u6 (terminal): length 6
    rows = [{"url": f"u{i}", "redirect": f"u{i + 1}"} for i in range(6)]
    rows.append({"url": "u6", "redirect": None})
    tbl = pa.Table.from_pylist(rows)

    at_cap = _resolve(tbl, max_hops=6)
    assert at_cap["u0"] == ("u6", 6, True)  # == cap resolves
    below = _resolve(tbl, max_hops=5)
    assert below["u0"] == (None, None, False)  # > cap exhausts
    assert below["u1"] == ("u6", 5, True)  # next link is inside cap


def test_terminal_by_absence_and_self_cycle(ray_session):
    rows = [
        {"url": "a", "redirect": "offsite"},  # target not in the map
        {"url": "b", "redirect": "b"},        # 1-cycle
        {"url": "c", "redirect": None},       # plain terminal
    ]
    got = _resolve(pa.Table.from_pylist(rows), max_hops=10)
    assert got["a"] == ("offsite", 1, True)
    assert got["b"] == (None, None, False)
    assert got["c"] == ("c", 0, True)


def test_duplicate_urls_raise(ray_session):
    tbl = pa.Table.from_pylist([
        {"url": "a", "redirect": "b"},
        {"url": "a", "redirect": None},
    ])
    with pytest.raises(ValueError, match="functional"):
        _resolve(tbl, max_hops=5)


def test_empty_input(ray_session):
    tbl = pa.table({"url": pa.array([], pa.string()),
                    "redirect": pa.array([], pa.string())})
    assert _resolve(tbl) == {}


def test_long_chain_log_rounds(ray_session):
    # a 64-hop chain must resolve well inside max_rounds=16 — only
    # pointer doubling gets there (stepwise would need 64 rounds)
    rows = [{"url": f"n{i}", "redirect": f"n{i + 1}"} for i in range(64)]
    rows.append({"url": "n64", "redirect": None})
    got = _resolve(pa.Table.from_pylist(rows), max_hops=100,
                   max_rounds=16)
    assert got["n0"] == ("n64", 64, True)
    hops = np.array([got[f"n{i}"][1] for i in range(65)])
    assert (hops == np.arange(64, -1, -1)).all()


def test_broadcast_vs_doubling_parity(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.redirects import resolve_redirects

    def u(d):
        return f"http://h{d % 10}.example/r/{d}"

    rows = []
    for d in range(300):
        if d % 48 == 0:
            red = u(d + 2)
        elif d % 8 != 0:
            red = u(d - 1)
        else:
            red = None
        rows.append({"url": u(d), "redirect": red})
    tbl = pa.Table.from_pylist(rows)

    def run(budget):
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = resolve_redirects(ds, max_hops=20,
                                broadcast_budget_bytes=budget)
        return sorted((r["url"], r["final_url"], r["hops"],
                       r["resolved"]) for r in out.take_all())

    fast = run(256 << 20)   # broadcast path
    slow = run(0)           # forced pointer-doubling path
    assert fast == slow
    assert any(not r[3] for r in fast)  # cycles exhausted on both
