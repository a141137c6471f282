"""Distributed redirect-chain resolution (pointer doubling, hop-capped).

The reference follows redirect chains one HTTP hop at a time inside
``requests`` (reference myrequests.py:57-166 lets requests auto-follow)
and rewrites single wayback redirect targets per record
(reference warc.py:19-20, M14).  At corpus scale the same question —
"where does this URL actually land?" — is a graph problem: the 3xx
captures form a FUNCTIONAL graph (each url has at most one redirect
target) and every crawler needs the terminal URL per source to
canonicalize dedup keys, merge link-graph mass, and avoid re-fetching
chain interiors.

This stage resolves every url to its terminal target with **pointer
doubling**: each round replaces ``cur(v) <- cur(cur(v))`` and
``hops(v) <- hops(v) + hops(cur(v))`` via ONE hash self-join of the
O(V) narrow state table, so a chain of length L resolves in O(log L)
rounds, not O(L).  ``hops`` is always the EXACT distance from ``v``
to ``cur(v)`` (doubling composes exact prefix distances), which makes
the hop cap exact too:

- partner row missing            -> ``cur`` is terminal by absence: resolved
- partner resolved, hops+p.hops <= max_hops -> resolved at that exact depth
- partner resolved, hops+p.hops  > max_hops -> exhausted (distance proven > cap)
- partner exhausted              -> exhausted (chain passes through one)
- partner active, new hops > max_hops -> exhausted (distance >= hops > cap)

Cycles never reach a terminal, so their hops double until they cross
``max_hops`` and flag exhausted — no cycle detection pass is needed
and the round count stays O(log max_hops) regardless of corpus size.

Scale shape: state is one narrow (url, cur, hops, flags) row per
input url; every round is one balanced hash join plus a vectorized
rule pass; the driver holds only the active-row counter.  Text and
capture payloads never enter the loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _resolve_broadcast(edges: ray.data.Dataset,
                       rmap: ray.data.Dataset, *, url_col: str,
                       redirect_col: str,
                       max_hops: int) -> ray.data.Dataset:
    """Broadcast path: the redirect map as two sorted numpy arrays
    (``ray.put`` once), each batch chased with <= max_hops vectorized
    searchsorted passes — the serial walker's semantics, batch-wide."""
    pairs = rmap.take_all()
    keys = np.array(sorted(r[url_col] for r in pairs), dtype=object)
    kmap = {r[url_col]: r[redirect_col] for r in pairs}
    vals = np.array([kmap[k] for k in keys.tolist()], dtype=object)
    keys_u = keys.astype(str)
    ref = ray.put((keys_u, vals))

    def chase(batch: pa.Table, cap: int = max_hops) -> pa.Table:
        ks, vs = ray.get(ref)
        url = batch[url_col].to_numpy(zero_copy_only=False).astype(str)
        n = len(url)
        cur = url.astype(object)
        hops = np.zeros(n, np.int64)
        active = np.ones(n, bool)
        for _ in range(cap + 1):
            if not active.any():
                break
            ca = cur[active].astype(str)
            idx = np.searchsorted(ks, ca)
            idx_c = np.minimum(idx, len(ks) - 1) if len(ks) else idx
            found = (np.zeros(len(ca), bool) if not len(ks)
                     else ks[idx_c] == ca)
            # terminal by absence: those rows stop, stay resolved
            act_idx = np.flatnonzero(active)
            stop = act_idx[~found]
            active[stop] = False
            go = act_idx[found]
            cur[go] = vs[idx_c[found]]
            hops[go] += 1
        # rows still chasing after cap+1 iterations took cap+1 hops
        exhausted = hops > cap
        ok = ~exhausted
        final = np.where(ok, cur, None)
        return pa.table({
            "url": batch[url_col],
            "final_url": pa.array(final.tolist(), pa.string()),
            "hops": pa.array(
                [int(h) if o else None
                 for h, o in zip(hops.tolist(), ok.tolist())],
                pa.int64()),
            "resolved": pa.array(ok),
        })

    return edges.map_batches(chase, batch_format="pyarrow",
                             batch_size=None)


def resolve_redirects(edges: ray.data.Dataset, *, url_col: str = "url",
                      redirect_col: str = "redirect", max_hops: int = 20,
                      num_partitions: int | None = None,
                      max_rounds: int = 64,
                      broadcast_budget_bytes: int = 256 << 20
                      ) -> ray.data.Dataset:
    """``(url, final_url, hops, resolved)`` per input url.

    ``edges`` holds one row per url: ``redirect_col`` is the 3xx
    Location target or null for a terminal (non-redirect) response.
    A url whose chain ends within ``max_hops`` steps resolves to
    ``(final_url, hops, resolved=true)``; a chain longer than the cap
    — including every cycle — yields ``(null, null, false)``, the
    "give up" a polite fetcher signals after too many Location hops.

    Targets that never appear in ``edges`` (off-corpus urls) are
    terminal by absence, matching a crawler that stops at the first
    url it has no capture for.  Duplicate urls in ``edges`` raise: the
    redirect map must be functional (compact captures first —
    stages/recrawl.compact_captures — to pick one winner per url).

    Path auto-select (the content-join pattern): the REDIRECT SUBSET
    (rows whose ``redirect_col`` is non-null — a few percent of a real
    capture table) is the map the walk needs; when it fits
    ``broadcast_budget_bytes`` it broadcasts once as two sorted arrays
    and every input batch chases its chains in <= max_hops vectorized
    searchsorted passes — zero shuffles, one corpus scan.  Above the
    budget the pointer-doubling self-join loop runs (O(log chain)
    exchanges of the narrow state).  Both paths are row-identical
    (tests pin the parity).
    """
    from .dedup import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()

    # the functional-map contract guards BOTH paths: one narrow-column
    # aggregate (the urls), before any resolution work
    n_urls = edges.count()
    if n_urls and \
            edges.groupby(url_col).count().count() != n_urls:
        raise ValueError(
            "resolve_redirects: duplicate urls in the edge table — the "
            "redirect map must be functional (one row per url); run "
            "compact_captures first")

    rmap = edges.select_columns([url_col, redirect_col]).map_batches(
        lambda b: b.filter(pc.is_valid(b[redirect_col])),
        batch_format="pyarrow", batch_size=None).materialize()
    if (rmap.size_bytes() or 0) <= broadcast_budget_bytes:
        return _resolve_broadcast(edges, rmap, url_col=url_col,
                                  redirect_col=redirect_col,
                                  max_hops=max_hops)

    def init_state(batch: pa.Table) -> pa.Table:
        url = batch[url_col]
        red = batch[redirect_col]
        is_term = pc.is_null(red)
        n = batch.num_rows
        return pa.table({
            "src": url,
            # terminals are fixpoints: cur = self, hops = 0
            "cur": pc.if_else(is_term, url, red),
            "hops": pc.if_else(is_term, pa.scalar(0, pa.int64()),
                               pa.scalar(1, pa.int64())),
            "done": pc.cast(is_term, pa.int8()),
            # term=1 <=> done row carries a real terminal (vs exhausted)
            "term": pc.cast(is_term, pa.int8()),
            "_n": pa.array(np.ones(n, np.int64)),
        })

    state = edges.map_batches(init_state, batch_format="pyarrow",
                              batch_size=None)
    if n_urls == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "final_url": pa.array([], pa.string()),
            "hops": pa.array([], pa.int64()),
            "resolved": pa.array([], pa.bool_())}))
    # narrow state: size the per-round joins to the url volume, with
    # num_partitions as the 100-TB ceiling
    n_parts = max(1, min(num_partitions, (n_urls + (1 << 17) - 1) >> 17))
    state = state.drop_columns(["_n"]).repartition(n_parts).materialize()

    converged = False
    for _round in range(max_rounds):
        active = state.filter(expr="done == 0")
        if active.count() == 0:
            converged = True
            break
        finished = state.filter(expr="done == 1")
        # partner lookup: state[cur] — the full table is the right
        # side because cur may point at done OR active rows
        joined = active.join(
            state.select_columns(["src", "cur", "hops", "done", "term"])
                 .rename_columns({"src": "p_src", "cur": "p_cur",
                                  "hops": "p_hops", "done": "p_done",
                                  "term": "p_term"}),
            "left_outer", n_parts, on=("cur",), right_on=("p_src",))

        def jump(batch: pa.Table, cap: int = max_hops) -> pa.Table:
            hops = batch["hops"].to_numpy(zero_copy_only=False)
            cur = batch["cur"]
            p_missing = pc.is_null(batch["p_hops"]).to_numpy(
                zero_copy_only=False)
            p_hops = batch["p_hops"].to_numpy(zero_copy_only=False)
            p_done = batch["p_done"].to_numpy(zero_copy_only=False)
            p_term = batch["p_term"].to_numpy(zero_copy_only=False)
            p_hops = np.where(p_missing, 0, p_hops).astype(np.int64)
            p_done_b = (~p_missing) & (p_done == 1)
            p_term_b = (~p_missing) & (p_term == 1)
            cand = hops + p_hops

            # rule table (see module docstring)
            resolved = p_missing | (p_done_b & p_term_b & (cand <= cap))
            exhausted = (~resolved) & \
                ((p_done_b & ~p_term_b) | (cand > cap))
            done = resolved | exhausted

            # terminal-by-absence keeps cur; every other row jumps to
            # the partner's cur (exhausted rows park there, inert —
            # done=1 means they never join again)
            new_cur = pc.if_else(pa.array(p_missing), cur, batch["p_cur"])
            new_hops = np.where(p_missing, hops, cand).astype(np.int64)
            return pa.table({
                "src": batch["src"],
                "cur": new_cur,
                "hops": pa.array(new_hops),
                "done": pa.array(done.astype(np.int8)),
                "term": pa.array(resolved.astype(np.int8)),
            })

        stepped = joined.map_batches(jump, batch_format="pyarrow",
                                     batch_size=None)
        state = finished.union(stepped).repartition(n_parts).materialize()
    if not converged:
        raise RuntimeError(
            f"resolve_redirects did not converge in {max_rounds} rounds")

    def finish(batch: pa.Table) -> pa.Table:
        ok = pc.equal(batch["term"], 1)
        return pa.table({
            "url": batch["src"],
            "final_url": pc.if_else(ok, batch["cur"],
                                    pa.scalar(None, pa.string())),
            "hops": pc.if_else(ok, batch["hops"],
                               pa.scalar(None, pa.int64())),
            "resolved": ok,
        })

    return state.map_batches(finish, batch_format="pyarrow",
                             batch_size=None)
