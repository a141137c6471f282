"""Neighborhood function, harmonic centrality and HyperBall.

Boldi & Vigna, "HyperANF / HyperBall: in-core centrality at bounded
memory" (WebConf/WWW-era line of work on the neighborhood function
N(v, t) = |{u : dist(v, u) <= t}|): per-node ball sizes drive
harmonic centrality, effective-diameter estimation and crawl
prioritization over web graphs far too large for per-node visited
sets. Two modes share one dataflow here:

* **exact** (``neighborhood_function``): the verification twin — the
  (root, node, dist) pair stream is materialized bucket-by-bucket.
  Exact and SQL-oracle-checkable, but the stream is O(n x ball):
  small-scale / truth-table use only (the ann_ivf_full convention).
* **HyperBall** (``hyperball``): the scale path — each node carries a
  fixed ``2^p``-register HLL counter of its ball; one round max-merges
  each node's counter into its IN-neighbors' counters (counters move,
  never node sets), so per-round traffic is ``edges x 2^p`` bytes and
  per-node memory is constant. Registers are deterministic (fixed
  FNV-derived node hashes), so results are reproducible run to run.

Reference anchor: the reference has no graph ops at all (it is an
HTTP CDX client, cdx_toolkit/__init__.py); this family exists for the
crawl-frontier north star — ball growth and harmonic centrality are
standard crawl-ordering / seed-quality signals.

Dataflow (the kcore_peel/link_rank shape): edges are hash-bucketed by
``src`` ONCE and cached in the object store; every round moves only
the narrow frontier (exact) or the register matrix (HyperBall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..canon import hash64_batch

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (the engine-wide key mixer)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _pair_hash(root: pa.Array | np.ndarray,
               node: pa.Array | np.ndarray) -> np.ndarray:
    hr = hash64_batch(root if isinstance(root, pa.Array)
                      else pa.array(root, pa.string()))
    hn = hash64_batch(node if isinstance(node, pa.Array)
                      else pa.array(node, pa.string()))
    return _mix64(hr * _PHI ^ hn)


def _ranges_to_indices(starts: np.ndarray, counts: np.ndarray
                       ) -> np.ndarray:
    """Concatenate [s, s+c) ranges without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(offsets, counts)
            + np.repeat(starts, counts))


_EMPTY_PAIRS = pa.table({"root": pa.array([], pa.string()),
                         "node": pa.array([], pa.string())})
_EMPTY_VIS = pa.table({"root": pa.array([], pa.string()),
                       "node": pa.array([], pa.string()),
                       "dist": pa.array([], pa.int64())})


@ray.remote
def _nf_edges(*tbls: pa.Table) -> pa.Table:
    """One src-bucket's edge slices -> distinct (src, dst) sorted by
    src (searchsorted-ready for every later expansion)."""
    live = [t for t in tbls if t.num_rows]
    if not live:
        return _EMPTY_PAIRS.rename_columns(["src", "dst"])
    import polars as pl

    t = pa.concat_tables(live, promote_options="permissive")
    df = pl.from_arrow(t.select(["src", "dst"])).unique() \
        .sort(["src", "dst"])
    return df.to_arrow().cast(pa.schema([("src", pa.string()),
                                         ("dst", pa.string())]))


@ray.remote
def _nf_init(nb: int, *node_slices: pa.Table):
    """One node-bucket's distinct urls -> (frontier table for this
    bucket, visited (v, v, 0) slices routed by pair hash)."""
    import pyarrow.compute as pc

    arrs = [t["url"].combine_chunks() for t in node_slices
            if t.num_rows]
    if not arrs:
        empty_f = _EMPTY_PAIRS
        out = [empty_f] + [_EMPTY_VIS] * nb
        return tuple(out)
    u = pc.unique(pa.concat_arrays(arrs)).cast(pa.string())
    front = pa.table({"root": u, "node": u})
    ph = (_pair_hash(u, u) % np.uint64(nb)).astype(np.int64)
    order = np.argsort(ph, kind="stable")
    un = u.take(pa.array(order))
    bounds = np.searchsorted(ph[order], np.arange(nb + 1))
    vis = []
    for p in range(nb):
        s = un.slice(bounds[p], bounds[p + 1] - bounds[p])
        vis.append(pa.table({
            "root": s, "node": s,
            "dist": pa.array(np.zeros(len(s), np.int64), pa.int64())}))
    return tuple([front] + vis)


@ray.remote
def _nf_expand(nb: int, edges: pa.Table, *front_parts: pa.Table):
    """Expand one node-bucket's frontier along its cached out-edges;
    candidate (root, dst) pairs are pre-split by pair hash."""
    live = [t for t in front_parts if t.num_rows]
    if not live or edges.num_rows == 0:
        out = [_EMPTY_PAIRS] * nb
        return out[0] if nb == 1 else tuple(out)
    f = pa.concat_tables(live, promote_options="permissive")
    roots = f["root"].combine_chunks().to_numpy(zero_copy_only=False)
    nodes = f["node"].combine_chunks().to_numpy(zero_copy_only=False)
    src = edges["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = edges["dst"].combine_chunks()
    lo = np.searchsorted(src, nodes, side="left")
    hi = np.searchsorted(src, nodes, side="right")
    counts = (hi - lo).astype(np.int64)
    idx = _ranges_to_indices(lo.astype(np.int64), counts)
    if len(idx) == 0:
        out = [_EMPTY_PAIRS] * nb
        return out[0] if nb == 1 else tuple(out)
    cr = np.repeat(roots, counts)
    cd = dst.take(pa.array(idx))
    cra = pa.array(cr, pa.string())
    ph = (_pair_hash(cra, cd) % np.uint64(nb)).astype(np.int64)
    order = np.argsort(ph, kind="stable")
    t = pa.table({"root": cra, "node": cd}).take(pa.array(order))
    bounds = np.searchsorted(ph[order], np.arange(nb + 1))
    out = [t.slice(bounds[p], bounds[p + 1] - bounds[p])
           for p in range(nb)]
    return out[0] if nb == 1 else tuple(out)


@ray.remote
def _nf_gather(d: int, nb: int, vis: pa.Table, *cands: pa.Table):
    """One pair-bucket: distinct new candidates not yet visited join
    the visited set at dist=d; new pairs are re-routed by NODE hash
    (the next round's expansion key)."""
    live = [t for t in cands if t.num_rows]
    if not live:
        return tuple([vis] + [_EMPTY_PAIRS] * nb)
    c = pa.concat_tables(live, promote_options="permissive")
    cr = c["root"].combine_chunks().to_numpy(zero_copy_only=False)
    cn = c["node"].combine_chunks().to_numpy(zero_copy_only=False)
    ckey = np.char.add(np.char.add(cr.astype(str), "\x00"),
                       cn.astype(str))
    order = np.argsort(ckey, kind="stable")
    ckey, cr, cn = ckey[order], cr[order], cn[order]
    first = np.ones(len(ckey), bool)
    first[1:] = ckey[1:] != ckey[:-1]
    ckey, cr, cn = ckey[first], cr[first], cn[first]
    if vis.num_rows:
        vr = vis["root"].combine_chunks().to_numpy(zero_copy_only=False)
        vn = vis["node"].combine_chunks().to_numpy(zero_copy_only=False)
        vkey = np.sort(np.char.add(np.char.add(vr.astype(str), "\x00"),
                                   vn.astype(str)))
        pos = np.searchsorted(vkey, ckey)
        pos_c = np.minimum(pos, len(vkey) - 1)
        seen = vkey[pos_c] == ckey
        cr, cn = cr[~seen], cn[~seen]
    if len(cr) == 0:
        return tuple([vis] + [_EMPTY_PAIRS] * nb)
    new = pa.table({
        "root": pa.array(cr, pa.string()),
        "node": pa.array(cn, pa.string()),
        "dist": pa.array(np.full(len(cr), d, np.int64), pa.int64())})
    vis_out = pa.concat_tables([vis, new],
                               promote_options="permissive") \
        if vis.num_rows else new
    na = pa.array(cn, pa.string())
    hb = (hash64_batch(na) % np.uint64(nb)).astype(np.int64)
    order = np.argsort(hb, kind="stable")
    t = pa.table({"root": pa.array(cr[order], pa.string()),
                  "node": pa.array(cn[order], pa.string())})
    bounds = np.searchsorted(hb[order], np.arange(nb + 1))
    slices = [t.slice(bounds[p], bounds[p + 1] - bounds[p])
              for p in range(nb)]
    return tuple([vis_out] + slices)


@ray.remote
def _nf_partial(lcm: int, fb: int, vis: pa.Table) -> pa.Table:
    """One pair-bucket's visited rows -> per-root partial (count,
    harmonic numerator), bucketed by root for the final fold."""
    sch = pa.schema([("url", pa.string()), ("ball", pa.int64()),
                     ("h_num", pa.int64()), ("_b", pa.int64())])
    if vis.num_rows == 0:
        return sch.empty_table()
    r = vis["root"].combine_chunks().to_numpy(zero_copy_only=False)
    dist = vis["dist"].to_numpy(zero_copy_only=False)
    order = np.argsort(r, kind="stable")
    r, dist = r[order], dist[order]
    new = np.ones(len(r), bool)
    new[1:] = r[1:] != r[:-1]
    st = np.flatnonzero(new)
    cnt = np.diff(np.r_[st, len(r)]).astype(np.int64)
    contrib = np.where(dist > 0, lcm // np.maximum(dist, 1), 0)
    hsum = np.add.reduceat(contrib, st).astype(np.int64)
    roots = pa.array(r[st], pa.string())
    b = (hash64_batch(roots) % np.uint64(fb)).astype(np.int64)
    return pa.table({"url": roots, "ball": pa.array(cnt),
                     "h_num": pa.array(hsum),
                     "_b": pa.array(b, pa.int64())})


def _keyed_edges(links: ray.data.Dataset, nb: int,
                 src_col: str, dst_col: str) -> ray.data.Dataset:
    nbu = np.uint64(nb)

    def key(batch: pa.Table) -> pa.Table:
        s = batch[src_col].cast(pa.string())
        d = batch[dst_col].cast(pa.string())
        h = hash64_batch(s.combine_chunks())
        return pa.table({
            "bucket": pa.array((h % nbu).astype(np.int64), pa.int64()),
            "src": s, "dst": d})

    return links.map_batches(key, batch_format="pyarrow",
                             batch_size=None)


def neighborhood_function(links: ray.data.Dataset, *, radius: int = 3,
                          lcm: int | None = None,
                          num_buckets: int = 16,
                          src_col: str = "src_url",
                          dst_col: str = "dst_url"
                          ) -> ray.data.Dataset:
    """EXACT per-node neighborhood function + harmonic centrality at
    bounded radius over the directed link graph: for every node v,
    ``ball`` = |{u : dist(v,u) <= radius}| (v included) and ``h_num``
    = sum over reachable u != v of ``lcm // dist(v,u)`` — harmonic
    centrality as an exact integer (``lcm`` defaults to lcm(1..radius)
    so every 1/d term is integral; Boldi & Vigna's axioms pick the
    harmonic form over closeness for disconnected web graphs).

    This is the small-scale verification twin of :func:`hyperball`
    (the ann_ivf_full convention): the (root, node, dist) pair stream
    it materializes is O(n x ball) and would not fit a 10^10-node
    graph — the register-passing HyperBall is the scale path.

    Dataflow: edges bucket-cached by src ONCE; each hop moves only the
    frontier pair stream twice (expand by node key, dedup by pair
    key). Returns ``(url, ball, h_num)``.
    """
    if radius < 0:
        raise ValueError("radius must be >= 0")
    if lcm is None:
        lcm = int(np.lcm.reduce(np.arange(1, radius + 1))) \
            if radius else 1
    nb = num_buckets
    from .exchange import _chunked, _split_hash, hash_bucket_apply

    keyed = _keyed_edges(links, nb, src_col, dst_col).materialize()
    refs = keyed.to_arrow_refs()
    splits = [_split_hash.options(num_returns=nb).remote(
        "bucket", nb, *g) for g in _chunked(refs)]
    if nb == 1:
        splits = [[s] for s in splits]
    edges_b = [_nf_edges.remote(*[sp[b] for sp in splits])
               for b in range(nb)]

    from .links import _lr_emit_nodes

    node_slices = [_lr_emit_nodes.options(num_returns=nb).remote(nb, e)
                   for e in edges_b]
    if nb == 1:
        node_slices = [[s] for s in node_slices]
    inits = [_nf_init.options(num_returns=1 + nb).remote(
        nb, *[ns[b] for ns in node_slices]) for b in range(nb)]
    front_parts = [[inits[b][0]] for b in range(nb)]
    vis_b = [_nf_concat.remote(*[inits[b][1 + p] for b in range(nb)])
             for p in range(nb)]

    for d in range(1, radius + 1):
        cands = [_nf_expand.options(num_returns=nb).remote(
            nb, edges_b[b], *front_parts[b]) for b in range(nb)]
        if nb == 1:
            cands = [[c] for c in cands]
        gathers = [_nf_gather.options(num_returns=1 + nb).remote(
            d, nb, vis_b[p], *[cands[b][p] for b in range(nb)])
            for p in range(nb)]
        vis_b = [gathers[p][0] for p in range(nb)]
        front_parts = [[gathers[p][1 + b] for p in range(nb)]
                       for b in range(nb)]

    partials = [_nf_partial.remote(lcm, nb, v) for v in vis_b]
    ds = ray.data.from_arrow_refs(partials)

    def merge(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("url", pa.string()), ("ball", pa.int64()),
                         ("h_num", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        import polars as pl

        return (pl.from_arrow(tbl.select(["url", "ball", "h_num"]))
                .group_by("url")
                .agg([pl.col("ball").sum(), pl.col("h_num").sum()])
                .to_arrow().cast(sch))

    return hash_bucket_apply(ds, "_b", merge, num_buckets=nb)


# --------------------------------------------------------------------------
# HyperBall — register passing (the scale path)
# --------------------------------------------------------------------------

def _hll_init_registers(urls: pa.Array, p: int) -> np.ndarray:
    """Each node's counter starts as HLL({node}): one register set."""
    m = 1 << p
    # splitmix64 finalizer: raw FNV's high bits don't avalanche on
    # short/similar urls (the measured FNV-prefix bias the sampling
    # stages also correct) and HLL keys off the TOP p bits
    h = _mix64(hash64_batch(urls))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rho = leading zeros of the remaining bits + 1 (capped by width)
    lz = np.zeros(len(h), np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    rho = (lz + 1).astype(np.uint8)
    regs = np.zeros((len(h), m), np.uint8)
    regs[np.arange(len(h)), idx] = rho
    return regs


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimator with linear-counting small-range
    correction; deterministic, returned as floor int64."""
    n, m = regs.shape
    if n == 0:
        return np.zeros(0, np.int64)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1))
    est = np.where(small, lin, est)
    return np.floor(est).astype(np.int64)


@ray.remote
def _hb_init(p: int, *node_slices: pa.Table):
    import pyarrow.compute as pc

    arrs = [t["url"].combine_chunks() for t in node_slices
            if t.num_rows]
    if not arrs:
        return pa.table({"url": pa.array([], pa.string())}), \
            np.zeros((0, 1 << p), np.uint8)
    u = pc.unique(pa.concat_arrays(arrs)).cast(pa.string())
    un = u.to_numpy(zero_copy_only=False)
    order = np.argsort(un)
    u = u.take(pa.array(order))
    return pa.table({"url": u}), _hll_init_registers(u, p)


@ray.remote
def _hb_scatter(nb: int, edges: pa.Table, state_urls: pa.Table,
                regs: np.ndarray):
    """Counters flow dst -> src (v's ball absorbs its out-neighbors'
    balls), so edges are cached keyed by DST (the sender side): this
    task looks up the LOCAL dst-nodes' registers per edge, max-merges
    them per src receiver in-task (the combiner), and routes one row
    per receiver to the receiver's bucket."""
    urls = state_urls["url"].combine_chunks() \
        .to_numpy(zero_copy_only=False)
    if edges.num_rows == 0 or len(urls) == 0:
        empty = pa.table({"url": pa.array([], pa.string())})
        out = [(empty, np.zeros((0, regs.shape[1]), np.uint8))] * nb
        return out[0] if nb == 1 else tuple(out)
    e_dst = edges["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    e_src = edges["src"].combine_chunks()
    idx = np.searchsorted(urls, e_dst)
    idx_c = np.minimum(idx, len(urls) - 1)
    ok = urls[idx_c] == e_dst
    if not ok.any():
        empty = pa.table({"url": pa.array([], pa.string())})
        out = [(empty, np.zeros((0, regs.shape[1]), np.uint8))] * nb
        return out[0] if nb == 1 else tuple(out)
    src = e_src.filter(pa.array(ok))
    payload = regs[idx_c[ok]]
    # pre-merge per receiver within the task (combiner): one row per src
    sn = src.to_numpy(zero_copy_only=False)
    order = np.argsort(sn, kind="stable")
    sn, payload = sn[order], payload[order]
    first = np.ones(len(sn), bool)
    first[1:] = sn[1:] != sn[:-1]
    st = np.flatnonzero(first)
    merged = np.maximum.reduceat(payload, st, axis=0)
    recv = pa.array(sn[st], pa.string())
    hb = (hash64_batch(recv) % np.uint64(nb)).astype(np.int64)
    out = []
    for b in range(nb):
        sel = hb == b
        out.append((pa.table({"url": recv.filter(pa.array(sel))}),
                    merged[sel]))
    return out[0] if nb == 1 else tuple(out)


@ray.remote
def _hb_gather(state_urls: pa.Table, regs: np.ndarray, *msgs):
    """Max-merge incoming register rows into this bucket's state."""
    urls = state_urls["url"].combine_chunks() \
        .to_numpy(zero_copy_only=False)
    out = regs.copy()
    if len(urls) == 0:
        return state_urls, out
    for m_urls, m_regs in msgs:
        if m_regs.shape[0] == 0:
            continue
        mu = m_urls["url"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(urls, mu)
        idx_c = np.minimum(idx, len(urls) - 1)
        ok = urls[idx_c] == mu
        if np.any(ok):
            np.maximum.at(out, idx_c[ok], m_regs[ok])
    return state_urls, out


@ray.remote
def _hb_final(state_urls: pa.Table, regs: np.ndarray) -> pa.Table:
    return pa.table({
        "url": state_urls["url"].combine_chunks().cast(pa.string()),
        "ball_est": pa.array(_hll_estimate(regs), pa.int64())})


def hyperball(links: ray.data.Dataset, *, radius: int = 3, p: int = 9,
              num_buckets: int = 16, src_col: str = "src_url",
              dst_col: str = "dst_url") -> ray.data.Dataset:
    """HyperBall (Boldi & Vigna): APPROXIMATE per-node ball sizes at
    bounded radius via mergeable HLL counters — the 10^10-node scale
    path for :func:`neighborhood_function`. Each node carries 2^p
    one-byte registers; each round every node's counter max-merges
    into its in-neighbors' counters (ball_d(v) = ball_{d-1}(v) union
    the out-neighbors' balls). Per-round traffic is edges x 2^p bytes
    with an in-task per-receiver combiner; node sets never move.
    Deterministic: node hashes are the engine's fixed FNV-64, so the
    estimate is bit-stable run to run (rows-only catalog entry; the
    exact twin is the oracle, the accuracy bound is pytest-checked).

    Returns ``(url, ball_est)`` with ``ball_est = floor(HLL estimate)``.
    """
    if radius < 0:
        raise ValueError("radius must be >= 0")
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    nb = num_buckets
    from .exchange import _chunked, _split_hash
    from .links import _lr_emit_nodes

    # edges cached keyed by DST (the sender side: dst's registers flow
    # to src), sorted by dst for the searchsorted probe
    def key(batch: pa.Table) -> pa.Table:
        s = batch[src_col].cast(pa.string())
        d = batch[dst_col].cast(pa.string())
        h = hash64_batch(d.combine_chunks())
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64),
                               pa.int64()),
            "src": s, "dst": d})

    keyed = links.map_batches(key, batch_format="pyarrow",
                              batch_size=None).materialize()
    refs = keyed.to_arrow_refs()
    splits = [_split_hash.options(num_returns=nb).remote(
        "bucket", nb, *g) for g in _chunked(refs)]
    if nb == 1:
        splits = [[s] for s in splits]
    edges_b = [_hb_edges.remote(*[sp[b] for sp in splits])
               for b in range(nb)]

    node_slices = [_lr_emit_nodes.options(num_returns=nb).remote(nb, e)
                   for e in edges_b]
    if nb == 1:
        node_slices = [[s] for s in node_slices]
    state_b = [_hb_init.options(num_returns=2).remote(
        p, *[ns[b] for ns in node_slices]) for b in range(nb)]
    state_b = [(s[0], s[1]) for s in state_b]

    for _ in range(radius):
        msgs = [_hb_scatter.options(num_returns=nb).remote(
            nb, edges_b[b], state_b[b][0], state_b[b][1])
            for b in range(nb)]
        if nb == 1:
            msgs = [[m] for m in msgs]
        new_state = [_hb_gather.options(num_returns=2).remote(
            state_b[b][0], state_b[b][1],
            *[msgs[q][b] for q in range(nb)]) for b in range(nb)]
        state_b = [(s[0], s[1]) for s in new_state]

    return ray.data.from_arrow_refs(
        [_hb_final.remote(s[0], s[1]) for s in state_b])


@ray.remote
def _hb_edges(*tbls: pa.Table) -> pa.Table:
    """One dst-bucket's edge slices -> distinct (src, dst) sorted by
    dst (the probe key)."""
    live = [t for t in tbls if t.num_rows]
    if not live:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})
    import polars as pl

    t = pa.concat_tables(live, promote_options="permissive")
    df = pl.from_arrow(t.select(["src", "dst"])).unique() \
        .sort(["dst", "src"])
    return df.to_arrow().cast(pa.schema([("src", pa.string()),
                                         ("dst", pa.string())]))


@ray.remote
def _nf_concat(*tbls: pa.Table) -> pa.Table:
    live = [t for t in tbls if t.num_rows]
    if not live:
        return _EMPTY_VIS
    return pa.concat_tables(live, promote_options="permissive")


@ray.remote
def _dd_partial(nb: int, vis: pa.Table) -> pa.Table:
    """One pair-bucket's visited rows -> (dist, n) partial counts."""
    sch = pa.schema([("d", pa.int64()), ("n_pairs", pa.int64()),
                     ("_b", pa.int64())])
    if vis.num_rows == 0:
        return sch.empty_table()
    dist = vis["dist"].to_numpy(zero_copy_only=False)
    vals, cnt = np.unique(dist, return_counts=True)
    return pa.table({
        "d": pa.array(vals.astype(np.int64), pa.int64()),
        "n_pairs": pa.array(cnt.astype(np.int64), pa.int64()),
        "_b": pa.array(vals.astype(np.int64) % nb, pa.int64())})


def distance_distribution(links: ray.data.Dataset, *, radius: int = 3,
                          num_buckets: int = 16,
                          src_col: str = "src_url",
                          dst_col: str = "dst_url"
                          ) -> ray.data.Dataset:
    """EXACT distance distribution of the directed graph at bounded
    radius — the neighborhood function N(d) = |{(u,v) : dist(u,v) =
    d}| that HyperANF estimates (Boldi, Rosa & Vigna, WWW 2011), the
    basis of effective-diameter and spid reports. Shares the
    bucket-cached BFS dataflow of :func:`neighborhood_function`;
    the reduction to one row per distance is two tiny folds.
    Returns ``(d, n_pairs)`` with d = 0..radius (d=0 rows = nodes)."""
    if radius < 0:
        raise ValueError("radius must be >= 0")
    nb = num_buckets
    from .exchange import _chunked, _split_hash, hash_bucket_apply
    from .links import _lr_emit_nodes

    keyed = _keyed_edges(links, nb, src_col, dst_col).materialize()
    refs = keyed.to_arrow_refs()
    splits = [_split_hash.options(num_returns=nb).remote(
        "bucket", nb, *g) for g in _chunked(refs)]
    if nb == 1:
        splits = [[s] for s in splits]
    edges_b = [_nf_edges.remote(*[sp[b] for sp in splits])
               for b in range(nb)]
    node_slices = [_lr_emit_nodes.options(num_returns=nb).remote(nb, e)
                   for e in edges_b]
    if nb == 1:
        node_slices = [[s] for s in node_slices]
    inits = [_nf_init.options(num_returns=1 + nb).remote(
        nb, *[ns[b] for ns in node_slices]) for b in range(nb)]
    front_parts = [[inits[b][0]] for b in range(nb)]
    vis_b = [_nf_concat.remote(*[inits[b][1 + p] for b in range(nb)])
             for p in range(nb)]
    for d in range(1, radius + 1):
        cands = [_nf_expand.options(num_returns=nb).remote(
            nb, edges_b[b], *front_parts[b]) for b in range(nb)]
        if nb == 1:
            cands = [[c] for c in cands]
        gathers = [_nf_gather.options(num_returns=1 + nb).remote(
            d, nb, vis_b[p], *[cands[b][p] for b in range(nb)])
            for p in range(nb)]
        vis_b = [gathers[p][0] for p in range(nb)]
        front_parts = [[gathers[p][1 + b] for p in range(nb)]
                       for b in range(nb)]

    ds = ray.data.from_arrow_refs(
        [_dd_partial.remote(nb, v) for v in vis_b])

    def merge(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("d", pa.int64()), ("n_pairs", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        import polars as pl

        return (pl.from_arrow(tbl.select(["d", "n_pairs"]))
                .group_by("d").agg(pl.col("n_pairs").sum())
                .to_arrow().cast(sch))

    return hash_bucket_apply(ds, "_b", merge, num_buckets=nb)


def graph_report(links: ray.data.Dataset, *, radius: int = 3,
                 num_buckets: int = 16, src_col: str = "src_url",
                 dst_col: str = "dst_url") -> ray.data.Dataset:
    """The HyperANF summary report over the radius-capped distance
    distribution (Boldi, Rosa & Vigna 2011): ``eff_diameter_90`` (the
    90th-percentile distance with the standard linear interpolation),
    ``mean_distance`` and ``spid`` (variance/mean — the
    shortest-paths index of dispersion; < 1000 permille = proper web
    graph, > 1000 = "galaxy" per the paper). All three are EXACT
    integer permille computed from the exact N(d) counts with Python
    big-int arithmetic in one final task over <= radius+1 rows (the
    T·Σd²n products wrap int64 at web-scale pair counts). Distances
    are capped at ``radius`` — the report describes the radius-ball,
    as any bounded-iteration HyperANF run does."""
    dd = distance_distribution(links, radius=radius,
                               num_buckets=num_buckets,
                               src_col=src_col, dst_col=dst_col)

    def report(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("metric", pa.string()),
                         ("value_permille", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        d = tbl["d"].to_numpy(zero_copy_only=False).tolist()
        n = tbl["n_pairs"].to_numpy(zero_copy_only=False).tolist()
        order = sorted(range(len(d)), key=lambda i: d[i])
        d = [int(d[i]) for i in order]
        n = [int(n[i]) for i in order]
        t = sum(n)
        s1 = sum(di * ni for di, ni in zip(d, n))
        s2 = sum(di * di * ni for di, ni in zip(d, n))
        mean_pm = 1000 * s1 // t
        var_num = t * s2 - s1 * s1          # variance = var_num / t^2
        spid_pm = (1000 * var_num // (t * s1)) if s1 else 0
        cum = 0
        ed_pm = 0
        for di, ni in zip(d, n):
            if 10 * (cum + ni) >= 9 * t:
                ed_pm = 0 if di == 0 else \
                    1000 * (di - 1) + (1000 * (9 * t - 10 * cum)
                                       ) // (10 * ni)
                break
            cum += ni
        return pa.table({
            "metric": pa.array(["eff_diameter_90", "mean_distance",
                                "spid"], pa.string()),
            "value_permille": pa.array([ed_pm, mean_pm, spid_pm],
                                       pa.int64())})

    return dd.repartition(1).map_batches(report,
                                         batch_format="pyarrow",
                                         batch_size=None)


@ray.remote
def _gc_rekey(nb: int, vis: pa.Table):
    """Re-route one pair-bucket's (root, node) rows by NODE hash (the
    covered-flag co-location key for greedy cover)."""
    sch = pa.schema([("root", pa.string()), ("node", pa.string())])
    if vis.num_rows == 0:
        out = [sch.empty_table()] * nb
        return out[0] if nb == 1 else tuple(out)
    t = vis.select(["root", "node"])
    h = (hash64_batch(t["node"].combine_chunks())
         % np.uint64(nb)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    t = t.take(pa.array(order))
    bounds = np.searchsorted(h[order], np.arange(nb + 1))
    out = [t.slice(bounds[p], bounds[p + 1] - bounds[p])
           for p in range(nb)]
    return out[0] if nb == 1 else tuple(out)


@ray.remote
def _gc_init(*parts: pa.Table):
    """One node-bucket: (pairs sorted by node, distinct node array,
    all-False covered flags)."""
    sch = pa.schema([("root", pa.string()), ("node", pa.string())])
    live = [t for t in parts if t.num_rows]
    if not live:
        return sch.empty_table(), np.zeros(0, object), \
            np.zeros(0, bool)
    import polars as pl

    t = pa.concat_tables(live, promote_options="permissive")
    df = pl.from_arrow(t).sort(["node", "root"])
    t = df.to_arrow().cast(sch)
    nodes = np.unique(t["node"].combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(str))
    return t, nodes, np.zeros(len(nodes), bool)


@ray.remote
def _gc_count(pairs: pa.Table, nodes: np.ndarray, covered: np.ndarray):
    """Per-root count of UNCOVERED nodes in this bucket -> one best
    candidate (count desc, root asc) plus the full partial table is
    unnecessary — counts fold per bucket, the driver reduces nb
    candidates... but a root's ball spans buckets, so partials must
    fold ACROSS buckets first: return (root, cnt) partials."""
    sch = pa.schema([("root", pa.string()), ("cnt", pa.int64())])
    if pairs.num_rows == 0:
        return sch.empty_table()
    node = pairs["node"].combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(str)
    root = pairs["root"].combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(str)
    idx = np.searchsorted(nodes, node)
    unc = ~covered[idx]
    if not unc.any():
        return sch.empty_table()
    r = root[unc]
    order = np.argsort(r, kind="stable")
    r = r[order]
    first = np.ones(len(r), bool)
    first[1:] = r[1:] != r[:-1]
    st = np.flatnonzero(first)
    cnt = np.diff(np.r_[st, len(r)]).astype(np.int64)
    return pa.table({"root": pa.array(r[st], pa.string()),
                     "cnt": pa.array(cnt, pa.int64())})


@ray.remote
def _gc_best(*parts: pa.Table):
    """Fold (root, cnt) partials of one root-bucket -> its best
    candidate (cnt desc, root asc)."""
    live = [t for t in parts if t.num_rows]
    if not live:
        return None
    t = pa.concat_tables(live, promote_options="permissive")
    r = t["root"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(str)
    c = t["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    first = np.ones(len(r), bool)
    first[1:] = r[1:] != r[:-1]
    st = np.flatnonzero(first)
    tot = np.add.reduceat(c, st)
    cand = sorted(zip((-tot).tolist(), r[st].tolist()))[0]
    return int(-cand[0]), cand[1]


@ray.remote
def _gc_mark(winner: str, pairs: pa.Table, nodes: np.ndarray,
             covered: np.ndarray) -> np.ndarray:
    """Mark the winner's ball nodes covered in this bucket."""
    if pairs.num_rows == 0:
        return covered
    root = pairs["root"].combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(str)
    sel = root == winner
    if not sel.any():
        return covered
    node = pairs["node"].combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(str)[sel]
    out = covered.copy()
    out[np.searchsorted(nodes, np.unique(node))] = True
    return out


def greedy_seed_cover(links: ray.data.Dataset, *, k: int = 3,
                      radius: int = 2, num_buckets: int = 16,
                      src_col: str = "src_url",
                      dst_col: str = "dst_url") -> ray.data.Dataset:
    """Greedy maximum-coverage seed selection: pick ``k`` seeds, each
    round taking the url whose radius-``radius`` forward ball covers
    the most NOT-YET-COVERED urls (ties to the smaller url) — the
    (1 - 1/e)-approximate max-cover rule, the standard way to build a
    small seed list that still reaches most of a web graph. Rounds
    with zero marginal gain stop early.

    Dataflow: the exact ball pair stream (the neighborhood_function
    BFS over bucket-cached edges) is re-keyed ONCE by node so covered
    flags co-locate; each greedy round is one uncovered-count scatter
    + one per-root fold; the driver holds only the current winner and
    its gain. Returns ``(rank, seed, gain)``.

    Oracle: the recursive-CTE walk with ``k`` greedy rounds unrolled
    in SQL (NOT-IN against the accumulated cover)."""
    if k < 0 or radius < 0:
        raise ValueError("k and radius must be >= 0")
    nb = num_buckets
    from .exchange import _chunked, _split_hash
    from .links import _lr_emit_nodes

    keyed = _keyed_edges(links, nb, src_col, dst_col).materialize()
    if keyed.count() == 0:
        return ray.data.from_arrow(pa.table({
            "rank": pa.array([], pa.int64()),
            "seed": pa.array([], pa.string()),
            "gain": pa.array([], pa.int64())}))
    refs = keyed.to_arrow_refs()
    splits = [_split_hash.options(num_returns=nb).remote(
        "bucket", nb, *g) for g in _chunked(refs)]
    if nb == 1:
        splits = [[s] for s in splits]
    edges_b = [_nf_edges.remote(*[sp[b] for sp in splits])
               for b in range(nb)]
    node_slices = [_lr_emit_nodes.options(num_returns=nb).remote(nb, e)
                   for e in edges_b]
    if nb == 1:
        node_slices = [[s] for s in node_slices]
    inits = [_nf_init.options(num_returns=1 + nb).remote(
        nb, *[ns[b] for ns in node_slices]) for b in range(nb)]
    front_parts = [[inits[b][0]] for b in range(nb)]
    vis_b = [_nf_concat.remote(*[inits[b][1 + p] for b in range(nb)])
             for p in range(nb)]
    for d in range(1, radius + 1):
        cands = [_nf_expand.options(num_returns=nb).remote(
            nb, edges_b[b], *front_parts[b]) for b in range(nb)]
        if nb == 1:
            cands = [[c] for c in cands]
        gathers = [_nf_gather.options(num_returns=1 + nb).remote(
            d, nb, vis_b[p], *[cands[b][p] for b in range(nb)])
            for p in range(nb)]
        vis_b = [gathers[p][0] for p in range(nb)]
        front_parts = [[gathers[p][1 + b] for p in range(nb)]
                       for b in range(nb)]

    rekeyed = [_gc_rekey.options(num_returns=nb).remote(nb, v)
               for v in vis_b]
    if nb == 1:
        rekeyed = [[r] for r in rekeyed]
    states = [_gc_init.options(num_returns=3).remote(
        *[rekeyed[q][p] for q in range(nb)]) for p in range(nb)]
    pairs_b = [s[0] for s in states]
    nodes_b = [s[1] for s in states]
    cov_b = [s[2] for s in states]

    ranks, seeds, gains = [], [], []
    for rank in range(1, k + 1):
        parts = [_gc_count.remote(pairs_b[p], nodes_b[p], cov_b[p])
                 for p in range(nb)]
        # fold partials per root: slice each partial by root hash
        sl = [_gc_rekey_root.options(num_returns=nb).remote(nb, t)
              for t in parts]
        if nb == 1:
            sl = [[s] for s in sl]
        bests = ray.get([_gc_best.remote(*[sl[q][p]
                                           for q in range(nb)])
                         for p in range(nb)])
        bests = [x for x in bests if x is not None]
        if not bests:
            break
        gain, winner = sorted(((-c, r) for c, r in bests))[0]
        gain = -gain
        if gain <= 0:
            break
        ranks.append(rank)
        seeds.append(winner)
        gains.append(gain)
        cov_b = [_gc_mark.remote(winner, pairs_b[p], nodes_b[p],
                                 cov_b[p]) for p in range(nb)]
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "seed": pa.array(seeds, pa.string()),
        "gain": pa.array(gains, pa.int64())}))


@ray.remote
def _gc_rekey_root(nb: int, t: pa.Table):
    """Slice a (root, cnt) partial table by root hash."""
    sch = pa.schema([("root", pa.string()), ("cnt", pa.int64())])
    if t.num_rows == 0:
        out = [sch.empty_table()] * nb
        return out[0] if nb == 1 else tuple(out)
    h = (hash64_batch(t["root"].combine_chunks())
         % np.uint64(nb)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    t = t.take(pa.array(order))
    bounds = np.searchsorted(h[order], np.arange(nb + 1))
    out = [t.slice(bounds[p], bounds[p + 1] - bounds[p])
           for p in range(nb)]
    return out[0] if nb == 1 else tuple(out)
