"""The integrated crawl loop: seeds -> fetch -> discover -> fetch.

``crawl_bfs`` (stages/links.py) walks a PRE-EXTRACTED link graph;
``fetch_execute`` (pipelines/fetch.py) executes ONE wave of a schedule.
This module closes the feedback edge between them — the loop the
reference leaves to its users (the examples/iter-and-warc composition
over ``obj.content``, reference cdx_toolkit/__init__.py:122-127 +
cli.py:235-276): each wave's *fetched content* is the only place the
next wave's URLs can come from. A page that fails its fetch (invalid /
retry-exhausted under the deterministic fault schedule) contributes no
outlinks, so the reachable set is fetch-outcome-dependent — semantics
``crawl_bfs`` cannot express.

Wave anatomy (driver holds only object refs + a per-wave count):

1. **gate** — the wave frontier is offered block-wise to the sharded
   URL-seen actor pool (state/seen.py, ``exact=True`` for the oracle's
   zero-FP contract); first-seen-wins across and within waves.
2. **fetch** — survivors run through the ``FetchExecutor`` actor pool
   (RetryPolicy classification, virtual backoff, max-attempt budget)
   against the injectable transport. One streaming-executor launch per
   wave; transport state loads once per actor.
3. **discover** — outlinks are harvested from the *ok* rows' fetched
   text by one raw task per fetched block (``links.link_kernel``, the
   crawl_bfs probe-round pattern — no extra executor launch), and the
   distinct dst URLs become the next wave's frontier.

Scale notes (100 TB / multi-node): the per-wave fetched blocks stay in
the object store as refs (spillable); the seen set is the sharded actor
pool a resumable crawl checkpoints; the loop count is the bounded
``max_waves``, never data-dependent. Politeness composition is proven
separately (``fetch_requeue`` continues per-host clocks across waves);
this loop focuses on the content-feedback edge. At real scale the
payload side of the transport rides the hash-bucket content join
(pipelines/warcout.py extract_content) — ``UrlTableTransport``'s
per-actor index is the bounded-corpus sandbox twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..canon import hash64_batch
from ..stages.exchange import hash_bucket_apply
from ..state.seen import SeenFilterStage, ShardedSeenSet
from ..stages.links import _gate_block, link_kernel
from .fetch import TableTransport, fetch_execute

__all__ = ["UrlTableTransport", "crawl_waves", "run_crawl"]

_OUT_SCHEMA = pa.schema([
    ("url", pa.string()), ("wave", pa.int64()),
    ("n_attempts", pa.int64()), ("final_status", pa.int64()),
    ("fetch_action", pa.string()), ("text", pa.string()),
])


class UrlTableTransport(TableTransport):
    """Sandbox transport keyed by ``hash64(url)`` (canon.py FNV-1a):
    the fault schedule is the same pure function of (id, attempt) as
    :class:`TableTransport` — here the id is the url hash, so a serial
    oracle replays it from the url string alone. Payloads resolve from
    the pages table by hashing its url column once per actor
    (column-pruned read).

    A pages table is an ARCHIVE — multiple captures per url — but a
    live fetch returns one current page, so when ``ts_col`` exists the
    LATEST capture wins (max ``ts_col`` per url; ``(url, ts)`` is
    unique in the fixture contract). Without a timestamp column the
    first file-order row wins.

    No over-budget filtered path exists here: the hash column is not on
    disk, so predicate pushdown can't prune row groups. At corpus scale
    payload resolution belongs to the hash-bucket content join
    (extract_content); this transport is the bounded-corpus twin and
    raises above ``index_budget_bytes`` rather than silently scanning.
    """

    def __init__(self, table_path: str, url_col: str = "url",
                 text_col: str = "text", ts_col: str | None = "warc_ts",
                 index_budget_bytes: int = 1 << 31):
        super().__init__(table_path, id_col=url_col, text_col=text_col,
                         index_budget_bytes=index_budget_bytes)
        self.ts_col = ts_col

    def _load(self) -> None:
        import pyarrow.parquet as pq

        have_ts = (self.ts_col is not None and self.ts_col in
                   pq.read_schema(self.table_path).names)
        cols = [self.id_col, self.text_col] + \
            ([self.ts_col] if have_ts else [])
        t = pq.read_table(self.table_path, columns=cols)
        ids = hash64_batch(t[self.id_col]).view(np.int64)
        if have_ts:
            ts = t[self.ts_col].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            # primary: hash; secondary: ts ascending -> the run's LAST
            # row per hash is the latest capture
            order = np.lexsort((ts, ids))
            sids = ids[order]
            last = np.r_[sids[1:] != sids[:-1], True] \
                if len(sids) else np.zeros(0, bool)
            self._ids = sids[last]
            keep = order[last]
        else:
            order = np.argsort(ids, kind="stable")
            sids = ids[order]
            first = np.r_[True, sids[1:] != sids[:-1]] \
                if len(sids) else np.zeros(0, bool)
            self._ids = sids[first]
            keep = order[first]
        self._texts = t[self.text_col].combine_chunks().take(
            pa.array(keep))

    def _payloads_filtered(self, ids: np.ndarray) -> pa.Array:
        raise NotImplementedError(
            "pages table exceeds index_budget_bytes and hash64(url) "
            "cannot push down to parquet row groups; resolve payloads "
            "through the hash-bucket content join (extract_content) "
            "at this scale")


def _add_fetch_id(batch: pa.Table) -> pa.Table:
    h = hash64_batch(batch["url"]).view(np.int64)
    return batch.append_column("fetch_id", pa.array(h, pa.int64()))


def _prep_wave(batch: pa.Table) -> pa.Table:
    """(url, hop) -> + fetch_id (hash64 of the raw url, the fault-
    schedule identity) + host (the politeness/robots key, via the
    proven canonicalizer kernel)."""
    from ..canon import canonicalize_batch

    batch = _add_fetch_id(batch)
    cb = canonicalize_batch(batch.select(["url"]))
    return batch.append_column("host", cb["host"])


# --- cross-wave politeness: a narrow (host, base) exchange per wave ----
#
# The per-host virtual clock must hold ACROSS waves, not only within
# one (the fetch_requeue contract generalized to N waves): wave w+1's
# first slot for host h starts after wave w's last slot for h. The
# carried state is one narrow row per ACTIVE host — at web scale that
# stream is bucketed through the same exchange as the rows themselves,
# never a driver dict.

_SCHED_KIND_ROW = 0   # a frontier row awaiting a slot
_SCHED_KIND_BASE = 1  # carried state: host's last assigned slot


def _key_sched(nb: int):
    nbu = np.uint64(nb)

    def fn(batch: pa.Table) -> pa.Table:
        hb = (hash64_batch(batch["host"]) % nbu).astype(np.int64)
        n = batch.num_rows
        return pa.table({
            "bucket": pa.array(hb, pa.int64()),
            "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            "url": batch["url"].cast(pa.string()),
            "hop": batch["hop"].cast(pa.int64()),
            "fetch_id": batch["fetch_id"].cast(pa.int64()),
            "host": batch["host"].cast(pa.string()),
            "crawl_delay_ms": batch["crawl_delay_ms"].cast(pa.int64()),
            "fetch_ms": pa.array([None] * n, pa.int64()),
            "n_fetched": pa.array([None] * n, pa.int64()),
        })

    return fn


def _key_base_tbl(nb: int, tbl: pa.Table) -> pa.Table:
    """Base rows (host, fetch_ms) -> full exchange schema, kind=1."""
    nbu = np.uint64(nb)
    n = tbl.num_rows
    hb = (hash64_batch(tbl["host"]) % nbu).astype(np.int64)
    return pa.table({
        "bucket": pa.array(hb, pa.int64()),
        "kind": pa.array(np.ones(n, np.int8), pa.int8()),
        "url": pa.array([None] * n, pa.string()),
        "hop": pa.array([None] * n, pa.int64()),
        "fetch_id": pa.array([None] * n, pa.int64()),
        "host": tbl["host"].cast(pa.string()),
        "crawl_delay_ms": pa.array([None] * n, pa.int64()),
        "fetch_ms": tbl["fetch_ms"].cast(pa.int64()),
        "n_fetched": tbl["n_fetched"].cast(pa.int64()),
    })


@ray.remote
def _key_base_block(nb: int, tbl: pa.Table) -> pa.Table:
    return _key_base_tbl(nb, tbl)


def _base_rows(hosts: list, fms: list, nf: list) -> pa.Table:
    n = len(hosts)
    return pa.table({
        "kind": pa.array(np.ones(n, np.int8), pa.int8()),
        "url": pa.array([None] * n, pa.string()),
        "hop": pa.array([None] * n, pa.int64()),
        "fetch_id": pa.array([None] * n, pa.int64()),
        "host": pa.array(hosts, pa.string()),
        "crawl_delay_ms": pa.array([None] * n, pa.int64()),
        "fetch_ms": pa.array(fms, pa.int64()),
        "n_fetched": pa.array(nf, pa.int64()),
    })


def _sched_bucket(tbl: pa.Table, cap: int | None = None) -> pa.Table:
    """One host-hash bucket: assign this wave's politeness slots and
    roll the per-host base forward.

    Slots: rows rank within their host in url order (unique after the
    seen gate); ``fetch_ms = base + (rank+1) * crawl_delay_ms`` with
    ``base = -delay`` for hosts never fetched (first slot lands at 0,
    the frontier scheduler's convention). With ``cap`` set, rows whose
    cumulative per-host fetch count (earlier waves + this wave's rank)
    would reach the cap are DROPPED — the per-host crawl budget; their
    links are never harvested and the seen gate keeps them from coming
    back. Emits the scheduled rows (kind 0) plus one base row per host
    (kind 1, carrying last slot + total fetched) — including carried
    hosts with no rows this wave. Incoming base rows fold by
    (max slot, summed count), so resume can feed per-wave partials."""
    import pandas as pd

    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    base_t = tbl.filter(pa.array(kind == _SCHED_KIND_BASE))
    f = tbl.filter(pa.array(kind == _SCHED_KIND_ROW))
    base_ms: dict = {}
    base_n: dict = {}
    if base_t.num_rows:
        bh = pd.Series(base_t["host"].to_numpy(zero_copy_only=False))
        bm = pd.Series(base_t["fetch_ms"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        bn = pd.Series(base_t["n_fetched"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        base_ms = bm.groupby(bh).max().to_dict()
        base_n = bn.groupby(bh).sum().to_dict()

    out_cols = ["kind", "url", "hop", "fetch_id", "host",
                "crawl_delay_ms", "fetch_ms", "n_fetched"]
    if f.num_rows == 0:
        hosts = sorted(base_ms)
        return _base_rows(hosts, [base_ms[h] for h in hosts],
                          [base_n.get(h, 0) for h in hosts]) \
            .select(out_cols)

    hosts = f["host"].to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(hosts)
    delay = f["crawl_delay_ms"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # per-host delay = first row's (robots delay is a host property)
    first_idx = np.full(len(uniq), len(codes), np.int64)
    np.minimum.at(first_idx, codes, np.arange(len(codes)))
    delay_u = delay[first_idx]
    base_u = np.array([base_ms.get(h, -int(d))
                       for h, d in zip(uniq, delay_u)], np.int64)
    prior_u = np.array([base_n.get(h, 0) for h in uniq], np.int64)

    urls = f["url"].to_numpy(zero_copy_only=False)
    order = np.lexsort((urls, codes))
    s_host = codes[order]
    new_run = np.r_[True, s_host[1:] != s_host[:-1]] \
        if len(order) else np.zeros(0, bool)
    starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    rank_sorted = np.arange(len(order)) - starts[run_id]
    rank = np.empty(len(codes), np.int64)
    rank[order] = rank_sorted

    if cap is not None:
        keep = (prior_u[codes] + rank) < cap
        f = f.filter(pa.array(keep))
        codes, rank = codes[keep], rank[keep]
    fetch_ms = base_u[codes] + (rank + 1) * delay_u[codes]

    counts = np.bincount(codes, minlength=len(uniq))
    new_ms = {h: int(b + c * d) for h, b, c, d in
              zip(uniq, base_u, counts, delay_u)}
    new_n = {h: int(p + c) for h, p, c in zip(uniq, prior_u, counts)}
    for h, m in base_ms.items():
        if h not in new_ms:
            new_ms[h] = m
            new_n[h] = base_n.get(h, 0)
    bhosts = sorted(new_ms)

    sched = pa.table({
        "kind": pa.array(np.zeros(f.num_rows, np.int8), pa.int8()),
        "url": f["url"].cast(pa.string()),
        "hop": f["hop"].cast(pa.int64()),
        "fetch_id": f["fetch_id"].cast(pa.int64()),
        "host": f["host"].cast(pa.string()),
        "crawl_delay_ms": f["crawl_delay_ms"].cast(pa.int64()),
        "fetch_ms": pa.array(fetch_ms, pa.int64()),
        "n_fetched": pa.array([None] * f.num_rows, pa.int64()),
    })
    bases = _base_rows(bhosts, [new_ms[h] for h in bhosts],
                       [new_n[h] for h in bhosts])
    return pa.concat_tables([sched.select(out_cols),
                             bases.select(out_cols)])


@ray.remote
def _url_gate_block(gate_fn, tbl: pa.Table) -> pa.Table:
    """Apply a stateless URL hygiene gate (spam/trap/tracking filter,
    stages/urlfeat) to one frontier block BEFORE the seen gate — a
    gated URL is never offered, never fetched, and prunes its
    subtree."""
    if tbl is None or tbl.num_rows == 0:
        return tbl
    return gate_fn(tbl)


@ray.remote
def _tbl_len(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote(num_returns=2)
def _split_sched(tbl: pa.Table):
    """(scheduled rows, base rows) of one exchange output block."""
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    sched = tbl.filter(pa.array(kind == _SCHED_KIND_ROW)) \
        .drop(["kind", "n_fetched"])
    base = tbl.filter(pa.array(kind == _SCHED_KIND_BASE)) \
        .select(["host", "fetch_ms", "n_fetched"])
    return sched, base


@ray.remote
def _stored_wave_base(path: str) -> pa.Table:
    """Resume path: per-host (max fetch_ms, row count) of one persisted
    wave file (a partial — the schedule kernel folds partials by
    max slot / summed count)."""
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["host", "fetch_ms"])
    if t.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "fetch_ms": pa.array([], pa.int64()),
                         "n_fetched": pa.array([], pa.int64())})
    df = t.to_pandas().groupby("host", as_index=False) \
        .agg(fetch_ms=("fetch_ms", "max"), n_fetched=("fetch_ms", "size"))
    return pa.table({"host": pa.array(df["host"], pa.string()),
                     "fetch_ms": pa.array(df["fetch_ms"].astype("int64"),
                                          pa.int64()),
                     "n_fetched": pa.array(
                         df["n_fetched"].astype("int64"), pa.int64())})


def _outlinks_tbl(tbl: pa.Table) -> pa.Table:
    """Distinct outlink dst URLs of one fetched block's ok rows — the
    next wave's frontier contribution. Cross-block and cross-wave dedup
    is the seen gate's job."""
    ok = tbl.filter(pc.and_kleene(
        pc.equal(tbl["fetch_action"], "ok"),
        pc.is_valid(tbl["text"])))
    if ok.num_rows == 0:
        return pa.table({"url": pa.array([], pa.string())})
    links = link_kernel(ok, "url", "text")
    dst = pc.unique(links["dst_url"].combine_chunks())
    return pa.table({"url": dst.cast(pa.string())})


@ray.remote
def _wave_outlinks(tbl: pa.Table) -> pa.Table:
    """Raw task round over materialized wave refs (no executor
    launch)."""
    return _outlinks_tbl(tbl)


@ray.remote
def _stored_wave_outlinks(path: str) -> pa.Table:
    """Resume path: outlinks of one PERSISTED wave file (column-pruned
    read; the text column never reaches the driver)."""
    import pyarrow.parquet as pq

    return _outlinks_tbl(pq.read_table(
        path, columns=["url", "text", "fetch_action"]))


@ray.remote
def _stored_wave_urls(path: str) -> pa.Table:
    """Resume path: the url column of one persisted wave file, for
    re-priming the seen gate."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=["url"])


@ray.remote
def _wave_counters(tbl: pa.Table) -> dict:
    acts = tbl["fetch_action"]
    return {"rows": tbl.num_rows,
            "ok": int(pc.sum(pc.equal(acts, "ok")).as_py() or 0)}


def crawl_waves(pages_path: str, *,
                seeds: ray.data.Dataset | None = None,
                seed_suffix: str = ".example/",
                transport=None,
                max_waves: int = 3, max_attempts: int = 3,
                minimum_interval: float = 3.0,
                num_shards: int = 8, n_bits: int = 1 << 22,
                exact: bool = True, seen_backend: str = "bloom",
                seen_expected_keys: int | None = None,
                url_gate=None,
                concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    """Run the full crawl loop to a wave budget; one row per URL ever
    fetched: ``(url, wave, n_attempts, final_status, fetch_action,
    text)`` with ``wave`` = the BFS level at which the URL was first
    fetched (seeds are wave 0) and ``text`` the fetched payload for ok
    rows (null for failures and for ok URLs the corpus doesn't host —
    dangling outlinks are fetched, yield nothing, and expand nothing).

    Equivalent relation (the SQL oracle): min-wave over the wave-capped
    transitive closure of the link graph restricted to edges whose
    source URL's fault-schedule replay classifies ok, with each reached
    URL's (n_attempts, final_status, fetch_action) the serial
    RetryPolicy replay of ``FAULT_STATUSES[(hash64(url)+k) % 8]`` and
    ``text`` the pages-table payload for ok rows.

    ``exact=True`` (default here, unlike ``crawl_bfs``) because a
    Bloom false positive drops a URL *and every page reachable only
    through it*; pass ``exact=False`` plus a generous ``n_bits`` only
    when approximate reach is acceptable.
    """
    if max_waves < 0:
        raise ValueError("max_waves must be >= 0")
    if transport is None:
        transport = UrlTableTransport(pages_path)
    # exact= applies to the bloom backend only; cuckoo has no false
    # negatives by construction (fingerprints never leave their
    # bucket pair) and sizes via seen_expected_keys
    seen = ShardedSeenSet(num_shards=num_shards, n_bits=n_bits,
                          exact=exact, backend=seen_backend,
                          expected_keys=seen_expected_keys)
    gate = SeenFilterStage(seen)

    if seeds is None:
        seeds = (ray.data.read_parquet(pages_path, columns=["url"])
                 .map_batches(lambda b: b.filter(
                     pc.ends_with(b["url"], seed_suffix)),
                     batch_format="pyarrow", batch_size=None))

    frontier_refs = (seeds.select_columns(["url"]).materialize()
                     .to_arrow_refs())
    out_refs: list = []
    for wave in range(max_waves + 1):
        if url_gate is not None:
            frontier_refs = [_url_gate_block.remote(url_gate, r)
                             for r in frontier_refs]
        gated = [_gate_block.options(num_returns=2).remote(
            gate, "url", wave, r) for r in frontier_refs]
        counts = ray.get([g[1] for g in gated])
        if int(sum(counts)) == 0:
            break
        hop_refs = [g[0] for g, n in zip(gated, counts) if n]
        wds = (ray.data.from_arrow_refs(hop_refs)
               .map_batches(_add_fetch_id, batch_format="pyarrow",
                            batch_size=None))
        fetched = fetch_execute(
            wds, transport, max_attempts=max_attempts,
            minimum_interval=minimum_interval, id_col="fetch_id",
            concurrency=concurrency).materialize()
        wave_refs = fetched.to_arrow_refs()
        out_refs.extend(wave_refs)
        if wave == max_waves:
            break
        frontier_refs = [_wave_outlinks.remote(r) for r in wave_refs]

    if not out_refs:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    return (ray.data.from_arrow_refs(out_refs)
            .rename_columns({"hop": "wave"})
            .select_columns([f.name for f in _OUT_SCHEMA]))


def run_crawl(pages_path: str, out_dir: str, *,
              seeds: ray.data.Dataset | None = None,
              seed_suffix: str = ".example/",
              transport=None,
              max_waves: int = 3, max_attempts: int = 3,
              minimum_interval: float = 3.0,
              num_shards: int = 8, n_bits: int = 1 << 22,
              exact: bool = True, seen_backend: str = "bloom",
              seen_expected_keys: int | None = None,
              politeness: bool = True,
              robots_path: str | None = None,
              default_delay_ms: int = 1000,
              num_buckets: int = 16,
              max_per_host: int | None = None,
              warc_prefix: str | None = None,
              warc_size: int = 1 << 30,
              url_gate=None, url_gate_tag: str | None = None,
              concurrency: int | tuple = (1, 4)) -> dict:
    """Resumable :func:`crawl_waves`: one atomic output partition per
    wave (``<out_dir>/wave=N/``), each recorded in the lineage manifest
    with its fetch counters — a crawl that dies at wave 7 of 12 reruns
    waves 8..12 only.

    **Politeness across waves** (``politeness=True``): every wave's
    rows get virtual-clock slots through a per-host exchange whose
    carried state is one narrow (host, last-slot) row per active host —
    wave w+1's first slot for a host starts one crawl-delay after the
    host's LAST slot in any earlier wave (the fetch_requeue contract
    generalized to N waves), never a wall-clock sleep and never a
    driver-side dict. With ``robots_path`` the per-host crawl-delay and
    disallow rules come from the proven robots gate (blocked URLs are
    dropped after the seen gate, so they are never reconsidered);
    otherwise every host gets ``default_delay_ms``.

    Resume mechanics: completed waves (manifest fingerprint = pages
    footer + fetch params + seed rule) are never refetched; their urls
    re-prime the seen gate from the stored url columns (column-pruned
    reads), the politeness base re-derives from per-wave (host,
    max fetch_ms) partials, and the next frontier is re-derived from
    the LAST completed wave's persisted ok rows. A wave's row set
    depends only on (pages, seeds, max_attempts), never on
    ``max_waves`` — so a finished shallow crawl extends to a deeper one
    without refetching (the fingerprint deliberately excludes
    ``max_waves``).

    Caller contract when passing ``seeds=``: the seed set must be
    stable across reruns (it is part of wave 0's identity but cannot be
    fingerprinted through a Dataset); the default ``seed_suffix`` rule
    is fingerprinted.

    Returns ``{"skipped_waves", "ran_waves", "counters": {wave: {rows,
    ok}}}``.
    """
    import glob as _glob
    import os

    from ..state.lineage import (LineageManifest, atomic_write_dir,
                                 fingerprint_file)

    if max_waves < 0:
        raise ValueError("max_waves must be >= 0")
    if transport is None:
        transport = UrlTableTransport(pages_path)
    manifest = LineageManifest(out_dir)
    fp = "%s+a%d+i%s+s%s" % (fingerprint_file(pages_path), max_attempts,
                             minimum_interval,
                             seed_suffix if seeds is None else "custom")
    if url_gate is not None:
        if not url_gate_tag:
            raise ValueError(
                "url_gate requires url_gate_tag (a stable string "
                "naming the gate — callables cannot be fingerprinted "
                "into the resume manifest)")
        fp += "+g" + url_gate_tag
    if politeness:
        fp += "+p%d" % default_delay_ms
        if robots_path is not None:
            fp += "+r" + fingerprint_file(robots_path)
        if max_per_host is not None:
            fp += "+c%d" % max_per_host
    elif max_per_host is not None:
        raise ValueError("max_per_host requires politeness=True (the "
                         "budget lives in the schedule kernel)")

    robots_fn = None
    if politeness:
        if robots_path is not None:
            from .frontier import load_robots, make_robots_gate
            robots_fn = make_robots_gate(ray.put(load_robots(robots_path)),
                                         default_delay_ms)
        else:
            def robots_fn(batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                batch = batch.append_column(
                    "robots_blocked", pa.array(np.zeros(n, bool)))
                return batch.append_column(
                    "crawl_delay_ms",
                    pa.array(np.full(n, default_delay_ms, np.int64),
                             pa.int64()))

    _names = [f.name for f in _OUT_SCHEMA]
    out_names = (_names[:2] +
                 (["host", "fetch_ms"] if politeness else []) +
                 _names[2:])

    # completed waves count only as a contiguous prefix: wave N+1's
    # frontier derives from wave N's output
    done: list[int] = []
    for w in range(max_waves + 1):
        if manifest.is_complete("wave=%d" % w, fp):
            done.append(w)
        else:
            break

    seen = ShardedSeenSet(num_shards=num_shards, n_bits=n_bits,
                          exact=exact, backend=seen_backend,
                          expected_keys=seen_expected_keys)
    gate = SeenFilterStage(seen)
    result = {"skipped_waves": list(done), "ran_waves": [],
              "counters": {w: {k: manifest.entries["wave=%d" % w][k]
                               for k in ("rows", "ok")} for w in done}}

    base_refs: list = []
    if done:
        # re-prime the seen set and the politeness base from every
        # stored wave, then re-derive the frontier from the last
        # stored wave's ok rows
        prime_refs = []
        for w in done:
            for f in sorted(_glob.glob(os.path.join(
                    out_dir, "wave=%d" % w, "*.parquet"))):
                prime_refs.append(_stored_wave_urls.remote(f))
                if politeness:
                    base_refs.append(_key_base_block.remote(
                        num_buckets, _stored_wave_base.remote(f)))
        primed = [_gate_block.options(num_returns=2).remote(
            gate, "url", 0, r) for r in prime_refs]
        ray.get([p[1] for p in primed])
        last_files = sorted(_glob.glob(os.path.join(
            out_dir, "wave=%d" % done[-1], "*.parquet")))
        frontier_refs = [_stored_wave_outlinks.remote(f)
                         for f in last_files]
    else:
        if seeds is None:
            seeds = (ray.data.read_parquet(pages_path, columns=["url"])
                     .map_batches(lambda b: b.filter(
                         pc.ends_with(b["url"], seed_suffix)),
                         batch_format="pyarrow", batch_size=None))
        frontier_refs = (seeds.select_columns(["url"]).materialize()
                         .to_arrow_refs())

    for wave in range(len(done), max_waves + 1):
        if url_gate is not None:
            frontier_refs = [_url_gate_block.remote(url_gate, r)
                             for r in frontier_refs]
        gated = [_gate_block.options(num_returns=2).remote(
            gate, "url", wave, r) for r in frontier_refs]
        counts = ray.get([g[1] for g in gated])
        if int(sum(counts)) == 0:
            break
        hop_refs = [g[0] for g, n in zip(gated, counts) if n]
        wds = ray.data.from_arrow_refs(hop_refs)
        if politeness:
            wds = (wds.map_batches(_prep_wave, batch_format="pyarrow",
                                   batch_size=None)
                   .map_batches(robots_fn, batch_format="pyarrow",
                                batch_size=None)
                   .map_batches(lambda b: b.filter(
                       pc.invert(b["robots_blocked"])),
                       batch_format="pyarrow", batch_size=None)
                   .map_batches(_key_sched(num_buckets),
                                batch_format="pyarrow", batch_size=None))
            if base_refs:
                wds = wds.union(ray.data.from_arrow_refs(base_refs))
            import functools

            ex = hash_bucket_apply(
                wds, "bucket",
                functools.partial(_sched_bucket, cap=max_per_host),
                num_buckets=num_buckets)
            pairs = [_split_sched.options(num_returns=2).remote(r)
                     for r in ex.to_arrow_refs()]
            sched_refs = [p[0] for p in pairs]
            base_refs = [_key_base_block.remote(num_buckets, p[1])
                         for p in pairs]
            scounts = ray.get([_tbl_len.remote(r) for r in sched_refs])
            if int(sum(scounts)) == 0:
                # every surviving row was over its host budget (or
                # robots-blocked): nothing to fetch, crawl ends here
                break
            sched_refs = [r for r, c in zip(sched_refs, scounts) if c]
            wds = ray.data.from_arrow_refs(sched_refs)
        else:
            wds = wds.map_batches(_add_fetch_id, batch_format="pyarrow",
                                  batch_size=None)
        fetched = fetch_execute(
            wds, transport, max_attempts=max_attempts,
            minimum_interval=minimum_interval, id_col="fetch_id",
            concurrency=concurrency).materialize()
        wave_refs = fetched.to_arrow_refs()
        parts = ray.get([_wave_counters.remote(r) for r in wave_refs])
        counters = {"rows": sum(p["rows"] for p in parts),
                    "ok": sum(p["ok"] for p in parts)}
        final = os.path.join(out_dir, "wave=%d" % wave)
        with atomic_write_dir(final) as tmp:
            (fetched.rename_columns({"hop": "wave"})
             .select_columns(out_names)
             .write_parquet(tmp))
        if warc_prefix is not None:
            # real WARC/1.0 bytes next to the parquet partition: one
            # size-rotated segment family per wave, ok rows as
            # response records (reference warc.py contract). Runs
            # BEFORE the manifest mark so a crash here re-renders the
            # wave on resume — and the re-render first REMOVES any
            # stale segments a crashed attempt left behind (the writer
            # probes for unused segment numbers, so without the sweep
            # a resumed wave would duplicate every record in the
            # segment family / leave a truncated member for ingest to
            # trip on). Safe: only never-recorded waves reach here.
            import glob as _warc_glob

            from .warcbytes import write_warc_distributed

            for stale in _warc_glob.glob(os.path.join(
                    out_dir, "%s-w%d-*.warc*" % (warc_prefix, wave))):
                os.unlink(stale)

            def _warc_rows(batch: pa.Table) -> pa.Table:
                ok = batch.filter(pc.and_kleene(
                    pc.equal(batch["fetch_action"], "ok"),
                    pc.is_valid(batch["text"])))
                return pa.table({
                    "url": ok["url"].cast(pa.string()),
                    "text": ok["text"].cast(pa.string()),
                    "status": ok["final_status"].cast(pa.string()),
                })

            write_warc_distributed(
                ray.data.from_arrow_refs(wave_refs)
                .map_batches(_warc_rows, batch_format="pyarrow",
                             batch_size=None),
                os.path.join(out_dir, warc_prefix), "w%d" % wave,
                {"isPartOf": warc_prefix,
                 "description": "crawl wave %d" % wave},
                size=warc_size)
        manifest.record("wave=%d" % wave, fp, counters, final)
        result["ran_waves"].append(wave)
        result["counters"][wave] = counters
        if wave == max_waves:
            break
        frontier_refs = [_wave_outlinks.remote(r) for r in wave_refs]
    return result
