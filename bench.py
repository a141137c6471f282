#!/usr/bin/env python
"""Headline benchmark for the cdx_toolkit_ray engine.

Runs the flagship frontier pipeline plus representative query-engine
and training-data operators over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "frontier_urls": ..., "frontier_urls_per_sec": ...}

``--scaling`` re-runs the headline frontier pipeline in two fresh
processes (RAY_GRAFT_CPUS=8 and =32, same input) and reports both
throughputs plus the N->4N scaling efficiency (sandbox stand-in for
N-node vs 4N-node clusters; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# replicate the derived frontier input this many times (scaling runs
# use a fixed larger value so the job is compute-dominated)
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "1"))

_DELAYS = (550, 1000, 3000, 6000)


def prepare_seeds(sf_dir: str, replicate: int) -> str:
    """Materialize the frontier seeds table (input_hint shape: one URL
    per row + priority + unique seed_order) once per (sf, replicate),
    derived deterministically from lineitem. Cached under /tmp; NOT
    part of the timed pipeline (it is the benchmark's input table).

    Host distribution is skewed on purpose: ~20% of rows land on one
    hot host (l_partkey % 5 == 0) to exercise the skewed politeness
    group; the rest spread over ~997 hosts. ``seed_order`` is the
    global row number (the first-wins dedup contract requires a unique
    order key — the synthetic lineitem contains duplicate rows, so no
    column combination is unique).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = hashlib.sha1(("%s|%d" % (sf_dir, replicate)).encode()).hexdigest()[:10]
    path = "/tmp/cdxray_bench_seeds_%s" % tag
    if os.path.exists(os.path.join(path, ".done")):
        return path

    t = pq.read_table("%s/lineitem.parquet" % sf_dir,
                      columns=["l_orderkey", "l_linenumber",
                               "l_suppkey", "l_partkey"])
    ok = t["l_orderkey"].to_numpy().astype(np.int64)
    ln = t["l_linenumber"].to_numpy().astype(np.int64)
    sk = t["l_suppkey"].to_numpy().astype(np.int64)
    pk = t["l_partkey"].to_numpy().astype(np.int64)
    n = len(ok)

    hostid = sk % 997
    hot = (pk % 5) == 0
    host = np.where(hot, "big-portal", np.char.add("supp", hostid.astype(str)))
    www = np.where(ok % 2 == 0, "www.", "")
    q = np.where(ln % 3 == 0, "?b=2&a=1", "")
    delays = np.array(_DELAYS, dtype=np.int64)[np.where(hot, 0, hostid % 4)]

    url = np.char.add(np.char.add("https://", www.astype(str)),
                      np.char.add(host.astype(str), ".example/o/"))
    url = np.char.add(url, ok.astype(str))
    url = np.char.add(url, "/")
    url = np.char.add(url, ln.astype(str))
    url = np.char.add(url, q.astype(str))

    # One file per ~150k rows: parallel read tasks from the first byte
    # (a single big file becomes ONE read task + SplitBlocks, which
    # serializes the fused read->map chain).
    os.makedirs(path, exist_ok=True)
    url_arr = pa.array(url.tolist(), pa.string())
    prio_arr = pa.array((ln % 4).astype(np.int32))
    delay_arr = pa.array(delays, pa.int64())
    rows_per_file = 150_000
    fno = 0
    for r in range(replicate):
        t = pa.table({
            "url": url_arr,
            "priority": prio_arr,
            "seed_order": pa.array(np.arange(n, dtype=np.int64) + r * n,
                                   pa.int64()),
            "crawl_delay_ms": delay_arr,
        })
        for lo in range(0, n, rows_per_file):
            pq.write_table(t.slice(lo, rows_per_file),
                           os.path.join(path, "part-%05d.parquet" % fno),
                           row_group_size=65536)
            fno += 1
    open(os.path.join(path, ".done"), "w").close()
    return path


def derive_frontier_seeds(sf_dir: str, num_cpus: int):
    import ray.data

    path = prepare_seeds(sf_dir, REPLICATE)
    return ray.data.read_parquet(
        path, override_num_blocks=max(8, num_cpus * 2))


def consume(ds) -> int:
    """Execute the full pipeline, moving only per-block row counts to
    the driver (a real job would write_parquet; pulling every block to
    the driver would measure the driver's NIC, not the engine)."""
    import pyarrow as pa

    def count_block(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    n = 0
    counted = ds.map_batches(count_block, batch_format="pyarrow")
    for b in counted.iter_batches(batch_format="pyarrow", batch_size=None):
        n += int(b["n"].to_numpy().sum())
    return n


def warmup(sf_dir: str, num_cpus: int) -> None:
    """Untimed: spawn the worker pools (map tasks + sort/aggregate
    actors) on a small slice so the timed run measures steady-state
    engine throughput, not process fork latency."""
    import numpy as np
    import pyarrow as pa

    from cdx_toolkit_ray.canon import canonicalize_batch

    ds = derive_frontier_seeds(sf_dir, num_cpus).limit(20000)
    ds = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    ds = ds.sort(["seed_order"])
    consume(ds)


def run_frontier(sf_dir: str, num_cpus: int) -> int:
    """Derived seeds -> canonicalize -> first-wins dedup -> politeness
    -> global crawl order (the north_rule flagship)."""
    import numpy as np
    import pyarrow as pa

    from cdx_toolkit_ray.canon import canonicalize_batch
    from cdx_toolkit_ray.pipelines.frontier import make_politeness_scheduler
    from cdx_toolkit_ray.stages.dedup import first_wins_dedup

    ds = derive_frontier_seeds(sf_dir, num_cpus)
    ds = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    ds = first_wins_dedup(ds, "hash64",
                          [("priority", 19), ("seed_order", 44)],
                          strategy="broadcast_recompute")

    def add_flags(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "robots_blocked", pa.array(np.zeros(batch.num_rows, bool)))

    ds = ds.map_batches(add_flags, batch_format="pyarrow")
    # Plan boundary: without it the streaming executor's resource
    # reservation for the downstream all-to-all (groupby/sort) throttles
    # the map stage to ~1 concurrent task at low CPU counts. The
    # deduped frontier is also the natural checkpoint in a real crawl.
    ds = ds.materialize()
    ds = ds.groupby("host").map_groups(make_politeness_scheduler(),
                                       batch_format="pandas")
    ds = ds.sort(["fetch_ms", "priority", "seed_order"])
    ds = ds.select_columns(["urlkey", "host", "host_rank", "fetch_ms"])
    return consume(ds)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cdx_toolkit_ray import queries as Q

    headline_only = "--headline-only" in sys.argv

    warmup(SF_DIR, NUM_CPUS)

    results: dict[str, float] = {}
    t0 = time.time()
    n_urls = run_frontier(SF_DIR, NUM_CPUS)
    frontier_sec = time.time() - t0
    results["frontier"] = round(frontier_sec, 3)

    if not headline_only:
        others = [
            ("groupby_agg", lambda: Q.q_groupby_agg(SF_DIR).to_pandas()),
            ("time_window", lambda: consume(Q.q_time_window(SF_DIR))),
            ("closest", lambda: consume(Q.q_closest(SF_DIR))),
            ("exact_dedup", lambda: consume(Q.q_exact_dedup(SF_DIR))),
            ("token_stats", lambda: consume(Q.q_token_stats(SF_DIR))),
            ("lang_id", lambda: consume(Q.q_lang_id(SF_DIR))),
            ("ann_topk", lambda: consume(Q.q_ann_topk(SF_DIR))),
            ("minhash_pairs", lambda: consume(Q.q_minhash_pairs(SF_DIR))),
            ("captures_query", lambda: consume(Q.q_captures_query(SF_DIR))),
            ("content_extract",
             lambda: consume(Q.q_content_extract(SF_DIR))),
        ]
        for name, fn in others:
            t = time.time()
            fn()
            results[name] = round(time.time() - t, 3)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "cdx_toolkit_ray headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "frontier_urls": n_urls,
        "frontier_urls_per_sec": round(n_urls / frontier_sec, 1),
    }
    print(json.dumps(out))
    ray.shutdown()


def scaling() -> None:
    """Same frontier job at 8 and 32 CPUs in fresh processes."""
    lo, hi = 8, 32
    rep = os.environ.get("GRAFT_REPLICATE", "4")
    prepare_seeds(SF_DIR, int(rep))  # build input before any timed run
    rates = {}
    for cpus in (lo, hi):
        env = dict(os.environ,
                   RAY_GRAFT_CPUS=str(cpus),
                   GRAFT_REPLICATE=rep)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        rates[cpus] = {
            "sec": r["queries"]["frontier"],
            "urls": r["frontier_urls"],
            "urls_per_sec": r["frontier_urls_per_sec"],
        }
    eff = (rates[hi]["urls_per_sec"] / rates[lo]["urls_per_sec"]) / (hi / lo)
    print(json.dumps({
        "metric": "frontier scaling efficiency %d->%d cpus" % (lo, hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "runs": rates,
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
