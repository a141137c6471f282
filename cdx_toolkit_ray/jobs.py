"""``ray job submit`` entrypoint for the frontier pipeline.

north_rule: "the whole job launches via ``ray job submit`` on fixed
N-node and 4N-node clusters". On a cluster:

    ray job submit --working-dir . -- \
        python -m cdx_toolkit_ray.jobs \
            --seeds /data/seeds.parquet --robots /data/robots.parquet \
            --out /data/frontier_out --num-buckets 64

Inside a submitted job the Ray client is already wired to the cluster
(``RAY_ADDRESS`` is set by the job runtime), so ``ray.init()`` with no
address attaches to it; standalone the ``--num-cpus`` fallback starts
a local session. Either way the job is the ONE owner of its Ray
session (the library never calls init).

The run is resumable by construction (pipelines/frontier.run_frontier):
one output partition per host-hash bucket, each recorded in the
lineage manifest with its counters (fetched / deduped /
deferred-for-politeness / robots-blocked); re-submitting the same job
with unchanged inputs skips completed buckets. The job prints ONE JSON
line — ran/skipped buckets, manifest path, wall time — and exits 0.
"""

from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser


def make_parser() -> ArgumentParser:
    p = ArgumentParser(
        prog="python -m cdx_toolkit_ray.jobs",
        description="resumable crawl-frontier job (ray job submit "
                    "entrypoint); --query runs any catalog operator "
                    "instead")
    p.add_argument("--seeds",
                   help="seed URLs Parquet (url column); required "
                        "unless --query")
    p.add_argument("--robots",
                   help="robots rules Parquet; required unless --query")
    p.add_argument("--out", required=True,
                   help="output directory (partitioned Parquet + "
                        "lineage manifest)")
    p.add_argument("--query",
                   help="run this queries.QUERIES catalog entry over "
                        "--sf-dir and write the result to --out as "
                        "Parquet (every operator is cluster-runnable)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="input table directory for --query")
    p.add_argument("--num-buckets", type=int, default=8,
                   help="host-hash output partitions (default 8; size "
                        "to the cluster)")
    p.add_argument("--num-salts", type=int, default=1,
                   help="politeness sub-queues for skewed hosts")
    p.add_argument("--seen-checkpoint",
                   help="directory to checkpoint the URL-seen shards")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                   help="LOCAL fallback only; ignored under a cluster "
                        "job (RAY_ADDRESS wins)")
    p.add_argument("--bench", action="store_true",
                   help="scaling benchmark over --seeds/--robots: on a "
                        "cluster (RAY_ADDRESS) one leg at the cluster's "
                        "size; locally the lo/hi fresh-process pair. "
                        "Emits bench.py --scaling's JSON schema")
    p.add_argument("--bench-leg", action="store_true",
                   help="internal: run ONE bench leg in this session "
                        "and print its JSON")
    p.add_argument("--peer", help="with --bench on a cluster: a prior "
                                  "leg JSON file from the other cluster "
                                  "size; efficiency is computed across "
                                  "the two")
    p.add_argument("--scale-lo", type=int,
                   default=int(os.environ.get("GRAFT_SCALE_LO", "2")))
    p.add_argument("--scale-hi", type=int,
                   default=int(os.environ.get("GRAFT_SCALE_HI", "8")))
    p.add_argument("--attempts", type=int,
                   default=int(os.environ.get("GRAFT_SCALE_ATTEMPTS", "2")))
    return p


def _bench_leg(args) -> dict:
    """One scaling leg in the CURRENT Ray session: the frontier job
    over the given seeds/robots tables, with per-stage timings.

    Stage split: ``schedule`` = canonicalize + first-wins dedup +
    robots gate + politeness slots (frontier_flow consumed);
    ``ordered`` = the same plus the global crawl order (the headline —
    what urls_per_sec measures); ``resumable_write`` = the full
    run_frontier pass writing partitioned Parquet + lineage.
    """
    import tempfile
    import time as _time

    import ray

    from .pipelines.frontier import (crawl_order, frontier_flow,
                                     run_frontier)

    cpus = int(ray.cluster_resources().get("CPU", 0))
    stages: dict = {}

    t0 = _time.time()
    n_urls = frontier_flow(args.seeds, args.robots).count()
    stages["schedule"] = round(_time.time() - t0, 3)

    def ordered_once() -> tuple[float, int]:
        t = _time.time()
        n = crawl_order(frontier_flow(args.seeds, args.robots)).count()
        return _time.time() - t, n

    cold, n_ordered = ordered_once()
    warm = min(ordered_once()[0] for _ in range(2))
    stages["ordered"] = round(warm, 3)

    t0 = _time.time()
    with tempfile.TemporaryDirectory() as out:
        run_frontier(args.seeds, args.robots, out, num_buckets=8)
    stages["resumable_write"] = round(_time.time() - t0, 3)

    return {"cpus": cpus, "sec": round(warm, 3),
            "cold_sec": round(cold, 3), "urls": int(n_ordered),
            "urls_per_sec": round(n_ordered / warm, 1),
            "n_flow_rows": int(n_urls), "stages": stages}


def _bench(args) -> int:
    """The --bench driver. Cluster: one leg (submit once per cluster
    size; --peer computes the cross-size efficiency). Local: the
    bench.py --scaling protocol — interleaved fresh-process legs at
    lo/hi CPUs, best-of-attempts per config (additive host noise)."""
    import subprocess

    # "local" is not a cluster (it's this sandbox's preset): the pair
    # protocol below is the local stand-in for two cluster sizes
    if os.environ.get("RAY_ADDRESS") not in (None, "", "local"):
        import ray

        if not ray.is_initialized():
            ray.init()
        leg = _bench_leg(args)
        out = {"metric": "frontier scaling (cluster leg, %d cpus)"
                         % leg["cpus"],
               "value": None, "unit": "efficiency",
               "runs": {str(leg["cpus"]): leg},
               "estimator": "single cluster leg",
               "sf": args.seeds}
        if args.peer:
            peer = json.load(open(args.peer))
            pleg = list(peer["runs"].values())[0]
            lo, hi = sorted([pleg, leg], key=lambda r: r["cpus"])
            out["runs"] = {str(lo["cpus"]): lo, str(hi["cpus"]): hi}
            out["value"] = round(
                (hi["urls_per_sec"] / lo["urls_per_sec"])
                / (hi["cpus"] / lo["cpus"]), 3)
            out["metric"] = ("frontier scaling efficiency %d->%d cpus"
                            % (lo["cpus"], hi["cpus"]))
        print(json.dumps(out))
        return 0

    def run_leg(cpus: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        env.pop("RAY_ADDRESS", None)
        p = subprocess.run(
            [sys.executable, "-m", "cdx_toolkit_ray.jobs",
             "--bench-leg", "--seeds", args.seeds, "--robots",
             args.robots, "--out", args.out, "--num-cpus", str(cpus)],
            env=env, capture_output=True, text=True, check=True)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    runs_lo, runs_hi = [], []
    for _ in range(max(1, args.attempts)):
        runs_lo.append(run_leg(args.scale_lo))
        runs_hi.append(run_leg(args.scale_hi))
    best_lo = min(runs_lo, key=lambda r: r["sec"])
    best_hi = min(runs_hi, key=lambda r: r["sec"])
    eff = (best_hi["urls_per_sec"] / best_lo["urls_per_sec"]) \
        / (args.scale_hi / args.scale_lo)
    print(json.dumps({
        "metric": "frontier scaling efficiency %d->%d cpus"
                  % (args.scale_lo, args.scale_hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "runs": {args.scale_lo: best_lo, args.scale_hi: best_hi},
        "all_runs": {args.scale_lo: runs_lo, args.scale_hi: runs_hi},
        "estimator": "best-of-%d per config (additive host noise)"
                     % args.attempts,
        "sf": args.seeds,
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)

    if args.bench or args.bench_leg:
        if not args.seeds or not args.robots:
            print(json.dumps({"error": "--bench needs --seeds and "
                                       "--robots"}))
            return 2
        if args.bench:
            return _bench(args)

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS"):
            ray.init()  # cluster job: attach to the submitted address
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")

    if args.bench_leg:
        print(json.dumps(_bench_leg(args)))
        return 0

    if args.query:
        from .queries import QUERIES

        if args.query not in QUERIES:
            print(json.dumps({"error": "unknown query %r" % args.query,
                              "available": sorted(QUERIES)}))
            return 2
        t0 = time.time()
        res = QUERIES[args.query](args.sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.write_parquet(args.out)
            n = ray.data.read_parquet(args.out).count()
        else:  # pandas / Arrow results land as one file
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = (res if isinstance(res, pa.Table)
                   else pa.Table.from_pandas(res))
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(tbl, os.path.join(args.out, "result.parquet"))
            n = tbl.num_rows
        print(json.dumps({"query": args.query, "rows": int(n),
                          "out_dir": args.out,
                          "wall_sec": round(time.time() - t0, 3)}))
        return 0

    if not args.seeds or not args.robots:
        print(json.dumps({"error": "--seeds and --robots are required "
                                   "unless --query is given"}))
        return 2

    from .pipelines.frontier import run_frontier
    from .state.seen import ShardedSeenSet

    seen = None
    if args.seen_checkpoint:
        seen = ShardedSeenSet(num_shards=max(2, args.num_buckets // 4))
        if os.path.isdir(args.seen_checkpoint):
            seen.restore(args.seen_checkpoint)

    t0 = time.time()
    result = run_frontier(args.seeds, args.robots, args.out,
                          num_buckets=args.num_buckets,
                          num_salts=args.num_salts,
                          seen_checkpoint_dir=args.seen_checkpoint,
                          seen=seen)
    result["wall_sec"] = round(time.time() - t0, 3)
    result["out_dir"] = args.out
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
