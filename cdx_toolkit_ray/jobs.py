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
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS"):
            ray.init()  # cluster job: attach to the submitted address
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")

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
