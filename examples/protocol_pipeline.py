#!/usr/bin/env python
"""The crawl-protocol chain end-to-end over the synthetic documents
table: RFC 9309 wildcard robots gate -> redirect-chain resolution
(pointer doubling / broadcast chase) -> rel=canonical alias folding
-> conditional revalidation headers. Every stage is an oracle-checked
operator (robots_wildcard / resolve_redirects / canonical_dedup /
revalidation_plan in the driver catalog); this script runs them
individually so each intermediate is visible.

    python examples/protocol_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.compute as pc  # noqa: E402
import ray.data  # noqa: E402

from cdx_toolkit_ray import queries as Q  # noqa: E402

# 1. robots: which frontier candidates may be fetched at all?
gated = Q.q_robots_wildcard(SF)
allowed = gated.filter(lambda r: r["allowed"])
n_all, n_ok = gated.count(), allowed.count()
print(f"robots gate: {n_ok}/{n_all} candidates allowed "
      f"({n_all - n_ok} blocked by wildcard rules)")

# 2. redirects: where do the allowed urls actually land?
resolved = Q.q_resolve_redirects(SF)
n_res = resolved.filter(lambda r: r["resolved"]).count()
n_exh = resolved.count() - n_res
print(f"redirects: {n_res} urls resolve, {n_exh} exhaust the hop cap "
      f"(cycles / over-long chains)")

# 3. canonical: fold alias groups before dedup
groups = Q.q_canonical_dedup(SF)
gp = groups.to_pandas()
print(f"canonical: {int(gp['n_pages'].sum())} pages fold into "
      f"{len(gp)} alias groups "
      f"(largest group: {int(gp['n_pages'].max())})")

# 4. revalidation: what does the next polite fetch send?
plan = Q.q_revalidation_plan(SF)
pp = plan.to_pandas()
due = pp[pp["due"]]
print(f"revalidation: {len(due)}/{len(pp)} pages due; sample headers: "
      f"If-None-Match: {pp.iloc[0]['etag']!r}, "
      f"If-Modified-Since: {pp.iloc[0]['if_modified_since']!r}")

ray.shutdown()
print("OK")
