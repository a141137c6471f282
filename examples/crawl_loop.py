#!/usr/bin/env python
"""The full crawl loop, resumable and polite: seeds -> politeness
slots -> fetch (fault-injected transport) -> harvest outlinks from the
fetched text -> next wave. This is the composition the reference
leaves to its users (iterate, fetch obj.content, feed new URLs back);
here it is one driver call with lineage-tracked wave partitions —
rerunning the script skips every finished wave.

    python examples/crawl_loop.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

from cdx_toolkit_ray import fixtures
from cdx_toolkit_ray.pipelines.crawl import run_crawl

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cdxray_example_crawl"
paths = fixtures.generate("/tmp/cdxray_example_fix", n_pages=800, seed=42)

summary = run_crawl(
    paths["pages"], out_dir,
    max_waves=3,                 # BFS depth budget
    max_attempts=3,              # RetryPolicy attempt budget per URL
    robots_path=paths["robots"],  # per-host crawl-delay + disallow
    default_delay_ms=1000,       # hosts robots does not list
)

print("skipped waves (already on disk):", summary["skipped_waves"])
print("fetched waves this run:        ", summary["ran_waves"])
for wave, c in sorted(summary["counters"].items()):
    print("  wave %s: %5d fetched, %5d ok" % (wave, c["rows"], c["ok"]))
print("output partitions under", out_dir,
      "(rerun me: every wave above is skipped)")

ray.shutdown()
