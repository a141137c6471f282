#!/usr/bin/env python
"""Web-graph macro analysis over a crawled page table: the session of
measurements a crawl team runs before spending budget — Broder
bow-tie map, ball sizes / effective diameter, link-spam triage and
greedy seed selection, all from the same harvested link stream.

    python examples/graph_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

from cdx_toolkit_ray import fixtures
from cdx_toolkit_ray.stages.balls import (graph_report,
                                          greedy_seed_cover,
                                          hyperball)
from cdx_toolkit_ray.stages.links import extract_links
from cdx_toolkit_ray.stages.scc import bowtie, with_intrahost_backlinks

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

paths = fixtures.generate("/tmp/cdxray_example_fix", n_pages=800,
                          seed=42)
pages = ray.data.read_parquet(paths["pages"], columns=["url", "text"])
links = extract_links(pages)

# 1. Broder bow-tie over the navigation graph (intra-host links
#    bidirectional): where do seeds need to sit?
bt = bowtie(with_intrahost_backlinks(links)).to_pandas()
print("bow-tie:", bt.component.value_counts().to_dict())

# 2. distance structure of the raw directed graph
print("report (permille):",
      dict(graph_report(links, radius=3).to_pandas().values))

# 3. HyperBall ball-size estimates (the constant-memory scale path)
hb = hyperball(links, radius=3, p=9).to_pandas()
print("hyperball: %d nodes, max ball_est %d" % (len(hb),
                                                hb.ball_est.max()))

# 4. greedy max-cover: the 5 seeds that reach the most pages in 2 hops
print("seed cover:")
print(greedy_seed_cover(links, k=5, radius=2).to_pandas()
      .to_string(index=False))

ray.shutdown()
