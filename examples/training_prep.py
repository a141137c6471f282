#!/usr/bin/env python
"""End-to-end training-batch preparation over the documents table:
Gopher quality gate -> exact dedup -> chunk -> pack (the composite
the `training_prep` catalog query runs), written as partitioned
Parquet.

    python examples/training_prep.py [sf_dir] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

from cdx_toolkit_ray.queries import q_training_prep

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cdxray_training_prep"

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

packed = q_training_prep(sf_dir)
packed.write_parquet(out)
n = ray.data.read_parquet(out).count()
print("wrote", n, "packed chunk assignments to", out)
ray.shutdown()
