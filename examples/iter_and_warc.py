#!/usr/bin/env python
"""The reference's examples/iter-and-warc.py composition, verbatim in
shape, against the Ray-Data engine (reference iter-and-warc.py:1-34):
iterate captures matching a URL pattern, fetch each record's content,
write size-rotated output segments.

Run (fixtures are generated deterministically under /tmp):

    python examples/iter_and_warc.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

import cdx_toolkit_ray
from cdx_toolkit_ray import fixtures
from cdx_toolkit_ray.pipelines.warcout import get_writer

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

paths = fixtures.generate("/tmp/cdxray_example_fix", n_pages=800, seed=42)
cdx = cdx_toolkit_ray.CDXFetcher(captures_root=paths["captures"],
                                 pages_path=paths["pages"])
url = "*.big-portal.example"

warcinfo = {
    "software": "cdx_toolkit_ray iter-and-warc example",
    "isPartOf": "EXAMPLE-COMMONCRAWL",
    "description": "warc extraction",
    "format": "WARC file version 1.0",
}

os.makedirs("/tmp/cdxray_example_out", exist_ok=True)
writer = get_writer("/tmp/cdxray_example_out/EXAMPLE",
                    "COMMONCRAWL", warcinfo,
                    warc_version="1.1")

# the fixture crawls span 2022-2023; without from/to the
# reference-faithful default window (1-year lookback from
# now, M16) would select nothing
for obj in cdx.iter(url, limit=10, from_ts="2022", to="2024"):
    url = obj["url"]
    status = obj["status"]
    timestamp = obj["timestamp"]

    print("considering extracting url", url, "timestamp", timestamp)
    if status != "200":
        print("  skipping because status was {}, not 200".format(status))
        continue

    try:
        record = obj.fetch_warc_record()
    except RuntimeError:
        print("  skipping capture for RuntimeError 404:", url, timestamp)
        continue
    writer.write_record(record)

    print("  wrote", url)

writer.close()
print("wrote", writer.segment, "segment(s) with prefix", writer.prefix)
ray.shutdown()
