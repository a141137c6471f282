"""Fixed Arrow schemas for every table the engine reads or writes.

The reference's capture record is a dynamic dict of wire strings
(cocrawler/cdx_toolkit cdx_toolkit/__init__.py:90-154, README.md:134);
here every table has a pinned ``pyarrow.Schema`` so blocks are
zero-copy Arrow end to end. Numeric wire-string fields (length, offset)
are stored as int64 and rendered as strings only at the output edge.
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint: the frontier input table.
PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# The CDX captures index (one hive partition per crawl).
CAPTURES = pa.schema([
    ("urlkey", pa.string()),
    ("timestamp", pa.string()),          # 14-digit YYYYMMDDHHMMSS
    ("url", pa.string()),
    ("mime", pa.string()),
    ("mime_detected", pa.string()),
    ("status", pa.string()),             # '-' marks revisits
    ("digest", pa.string()),
    ("length", pa.int64()),
    ("offset", pa.int64()),
    ("filename", pa.string()),
    ("redirect", pa.string()),           # nullable dynamic fields
    ("languages", pa.string()),
    ("encoding", pa.string()),
])

SEEDS = pa.schema([
    ("url", pa.string()),
    ("priority", pa.int32()),
    ("seed_order", pa.int64()),
])

ROBOTS = pa.schema([
    ("host", pa.string()),
    ("crawl_delay_ms", pa.int64()),
    ("disallow", pa.list_(pa.string())),
])

CRAWL_LIST = pa.schema([
    ("crawl", pa.string()),
    ("cdx_api", pa.string()),
    ("end_ts", pa.timestamp("us", tz="UTC")),
])

# Frontier pipeline output: the deterministic crawl schedule.
SCHEDULE = pa.schema([
    ("url", pa.string()),
    ("urlkey", pa.string()),
    ("hash64", pa.uint64()),
    ("host", pa.string()),
    ("priority", pa.int32()),
    ("seed_order", pa.int64()),
    ("host_rank", pa.int64()),           # 0-based fetch slot within host
    ("fetch_ms", pa.int64()),            # virtual-clock fetch time
])

# Per-partition lineage manifest (resumability).
LINEAGE = pa.schema([
    ("partition_id", pa.string()),
    ("input_fingerprint", pa.string()),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
    ("fetched", pa.int64()),
    ("deduped", pa.int64()),
    ("deferred_politeness", pa.int64()),
    ("output_path", pa.string()),
    ("completed", pa.bool_()),
])
