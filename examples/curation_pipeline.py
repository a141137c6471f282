#!/usr/bin/env python
"""The web-corpus curation loop end-to-end over the synthetic
documents table: host-level quality blocklist -> duplicate-line
removal over the survivors -> kept-lines gate -> token-budget mixture
by source. Every stage is an oracle-checked operator
(queries.q_corpus_pipeline chains the same stages as one
hash-verified composite); this script runs them individually so each
intermediate is visible.

    python examples/curation_pipeline.py [sf_dir]
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

import numpy as np
import pyarrow as pa

from cdx_toolkit_ray import queries as Q
from cdx_toolkit_ray.stages.hosts import (filter_blocked_hosts,
                                          host_quality_stats)
from cdx_toolkit_ray.stages.lines import dedup_lines

docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                             columns=["doc_id", "source", "text"])
n0 = docs.count()


def prep(batch: pa.Table) -> pa.Table:
    import polars as pl

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    source = batch["source"].to_numpy(zero_copy_only=False).astype(str)
    www = np.where((doc_id // 100) % 2 == 0, "www.", "")
    host = np.char.add(np.char.add(www.astype(str), source), ".example")
    s = pl.Series(batch["text"].combine_chunks()).cast(pl.String) \
        .fill_null("").str.to_lowercase().str.count_matches(r"\w+")
    return pa.table({
        "doc_id": batch["doc_id"], "source": batch["source"],
        "host": pa.array(host.tolist(), pa.string()),
        "score": s.cast(pl.Int64).to_arrow(), "text": batch["text"],
    })


prepped = docs.map_batches(prep, batch_format="pyarrow",
                           batch_size=None)
stats = host_quality_stats(prepped, host_col="host",
                           score_col="score")
sdf = stats.to_pandas()
print("hosts: %d, blocked: %d" % (len(sdf), sdf.blocked.sum()))

kept = filter_blocked_hosts(prepped, stats, host_col="host")
n1 = kept.count()
print("docs: %d -> %d after host blocklist" % (n0, n1))

wrapped = kept.map_batches(Q._wrap3_batch, batch_format="pyarrow",
                           batch_size=None)
clean = dedup_lines(wrapped, keep_cols=("source",)).to_pandas()
print("lines: %d -> %d after duplicate-line removal"
      % (clean.n_lines.sum(), clean.n_kept.sum()))

mixed = Q.q_corpus_pipeline(SF).to_pandas()
print("final mixture: %d docs, %d tokens across %d sources"
      % (len(mixed), mixed.n_tok.sum(), mixed.source.nunique()))

ray.shutdown()
