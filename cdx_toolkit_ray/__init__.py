"""cdx_toolkit_ray — a Ray-Data-native crawl-frontier / CDX query engine.

A from-scratch re-expression of cocrawler/cdx_toolkit's query and
data-processing capabilities as streaming ``ray.data.Dataset``
pipelines over Parquet tables of Common-Crawl-style pages, plus the
frontier/scheduler layer (SURT canonicalization, sharded URL-seen set,
per-host politeness with a deterministic virtual clock) and
training-data operators (dedup family, ANN, text analysis).
"""

__version__ = "0.1.0"

import os as _os

# One polars thread per process. Ray workers run 1-CPU tasks, but
# polars (used by our canonicalizer AND by Ray Data's own sort/groupby
# reduce path) sizes its Rust thread pool to the MACHINE's cores at
# first import — 32 workers x 32 threads thrashed a 32-core box with
# ~1000 runnable threads (measured: intermittent 3-5x slowdowns of
# whole pipeline runs). Setting it here covers every process that
# imports this package before touching polars; bench.py and the test
# fixture also export it before ray.init so plain shuffle workers
# inherit it too.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

# Keep Arrow's jemalloc pool from returning dirty pages to the OS
# between batches: the sandbox VM re-faults returned pages at
# ~8-30 MB/s (BASELINE.md "Sandbox memory-fault tax"), so page churn
# inside a worker costs far more than the retained RSS. Harmless on a
# normal host; skipped when the build has no jemalloc pool.
try:
    import pyarrow as _pa

    _pa.jemalloc_set_decay_ms(3_600_000)
except (ImportError, NotImplementedError):  # pragma: no cover
    pass

from .canon import surt, hash64, Canonicalizer  # noqa: F401
from .filters import compile_filters, FilterStage  # noqa: F401
from .api import CDXFetcher  # noqa: F401
