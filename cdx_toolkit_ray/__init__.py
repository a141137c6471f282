"""cdx_toolkit_ray — a Ray-Data-native crawl-frontier / CDX query engine.

A from-scratch re-expression of cocrawler/cdx_toolkit's query and
data-processing capabilities as streaming ``ray.data.Dataset``
pipelines over Parquet tables of Common-Crawl-style pages, plus the
frontier/scheduler layer (SURT canonicalization, sharded URL-seen set,
per-host politeness with a deterministic virtual clock) and
training-data operators (dedup family, ANN, text analysis).
"""

__version__ = "0.1.0"

from .canon import surt, hash64, Canonicalizer  # noqa: F401
from .filters import compile_filters, FilterStage  # noqa: F401
from .api import CDXFetcher  # noqa: F401
