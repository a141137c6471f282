"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use.

The catalog itself lives in :mod:`cdx_toolkit_ray.queries`; see that
module for the operator-by-operator mapping to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (north_rule frontier + fetch scheduler) on
    /root/testdata/sf0.001: derived seed URLs -> SURT canonicalization
    + hash64 -> vectorized first-wins dedup -> per-host politeness
    slots under the deterministic virtual clock -> global crawl order.
    """
    from cdx_toolkit_ray.queries import q_frontier_schedule

    return q_frontier_schedule("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Every returned entry has a matching ``oracle_sql()`` string.
    Approximate-by-design pipelines (HyperBall, KLL, IVF probe
    subsets, Lloyd k-means) are deliberately NOT here — they live in
    ``cdx_toolkit_ray.queries.APPROX_QUERIES`` as library surface,
    pytest-bounded against their exact hash-matched twins
    (harmonic_centrality / kll_quantiles_exact / ann_ivf_full /
    kmeans_assign), so the driver's correctness file stays free of
    no_oracle rows."""
    from cdx_toolkit_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for stateful /
    sketch pipelines -> driver's rows-only check)."""
    from cdx_toolkit_ray.queries import ORACLES, _fixture_root

    # captures_query / content_extract / wb_synthesis / media oracles
    # read deterministic generated tables from stable /tmp paths; make
    # sure they exist even if the driver runs an oracle before its Ray
    # twin
    from cdx_toolkit_ray.stages.multimodal import (fake_media_parquet,
                                                   real_media_parquet)

    _fixture_root("/root/testdata/sf0.01")
    fake_media_parquet(n=256, seed=42)
    real_media_parquet(n=128, seed=42)
    return dict(ORACLES)
