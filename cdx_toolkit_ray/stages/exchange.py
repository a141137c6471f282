"""Direct task-graph exchange: barrier-light shuffle for narrow streams.

Ray Data's ``sort`` / ``groupby`` operators are the right tool when the
shuffled payload is a large fraction of the input, but each one costs a
boundary-sampling round plus two executor barriers — a fixed ~2-4 s on
this engine's post-dedup survivor streams (measured: the flagship's
politeness groupby + final order sort added ~6 s of wall at 8 CPUs for
a 593k-row / ~80 MB stream whose actual kernel work is <0.5 s).

This module implements the same two-round shuffle as a direct Ray task
graph (the pattern already proven by the first-wins winner combine,
dedup.py): a SPLIT round partitions each input block into per-bucket
slices (single argsort pass, ``num_returns`` slices per task), a MERGE
round concatenates and reduces each bucket. No sampling round for the
hash exchange; the range exchange derives its boundaries from samples
the merge round returns as a side output — the driver only ever sees
O(num_buckets x sample) keys, never rows.

Scale contract: rounds are O(blocks + buckets) tasks and the driver
holds only object refs + samples, so the pattern scales exactly like
the executor shuffle it replaces; use it when per-job fixed latency
matters (the scheduling tail of a much larger pipeline), and prefer
``Dataset.sort`` when the stream is itself the dominant cost and you
want the executor's spill/backpressure machinery.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import ray


def _split_by_code(tbl: pa.Table, codes: np.ndarray, n: int):
    """Partition ``tbl`` into ``n`` slices by int bucket codes: one
    stable argsort + take, then zero-copy slices (``n`` filter scans
    would read the block ``n`` times)."""
    order = np.argsort(codes, kind="stable")
    t = tbl.take(pa.array(order))
    bounds = np.searchsorted(codes[order], np.arange(n + 1))
    return [t.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(n)]


def _as_arrow(tbl) -> pa.Table:
    """Some upstreams (pandas-block map_groups stages) hand
    ``to_arrow_refs`` pandas blocks; coerce worker-side."""
    if isinstance(tbl, pa.Table):
        return tbl
    return pa.Table.from_pandas(tbl, preserve_index=False)


@ray.remote
def _nrows(tbl) -> int:
    return tbl.num_rows if isinstance(tbl, pa.Table) else len(tbl)


@ray.remote
def _split_hash(bucket_col: str, nb: int, *tbls):
    # a map_batches stage that filters a block to zero rows can emit a
    # SCHEMA-LESS empty block (no bucket column); it carries no rows,
    # so it splits into nb empties rather than aborting the exchange
    live = [_as_arrow(t) for t in tbls]
    live = [t for t in live
            if t.num_rows or bucket_col in t.column_names]
    if not live:
        empty = pa.table({})
        return empty if nb == 1 else tuple([empty] * nb)
    tbl = pa.concat_tables(live, promote_options="permissive")
    codes = tbl[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
    slices = _split_by_code(tbl, codes, nb)
    # with num_returns=1 Ray returns the value as-is — a 1-tuple here
    # would reach the merge side unexploded
    return slices[0] if nb == 1 else tuple(slices)


@ray.remote
def _merge_bucket(merge_fn, sample_col, sample_every: int, *tbls):
    """Concat one bucket's slices, apply ``merge_fn``, and (optionally)
    return every ``sample_every``-th value of ``sample_col`` as the
    boundary-sample side output for a downstream range exchange."""
    t = pa.concat_tables([x for x in tbls if x.num_rows] or [tbls[0]],
                         promote_options="permissive")
    t = merge_fn(t)
    if sample_col is None:
        return t, None
    v = t[sample_col].to_numpy(zero_copy_only=False)
    return t, np.sort(v)[::max(sample_every, 1)].copy()


@ray.remote
def _split_range(sort_col: str, bounds: np.ndarray, tbl: pa.Table):
    v = tbl[sort_col].to_numpy(zero_copy_only=False)
    codes = np.searchsorted(bounds, v, side="right")
    slices = _split_by_code(tbl, codes, len(bounds) + 1)
    return slices[0] if len(slices) == 1 else tuple(slices)


@ray.remote
def _merge_range(sort_col: str, drop_sort_col: bool, *tbls):
    t = pa.concat_tables([x for x in tbls if x.num_rows] or [tbls[0]],
                         promote_options="permissive")
    v = t[sort_col].to_numpy(zero_copy_only=False)
    t = t.take(pa.array(np.argsort(v, kind="stable")))
    return t.drop_columns([sort_col]) if drop_sort_col else t


def _cluster_cpus() -> int:
    return (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)


def _chunked(refs: Sequence, max_tasks: int | None = None):
    if max_tasks is None:
        # one split task per CPU (min 8 so small clusters still
        # parallelize the fetches); more tasks than CPUs only
        # multiplies per-object scheduling cost
        max_tasks = min(32, max(8, _cluster_cpus()))
    chunk = max(1, (len(refs) + max_tasks - 1) // max_tasks)
    return [refs[i:i + chunk] for i in range(0, len(refs), chunk)]


#: direct-task-graph budget: a materialized input above this falls back
#: to the executor groupby (spill/backpressure machinery) instead of
#: holding the whole stream as task-graph refs. The contract ("narrow /
#: post-reduction streams only") is enforced, not advisory.
EXCHANGE_BYTES_BUDGET = 2 << 30


def hash_bucket_apply(ds: ray.data.Dataset, bucket_col: str,
                      merge_fn: Callable[[pa.Table], pa.Table], *,
                      num_buckets: int = 64,
                      sort_col: str | None = None,
                      num_ranges: int | None = None,
                      sample_every: int = 64,
                      drop_sort_col: bool = False,
                      bytes_budget: int = EXCHANGE_BYTES_BUDGET
                      ) -> ray.data.Dataset:
    """Group-apply + (optional) global range sort as one task graph.

    Every row whose ``bucket_col`` matches lands in exactly one MERGE
    task, which runs ``merge_fn`` over the whole group-set — identical
    semantics to ``groupby(bucket_col).map_groups(merge_fn)`` for
    kernels (like the politeness scheduler) that handle multiple
    groups per call. With ``sort_col`` set, a second range exchange
    leaves the result globally ordered by that column (equivalent to a
    trailing ``Dataset.sort(sort_col)``), with range boundaries from
    merge-side samples.

    Executes eagerly (the task graph needs materialized input blocks);
    the input should be the narrow/post-reduction stream of a pipeline,
    not its raw input. A stream over ``bytes_budget`` falls back to the
    executor ``groupby().map_groups()`` path (same rows, executor
    spill/backpressure instead of object-store pressure).
    """
    mat = ds.materialize()
    if bytes_budget is not None and \
            (mat.size_bytes() or 0) > bytes_budget:
        import logging

        logging.getLogger(__name__).warning(
            "hash_bucket_apply input is %.1f MB (> %.1f MB budget): "
            "falling back to the executor groupby path — this exchange "
            "is for narrow/post-reduction streams",
            (mat.size_bytes() or 0) / 1e6, bytes_budget / 1e6)
        out = mat.groupby(bucket_col).map_groups(
            merge_fn, batch_format="pyarrow")
        if sort_col is not None:
            out = out.sort(sort_col)
            if drop_sort_col:
                out = out.drop_columns([sort_col])
        return out
    refs = mat.to_arrow_refs()
    # upstream Filter/map stages emit schema-less zero-row blocks that
    # would poison pa.concat_tables — drop them (worker-side row-count
    # probe; blocks stay in the object store)
    counts = ray.get([_nrows.remote(r) for r in refs])
    refs = [r for r, n in zip(refs, counts) if n]
    if not refs:
        # empty input: run merge_fn once over an empty typed table so
        # the OUTPUT schema (what downstream select_columns sees) is
        # merge_fn's, not the input's
        try:
            empty = mat.schema().base_schema.empty_table()
            return ray.data.from_arrow(merge_fn(empty))
        except Exception:
            return mat

    nb = num_buckets
    splits = [_split_hash.options(num_returns=nb).remote(bucket_col, nb, *g)
              for g in _chunked(refs)]
    if nb == 1:  # num_returns=1 collapses the tuple
        splits = [[s] for s in splits]
    merged = [_merge_bucket.options(num_returns=2).remote(
        merge_fn, sort_col, sample_every, *[sp[b] for sp in splits])
        for b in range(nb)]
    bucket_refs = [m[0] for m in merged]
    if sort_col is None:
        return ray.data.from_arrow_refs(bucket_refs)

    samples = [s for s in ray.get([m[1] for m in merged])
               if s is not None and len(s)]
    nr = num_ranges or max(4, min(_cluster_cpus(), len(refs)))
    if samples:
        alls = np.sort(np.concatenate(samples))
        qs = np.linspace(0, len(alls) - 1, nr + 1)[1:-1].astype(np.int64)
        bounds = np.unique(alls[qs])
    else:
        bounds = np.zeros(0, np.int64)
    nr = len(bounds) + 1

    rsplits = [_split_range.options(num_returns=nr).remote(
        sort_col, bounds, r) for r in bucket_refs]
    if nr == 1:
        rsplits = [[s] for s in rsplits]
    out = [_merge_range.remote(sort_col, drop_sort_col,
                               *[s[r] for s in rsplits])
           for r in range(nr)]
    return ray.data.from_arrow_refs(out)
