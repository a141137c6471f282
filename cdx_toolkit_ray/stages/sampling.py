"""Deterministic corpus sampling and shuffling.

Two training-data operators the reference lacks (its only sampling is
the page-count estimate, cdx_toolkit/__init__.py:43-50 — §2 O6):

- **Stratified sampling**: keep exactly ``k`` documents per group
  (language / source / domain), chosen by a seeded hash rank so the
  draw is uniform-ish, reproducible, and independent of arrival order.
  The scale shape is local-prune-then-shuffle: every batch keeps at
  most ``k`` candidates per group before the ``groupby``, so the
  all-to-all moves O(groups x k x batches) candidate rows, never the
  corpus.

- **Deterministic sharded shuffle**: the reproducible global shuffle a
  training run needs. Each row gets a seeded hash key; ``shard = key %
  n_shards`` places it, and rank within the shard is the in-shard sort
  order by (key, id). Equivalent to a seeded ``random_shuffle`` but
  restartable (same seed -> same order), resumable per shard (each
  shard is an independent output partition), and cheaper: one balanced
  hash shuffle + per-shard sort instead of a full range sort.

Hash = FNV-1a 64 over ``"{seed}:{id}"`` (canon.hash64_batch), the same
primitive the SQL oracles replicate, so both operators value-check
against DuckDB ``row_number()`` windows. The seed is the PREFIX, not a
suffix: FNV-1a folds bytes left-to-right, so a trailing-seed change
only shifts hashes by ~seed_delta x prime and barely reorders them —
a prefix change avalanches through every subsequent byte.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _seeded_key(ids, seed: int) -> np.ndarray:
    """uint64 FNV-1a of ``"{seed}:{id}"`` — order-free, reproducible."""
    from ..canon import hash64_batch

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    import pyarrow.compute as pc

    keys = pc.binary_join_element_wise(
        str(seed), pc.cast(ids, pa.string()), ":")
    return hash64_batch(keys)


def stratified_sample(ds: ray.data.Dataset, group_col: str,
                      id_col: str = "doc_id", k: int = 10,
                      seed: int = 0) -> ray.data.Dataset:
    """Exactly min(k, group size) rows per group, the ones with the
    smallest seeded hash of ``id_col``; adds ``skey`` (the hash) and
    ``samp_rank`` (1..k within the group)."""

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["skey"] = _seeded_key(batch[id_col], seed)
        df = df.sort_values([group_col, "skey", id_col])
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k),
            preserve_index=False)

    def final_select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["skey", id_col]).head(k).copy()
        g["samp_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    pruned = ds.map_batches(local_prune, batch_format="pyarrow",
                            batch_size=None)
    return pruned.groupby(group_col).map_groups(final_select,
                                                batch_format="pandas")


def mixture_sample(ds: ray.data.Dataset, group_col: str,
                   fractions: dict[str, float], id_col: str = "doc_id",
                   default: float = 0.0, seed: int = 0
                   ) -> ray.data.Dataset:
    """Weighted domain-mixture sampling: keep each row independently
    with its group's probability — the "mix 30% web, 60% books, 10%
    code" re-weighting step of a training-data pipeline.

    Deterministic Bernoulli via the seeded hash: row kept iff
    ``skey < floor(frac * 2^64)`` (exact integer compare, so the same
    (seed, id) decision reproduces everywhere — across retries, resumed
    runs, and the SQL oracle). Groups absent from ``fractions`` keep
    ``default``. Zero shuffles: one streaming vectorized filter.

    The FNV key is passed through the splitmix64 finalizer
    (dedup._mix64): the threshold compare uses the hash's HIGH bits,
    where raw FNV-1a of short same-prefix strings (small integer ids)
    is measurably non-uniform — rank-based uses (stratified sample,
    sharded shuffle) only need relative order within a group, but a
    quantile cut needs uniformity.
    """
    from .dedup import _mix64

    lut = {g: min(int(f * 2.0 ** 64), (1 << 64) - 1)
           for g, f in fractions.items()}
    dflt = min(int(default * 2.0 ** 64), (1 << 64) - 1)

    def gate(batch: pa.Table) -> pa.Table:
        skey = _mix64(_seeded_key(batch[id_col], seed))
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        # use_na_sentinel=False: a null group gets its own code (it is
        # never in `fractions`, so it deterministically takes
        # `default`) — the sentinel -1 would fancy-index the LAST
        # group's threshold, a batch-layout-dependent wrong answer
        codes, uniq = pd.factorize(grp, sort=False,
                                   use_na_sentinel=False)
        thresh = np.array([lut.get(g, dflt) for g in uniq],
                          dtype=np.uint64)
        keep = skey < thresh[codes]
        return batch.append_column(
            "skey", pa.array(skey, pa.uint64())).filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", batch_size=None)


def sharded_shuffle(ds: ray.data.Dataset, id_col: str = "doc_id",
                    n_shards: int = 16, seed: int = 0) -> ray.data.Dataset:
    """Deterministic global shuffle: adds ``skey`` (seeded hash),
    ``shard`` (skey % n_shards) and ``shard_pos`` (0-based rank within
    the shard by (skey, id)). Reading shards 0..n-1 in shard_pos order
    is the shuffled corpus order; any shard can be re-derived alone."""

    def key_stage(batch: pa.Table) -> pa.Table:
        skey = _seeded_key(batch[id_col], seed)
        batch = batch.append_column("skey", pa.array(skey, pa.uint64()))
        return batch.append_column(
            "shard", pa.array((skey % n_shards).astype(np.int64)))

    def order_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["skey", id_col]).copy()
        g["shard_pos"] = np.arange(len(g), dtype=np.int64)
        return g

    keyed = ds.map_batches(key_stage, batch_format="pyarrow",
                           batch_size=None)
    return keyed.groupby("shard").map_groups(order_shard,
                                             batch_format="pandas")


def holdout_split(ds: ray.data.Dataset, group_col: str,
                  val_frac: float = 0.1, seed: int = 0,
                  out_col: str = "split") -> ray.data.Dataset:
    """Leakage-free train/validation split: the decision is a function
    of the GROUP (e.g. host), never the row, so all documents of a
    host land on the same side — near-duplicates within a host can't
    straddle the split and leak validation content into training.

    Deterministic: group g goes to validation iff
    ``mix64(fnv("{seed}:{g}")) < floor(val_frac * 2^64)`` (exact
    integer compare; same convention as mixture_sample so the SQL
    oracle replicates the assignment bit-for-bit). Zero shuffles —
    one streaming vectorized pass; the expected validation share is
    ``val_frac`` of GROUPS (weight by rows instead and a single hot
    host could swallow the whole budget).
    """
    if not (0.0 <= val_frac <= 1.0):
        raise ValueError("val_frac must be in [0, 1]")
    from .dedup import _mix64

    thresh = np.uint64(min(int(val_frac * 2.0 ** 64), (1 << 64) - 1))

    def tag(batch: pa.Table) -> pa.Table:
        grp = batch[group_col]
        # null groups get their own deterministic code (seeded key of
        # the null -> hash 0), never the -1 sentinel that would borrow
        # the last group's assignment batch-dependently
        codes, uniq = pd.factorize(
            grp.to_numpy(zero_copy_only=False), sort=False,
            use_na_sentinel=False)
        # factorize surfaces the null group as NaN — normalize to None
        # so the arrow conversion stays string-typed
        uniq = [None if u is None or (isinstance(u, float)
                                      and np.isnan(u)) else u
                for u in uniq]
        gkey = _mix64(_seeded_key(pa.array(uniq, pa.string()), seed))
        is_val = (gkey < thresh)[codes]
        return batch.append_column(
            out_col, pa.array(np.where(is_val, "val", "train")))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None)


def token_budget_mixture(ds: ray.data.Dataset, *,
                         source_col: str = "source",
                         id_col: str = "doc_id",
                         token_col: str = "n_tok",
                         budgets: dict | None = None,
                         seed: int = 0,
                         num_buckets: int = 32) -> ray.data.Dataset:
    """Fill each source's TOKEN budget deterministically (Dolma /
    SlimPajama-style corpus mixing): within a source, docs are taken
    in seeded-hash order ((skey, id) — an order-free shuffle) until
    the cumulative token count reaches the source's budget; the doc
    that crosses the boundary is included (concat-and-cut semantics,
    same rule as stages/chunk.pack_chunks).

    ``budgets`` maps source -> token budget (int). Output: the kept
    rows as ``(doc_id, source, n_tok, cum_before)`` where
    ``cum_before`` is the integer prefix sum of earlier kept-order
    docs — bit-stable under any parallelism, so the SQL oracle
    replicates it with one window function.

    Scale shape: one source-bucket exchange; each source's rows
    co-locate in one task for the exact prefix sum (sources are few
    and internally parallel-sorted; for a corpus where ONE source
    outgrows a task, pre-shard the source and allocate sub-budgets
    proportionally — the politeness sub-queue budget argument,
    SURVEY §4(c)). The budgets dict is O(sources) closure state.
    """
    if budgets is None:
        raise ValueError("budgets dict (source -> token budget) required")
    from ..canon import hash64_batch

    nb = np.uint64(num_buckets)

    def key_stage(batch: pa.Table) -> pa.Table:
        skey = _seeded_key(batch[id_col], seed)
        sb = (hash64_batch(batch[source_col]) % nb).astype(np.int64)
        return pa.table({
            "doc_id": batch[id_col],
            "source": batch[source_col],
            "n_tok": batch[token_col].cast(pa.int64()),
            "skey": pa.array(skey, pa.uint64()),
            "_sb": pa.array(sb),
        })

    def take_until(tbl: pa.Table) -> pa.Table:
        import polars as pl

        df = (pl.from_arrow(tbl).sort(["source", "skey", "doc_id"])
              .with_columns(cum=pl.col("n_tok").cum_sum()
                            .over("source")))
        df = df.with_columns(
            cum_before=pl.col("cum") - pl.col("n_tok"),
            budget=pl.col("source").replace_strict(
                budgets, default=0, return_dtype=pl.Int64))
        df = df.filter(pl.col("cum_before") < pl.col("budget"))
        return pa.table({
            "doc_id": df["doc_id"].to_arrow(),
            "source": df["source"].to_arrow().cast(pa.string()),
            "n_tok": df["n_tok"].to_arrow(),
            "cum_before": df["cum_before"].to_arrow().cast(pa.int64()),
        })

    from .exchange import hash_bucket_apply

    keyed = ds.select_columns([id_col, source_col, token_col]) \
        .map_batches(key_stage, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(keyed, "_sb", take_until,
                             num_buckets=num_buckets)


def temperature_mixture(ds: ray.data.Dataset, group_col: str, *,
                        budget: int, id_col: str = "doc_id",
                        seed: int = 0) -> ray.data.Dataset:
    """Temperature-based mixture sampling at tau = 2 (alpha = 1/2):
    the T5 / Gopher re-weighting rule — group g's share of a
    ``budget``-doc sample is proportional to ``sqrt(|g|)`` instead of
    ``|g|``, up-weighting small domains/languages without flattening
    to uniform. Exact integer chain: ``w_g = isqrt(n_g)`` (floor
    square root — matches SQL floor(sqrt) exactly below ~2^52 where
    the double can't misround across an integer), ``quota_g = budget
    * w_g // sum(w)`` (floor allocation), winners = the quota_g docs
    with the smallest splitmix64-finalized seeded hash (ties by id —
    the mixture_sample key, so samples are reproducible and
    decorrelated from any input order).

    Group sizes come from per-block partial counts folded to an
    O(groups) driver dict (the budget_mixture convention); selection
    is a per-group top-quota with a local per-block prune first, so
    at most ``blocks x quota`` rows reach the final exchange.
    Returns ``(id, group, skey, quota)`` for the selected docs."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    import math

    from .dedup import _mix64

    # per-block partial counts -> tiny (group, n) fold
    def part_counts(batch: pa.Table) -> pa.Table:
        g = batch[group_col].cast(pa.string()) \
            .to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(g.astype(str), return_counts=True)
        return pa.table({group_col: pa.array(vals, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = ds.select_columns([group_col]).map_batches(
        part_counts, batch_format="pyarrow", batch_size=None)
    sizes: dict[str, int] = {}
    for r in parts.groupby(group_col).sum("n").take_all():
        sizes[r[group_col]] = int(r["sum(n)"])
    w = {g: math.isqrt(n) for g, n in sizes.items()}
    sw = sum(w.values())
    quota = {g: (budget * wg // sw if sw else 0)
             for g, wg in w.items()}
    max_q = max(quota.values(), default=0)

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, group_col]).to_pandas()
        df["skey"] = _mix64(_seeded_key(batch[id_col], seed))
        df = df.sort_values([group_col, "skey", id_col])
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(max_q),
            preserve_index=False)

    def final_select(g: pd.DataFrame) -> pd.DataFrame:
        q = quota.get(str(g[group_col].iloc[0]), 0)
        g = g.sort_values(["skey", id_col]).head(q).copy()
        g["quota"] = np.int64(q)
        return g

    pruned = ds.map_batches(local_prune, batch_format="pyarrow",
                            batch_size=None)
    out = pruned.groupby(group_col).map_groups(final_select,
                                               batch_format="pandas")
    return out
