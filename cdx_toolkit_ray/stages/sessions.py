"""Gap-based sessionization over an event stream.

The classic weblog / interaction-log window operator: events of one
user belong to the same session while consecutive gaps stay within
``gap_us``; a larger gap opens a new session. Ray Data has no ordered
window-function operator, so this composes the engine's hash exchange
with a vectorized multi-user kernel: bucket by ``hash(user) % B``
(every user's events co-locate in ONE merge task — the partitioning
assumption, same contract as the as-of join), one lexsort per bucket,
then the session boundaries, indices and per-session aggregates all
fall out of run-length passes. No per-user Python, no per-row Python.

Skew note: a single pathological user costs one task O(events(user)
log events(user)) — the same bound any PARTITION BY window engine
pays; salt-split is NOT applicable (sessions are order-dependent
within a user).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import _mix64
from .exchange import hash_bucket_apply


def sessionize(ds: ray.data.Dataset, *, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_us: int = 30 * 60 * 1_000_000,
               level: str = "session",
               num_buckets: int = 32) -> ray.data.Dataset:
    """Assign gap-based sessions.

    ``level="session"`` -> one row per (user, session):
    ``(user_id, session_idx, n_events, t_start_us, t_end_us)``.
    ``level="event"`` -> one row per event:
    ``(event_id, user_id, session_idx, ts_us)``.
    ``session_idx`` counts from 0 per user in ``(ts, event_id)``
    order; ties on ts break by ascending event id (deterministic under
    any parallelism).
    """
    if level not in ("session", "event"):
        raise ValueError("level must be 'session' or 'event'")
    nb = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_ub", pa.array((_mix64(u.astype(np.uint64)) % nb)
                            .astype(np.int64)))

    keyed = ds.select_columns([id_col, user_col, ts_col]).map_batches(
        add_bucket, batch_format="pyarrow", batch_size=None)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = tbl[user_col].to_numpy(zero_copy_only=False)
        ts = tbl[ts_col].to_numpy(zero_copy_only=False)
        ts = ts.astype("datetime64[us]").view(np.int64) \
            if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = tbl[id_col].to_numpy(zero_copy_only=False)
        n = len(u)
        if not n:
            if level == "session":
                return pa.table({
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "t_start_us": pa.array([], pa.int64()),
                    "t_end_us": pa.array([], pa.int64())})
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64())})
        order = np.lexsort((ev, ts, u))
        us, tss, evs = u[order], ts[order], ev[order]
        new_user = np.ones(n, bool)
        new_user[1:] = us[1:] != us[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (tss[1:] - tss[:-1]) > gap_us
        sess_run = np.cumsum(new_sess) - 1            # global in bucket
        user_run = np.cumsum(new_user) - 1
        # session_idx = this session's global run id minus the user's
        # FIRST session run id
        first_run_of_user = sess_run[np.flatnonzero(new_user)]
        sidx = sess_run - first_run_of_user[user_run]
        if level == "event":
            return pa.table({
                "event_id": pa.array(evs, pa.int64()),
                "user_id": pa.array(us, pa.int64()),
                "session_idx": pa.array(sidx, pa.int64()),
                "ts_us": pa.array(tss, pa.int64())})
        starts = np.flatnonzero(new_sess)
        n_events = np.diff(np.append(starts, n))
        return pa.table({
            "user_id": pa.array(us[starts], pa.int64()),
            "session_idx": pa.array(sidx[starts], pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64)),
            "t_start_us": pa.array(tss[starts], pa.int64()),
            "t_end_us": pa.array(tss[np.append(starts[1:], n) - 1],
                                 pa.int64())})

    return hash_bucket_apply(keyed, "_ub", per_bucket,
                             num_buckets=num_buckets)


def rolling_sum(ds: ray.data.Dataset, *, user_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                value_col: str = "value", window: int = 5,
                num_buckets: int = 32) -> ray.data.Dataset:
    """Per-key moving-window aggregate: for every event, the sum and
    count of the last ``window`` rows (inclusive) of its user in
    ``(ts, event_id)`` order — SQL's ``SUM(...) OVER (PARTITION BY user
    ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Values are carried as integer cents (``round_half_away(v * 100)``)
    so the windowed sums are order-exact and SQL-checkable. Same
    partitioning contract as ``sessionize`` (user-bucket exchange, one
    lexsort + prefix-sum pass per bucket — the per-user reset is a
    clamp of the window start to the user's first row, no per-user
    Python).
    """
    nb = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count:
            raise ValueError(
                "rolling_sum: %r contains nulls — a NaN->int64 cast is "
                "undefined and would silently corrupt every window "
                "after it; filter or impute upstream" % value_col)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f" and np.isnan(v).any():
            raise ValueError(
                "rolling_sum: %r contains NaN — integer-exactness "
                "contract requires finite values" % value_col)
        cents = np.where(v >= 0, np.floor(v * 100.0 + 0.5),
                         np.ceil(v * 100.0 - 0.5)).astype(np.int64)
        batch = batch.select([id_col, user_col, ts_col])
        batch = batch.append_column("_cents", pa.array(cents))
        return batch.append_column(
            "_ub", pa.array((_mix64(u.astype(np.uint64)) % nb)
                            .astype(np.int64)))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=None)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = tbl[user_col].to_numpy(zero_copy_only=False)
        ts = tbl[ts_col].to_numpy(zero_copy_only=False)
        ts = ts.astype("datetime64[us]").view(np.int64) \
            if ts.dtype.kind == "M" else ts.astype(np.int64)
        ev = tbl[id_col].to_numpy(zero_copy_only=False)
        cents = tbl["_cents"].to_numpy(zero_copy_only=False)
        n = len(u)
        if not n:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "roll_sum_cents": pa.array([], pa.int64()),
                "roll_n": pa.array([], pa.int64())})
        order = np.lexsort((ev, ts, u))
        us, tss, evs, cs_ = u[order], ts[order], ev[order], cents[order]
        new_user = np.ones(n, bool)
        new_user[1:] = us[1:] != us[:-1]
        ustart = np.flatnonzero(new_user)
        user_run = np.cumsum(new_user) - 1
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - window + 1, ustart[user_run])
        prefix = np.cumsum(cs_)
        # sum(lo..i) = prefix[i] - prefix[lo-1]; when lo spans back
        # into a previous user the clamp above prevents it
        roll = prefix - np.where(lo > 0, prefix[lo - 1], 0)
        return pa.table({
            "event_id": pa.array(evs, pa.int64()),
            "user_id": pa.array(us, pa.int64()),
            "ts_us": pa.array(tss, pa.int64()),
            "roll_sum_cents": pa.array(roll, pa.int64()),
            "roll_n": pa.array(idx - lo + 1, pa.int64())})

    return hash_bucket_apply(keyed, "_ub", per_bucket,
                              num_buckets=num_buckets)


def event_spikes(ds: ray.data.Dataset, *, ts_col: str = "ts",
                 type_col: str = "event_type", spike_num: int = 3,
                 spike_den: int = 2, trail: int = 3,
                 num_buckets: int = 8) -> ray.data.Dataset:
    """Burst detection over the event stream: bucket events into
    tumbling 1-hour windows per type, then flag windows whose count
    exceeds ``spike_num/spike_den`` times the MEAN of the previous
    ``trail`` observed windows (integer cross-multiplication:
    ``cnt * trail * den > num * trailing_sum``; the first ``trail``
    windows of a type have no complete baseline and are never spikes).
    "Observed" = preceding windows that had at least one event, in
    window order — the standard ROWS-window semantics so the SQL
    oracle (SUM OVER ... ROWS BETWEEN) matches exactly.

    Dataflow: map-side fold to (type, window, count) partials —
    the shuffle moves one row per distinct window per block — then ONE
    type-keyed exchange computes every type's trailing sums in a
    single vectorized prefix-sum pass (no per-type Python).
    """
    import pyarrow.compute as pc

    from ..canon import hash64_batch

    nbu = np.uint64(num_buckets)

    part_sch = pa.schema([("_tb", pa.int64()), ("event_type", pa.string()),
                          ("win", pa.string()), ("cnt", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_sch.empty_table()
        win = pc.strftime(pc.floor_temporal(batch[ts_col], unit="hour"),
                          format="%Y%m%d%H")
        t = pa.table({"event_type": batch[type_col], "win": win})
        g = t.group_by(["event_type", "win"]).aggregate([([], "count_all")])
        tb = (hash64_batch(g["event_type"].combine_chunks())
              % nbu).astype(np.int64)
        return pa.table({
            "_tb": pa.array(tb, pa.int64()),
            "event_type": g["event_type"].cast(pa.string()),
            "win": g["win"].cast(pa.string()),
            "cnt": g["count_all"].cast(pa.int64()),
        })

    out_sch = pa.schema([("event_type", pa.string()), ("win", pa.string()),
                         ("cnt", pa.int64()), ("trailing_cnt", pa.int64()),
                         ("spike", pa.bool_())])

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_sch.empty_table()
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        win = tbl["win"].to_numpy(zero_copy_only=False)
        c = tbl["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((win, et))
        et, win, c = et[order], win[order], c[order]
        new = np.ones(len(et), bool)
        new[1:] = (et[1:] != et[:-1]) | (win[1:] != win[:-1])
        starts = np.flatnonzero(new)
        cnt = np.add.reduceat(c, starts)
        et, win = et[starts], win[starts]
        tnew = np.ones(len(et), bool)
        tnew[1:] = et[1:] != et[:-1]
        # trailing sum of the previous `trail` rows within each type:
        # one prefix-sum pass, window start clamped to the type's first
        # row (the rolling_sum kernel's shape)
        idx = np.arange(len(et))
        tstart = np.maximum.accumulate(np.where(tnew, idx, 0))
        ps = np.concatenate([[0], np.cumsum(cnt)])
        lo = np.maximum(idx - trail, tstart)
        trailing = ps[idx] - ps[lo]
        full = (idx - tstart) >= trail
        spike = full & (cnt * trail * spike_den
                        > spike_num * trailing)
        return pa.table({
            "event_type": pa.array(et, pa.string()),
            "win": pa.array(win, pa.string()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "trailing_cnt": pa.array(trailing.astype(np.int64), pa.int64()),
            "spike": pa.array(spike),
        })

    from .exchange import hash_bucket_apply

    partials = ds.select_columns([ts_col, type_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    return hash_bucket_apply(partials, "_tb", merge,
                             num_buckets=num_buckets)


def json_props_rollup(ds: ray.data.Dataset, *, json_col: str = "props",
                      field: str = "k", type_col: str = "event_type"
                      ) -> ray.data.Dataset:
    """Semi-structured extraction + rollup: pull an integer field out
    of a JSON string column (the nested-field companion of the S3/S4
    wire decoders, sources/wire.py — event streams ship properties as
    JSON blobs) and aggregate per type: ``(event_type, n_events,
    k_sum, k_min, k_max, n_missing)``.

    The extraction is vectorized (polars ``str.json_path_match`` —
    native JSON parsing, no per-row Python); blocks fold to one
    partial row per type before a tiny groupby. Missing / non-numeric
    fields count into ``n_missing`` and are excluded from the sums.
    """
    import pyarrow.compute as _pc  # noqa: F401 (module convention)

    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        sch = pa.schema([(type_col, pa.string()), ("n_events", pa.int64()),
                         ("k_sum", pa.int64()), ("k_min", pa.int64()),
                         ("k_max", pa.int64()), ("n_missing", pa.int64())])
        if batch.num_rows == 0:
            return sch.empty_table()
        df = (pl.DataFrame({
                  "t": pl.from_arrow(batch[type_col].combine_chunks()
                                     .cast(pa.string())),
                  "j": pl.from_arrow(batch[json_col].combine_chunks()
                                     .cast(pa.string())),
              })
              .with_columns(k=pl.col("j")
                            .str.json_path_match("$." + field)
                            .cast(pl.Int64, strict=False))
              .group_by("t")
              .agg(n_events=pl.len().cast(pl.Int64),
                   k_sum=pl.col("k").sum().fill_null(0).cast(pl.Int64),
                   k_min=pl.col("k").min().cast(pl.Int64),
                   k_max=pl.col("k").max().cast(pl.Int64),
                   n_missing=pl.col("k").is_null().sum()
                   .cast(pl.Int64)))
        return df.rename({"t": type_col}).to_arrow().cast(sch)

    parts = ds.select_columns([type_col, json_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    agg = parts.groupby(type_col).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("k_sum", alias_name="k_sum"),
        Min("k_min", alias_name="k_min"),
        Max("k_max", alias_name="k_max"),
        Sum("n_missing", alias_name="n_missing"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            type_col: batch[type_col].cast(pa.string()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "k_sum": batch["k_sum"].cast(pa.int64()),
            "k_min": batch["k_min"].cast(pa.int64()),
            "k_max": batch["k_max"].cast(pa.int64()),
            "n_missing": batch["n_missing"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)
