"""As-of (nearest-earlier) join — a custom operator the reference only
hints at (its time-window -> crawl bisect, commoncrawl.py:223-232, is a
plan-time as-of lookup; here it is a full data-plane operator).

Partitioning assumption (documented per the custom-operator contract):
both sides are co-located by ``hash(key) % num_buckets`` — ONE balanced
shuffle each — and every bucket is merged with a single vectorized
searchsorted pass, no Python call per key. Keys and timestamps must fit
the packed 64-bit combine: ``|key| < 2^22`` distinct-key codes per
bucket and ``0 <= ts < 2^40`` (epoch seconds do).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .exchange import hash_bucket_apply

_TS_BITS = np.int64(40)


def _mix_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(num_buckets)).astype(np.int64)


def _sided(merge, *, l_only: set | None, r_only: set):
    """Adapt a two-frame merge kernel to one exchange-bucket table.

    The unioned stream carries the SUPERSET schema, each side's missing
    columns null-filled; a whole-bucket ``to_pandas`` would promote
    int64-with-null payload columns to float64 and corrupt integer
    outputs. Split by ``_side`` and drop the other side's columns in
    ARROW first, so each side converts null-free at its true dtype.
    """
    structural = {"_k", "_ts", "_side", "_bucket"}

    def fn(tbl: pa.Table) -> pa.Table:
        cols = set(tbl.column_names)
        ro = r_only & cols
        lo = (l_only if l_only is not None
              else cols - structural - ro) & cols
        side = tbl["_side"].to_numpy(zero_copy_only=False)
        lg = tbl.drop_columns(sorted(ro)) \
            .filter(pa.array(side == 0)).to_pandas()
        rg = tbl.drop_columns(sorted(lo)) \
            .filter(pa.array(side == 1)).to_pandas()
        return pa.Table.from_pandas(merge(lg, rg), preserve_index=False)

    return fn


def asof_join_backward(left: ray.data.Dataset, right: ray.data.Dataset,
                       *, left_key: str, right_key: str,
                       left_ts: str, right_ts: str,
                       right_cols: list[str], tie_col: str | None = None,
                       num_buckets: int = 32) -> ray.data.Dataset:
    """Inner as-of join: each left row pairs with the right row of the
    same key having the greatest ``right_ts <= left_ts``. Rows with no
    earlier right row are dropped (inner semantics — no nullable
    payload columns to round-trip). Ties on ``right_ts`` within a key
    resolve deterministically to the max ``tie_col`` row.
    """
    if tie_col is None:
        tie_col = right_cols[0]

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_k": pa.array(k),
            "_ts": pa.array(batch[left_ts].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "_side": pa.array(np.zeros(len(k), np.int8)),
            "_bucket": pa.array(_mix_bucket(k, num_buckets)),
            **{c: batch[c] for c in batch.column_names
               if c not in (left_key, left_ts)},
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "_k": pa.array(k),
            "_ts": pa.array(batch[right_ts].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "_side": pa.array(np.ones(len(k), np.int8)),
            "_bucket": pa.array(_mix_bucket(k, num_buckets)),
        }
        for c in right_cols:
            out["_r_" + c] = batch[c]
        return pa.table(out)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           batch_size=None)
    both = lt.union(rt)

    r_payload = ["_r_" + c for c in right_cols]
    tie = "_r_" + tie_col

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        left_cols = [c for c in lg.columns
                     if c not in ("_side", "_bucket") and c not in r_payload]
        if not len(lg) or not len(rg):
            return pd.DataFrame({c: [] for c in
                                 [c for c in left_cols
                                  if c not in ("_k", "_ts")]
                                 + [left_key, left_ts] + right_cols})

        # dense per-bucket key codes so the 64-bit combine stays safe
        all_k = np.concatenate([lg["_k"].to_numpy(), rg["_k"].to_numpy()])
        codes, uniq = pd.factorize(all_k)
        lk = codes[:len(lg)].astype(np.int64)
        rk = codes[len(lg):].astype(np.int64)
        lts = lg["_ts"].to_numpy().astype(np.int64)
        rts = rg["_ts"].to_numpy().astype(np.int64)
        if len(uniq) >= (1 << 22) or (rts >= (1 << 40)).any() \
                or (rts < 0).any() or (lts >= (1 << 40)).any() \
                or (lts < 0).any():
            raise ValueError("asof combine out of packed range")

        # right side: sort by (key, ts, tie), keep LAST per (key, ts)
        rtie = rg[tie].to_numpy()
        r_order = np.lexsort((rtie, rts, rk))
        rk_s, rts_s = rk[r_order], rts[r_order]
        comb_r = (rk_s << _TS_BITS) | rts_s
        last = np.ones(len(comb_r), dtype=bool)
        last[:-1] = comb_r[:-1] != comb_r[1:]
        r_idx = r_order[last]
        comb_r = comb_r[last]
        rk_d = rk_s[last]

        comb_l = (lk << _TS_BITS) | lts
        pos = np.searchsorted(comb_r, comb_l, side="right") - 1
        ok = pos >= 0
        pos_c = np.maximum(pos, 0)
        ok &= rk_d[pos_c] == lk  # nearest-earlier row must share the key

        out = {}
        for c in left_cols:
            if c in ("_k", "_ts"):
                continue
            out[c] = lg[c].to_numpy()[ok]
        out[left_key] = lg["_k"].to_numpy()[ok]
        out[left_ts] = lts[ok]
        take = r_idx[pos_c[ok]]
        for c in right_cols:
            out[c] = rg["_r_" + c].to_numpy()[take]
        return pd.DataFrame(out)

    # task-graph exchange instead of groupby.map_groups (fixed-cost
    # tail, same A/B finding as lm/tfidf). The wrapper splits sides in
    # ARROW before to_pandas: the unioned superset schema carries each
    # side's missing columns as nulls, and a whole-group to_pandas
    # would promote int64-with-null payload columns to float64.
    return hash_bucket_apply(
        both, "_bucket",
        _sided(merge, l_only=None, r_only=set(r_payload)),
        num_buckets=num_buckets)


def range_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
               left_key: str, right_key: str, left_ts: str,
               right_lo: str, right_hi: str,
               right_cols: list[str],
               num_buckets: int = 32) -> ray.data.Dataset:
    """Inner range join: pairs every left row with each right row of
    the same key whose interval ``[right_lo, right_hi]`` contains
    ``left_ts``. Same partitioning contract as the as-of join (hash of
    the key, one balanced shuffle per side); within a bucket the match
    is one sorted interval-sweep per key run, vectorized with
    searchsorted over interval starts — per-pair output is the real
    work, not per-key Python.

    Overlapping intervals of one key are fully supported: for each left
    row the sweep finds the earliest candidate interval via a vectorized
    binary search over the per-key running max of ``right_hi`` (monotone
    within a key run), then emits exactly the (row, interval) pairs in
    that window — output-sensitive cost, no iteration cap, no silently
    dropped pairs. Timestamps and interval bounds must satisfy
    ``|v| < 2^39`` and each bucket must hold < 2^22 distinct keys (the
    packed 64-bit combine); violations raise ``ValueError``.
    """
    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_k": pa.array(k),
            "_ts": pa.array(batch[left_ts].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "_side": pa.array(np.zeros(len(k), np.int8)),
            "_bucket": pa.array(_mix_bucket(k, num_buckets)),
            **{c: batch[c] for c in batch.column_names
               if c not in (left_key, left_ts)},
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "_k": pa.array(k),
            "_lo": pa.array(batch[right_lo].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "_hi": pa.array(batch[right_hi].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "_side": pa.array(np.ones(len(k), np.int8)),
            "_bucket": pa.array(_mix_bucket(k, num_buckets)),
        }
        for c in right_cols:
            out["_r_" + c] = batch[c]
        return pa.table(out)

    lt = left.map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           batch_size=None)
    both = lt.union(rt)
    r_payload = ["_r_" + c for c in right_cols]

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        left_cols = [c for c in lg.columns
                     if c not in ("_side", "_bucket", "_lo", "_hi")
                     and c not in r_payload]
        empty = {c: [] for c in
                 [c for c in left_cols if c not in ("_k", "_ts")]
                 + [left_key, left_ts] + right_cols}
        if not len(lg) or not len(rg):
            return pd.DataFrame(empty)

        lk = lg["_k"].to_numpy().astype(np.int64)
        lts = lg["_ts"].to_numpy().astype(np.int64)
        rk = rg["_k"].to_numpy().astype(np.int64)
        rlo = rg["_lo"].to_numpy().astype(np.int64)
        rhi = rg["_hi"].to_numpy().astype(np.int64)
        # |v| < 2^39 so v + 2^39 fits the 40-bit ts field without
        # spilling into the key-code bits (rhi held to the same
        # contract for uniformity even though it is never packed)
        if (np.abs(rlo) >= (1 << 39)).any() \
                or (np.abs(rhi) >= (1 << 39)).any() \
                or (np.abs(lts) >= (1 << 39)).any():
            raise ValueError("range join combine out of packed range")

        # dense key codes shared by both sides
        codes, uniq = pd.factorize(np.concatenate([lk, rk]))
        if len(uniq) >= (1 << 22):
            raise ValueError("range join combine out of packed range")
        lkc = codes[:len(lk)].astype(np.int64)
        rkc = codes[len(lk):].astype(np.int64)

        r_order = np.lexsort((rlo, rkc))
        rk_s, rlo_s, rhi_s = rkc[r_order], rlo[r_order], rhi[r_order]
        comb_r = (rk_s << _TS_BITS) | (rlo_s + (1 << 39))
        comb_l = (lkc << _TS_BITS) | (lts + (1 << 39))
        # last interval (per packed order) starting at or before ts
        pos = np.searchsorted(comb_r, comb_l, side="right") - 1

        valid = pos >= 0
        pc = np.maximum(pos, 0)
        valid &= rk_s[pc] == lkc
        if not valid.any():
            return pd.DataFrame(empty)
        vpos = pc[valid]
        vts = lts[valid]

        # key runs in the sorted right side; prefix running-max of hi
        # is monotone non-decreasing within a run, so the earliest
        # candidate interval per left row is a binary-search target
        new_run = np.ones(len(rk_s), dtype=bool)
        new_run[1:] = rk_s[1:] != rk_s[:-1]
        run_id = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)
        prefix_hi = pd.Series(rhi_s).groupby(run_id).cummax().to_numpy()

        # first j in [run_start, vpos] with prefix_hi[j] >= ts
        # (vectorized lower-bound search: terminates in log2(run) steps)
        lo_b = run_start[run_id[vpos]].copy()
        hi_b = vpos + 1
        while True:
            unresolved = lo_b < hi_b
            if not unresolved.any():
                break
            mid = (lo_b + hi_b) // 2
            ge = prefix_hi[np.minimum(mid, len(prefix_hi) - 1)] >= vts
            hi_b = np.where(unresolved & ge, mid, hi_b)
            lo_b = np.where(unresolved & ~ge, mid + 1, lo_b)

        counts = np.maximum(vpos - lo_b + 1, 0)  # 0 when no hi reaches ts
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(empty)
        vrows = np.flatnonzero(valid)
        li = np.repeat(vrows, counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rj = np.repeat(lo_b, counts) + (np.arange(total)
                                        - np.repeat(cum, counts))
        # rlo_s[rj] <= ts and key equality hold by construction
        # (rj <= vpos within the same key run); only hi needs checking
        keep = rhi_s[rj] >= np.repeat(vts, counts)
        li = li[keep]
        ri = r_order[rj[keep]]

        out = {}
        for c in left_cols:
            if c in ("_k", "_ts"):
                continue
            out[c] = lg[c].to_numpy()[li]
        out[left_key] = lk[li]
        out[left_ts] = lts[li]
        for c in right_cols:
            out[c] = rg["_r_" + c].to_numpy()[ri]
        return pd.DataFrame(out)

    return hash_bucket_apply(
        both, "_bucket",
        _sided(merge, l_only=None,
               r_only=set(r_payload) | {"_lo", "_hi"}),
        num_buckets=num_buckets)
