"""Record / replay cassette for the fetch transport — the engine's
analog of the reference's record-then-mock HTTP test harness
(cocrawler/cdx_toolkit tests/conftest.py:56-114: live responses are
recorded once, later runs replay them offline).

``record_cassette`` drives any transport (typically
:class:`~cdx_toolkit_ray.pipelines.httpfetch.HttpTransport`) serially
on the DRIVER over a bounded request table, capturing every
(request, attempt) -> status draw plus the final ok bodies into one
Parquet file. Recording is deliberately serial and driver-side — it
is a fixture-authoring step over test-sized inputs, exactly like the
reference's recording mode, never a crawl path.

``ReplayTransport`` then serves that cassette inside the DISTRIBUTED
fetch loop: it implements the injectable transport protocol, loads
the cassette once per actor (column-pruned read in ``__init__``-time
lazy load, the TableTransport idiom), and answers ``statuses`` /
``payloads`` from the recording. ``strict=True`` (default) raises on
any (request, attempt) the cassette never saw — the reference mock's
unknown-URL error — so a drifted schedule fails loudly instead of
silently fabricating responses.

Cassette schema (one Parquet file):
    kind:int8 (0 = status draw, 1 = final body)
    fetch_id:int64, url:string, attempt:int64, status:int64,
    body:string (null on status rows)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["record_cassette", "ReplayTransport"]


def record_cassette(requests: pa.Table, transport, out_path: str, *,
                    max_attempts: int = 3,
                    minimum_interval: float = 3.0,
                    id_col: str = "seed_order",
                    url_col: str = "url",
                    cdx: bool = False,
                    allow404: bool = False) -> str:
    """Serially drive ``transport`` over ``requests`` with the
    reference retry policy and write the cassette Parquet.

    Returns ``out_path``. The recorded attempt sequence is exactly
    what :class:`~cdx_toolkit_ray.pipelines.fetch.FetchExecutor`
    would draw (first non-retry classification finalizes; retries
    stop at ``max_attempts``), so a replayed ``fetch_execute`` with
    the same policy reproduces the run bit for bit.
    """
    import pyarrow.parquet as pq

    from ..retry import RetryPolicy

    policy = RetryPolicy(minimum_interval=minimum_interval)
    ids = requests[id_col].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # replay keys pack (fetch_id << 8) | attempt into one int64 —
    # out-of-range values would silently collide (ADVICE r4)
    if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 55)):
        raise ValueError(
            "record_cassette: %s values must satisfy 0 <= id < 2**55 "
            "(replay keys pack (id << 8) | attempt into int64)"
            % id_col)
    if not 0 < max_attempts <= 256:
        raise ValueError(
            "record_cassette: max_attempts must be in 1..256 "
            "(the attempt index packs into 8 bits of the replay key)")
    needs_urls = getattr(transport, "needs_urls", False)
    if needs_urls and url_col not in requests.column_names:
        raise ValueError(
            "record_cassette: transport %s needs urls but the request "
            "table has no %r column" % (type(transport).__name__,
                                        url_col))
    urls = (requests[url_col].to_pylist()
            if url_col in requests.column_names else [None] * len(ids))

    if needs_urls:
        transport.begin_batch(ids, urls)

    r_kind, r_id, r_url, r_att, r_st = [], [], [], [], []
    ok_ids = []
    for i, d in enumerate(ids.tolist()):
        for k in range(max_attempts):
            st = int(transport.statuses(np.array([d], np.int64), k)[0])
            r_kind.append(0)
            r_id.append(d)
            r_url.append(urls[i])
            r_att.append(k)
            r_st.append(st)
            act = policy.classify(st, cdx=cdx, allow404=allow404)
            if act != "retry":
                if act == "ok":
                    ok_ids.append(d)
                break
    bodies = transport.payloads(np.array(ok_ids, np.int64)) \
        if ok_ids else pa.array([], pa.string())
    body_col = ([None] * len(r_kind)) + bodies.to_pylist()
    tbl = pa.table({
        "kind": pa.array(r_kind + [1] * len(ok_ids), pa.int8()),
        "fetch_id": pa.array(r_id + ok_ids, pa.int64()),
        "url": pa.array(r_url + [None] * len(ok_ids), pa.string()),
        "attempt": pa.array(r_att + [-1] * len(ok_ids), pa.int64()),
        "status": pa.array(r_st + [-1] * len(ok_ids), pa.int64()),
        "body": pa.array(body_col, pa.string()),
    })
    pq.write_table(tbl, out_path)
    return out_path


class ReplayTransport:
    """Serve a recorded cassette through the fetch-transport protocol.

    One instance per fetch actor; the cassette loads lazily once
    (column-pruned) and answers from two sorted numpy probes — no
    per-row Python in the distributed path beyond the dict-free
    searchsorted lookups.
    """

    def __init__(self, cassette_path: str, strict: bool = True):
        self.cassette_path = cassette_path
        self.strict = strict
        self._keys = None      # sorted (id << 8 | attempt) composites
        self._st = None
        self._body_ids = None
        self._bodies = None

    def _load(self) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(self.cassette_path,
                          columns=["kind", "fetch_id", "attempt",
                                   "status", "body"])
        kind = t["kind"].to_numpy(zero_copy_only=False)
        fid = t["fetch_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        att = t["attempt"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        st = t["status"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = kind == 0
        # same packing contract as record_cassette (ADVICE r4): a
        # corrupt/hand-edited cassette must fail loudly, not collide
        if s.any() and (fid[s].min() < 0 or fid[s].max() >= (1 << 55)
                        or att[s].min() < 0 or att[s].max() > 255):
            raise ValueError(
                "ReplayTransport: cassette %s holds fetch_id/attempt "
                "outside the packable range (0 <= id < 2**55, "
                "0 <= attempt < 256)" % self.cassette_path)
        keys = (fid[s] << np.int64(8)) | att[s]
        order = np.argsort(keys)
        self._keys = keys[order]
        self._st = st[s][order]
        b = kind == 1
        bid = fid[b]
        border = np.argsort(bid, kind="stable")
        self._body_ids = bid[border]
        self._bodies = t["body"].combine_chunks() \
            .filter(pa.array(b)).take(pa.array(border))

    def statuses(self, ids: np.ndarray, attempt: int) -> np.ndarray:
        if self._keys is None:
            self._load()
        want = (ids.astype(np.int64) << np.int64(8)) | np.int64(attempt)
        pos = np.searchsorted(self._keys, want)
        pos_c = np.clip(pos, 0, max(len(self._keys) - 1, 0))
        hit = (self._keys[pos_c] == want) if len(self._keys) else \
            np.zeros(len(ids), bool)
        if self.strict and not hit.all():
            missing = ids[~hit].tolist()
            raise KeyError(
                "ReplayTransport: cassette has no recording for "
                "requests %r at attempt %d (schedule drifted from "
                "the recording?)" % (missing[:5], attempt))
        out = np.where(hit, self._st[pos_c] if len(self._keys)
                       else 0, 404)
        return out.astype(np.int64)

    def payloads(self, ids: np.ndarray) -> pa.Array:
        if self._keys is None:
            self._load()
        ids = ids.astype(np.int64)
        pos = np.searchsorted(self._body_ids, ids)
        pos_c = np.clip(pos, 0, max(len(self._body_ids) - 1, 0))
        hit = (self._body_ids[pos_c] == ids) if len(self._body_ids) \
            else np.zeros(len(ids), bool)
        if self.strict and not hit.all():
            raise KeyError(
                "ReplayTransport: cassette has no body for %r"
                % ids[~hit].tolist()[:5])
        taken = self._bodies.take(
            pa.array(np.where(hit, pos_c, -1),
                     mask=~hit)) if len(self._body_ids) else \
            pa.array([None] * len(ids), pa.string())
        return taken
