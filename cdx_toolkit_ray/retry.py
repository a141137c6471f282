"""Status-classified retry/backoff policy + host-failure seen set.

Re-expresses the reference's request-loop control state (T2/T3,
cocrawler/cdx_toolkit cdx_toolkit/myrequests.py:10-21, 63-65, 94-157)
as data-plane objects the engine can apply WITHOUT wall-clock sleeps:

* the retryable status set {429, 500, 502, 503, 504, 509}
  (myrequests.py:111-123) and the cdx/allow404 giving-up rules
  (myrequests.py:101-110)
* exponential backoff: first sleep = 2 x minimum_interval, doubling,
  capped at ``retry_max_sec`` = 60 (myrequests.py:95, 121-122)
* the connection-error budget: warn past 10, hard error past 100
  (myrequests.py:63-65, 147-151)
* the previously-seen-hostname set deciding whether a DNS failure is
  fatal (myrequests.py:10-21: fail fast only for never-seen hosts)

In this engine the sleeps are VIRTUAL (the politeness scheduler owns
the clock), so ``RetryState`` returns the seconds a serial client
would have slept; pipelines budget them, tests assert them, and no
worker ever blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: statuses the reference retries with backoff (myrequests.py:111)
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504, 509})

#: per-host politeness intervals, seconds (myrequests.py:23-40)
MINIMUM_INTERVALS = {
    "default": 3.0,
    "index.commoncrawl.org": 1.0,
    "data.commoncrawl.org": 0.55,
    "web.archive.org": 6.0,
}


def minimum_interval_for(hostname: str | None) -> float:
    return MINIMUM_INTERVALS.get(hostname or "",
                                 MINIMUM_INTERVALS["default"])


class HostSeenSet:
    """T3: hosts that have answered before. A DNS failure for a host
    never seen is fatal immediately; for a seen host it is retried like
    any connection error (myrequests.py:10-21, 128-140)."""

    #: the reference's pre-seeded known-good hosts (myrequests.py:10-14)
    DEFAULT_SEED = ("commoncrawl.s3.amazonaws.com",
                    "data.commoncrawl.org",
                    "web.archive.org")

    def __init__(self, seed=DEFAULT_SEED):
        self._seen = set(seed)

    def dns_fatal(self, hostname: str) -> bool:
        return hostname not in self._seen

    def mark_seen(self, hostname: str) -> None:
        self._seen.add(hostname)

    def __contains__(self, hostname: str) -> bool:
        return hostname in self._seen


class RetryPolicy:
    """The classification + backoff constants, frozen at construction
    (compile-once; share one instance per actor)."""

    def __init__(self, minimum_interval: float = 3.0,
                 retry_max_sec: float = 60.0,
                 warn_after: int = 10, error_after: int = 100):
        self.minimum_interval = float(minimum_interval)
        self.retry_max_sec = float(retry_max_sec)
        self.warn_after = int(warn_after)
        self.error_after = int(error_after)

    def classify(self, status: int, *, cdx: bool = False,
                 allow404: bool = False) -> str:
        """One status -> action, the reference's branch order
        (myrequests.py:101-124):

        * ``'no_captures'`` — cdx 400/404 (empty result, not an error)
        * ``'ok'``          — 2xx/3xx, or 404 with allow404
        * ``'retry'``       — the retryable set
        * ``'invalid'``     — other 400/404 (bad url)
        * ``'error'``       — anything else (raise_for_status parity)
        """
        if cdx and status in (400, 404):
            return "no_captures"
        if allow404 and status == 404:
            return "ok"
        if status in RETRYABLE_STATUSES:
            return "retry"
        if status in (400, 404):
            return "invalid"
        if 200 <= status < 400:
            return "ok"
        return "error"

    def backoff_schedule(self, n: int) -> list[float]:
        """Virtual sleeps for the first ``n`` retries: 2i, 4i, 8i ...
        capped at ``retry_max_sec`` (myrequests.py:95, 121-122)."""
        out = []
        sec = 2.0 * self.minimum_interval
        for _ in range(n):
            out.append(min(sec, self.retry_max_sec))
            sec = min(sec * 2.0, self.retry_max_sec)
        return out


class RetryState:
    """Stateful controller for ONE logical request: feed it statuses /
    connection errors, get (action, virtual_sleep_sec) back. Mirrors
    the reference's while-retry loop variables (retry_sec, retries,
    connect_errors)."""

    def __init__(self, policy: RetryPolicy,
                 seen: HostSeenSet | None = None):
        self.policy = policy
        self.seen = seen or HostSeenSet()
        self.retry_sec = 2.0 * policy.minimum_interval
        self.retries = 0
        self.connect_errors = 0
        self.warnings = 0

    def on_status(self, status: int, *, cdx: bool = False,
                  allow404: bool = False) -> tuple[str, float]:
        action = self.policy.classify(status, cdx=cdx, allow404=allow404)
        if action != "retry":
            return action, 0.0
        self.retries += 1
        sleep = self.retry_sec
        self.retry_sec = min(self.retry_sec * 2.0,
                             self.policy.retry_max_sec)
        return "retry", sleep

    def on_connection_error(self, hostname: str,
                            is_dns: bool = False) -> tuple[str, float]:
        """Connection/timeout error path (myrequests.py:125-152):
        DNS failure of a never-seen host is fatal; otherwise count it,
        warn past the warning budget, fail past the error budget, and
        sleep the EXTRA-LONG retry_max_sec (myrequests.py:149)."""
        if is_dns and self.seen.dns_fatal(hostname):
            return "invalid_host", 0.0
        self.connect_errors += 1
        if self.connect_errors > self.policy.error_after:
            return "error", 0.0
        if self.connect_errors > self.policy.warn_after:
            self.warnings += 1
        sleep = self.policy.retry_max_sec
        self.retry_sec = min(self.retry_sec * 2.0,
                             self.policy.retry_max_sec)
        return "retry", sleep

    def on_success(self, hostname: str) -> None:
        self.seen.mark_seen(hostname)


def make_status_classifier(policy: RetryPolicy | None = None, *,
                           status_col: str = "status",
                           cdx: bool = False, allow404: bool = False,
                           max_retries: int = 5):
    """map_batches fn: classify each capture row's HTTP status with the
    policy and budget its virtual backoff.

    Appends ``fetch_action:string`` (ok / retry / no_captures / invalid
    / error) and ``retry_budget_ms:int64`` = total virtual backoff a
    serial client would spend before giving up after ``max_retries``
    attempts (0 for non-retryable rows). Vectorized: statuses factorize
    to a small code table, one classify call per DISTINCT status.
    """
    policy = policy or RetryPolicy()
    budget_ms = int(round(sum(policy.backoff_schedule(max_retries)) * 1000))

    def classify_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch[status_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(s)
        acts = np.empty(len(uniq), dtype=object)
        buds = np.zeros(len(uniq), dtype=np.int64)
        for i, v in enumerate(uniq):
            try:
                st = int(v)
            except (TypeError, ValueError):  # '-' revisit etc.
                acts[i] = "invalid"
                continue
            acts[i] = policy.classify(st, cdx=cdx, allow404=allow404)
            if acts[i] == "retry":
                buds[i] = budget_ms
        batch = batch.append_column(
            "fetch_action", pa.array(acts[codes], pa.string()))
        return batch.append_column(
            "retry_budget_ms", pa.array(buds[codes], pa.int64()))

    return classify_batch


def parse_retry_after_batch(batch, *, header_col: str = "retry_after",
                            now_ms: int = 0,
                            default_ms: int = 60_000):
    """RFC 9110 §10.2.3 ``Retry-After`` parsing -> absolute
    next-allowed time. Servers send either form: delta-seconds
    (``"120"``) or an IMF-fixdate (``"Wed, 21 Oct 2015 07:28:00
    GMT"``); the reference's backoff loop ignores the header entirely
    (myrequests.py:94-157 doubles blindly) — honoring it is what a
    429/503 actually asks for.

    Output appends ``next_allowed_ms`` (epoch ms; absent/unparseable
    headers fall back to ``now_ms + default_ms`` — the blind-backoff
    default) and ``retry_after_form`` in {'delta', 'date', null}.
    One vectorized polars pass (digit-form regex + strptime).
    """
    import os

    import pyarrow as pa

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if batch.num_rows == 0:
        batch = batch.append_column("next_allowed_ms",
                                    pa.array([], pa.int64()))
        return batch.append_column("retry_after_form",
                                   pa.array([], pa.string()))
    h = pl.from_arrow(batch[header_col].combine_chunks()
                      .cast(pa.string()))
    df = pl.DataFrame({"h": h})
    is_delta = pl.col("h").str.contains(r"^[0-9]+$")
    date_ms = (pl.col("h")
               .str.strptime(pl.Datetime("ms"),
                             "%a, %d %b %Y %H:%M:%S GMT", strict=False)
               .dt.epoch("ms"))
    out = df.select(
        form=pl.when(is_delta).then(pl.lit("delta"))
        .when(date_ms.is_not_null()).then(pl.lit("date"))
        .otherwise(None),
        next_ms=pl.when(is_delta)
        .then(pl.lit(now_ms, pl.Int64)
              + pl.col("h").cast(pl.Int64, strict=False) * 1000)
        .when(date_ms.is_not_null()).then(date_ms)
        .otherwise(pl.lit(now_ms + default_ms, pl.Int64)))
    t = out.to_arrow()
    batch = batch.append_column("next_allowed_ms",
                                t["next_ms"].cast(pa.int64()))
    return batch.append_column("retry_after_form",
                               t["form"].cast(pa.string()))
