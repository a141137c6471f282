"""Retry/backoff policy (T2), host-failure seen set (T3), collinfo TTL
memo (T4), and row sampling (O6) — reference semantics:
cdx_toolkit/myrequests.py:10-21,63-65,94-157, commoncrawl.py:42-70."""

import pytest
import ray.data

from cdx_toolkit_ray.retry import (
    RETRYABLE_STATUSES,
    HostSeenSet,
    RetryPolicy,
    RetryState,
    make_status_classifier,
    minimum_interval_for,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_retryable_set_and_intervals():
    assert RETRYABLE_STATUSES == {429, 500, 502, 503, 504, 509}
    assert minimum_interval_for("index.commoncrawl.org") == 1.0
    assert minimum_interval_for("data.commoncrawl.org") == 0.55
    assert minimum_interval_for("web.archive.org") == 6.0
    assert minimum_interval_for("unknown.example") == 3.0


def test_backoff_schedule_doubles_and_caps():
    p = RetryPolicy(minimum_interval=3.0)
    assert p.backoff_schedule(6) == [6.0, 12.0, 24.0, 48.0, 60.0, 60.0]
    p = RetryPolicy(minimum_interval=0.55)
    sched = p.backoff_schedule(8)
    assert sched[0] == pytest.approx(1.1)
    assert sched[-1] == 60.0


def test_classification_branches():
    p = RetryPolicy()
    assert p.classify(503) == "retry"
    assert p.classify(200) == "ok"
    assert p.classify(301) == "ok"
    assert p.classify(404, cdx=True) == "no_captures"
    assert p.classify(400, cdx=True) == "no_captures"
    assert p.classify(404, allow404=True) == "ok"
    assert p.classify(404) == "invalid"
    assert p.classify(403) == "error"


def test_retry_state_sequence():
    st = RetryState(RetryPolicy(minimum_interval=1.0))
    acts = [st.on_status(503), st.on_status(500), st.on_status(429),
            st.on_status(200)]
    assert [a for a, _ in acts] == ["retry", "retry", "retry", "ok"]
    assert [s for _, s in acts] == [2.0, 4.0, 8.0, 0.0]
    assert st.retries == 3


def test_connection_error_budget_and_dns():
    p = RetryPolicy(warn_after=2, error_after=4)
    st = RetryState(p)
    # DNS failure of a never-seen host is fatal immediately
    assert st.on_connection_error("new.example", is_dns=True)[0] \
        == "invalid_host"
    st.seen.mark_seen("new.example")
    assert st.on_connection_error("new.example", is_dns=True)[0] == "retry"
    # budget: error past error_after, warnings in between
    for _ in range(3):
        act, sleep = st.on_connection_error("new.example")
        assert act == "retry" and sleep == 60.0
    assert st.warnings > 0
    assert st.on_connection_error("new.example")[0] == "error"


def test_host_seen_set_defaults():
    s = HostSeenSet()
    assert not s.dns_fatal("web.archive.org")
    assert s.dns_fatal("brand-new.example")
    s.mark_seen("brand-new.example")
    assert not s.dns_fatal("brand-new.example")


def test_status_classifier_batch():
    import pyarrow as pa

    fn = make_status_classifier(RetryPolicy(minimum_interval=3.0),
                                max_retries=5)
    out = fn(pa.table({"status": ["200", "503", "404", "-", "403"]}))
    assert out["fetch_action"].to_pylist() == \
        ["ok", "retry", "invalid", "invalid", "error"]
    assert out["retry_budget_ms"].to_pylist() == [0, 150000, 0, 0, 0]


def test_partition_listing_ttl(fixture_dir):
    from cdx_toolkit_ray.sources import captures as cap
    from cdx_toolkit_ray.sources.captures import list_crawl_partitions

    root = fixture_dir["captures"]
    cap._PARTITIONS_CACHE.pop(root, None)  # isolate from other tests
    first = list_crawl_partitions(root, now=1000.0)
    assert first
    # within TTL: memo answers (even for a now-empty dir it would)
    assert list_crawl_partitions(root, now=1000.0 + 86000) is first
    # past TTL: re-scan produces a fresh dict
    fresh = list_crawl_partitions(root, now=1000.0 + 90000)
    assert fresh == first and fresh is not first


def test_random_sample_and_hash_sample():
    """O6: Dataset.random_sample for the uniform draw; the catalog's
    hash-band sample for the deterministic scale path."""
    from cdx_toolkit_ray.queries import q_row_sample

    ds = ray.data.range(10_000)
    n = ds.random_sample(0.1, seed=7).count()
    assert 600 < n < 1400
    out = q_row_sample("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    # deterministic: same rows on every run
    out2 = q_row_sample("/root/testdata/sf0.001").to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_parse_retry_after_forms():
    import pyarrow as pa

    from cdx_toolkit_ray.retry import parse_retry_after_batch

    b = pa.table({"retry_after": pa.array(
        ["120", "0", "Wed, 21 Oct 2015 07:28:00 GMT", "soon",
         None, "12x"], pa.string())})
    out = parse_retry_after_batch(b, now_ms=1_000_000,
                                  default_ms=60_000)
    assert out["next_allowed_ms"].to_pylist() == [
        1_120_000, 1_000_000, 1445412480000,
        1_060_000, 1_060_000, 1_060_000]
    assert out["retry_after_form"].to_pylist() == [
        "delta", "delta", "date", None, None, None]
    empty = b.slice(0, 0)
    assert parse_retry_after_batch(empty).num_rows == 0
