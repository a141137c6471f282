"""Gap-based sessionization vs DuckDB window functions."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from cdx_toolkit_ray.stages.sessions import sessionize

pytestmark = pytest.mark.usefixtures("ray_session")

GAP_US = 10 * 60 * 1_000_000  # 10 minutes


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(9)
    rows = []
    eid = 0
    base = np.datetime64("2024-03-01T00:00:00", "us")
    for user in range(12):
        t = base + np.timedelta64(int(rng.integers(0, 3600)), "s")
        for _ in range(int(rng.integers(1, 40))):
            rows.append({"event_id": eid, "user_id": user,
                         "ts": pd.Timestamp(t)})
            eid += 1
            # mix of intra-session gaps and session-breaking gaps
            step = int(rng.choice([5, 60, 300, 1200, 7200]))
            t = t + np.timedelta64(step, "s")
    # tie-break case: two events at the identical timestamp
    rows.append({"event_id": eid, "user_id": 0,
                 "ts": rows[0]["ts"]})
    return pd.DataFrame(rows)


def test_session_level_matches_sql(events):
    got = sessionize(ray.data.from_pandas(events), gap_us=GAP_US,
                     num_buckets=5).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", events)
    want = con.execute(f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
      FROM o)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS t_start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS t_end_us
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
""").df().astype({c: "int64" for c in
                  ("user_id", "session_idx", "n_events",
                   "t_start_us", "t_end_us")}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("user_id")["session_idx"].min() == 0).all()


def test_event_level_consistent_with_session_level(events):
    ev = sessionize(ray.data.from_pandas(events), gap_us=GAP_US,
                    level="event").to_pandas()
    se = sessionize(ray.data.from_pandas(events), gap_us=GAP_US,
                    level="session").to_pandas()
    roll = ev.groupby(["user_id", "session_idx"]).agg(
        n_events=("event_id", "size"), t_start_us=("ts_us", "min"),
        t_end_us=("ts_us", "max")).reset_index()
    merged = roll.merge(se, on=["user_id", "session_idx"],
                        suffixes=("_ev", "_se"))
    assert len(merged) == len(se) == len(roll)
    for c in ("n_events", "t_start_us", "t_end_us"):
        assert (merged[c + "_ev"] == merged[c + "_se"]).all()
    # every event appears exactly once
    assert ev["event_id"].is_unique and len(ev) == len(events)


def test_bad_level_raises(events):
    with pytest.raises(ValueError):
        sessionize(ray.data.from_pandas(events), level="nope")


def test_rolling_sum_rejects_null_and_nan_values(events):
    """NaN->int64 is undefined and would silently corrupt every window
    after it — the stage must fail loudly (ADVICE regression)."""
    from cdx_toolkit_ray.stages.sessions import rolling_sum

    ev = events.copy()
    ev["value"] = 1.0
    ev.loc[ev.index[3], "value"] = np.nan
    with pytest.raises(Exception, match="rolling_sum"):
        rolling_sum(ray.data.from_pandas(ev), window=3,
                    num_buckets=2).materialize()


def test_rolling_sum_matches_sql(events):
    from cdx_toolkit_ray.stages.sessions import rolling_sum

    rng = np.random.default_rng(4)
    ev = events.copy()
    ev["value"] = rng.uniform(-50, 50, len(ev)).round(2)
    got = rolling_sum(ray.data.from_pandas(ev), window=3,
                      num_buckets=4).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum_cents,
       CAST(count(*) OVER w AS BIGINT) AS roll_n
FROM (SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY event_id""").df().astype(
        {c: "int64" for c in ("event_id", "user_id", "ts_us",
                              "roll_sum_cents", "roll_n")}) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["roll_n"].max() == 3 and got["roll_n"].min() == 1


def test_event_spikes_reference():
    import pandas as pd

    from cdx_toolkit_ray.stages.sessions import event_spikes

    # one event per hour baseline, then a 10-event burst at hour 8
    rows = []
    for h in range(8):
        rows.append({"ts": pd.Timestamp(2023, 1, 1, h),
                     "event_type": "a"})
    for _ in range(10):
        rows.append({"ts": pd.Timestamp(2023, 1, 1, 8, 30),
                     "event_type": "a"})
    # a second type with too few windows for a baseline
    rows.append({"ts": pd.Timestamp(2023, 1, 1, 0), "event_type": "b"})
    rows.append({"ts": pd.Timestamp(2023, 1, 1, 1), "event_type": "b"})
    df = pd.DataFrame(rows)
    got = event_spikes(ray.data.from_pandas(df).repartition(4),
                       num_buckets=3).to_pandas() \
        .set_index(["event_type", "win"]).sort_index()
    a8 = got.loc[("a", "2023010108")]
    assert a8.cnt == 10 and a8.trailing_cnt == 3 and bool(a8.spike)
    # steady hours are not spikes; early hours lack a baseline
    assert not got.loc[("a", "2023010103")].spike  # 1 vs mean 1
    assert not got.loc[("a", "2023010101")].spike  # incomplete baseline
    assert not got.loc[("b", "2023010101")].spike


def test_json_props_rollup_missing_and_malformed():
    import pandas as pd

    from cdx_toolkit_ray.stages.sessions import json_props_rollup

    df = pd.DataFrame({
        "event_type": ["a", "a", "a", "b", "b"],
        "props": ['{"k": 5}', '{"k": 7}', '{"other": 1}',
                  'not json at all', '{"k": -3}'],
    })
    got = json_props_rollup(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("event_type")
    a = got.loc["a"]
    assert tuple(a[["n_events", "k_sum", "k_min", "k_max",
                    "n_missing"]]) == (3, 12, 5, 7, 1)
    b = got.loc["b"]
    assert tuple(b[["n_events", "k_sum", "k_min", "k_max",
                    "n_missing"]]) == (2, -3, -3, -3, 1)
