"""Real-HTTP fetch + cassette replay, end to end on localhost.

Starts a loopback http.server with a deterministic fault schedule,
drives the distributed fetch loop through HttpTransport (retry /
backoff / dead-letter all from the oracle-proven policy), records a
cassette from the same server, and replays it OFFLINE through the
same fetch loop — the workflow for turning one live crawl sample
into a deterministic regression fixture.

Run: python examples/http_fetch_replay.py
"""

import os
import sys

import pyarrow as pa
import ray

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdx_toolkit_ray.pipelines.cassette import (  # noqa: E402
    ReplayTransport, record_cassette)
from cdx_toolkit_ray.pipelines.fetch import (  # noqa: E402
    dead_letter, fetch_execute)
from cdx_toolkit_ray.pipelines.httpfetch import (  # noqa: E402
    HttpTransport)


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4,
                 include_dashboard=False, logging_level="ERROR")
    from cdx_toolkit_ray.pipelines.httpfetch import FaultScheduleServer

    srv = FaultScheduleServer({i: "page-%d" % i for i in range(12)})
    base = srv.base_url

    ids = list(range(12))
    sched = pa.table({
        "seed_order": pa.array(ids, pa.int64()),
        "url": pa.array(["%s/p/%d" % (base, i) for i in ids],
                        pa.string()),
    })

    # live crawl through the real transport
    fetched = fetch_execute(
        ray.data.from_arrow(sched),
        HttpTransport(min_interval=0.0, timeout=10.0),
        max_attempts=3, concurrency=1, batch_size=4).materialize()
    print("live:", fetched.to_pandas()[
        ["seed_order", "final_status", "fetch_action"]]
        .to_string(index=False))
    print("dead letters:", dead_letter(fetched).count())

    # record a cassette from a FRESH server (per-id attempt counters
    # reset), then replay offline
    srv.close()
    srv2 = FaultScheduleServer({i: "page-%d" % i for i in range(12)})
    sched2 = pa.table({
        "seed_order": sched["seed_order"],
        "url": pa.array(["%s/p/%d" % (srv2.base_url, i) for i in ids],
                        pa.string())})
    cassette = record_cassette(
        sched2, HttpTransport(min_interval=0.0, timeout=10.0),
        "/tmp/example_cassette.parquet", max_attempts=3)
    srv2.close()          # server gone: replay is fully offline
    replayed = fetch_execute(
        ray.data.from_arrow(sched2), ReplayTransport(cassette),
        max_attempts=3, concurrency=2, batch_size=4)
    print("replayed ok rows:",
          replayed.filter(expr="fetch_action == 'ok'").count())
    ray.shutdown()


if __name__ == "__main__":
    main()
