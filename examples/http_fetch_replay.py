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
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import ray

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdx_toolkit_ray.pipelines.cassette import (  # noqa: E402
    ReplayTransport, record_cassette)
from cdx_toolkit_ray.pipelines.fetch import (  # noqa: E402
    FAULT_STATUSES, dead_letter, fetch_execute)
from cdx_toolkit_ray.pipelines.httpfetch import (  # noqa: E402
    HttpTransport)


class Handler(BaseHTTPRequestHandler):
    hits: dict = {}
    lock = threading.Lock()

    def do_GET(self):
        rid = int(self.path.rsplit("/", 1)[-1])
        with self.lock:
            k = self.hits.get(rid, 0)
            self.hits[rid] = k + 1
        status = int(FAULT_STATUSES[(rid + k) % len(FAULT_STATUSES)])
        body = ("page-%d" % rid).encode()
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4,
                 include_dashboard=False, logging_level="ERROR")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]

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

    # record a cassette from the (reset) server, then replay offline
    Handler.hits = {}
    cassette = record_cassette(
        sched, HttpTransport(min_interval=0.0, timeout=10.0),
        "/tmp/example_cassette.parquet", max_attempts=3)
    srv.shutdown()        # server gone: replay is fully offline
    replayed = fetch_execute(
        ray.data.from_arrow(sched), ReplayTransport(cassette),
        max_attempts=3, concurrency=2, batch_size=4)
    print("replayed ok rows:",
          replayed.filter(expr="fetch_action == 'ok'").count())
    ray.shutdown()


if __name__ == "__main__":
    main()
