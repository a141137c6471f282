"""Deterministic synthetic crawl-corpus generator (FIXTURES.md).

Writes the crawl-specific tables the engine's tests and benchmarks run
over — ``pages``, hive-partitioned ``captures``, ``seeds``, ``robots``,
``crawl_list`` — with a fixed seed and no wall-clock reads, so every
run (and the serial oracle) sees byte-identical inputs.

Shape requirements (FIXTURES.md §1-5):
* url mix: http/https, with/without ``www.``, shuffled query-param
  order, duplicates differing only in canonicalization, skewed hosts
  (a couple of hosts hold ~half the rows)
* ``html`` binary includes invalid-UTF-8 runs in ~5% of rows and
  ``text == html.decode('utf-8', errors='replace')`` (the per-row
  invariant, reference cdx_toolkit/__init__.py:130-134)
* captures span >=4 crawls over >=2 years, rows ascending
  (urlkey, timestamp) within each crawl partition
  (reference README.md:243-252)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas
from .planner import crawl_to_end_time
from .canon import surt
from .timeutils import time_to_timestamp

CRAWLS = ["CC-MAIN-2022-05", "CC-MAIN-2022-40", "CC-MAIN-2023-14", "CC-MAIN-2023-50"]

# ~half of all rows land on the first two (hot) hosts — frontier skew.
HOSTS = [
    ("big-portal.example", 0.30),
    ("news-hub.example", 0.20),
    ("shop.example", 0.12),
    ("blog-alpha.example", 0.10),
    ("wiki-beta.example", 0.08),
    ("forum-gamma.example", 0.07),
    ("docs-delta.example", 0.06),
    ("mail-epsilon.example", 0.04),
    ("tiny-one.example", 0.02),
    ("tiny-two.example", 0.01),
]

DELAYS_MS = [550, 1000, 3000, 6000]
LANGS = ["eng", "deu", "fra", "spa", None]


def _make_url(rng: np.random.RandomState, host: str, page_id: int) -> str:
    scheme = "https" if rng.rand() < 0.7 else "http"
    www = "www." if rng.rand() < 0.4 else ""
    path = "/p/%d" % page_id if rng.rand() < 0.8 else "/"
    if rng.rand() < 0.3:
        q = ["a=%d" % (page_id % 7), "b=%d" % (page_id % 3)]
        if rng.rand() < 0.5:
            q.reverse()
        path += "?" + "&".join(q)
    return "%s://%s%s%s" % (scheme, www, host, path)


def _make_html(rng: np.random.RandomState, url: str, i: int) -> bytes:
    body = (
        "<html><head><title>page %d</title></head><body>"
        "<p>deterministic content for %s row %d</p>"
        "<a href='/p/%d'>next</a></body></html>" % (i, url, i, (i + 1) % 997)
    )
    raw = body.encode("utf-8")
    if rng.rand() < 0.05:
        # splice an invalid-UTF-8 run to exercise errors='replace'
        cut = len(raw) // 2
        raw = raw[:cut] + bytes([0xFF, 0xFE, 0x80, 0xC3]) + raw[cut:]
    return raw


def generate(root: str, n_pages: int = 1000, seed: int = 42) -> dict[str, str]:
    """Write all fixture tables under ``root``; returns name->path map."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)

    host_names = [h for h, _ in HOSTS]
    host_p = np.array([p for _, p in HOSTS])
    host_p = host_p / host_p.sum()

    crawl_ends = {c: crawl_to_end_time(c) for c in CRAWLS}

    # --- pages -----------------------------------------------------------
    host_idx = rng.choice(len(host_names), size=n_pages, p=host_p)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_pages):
        host = host_names[host_idx[i]]
        page_id = int(rng.randint(0, max(10, n_pages // 3)))
        url = _make_url(rng, host, page_id)
        crawl = CRAWLS[int(rng.randint(0, len(CRAWLS)))]
        end = crawl_ends[crawl]
        ts_s = end - float(rng.randint(1, 45 * 86400))  # within ~45d before end
        html = _make_html(rng, url, i)
        urls.append(url)
        tss.append(int(ts_s * 1_000_000))
        htmls.append(html)
        texts.append(html.decode("utf-8", errors="replace"))
        langs.append(LANGS[int(rng.randint(0, len(LANGS)))])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=schemas.PAGES,
    )
    pages_path = os.path.join(root, "pages.parquet")
    pq.write_table(pages, pages_path)

    # --- captures (hive-partitioned by crawl) ----------------------------
    cap_root = os.path.join(root, "captures")
    statuses = ["200", "200", "200", "301", "404", "-"]
    rows_by_crawl: dict[str, list[dict]] = {c: [] for c in CRAWLS}
    for i in range(n_pages):
        url = urls[i]
        ts_s = tss[i] / 1_000_000.0
        # assign the capture to the crawl whose window contains warc_ts
        crawl = min(
            (c for c in CRAWLS if crawl_ends[c] >= ts_s),
            key=lambda c: crawl_ends[c],
            default=CRAWLS[-1],
        )
        status = statuses[int(rng.randint(0, len(statuses)))]
        digest = hashlib.sha1(htmls[i]).hexdigest()[:32].upper()
        rec = {
            "urlkey": surt(url),
            "timestamp": time_to_timestamp(ts_s),
            "url": url,
            "mime": "warc/revisit" if status == "-" else "text/html",
            "mime_detected": "text/html",
            "status": status,
            "digest": digest,
            "length": len(htmls[i]),
            "offset": int(rng.randint(0, 1 << 30)),
            "filename": "crawl-data/%s/segments/%06d/warc/%06d.warc.gz"
                        % (crawl, i % 100, i),
            "redirect": ("https://%s/" % host_names[host_idx[i]])
                        if status == "301" else None,
            "languages": langs[i],
            "encoding": "UTF-8" if rng.rand() < 0.9 else None,
        }
        rows_by_crawl[crawl].append(rec)

    for crawl, rows in rows_by_crawl.items():
        rows.sort(key=lambda r: (r["urlkey"], r["timestamp"]))
        part_dir = os.path.join(cap_root, "crawl=%s" % crawl)
        os.makedirs(part_dir, exist_ok=True)
        cols = {name: [r[name] for r in rows] for name in schemas.CAPTURES.names}
        t = pa.table(cols, schema=schemas.CAPTURES)
        pq.write_table(t, os.path.join(part_dir, "part-0.parquet"))

    # --- seeds -----------------------------------------------------------
    n_seeds = max(20, n_pages // 2)
    seed_urls = [urls[int(rng.randint(0, n_pages))] for _ in range(n_seeds - 5)]
    seed_urls += ["https://unknown-%d.example/" % k for k in range(5)]
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "priority": pa.array(
                rng.randint(0, 4, size=len(seed_urls)).astype(np.int32)),
            "seed_order": pa.array(np.arange(len(seed_urls), dtype=np.int64)),
        },
        schema=schemas.SEEDS,
    )
    seeds_path = os.path.join(root, "seeds.parquet")
    pq.write_table(seeds, seeds_path)

    # --- robots ----------------------------------------------------------
    all_hosts = host_names + ["unknown-%d.example" % k for k in range(5)]
    robots = pa.table(
        {
            "host": pa.array(all_hosts, pa.string()),
            "crawl_delay_ms": pa.array(
                [DELAYS_MS[i % len(DELAYS_MS)] for i in range(len(all_hosts))],
                pa.int64(),
            ),
            "disallow": pa.array(
                [["/private", "/tmp"] if i % 3 == 0 else [] for i in range(len(all_hosts))],
                pa.list_(pa.string()),
            ),
        },
        schema=schemas.ROBOTS,
    )
    robots_path = os.path.join(root, "robots.parquet")
    pq.write_table(robots, robots_path)

    # --- crawl_list ------------------------------------------------------
    crawl_list = pa.table(
        {
            "crawl": pa.array(CRAWLS, pa.string()),
            "cdx_api": pa.array(
                ["https://index.example/%s-index" % c for c in CRAWLS], pa.string()),
            "end_ts": pa.array(
                [int(crawl_ends[c] * 1_000_000) for c in CRAWLS],
                pa.timestamp("us", tz="UTC"),
            ),
        },
        schema=schemas.CRAWL_LIST,
    )
    crawl_list_path = os.path.join(root, "crawl_list.parquet")
    pq.write_table(crawl_list, crawl_list_path)

    return {
        "pages": pages_path,
        "captures": cap_root,
        "seeds": seeds_path,
        "robots": robots_path,
        "crawl_list": crawl_list_path,
    }


if __name__ == "__main__":  # pragma: no cover
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cdx_fixtures"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    print(generate(out, n_pages=n))
