"""Content extraction pipeline: captures -> content -> segmented output.

The Ray-Data re-expression of ``cdxt warc`` (cocrawler/cdx_toolkit
cdx_toolkit/cli.py:235-276 + warc.py): iterate captures, resolve each
capture's content, write size-rotated output segments. The reference
resolves content with per-record HTTP byte-range fetches
(warc.py:123-156); in this sandbox content lives in the pages table, so
resolution is a LOOKUP JOIN on ``url`` (SURVEY.md §2.4 J1):

* small pages table  -> broadcast join: ``ray.put`` the url->html map
  once, cached ``ray.get`` per worker, dict lookup per batch — no
  shuffle
* large pages table  -> hash-bucket join: both sides get
  ``bucket = hash64(url) % B``, bucket-wise merge inside map_groups

Revisit records (``mime == 'warc/revisit'``, __init__.py:101-105)
resolve to the content of their original capture — here naturally, the
pages row for the same url. 404-style misses (no pages row) are skipped
exactly like the reference's RuntimeError-404 skip (cli.py:270-273).

Output: ``SegmentedParquetWriter`` reproduces the WARC writer contract
(warc.py:159-209): size-capped segments named
``<prefix>[-<subprefix>]-NNNNNN.extracted.parquet``, an info sidecar
per run, restart-safe unique-name probing. For cluster-scale output use
``write_parquet(partition_cols=...)`` instead (resumable layout).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..sources.captures import query_captures
from ..stages.text import decode_html_batch
from .frontier import _get_broadcast


def make_content_lookup(pages_ref):
    """map_batches fn: append ``html`` (binary) by url lookup; drop
    rows with no content (the 404 skip)."""

    def content_lookup(batch: pa.Table) -> pa.Table:
        lookup = _get_broadcast(pages_ref)
        urls = batch["url"].to_numpy(zero_copy_only=False)
        payload = np.empty(len(urls), dtype=object)
        hit = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            b = lookup.get(u)
            if b is not None:
                payload[i] = b
                hit[i] = True
        batch = batch.append_column("html", pa.array(payload, pa.binary()))
        return batch.filter(pa.array(hit))

    return content_lookup


def load_pages_index(pages_path: str):
    """pages parquet -> {url: html} (the broadcast small side)."""
    t = pq.read_table(pages_path, columns=["url", "html"])
    return dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))


def fgrep_stage(url_fgrep: str | None, url_fgrepv: str | None):
    """Substring URL gates (cli.py:262-267 parity: --url-fgrep/-fgrepv)."""

    def fgrep(batch: pa.Table) -> pa.Table:
        mask = None
        if url_fgrep:
            mask = pc.match_substring(batch["url"], url_fgrep)
        if url_fgrepv:
            m = pc.invert(pc.match_substring(batch["url"], url_fgrepv))
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return fgrep


def extract_content(captures_root: str, pages_path: str, url: str | None = None,
                    url_fgrep: str | None = None, url_fgrepv: str | None = None,
                    **query_kwargs) -> ray.data.Dataset:
    """captures query -> fgrep gates -> content join -> text decode.

    Returns the lazy Dataset with ``html:binary`` and ``text:string``
    appended; ``text`` is the byte-identical utf-8/replace decode.
    """
    ds = query_captures(captures_root, url=url, **query_kwargs)
    if url_fgrep or url_fgrepv:
        ds = ds.map_batches(fgrep_stage(url_fgrep, url_fgrepv),
                            batch_format="pyarrow")
    pages_ref = ray.put(load_pages_index(pages_path))
    ds = ds.map_batches(make_content_lookup(pages_ref), batch_format="pyarrow")
    ds = ds.map_batches(decode_html_batch, batch_format="pyarrow")
    return ds


class SegmentedParquetWriter:
    """Size-rotated segment writer (warc.py:159-209 contract parity).

    * segments: ``<prefix>[-<subprefix>]-NNNNNN.extracted.parquet``
    * rotation when the open segment exceeds ``size`` bytes
    * restart-safe: probes for the first unused segment number instead
      of clobbering existing files
    * info dict written once as ``<prefix>[-<subprefix>].warcinfo.json``
      (the warcinfo-record equivalent)
    """

    def __init__(self, prefix: str, subprefix: str | None = None,
                 info: dict | None = None, size: int = 10_000_000):
        self.prefix = prefix
        self.subprefix = subprefix
        self.size = size
        self.segment = 0
        self._open_path: str | None = None
        self._writer: pq.ParquetWriter | None = None
        base = prefix + (("-" + subprefix) if subprefix else "")
        if info is not None:
            with open(base + ".warcinfo.json", "w") as fd:
                json.dump(info, fd, sort_keys=True)

    def _segment_name(self) -> str:
        while True:
            name = self.prefix
            if self.subprefix:
                name += "-" + self.subprefix
            name += "-%06d.extracted.parquet" % self.segment
            if os.path.exists(name):
                self.segment += 1
            else:
                return name

    def write_batch(self, batch: pa.Table) -> None:
        if self._writer is None:
            self._open_path = self._segment_name()
            self._writer = pq.ParquetWriter(self._open_path, batch.schema)
        self._writer.write_table(batch)
        if os.path.exists(self._open_path) and \
                os.stat(self._open_path).st_size > self.size:
            self.close_segment()

    def close_segment(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
            self.segment += 1

    def close(self) -> None:
        self.close_segment()

    def write_dataset(self, ds: ray.data.Dataset,
                      batch_size: int = 4096) -> list[str]:
        """Stream a Dataset through the rotating writer (driver-side,
        ordered — the serial-writer parity path). For distributed
        output use ``ds.write_parquet(dir, partition_cols=...)``."""
        written = []
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            before = self._open_path
            self.write_batch(batch)
            if self._open_path != before and self._open_path:
                written.append(self._open_path)
        self.close()
        return sorted(set(written))


def get_writer(prefix: str, subprefix: str | None, info: dict,
               **kwargs) -> SegmentedParquetWriter:
    """Factory parity with cdx_toolkit.warc.get_writer (warc.py:212-213)."""
    return SegmentedParquetWriter(prefix, subprefix, info, **kwargs)
