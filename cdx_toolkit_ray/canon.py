"""SURT URL canonicalization + 64-bit hashing.

The reference consumes (never computes) the ``urlkey`` SURT field
produced by CDX servers (cocrawler/cdx_toolkit README.md:207-212:
"fields are in SURT format ... scheme dropped, www. dropped, host
reversed with commas, e.g. ``org,commoncrawl)/``").  This module is the
engine's own canonicalizer implementing that spec:

* lowercase scheme/host/path
* drop the scheme and any ``www.`` / ``www2.``-style host prefix
* reverse host labels joined by commas, then ``)``
* drop default ports (80/443), keep explicit non-default ports
* sort query parameters bytewise; drop a lone trailing ``?``
* drop fragments; strip trailing slash on the root path

Plus a 64-bit FNV-1a hash of the urlkey used as the dedup /
shard-routing key (north_rule: "SURT canonicalization + 64-bit hashing
in map_batches").

Hot path: ``canonicalize_batch`` is the vectorized per-batch kernel for
``Dataset.map_batches(batch_format='pyarrow')``; it runs the scalar
canonicalizer over a numpy object array (URL parsing does not vectorize
well in Arrow) but computes the hash vectorized.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, unquote

import numpy as np
import pyarrow as pa

_WWW_RE = re.compile(r"^www\d*\.")

_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def surt(url: str) -> str:
    """Canonical SURT urlkey for one URL.

    >>> surt('https://www.CommonCrawl.org/')
    'org,commoncrawl)/'
    >>> surt('http://example.com/Path?b=2&a=1#frag')
    'com,example)/path?a=1&b=2'
    >>> surt('https://sub.example.co.uk:8080/x')
    'uk,co,example,sub:8080)/x'
    """
    u = url.strip()
    if "://" not in u:
        u = "http://" + u
    parts = urlsplit(u)
    host = (parts.hostname or "").lower().rstrip(".")
    host = _WWW_RE.sub("", host)
    rev = ",".join(reversed(host.split("."))) if host else ""

    port = parts.port
    if port is not None and port not in (80, 443):
        rev += ":%d" % port

    path = unquote(parts.path or "/").lower()
    if path == "":
        path = "/"

    key = rev + ")" + path
    if parts.query:
        params = sorted(parts.query.split("&"))
        key += "?" + "&".join(params)
    return key


def host_of(url: str) -> str:
    """Lowercased registrable host of a URL ('' when unparseable)."""
    u = url.strip()
    if "://" not in u:
        u = "http://" + u
    return (urlsplit(u).hostname or "").lower().rstrip(".")


def hash64(key: str) -> int:
    """64-bit FNV-1a of a urlkey, as unsigned int."""
    h = int(_FNV64_OFFSET)
    for b in key.encode("utf-8"):
        h = ((h ^ b) * int(_FNV64_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64_batch(keys: np.ndarray) -> np.ndarray:
    """Vectorized-ish FNV-1a over an object array of strings -> uint64.

    Byte loop is per-string but in C via the bytes iteration; for the
    block sizes we use (<=64k rows) this is a minor cost next to URL
    parsing. A true SIMD hash would be the first optimization if this
    shows up in ds.stats().
    """
    out = np.empty(len(keys), dtype=np.uint64)
    mask = 0xFFFFFFFFFFFFFFFF
    prime = int(_FNV64_PRIME)
    offset = int(_FNV64_OFFSET)
    for i, k in enumerate(keys):
        if k is None:
            out[i] = 0
            continue
        h = offset
        for b in k.encode("utf-8"):
            h = ((h ^ b) * prime) & mask
        out[i] = h
    return out


class Canonicalizer:
    """Stateful map_batches callable: url -> (urlkey, hash64, host).

    Used as an actor-pool stage so the compiled regex and any future
    per-worker state (PSL tables, etc.) are built once per actor:

        ds.map_batches(Canonicalizer, batch_format="pyarrow",
                       concurrency=N, batch_size=B)

    Input batches must contain a ``url`` string column; output appends
    ``urlkey:string``, ``hash64:uint64``, ``host:string``.
    """

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return canonicalize_batch(batch, url_col=self.url_col)


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    urls = batch[url_col].to_numpy(zero_copy_only=False)
    n = len(urls)
    urlkeys = np.empty(n, dtype=object)
    hosts = np.empty(n, dtype=object)
    for i in range(n):
        u = urls[i]
        if u is None:
            urlkeys[i] = None
            hosts[i] = None
            continue
        urlkeys[i] = surt(u)
        hosts[i] = host_of(u)
    hashes = hash64_batch(urlkeys)
    batch = batch.append_column("urlkey", pa.array(urlkeys, type=pa.string()))
    batch = batch.append_column("hash64", pa.array(hashes, type=pa.uint64()))
    batch = batch.append_column("host", pa.array(hosts, type=pa.string()))
    return batch


if __name__ == "__main__":  # pragma: no cover
    import doctest

    doctest.testmod()
