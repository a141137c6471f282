"""IA-wayback <-> pywb dialect translation.

Parity with the reference's dialect shim (cocrawler/cdx_toolkit
cdx_toolkit/compat.py:6-38): the Internet Archive CDX server uses
``statuscode`` / ``original`` / ``mimetype`` where pywb (and Common
Crawl) use ``status`` / ``url`` / ``mime``; IA supports only the regex
and inverted-regex filter modifiers.
"""

from __future__ import annotations

import re

PYWB_FROM_IA = {"statuscode": "status", "original": "url", "mimetype": "mime"}
IA_FROM_PYWB = {v: k for k, v in PYWB_FROM_IA.items()}

# pywb-only filter modifiers that IA rejects (compat.py:13-16 parity)
_IA_FORBIDDEN_PREFIXES = ("=", "!=", "~", "!~")


def munge_filter(filters, source: str) -> list[str]:
    """Rename field names inside filter strings for the given dialect.

    For ``source='ia'`` also rejects pywb-only modifiers.
    """
    out = []
    for f in filters:
        if source == "ia":
            for bad in _IA_FORBIDDEN_PREFIXES:
                if f.startswith(bad):
                    raise ValueError("ia does not support the filter " + bad)
            for src, dst in IA_FROM_PYWB.items():
                f = re.sub(r"\b" + src + ":", dst + ":", f, count=1)
        else:
            for src, dst in PYWB_FROM_IA.items():
                f = re.sub(r"\b" + src + ":", dst + ":", f, count=1)
        out.append(f)
    return out


def munge_fields(fields: list[str], rows: list[list]) -> list[dict]:
    """Zip an IA header row with positional value rows into pywb-named dicts."""
    out = []
    for row in rows:
        rec = {}
        for name, value in zip(fields, row):
            rec[PYWB_FROM_IA.get(name, name)] = value
        out.append(rec)
    return out
