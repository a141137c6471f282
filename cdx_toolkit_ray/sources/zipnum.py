"""Zipnum (``cluster.idx``) sharded CDX index — build + pruned lookup.

The reference never BUILDS a CDX index: it queries
index.commoncrawl.org (reference cdx_toolkit/__init__.py:322-342,
paged reads of 3,000 lines), whose on-disk serving structure is
exactly this format (the pywb "zipnum cluster"): all CDX(J) lines
sorted by ``(urlkey, timestamp)``, cut into blocks of N lines, each
block gzip-compressed as one independent member appended to a shard
file, plus a small secondary index (``cluster.idx``) with one line per
block — the block's first ``urlkey timestamp``, its shard filename,
byte offset, compressed length and global block sequence. A query
binary-searches ``cluster.idx`` (tiny — ~200 MB for all of Common
Crawl) and decompresses ONLY the touched blocks; the reference's
"page" is a run of consecutive blocks served from this layout.

This module closes the loop: the engine can now *produce* the index
the reference consumes.

Scale contract: the build is one global ``Dataset.sort`` (a CDX index
IS a sort — the unavoidable all-to-all) followed by embarrassingly
parallel shard writes; the driver holds only the O(blocks) secondary
index rows (at 10^10 captures / 3,000-line blocks that is ~3.3M small
rows — the same order as the real cluster.idx, which is served
centrally by design). Lookup reads cluster.idx once, binary-searches
the candidate block range, and spawns one task per touched shard file
that seeks + decompresses only the candidate members and filters
before returning — untouched blocks are never read (asserted in
tests/test_zipnum.py).

CDXJ line format: ``<urlkey> <timestamp> <json>`` with the JSON keys
in sorted order (rendered vectorized via polars ``json_encode``,
parsed back via ``json_decode`` — no per-row Python on either side).
"""

from __future__ import annotations

import gzip
import os
from bisect import bisect_left

import numpy as np
import pyarrow as pa
import ray
import ray.data

# JSON-part fields in canonical (sorted) key order; urlkey/timestamp
# lead the line itself. Matches the captures fixture schema.
CDX_JSON_FIELDS = ("digest", "encoding", "filename", "languages",
                   "length", "mime", "mime_detected", "offset",
                   "redirect", "status", "url")
# int64-typed JSON fields (everything else is string)
_INT_FIELDS = frozenset({"length", "offset"})
# output column order = the captures table order
CDX_COLUMNS = ("urlkey", "timestamp", "url", "mime", "mime_detected",
               "status", "digest", "length", "offset", "filename",
               "redirect", "languages", "encoding")

_IDX_NAME = "cluster.idx"


def render_cdxj_batch(batch: pa.Table) -> pa.Table:
    """One Arrow batch of capture rows -> (urlkey, timestamp, line)."""
    import polars as pl

    df = pl.from_arrow(batch.select(list(CDX_COLUMNS)))
    out = df.select(
        pl.col("urlkey"), pl.col("timestamp"),
        pl.concat_str([
            pl.col("urlkey"), pl.col("timestamp"),
            pl.struct([pl.col(f) for f in CDX_JSON_FIELDS])
              .struct.json_encode(),
        ], separator=" ").alias("line"))
    return out.to_arrow()


def _json_dtype():
    import polars as pl

    return pl.Struct([
        pl.Field(f, pl.Int64 if f in _INT_FIELDS else pl.Utf8)
        for f in CDX_JSON_FIELDS])


def parse_cdxj_batch(lines: pa.Array | list) -> pa.Table:
    """CDXJ lines -> capture rows (vectorized splitn + json_decode)."""
    import polars as pl

    s = pl.Series("line", lines, dtype=pl.Utf8)
    parts = (s.str.splitn(" ", 3)
             .struct.rename_fields(["urlkey", "timestamp", "j"]))
    df = parts.struct.unnest()
    df = df.with_columns(
        df["j"].str.json_decode(_json_dtype()).alias("j"))
    df = df.drop("j").with_columns(df["j"].struct.unnest())
    t = df.select(list(CDX_COLUMNS)).to_arrow()
    # polars emits large_string; normalize to the captures schema
    schema = pa.schema([
        (c, pa.int64() if c in _INT_FIELDS else pa.string())
        for c in CDX_COLUMNS])
    return t.cast(schema)


@ray.remote
def _write_shard(out_dir: str, shard_id: int, lines_per_block: int,
                 *tbls: pa.Table) -> list:
    """Write one shard file: consecutive gzip members of
    <= lines_per_block lines each; return per-block index entries
    (first_urlkey, first_ts, filename, offset, length, n_lines)."""
    live = [t for t in tbls if t.num_rows]
    if not live:
        return []
    t = pa.concat_tables(live, promote_options="permissive")
    lines = t["line"].to_pylist()
    urlkeys = t["urlkey"].to_pylist()
    stamps = t["timestamp"].to_pylist()
    fname = "cdx-%05d.gz" % shard_id
    entries = []
    offset = 0
    with open(os.path.join(out_dir, fname), "wb") as f:
        for lo in range(0, len(lines), lines_per_block):
            hi = min(lo + lines_per_block, len(lines))
            data = gzip.compress(
                ("\n".join(lines[lo:hi]) + "\n").encode("utf-8"),
                mtime=0)  # mtime=0: byte-deterministic members
            f.write(data)
            entries.append((urlkeys[lo], stamps[lo], fname, offset,
                            len(data), hi - lo))
            offset += len(data)
    return entries


def build_zipnum(captures: ray.data.Dataset, out_dir: str, *,
                 lines_per_block: int = 3000,
                 num_shards: int = 8) -> dict:
    """Sort + render + shard the captures into a zipnum cluster under
    ``out_dir`` (``cdx-NNNNN.gz`` shard files + ``cluster.idx``).
    Returns ``{"rows": R, "blocks": B, "shards": S}``."""
    if lines_per_block < 1:
        raise ValueError("lines_per_block must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    lines = (captures.sort(["urlkey", "timestamp"])
             .map_batches(render_cdxj_batch, batch_format="pyarrow",
                          batch_size=None))
    refs = lines.materialize().to_arrow_refs()
    groups = [g for g in np.array_split(np.arange(len(refs)),
                                        max(min(num_shards, len(refs)),
                                            1))
              if len(g)]
    tasks = [_write_shard.remote(out_dir, i, lines_per_block,
                                 *[refs[j] for j in g])
             for i, g in enumerate(groups)]
    rows = 0
    seq = 0
    with open(os.path.join(out_dir, _IDX_NAME), "w",
              encoding="utf-8") as f:
        for entries in ray.get(tasks):
            for uk, ts, fname, off, length, n in entries:
                f.write("%s %s\t%s\t%d\t%d\t%d\n"
                        % (uk, ts, fname, off, length, seq))
                rows += n
                seq += 1
    return {"rows": rows, "blocks": seq, "shards": len(groups)}


def load_cluster_idx(out_dir: str) -> list[tuple]:
    """cluster.idx lines -> [(urlkey, ts, filename, offset, length)]."""
    path = os.path.join(out_dir, _IDX_NAME)
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            key, fname, off, length, _seq = line.rstrip("\n").split("\t")
            uk, ts = key.split(" ", 1)
            out.append((uk, ts, fname, int(off), int(length)))
    return out


@ray.remote
def _read_blocks(out_dir: str, fname: str, spans: list,
                 key_lo: str, key_hi: str, prefix: bool,
                 from_ts: str | None, to_ts: str | None) -> pa.Table:
    """Seek + decompress only the candidate members of one shard file,
    parse, and filter before returning (pruning happens at the read)."""
    import pyarrow.compute as pc

    lines: list[str] = []
    with open(os.path.join(out_dir, fname), "rb") as f:
        for off, length in spans:
            f.seek(off)
            lines.extend(gzip.decompress(f.read(length))
                         .decode("utf-8").splitlines())
    t = parse_cdxj_batch(lines)
    uk = t["urlkey"]
    if prefix:
        mask = pc.starts_with(uk, key_lo)
    else:
        mask = pc.equal(uk, key_lo)
    if from_ts is not None:
        mask = pc.and_(mask, pc.greater_equal(t["timestamp"], from_ts))
    if to_ts is not None:
        mask = pc.and_(mask, pc.less_equal(t["timestamp"], to_ts))
    return t.filter(mask)


def zipnum_lookup(out_dir: str, *, urlkey: str | None = None,
                  urlkey_prefix: str | None = None,
                  from_ts: str | None = None, to_ts: str | None = None,
                  stats: dict | None = None) -> ray.data.Dataset:
    """Binary-search ``cluster.idx`` and read ONLY the candidate
    blocks; returns the matching capture rows as a Dataset.

    Exactly one of ``urlkey`` (exact match) / ``urlkey_prefix`` must
    be given. ``stats`` (optional dict) receives ``blocks_total`` /
    ``blocks_read`` — the pruning evidence.

    SURT urlkeys are ASCII by construction, so ``prefix + chr(0x10FFFF)``
    is a safe exclusive upper bound for the prefix key range.
    """
    if (urlkey is None) == (urlkey_prefix is None):
        raise ValueError("give exactly one of urlkey / urlkey_prefix")
    idx = load_cluster_idx(out_dir)
    firsts = [e[0] for e in idx]
    prefix = urlkey_prefix is not None
    key_lo = urlkey_prefix if prefix else urlkey
    key_hi = (key_lo + chr(0x10FFFF)) if prefix else (key_lo + "\x00")
    # blocks are sorted runs; rows matching [key_lo, key_hi) can start
    # one block before the first block whose first key >= key_lo
    # (bisect_left keeps every tie block) and end before the first
    # block whose first key >= key_hi.
    i_lo = max(0, bisect_left(firsts, key_lo) - 1)
    i_hi = bisect_left(firsts, key_hi)
    cand = idx[i_lo:i_hi]
    if stats is not None:
        stats["blocks_total"] = len(idx)
        stats["blocks_read"] = len(cand)
    by_file: dict[str, list] = {}
    for uk, ts, fname, off, length in cand:
        by_file.setdefault(fname, []).append((off, length))
    refs = [_read_blocks.remote(out_dir, fname, spans, key_lo, key_hi,
                                prefix, from_ts, to_ts)
            for fname, spans in sorted(by_file.items())]
    if not refs:
        empty = pa.table({c: pa.array(
            [], pa.int64() if c in _INT_FIELDS else pa.string())
            for c in CDX_COLUMNS})
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)
