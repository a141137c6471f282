"""``cdxt``-parity command line tool over local Parquet capture tables.

Re-expresses the reference CLI surface (cocrawler/cdx_toolkit
cdx_toolkit/cli.py:14-283 — ``cdxt [--crawl ...] [--from --to --closest
--limit --filter*] {iter,warc,size}``) against this engine: the remote
CDX server is replaced by ``--captures-root`` (hive-partitioned
captures table) and WARC content fetch by ``--pages`` (pages table).

Output parity (cli.py:197-219):
* ``iter`` default: ``k v, k v, ...`` lines of sorted selected fields
* ``--jsonl``: one ``json.dumps(..., sort_keys=True)`` per capture
* ``--csv``: DictWriter with sorted header
* ``warc``: size-rotated ``<prefix>[-<subprefix>]-NNNNNN.extracted``
  Parquet segments + a ``.warcinfo.json`` info record
  (cli.py:235-276 semantics; fgrep/fgrepv gates cli.py:262-267)
* ``size``: prints the estimate (cli.py:279-283), ``--details`` adds
  per-crawl lines

The CLI owns its Ray session (guarded init — the library never calls
``ray.init``).
"""

from __future__ import annotations

import csv
import json
import logging
import os
import sys
from argparse import ArgumentParser

LOGGER = logging.getLogger(__name__)


def make_parser() -> ArgumentParser:
    parser = ArgumentParser(
        prog="cdxt-ray",
        description="cdx_toolkit_ray iterator command line tool")
    from . import __version__

    parser.add_argument("--version", "-V", action="version",
                        version="cdx_toolkit_ray " + __version__)
    parser.add_argument("--verbose", "-v", action="count",
                        help="INFO (-v) or DEBUG (-vv) logging")
    parser.add_argument("--captures-root",
                        help="hive-partitioned captures table directory "
                             "(required unless --source names a table)")
    parser.add_argument("--source", action="store",
                        help="arbitrary captures table path (the local "
                             "analog of the reference's --source CDX "
                             "server URL): one endpoint, pywb dialect, "
                             "no crawl pruning")
    parser.add_argument("--cc-mirror", action="store",
                        help="alternate root of the same cc captures "
                             "table (local mirror analog)")
    parser.add_argument("--wb", action="store",
                        help="wayback replay prefix stamped into "
                             "WARC-Source-URI (ia mode)")
    parser.add_argument("--pages", help="pages Parquet (content lookups)")
    parser.add_argument("--cc", action="store_const", const="cc",
                        help="treat the table as a Common Crawl index")
    parser.add_argument("--ia", action="store_const", const="ia",
                        help="treat the table as an IA index (dialect)")
    parser.add_argument("--crawl", action="store",
                        help="crawl names (comma separated) or an integer "
                             "for the most recent N crawls")
    parser.add_argument("--limit", type=int, action="store")
    parser.add_argument("--cc-sort", action="store", default="mixed",
                        help="default mixed, alternatively: ascending")
    parser.add_argument("--from", action="store")
    parser.add_argument("--to", action="store")
    parser.add_argument("--filter", action="append",
                        help="CDX filter language, [mod]field:expr")
    parser.add_argument("--get", action="store_true",
                        help="one-shot get with default limit=1000")
    parser.add_argument("--closest", action="store",
                        help="closest capture to this timestamp; with --get")
    parser.add_argument("--num-cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))

    sub = parser.add_subparsers(dest="cmd")
    sub.required = True

    it = sub.add_parser("iter", help="iterate printing captures")
    it.add_argument("--all-fields", action="store_true")
    it.add_argument("--fields", action="store",
                    default="url,status,timestamp",
                    help="comma-separated capture fields")
    it.add_argument("--jsonl", action="store_true")
    it.add_argument("--csv", action="store_true")
    it.add_argument("url")
    it.set_defaults(func=iterator)

    warc = sub.add_parser(
        "warc", help="iterate over capture content, writing segments")
    warc.add_argument("--prefix", default="TEST")
    warc.add_argument("--subprefix", type=str, default=None)
    warc.add_argument("--size", type=int, default=1000000000,
                      help="target segment size in bytes")
    warc.add_argument("--creator", action="store")
    warc.add_argument("--operator", action="store")
    warc.add_argument("--url-fgrep", action="store",
                      help="pattern that must be present to warc an url")
    warc.add_argument("--url-fgrepv", action="store",
                      help="pattern that must NOT be present")
    warc.add_argument("--format", choices=("warc", "parquet"),
                      default="warc", dest="warc_format",
                      help="segment format: real WARC/1.0 gzip members "
                           "(reference parity, default) or Parquet "
                           "(columnar twin)")
    warc.add_argument("url")
    warc.set_defaults(func=warcer)

    size = sub.add_parser(
        "size", help="imprecise count of how many results are available")
    size.add_argument("--details", action="store_true")
    size.add_argument("url")
    size.set_defaults(func=sizer)

    rep = sub.add_parser(
        "report", help="per-crawl dashboard: captures, distinct "
                       "urlkeys/hosts, status classes, revisits")
    rep.add_argument("--jsonl", action="store_true")
    rep.set_defaults(func=reporter)

    cr = sub.add_parser(
        "crawl", help="run the resumable polite crawl loop over the "
                      "--pages table (seeds -> fetch -> discover), one "
                      "lineage-tracked partition per wave")
    cr.add_argument("--out", required=True,
                    help="output directory (wave=N partitions + "
                         "lineage manifest; reruns skip finished waves)")
    cr.add_argument("--seed-suffix", default=".example/",
                    help="urls ending with this are the wave-0 seeds")
    cr.add_argument("--max-waves", type=int, default=3)
    cr.add_argument("--max-attempts", type=int, default=3)
    cr.add_argument("--robots", action="store",
                    help="robots table parquet (per-host crawl-delay + "
                         "disallow); politeness uses --delay-ms for "
                         "hosts it does not list")
    cr.add_argument("--delay-ms", type=int, default=1000)
    cr.add_argument("--warc-prefix", action="store",
                    help="also render each wave's ok rows as real "
                         "WARC/1.0 segments under --out")
    cr.add_argument("--max-per-host", type=int, default=None,
                    help="per-host crawl budget across ALL waves; "
                         "over-budget urls are skipped (their links "
                         "never harvested)")
    cr.set_defaults(func=crawler)

    cu = sub.add_parser(
        "curate", help="run the corpus-curation composite over a "
                       "documents table: host blocklist -> duplicate-"
                       "line removal -> kept-lines gate -> token-"
                       "budget mixture (queries.q_corpus_pipeline)")
    cu.add_argument("--sf-dir", required=True,
                    help="directory holding documents.parquet")
    cu.add_argument("--out", required=True,
                    help="output directory (partitioned parquet)")
    cu.set_defaults(func=curator)

    ix = sub.add_parser(
        "index", help="build a zipnum cluster (sorted CDXJ gzip-member "
                      "blocks + cluster.idx) from a captures table — "
                      "the serving structure CDX endpoints answer from")
    ix.add_argument("--captures", required=True,
                    help="captures table path (parquet file or "
                         "hive-partitioned directory)")
    ix.add_argument("--out", required=True,
                    help="output cluster directory")
    ix.add_argument("--lines-per-block", type=int, default=3000,
                    help="CDXJ lines per gzip member (the real "
                         "cluster uses 3000)")
    ix.add_argument("--shards", type=int, default=8)
    ix.add_argument("--per-crawl", action="store_true",
                    help="build one cluster per crawl= partition "
                         "(the Common Crawl deployment layout)")
    ix.set_defaults(func=indexer)
    return parser


def set_loglevel(cmd) -> None:
    loglevel = os.getenv("LOGLEVEL") or "WARNING"
    if cmd.verbose:
        loglevel = "DEBUG" if cmd.verbose > 1 else "INFO"
    logging.getLogger().setLevel(loglevel)
    logging.basicConfig(level=loglevel)


def _query_kwargs(cmd) -> dict:
    kwargs = {}
    if cmd.limit:
        kwargs["limit"] = cmd.limit
    if vars(cmd).get("from"):
        kwargs["from_ts"] = vars(cmd)["from"]
    if cmd.to:
        kwargs["to"] = cmd.to
    if cmd.closest:
        if not cmd.get:
            LOGGER.info("note: --closest works best with --get")
        kwargs["closest"] = cmd.closest
    if cmd.filter:
        kwargs["filter"] = cmd.filter
    return kwargs


def _fetcher(cmd):
    from .api import CDXFetcher

    source = cmd.source or ("ia" if cmd.ia else "cc")
    crawl = [cmd.crawl] if cmd.crawl else None
    return CDXFetcher(captures_root=cmd.captures_root,
                      pages_path=cmd.pages, source=source,
                      crawl=crawl, cc_mirror=cmd.cc_mirror,
                      wb=cmd.wb, cc_sort=cmd.cc_sort)


def winnow_fields(cmd, fields, obj) -> dict:
    """Field projection parity (cli.py:197-202)."""
    if cmd.all_fields:
        return dict(obj)
    return {k: obj[k] for k in fields if k in obj}


def print_line(cmd, writer, printme, out=None) -> None:
    """Serialization parity (cli.py:205-211)."""
    out = out or sys.stdout
    if cmd.jsonl:
        print(json.dumps(printme, sort_keys=True, default=str), file=out)
    elif writer:
        writer.writerow(printme)
    else:
        print(", ".join(" ".join((k, str(printme[k])))
                        for k in sorted(printme)), file=out)


def iterator(cmd, out=None) -> None:
    cdx = _fetcher(cmd)
    kwargs = _query_kwargs(cmd)
    fields = set(cmd.fields.split(","))
    writer = None
    if cmd.csv:
        writer = csv.DictWriter(out or sys.stdout,
                                fieldnames=sorted(fields))
        writer.writeheader()

    objs = cdx.get(cmd.url, **kwargs) if cmd.get \
        else cdx.iter(cmd.url, **kwargs)
    for obj in objs:
        print_line(cmd, writer, winnow_fields(cmd, fields, obj), out)


def warcer(cmd, out=None) -> None:
    from .pipelines.warcout import extract_content, get_writer

    kwargs = _query_kwargs(cmd)
    kwargs.pop("closest", None)

    use_warc = getattr(cmd, "warc_format", "warc") == "warc"
    ispartof = cmd.prefix + (("-" + cmd.subprefix) if cmd.subprefix else "")
    info = {
        "software": "cdx_toolkit_ray",
        "isPartOf": ispartof,
        "description": "extraction generated with: " + " ".join(sys.argv[1:]),
        "format": "WARC file version 1.0" if use_warc
        else "parquet segment (WARC-equivalent)",
    }
    if cmd.creator:
        info["creator"] = cmd.creator
    if cmd.operator:
        info["operator"] = cmd.operator

    if cmd.crawl:
        kwargs["crawl"] = [cmd.crawl]
    if cmd.source:
        # --source names an arbitrary single-endpoint table: pywb
        # dialect, NO crawl-partition listing and NO cc time-window
        # defaults (the reference's --source contract)
        kwargs["source"] = "custom"
    ds = extract_content(cmd.captures_root, cmd.pages, url=cmd.url,
                         url_fgrep=cmd.url_fgrep,
                         url_fgrepv=cmd.url_fgrepv,
                         cc_sort=cmd.cc_sort, **kwargs)
    if cmd.wb:
        # wayback-replay WARC-Source-URI stamping ("{wb}/{ts}id_/{url}",
        # the api.fetch_warc_record form) — makes --wb observable on
        # the warc path, not only through the CDXFetcher API
        import numpy as np
        import pyarrow as pa

        wb_prefix = cmd.wb

        def stamp(batch: pa.Table) -> pa.Table:
            ts = batch["timestamp"].to_numpy(zero_copy_only=False) \
                .astype(str)
            u = batch["url"].to_numpy(zero_copy_only=False).astype(str)
            uri = np.char.add(np.char.add(
                wb_prefix + "/", ts), np.char.add("id_/", u))
            return batch.append_column(
                "warc_source_uri", pa.array(uri.tolist(), pa.string()))

        ds = ds.map_batches(stamp, batch_format="pyarrow",
                            batch_size=None)
    if use_warc:
        # distributed per-segment renderer (byte-identical to the
        # serial SegmentedWARCWriter; parity-tested) — render, plan
        # and write all scale out
        from .pipelines.warcbytes import write_warc_distributed

        written = write_warc_distributed(ds, cmd.prefix, cmd.subprefix,
                                         info, size=cmd.size)
    else:
        writer = get_writer(cmd.prefix, cmd.subprefix, info,
                            size=cmd.size)
        written = writer.write_dataset(ds)
    LOGGER.info("wrote %d segments", len(written))


def sizer(cmd, out=None) -> None:
    cdx = _fetcher(cmd)
    kwargs = _query_kwargs(cmd)
    kwargs.pop("closest", None)
    kwargs.pop("limit", None)
    if cmd.details:
        size, per_crawl = cdx.get_size_estimate(cmd.url, details=True,
                                                **kwargs)
        print(size, file=out or sys.stdout)
        for crawl, n in per_crawl:
            print("%s %d" % (crawl, n), file=out or sys.stdout)
    else:
        print(cdx.get_size_estimate(cmd.url, **kwargs),
              file=out or sys.stdout)


def reporter(cmd, out=None) -> None:
    """`cdxt report` (beyond-reference, built on the captures table the
    other subcommands query): one line per crawl, columns in a fixed
    order; --jsonl for machine consumption."""
    import json as _json

    import ray.data

    from .stages.recrawl import crawl_report

    ds = ray.data.read_parquet(cmd.captures_root)
    rows = crawl_report(ds).to_pandas().sort_values("crawl")
    f = out or sys.stdout
    cols = ["crawl", "n_captures", "n_urlkeys", "n_hosts", "n_ok",
            "n_redirect", "n_error", "n_revisit"]
    for _, r in rows.iterrows():
        if cmd.jsonl:
            print(_json.dumps({c: (r[c] if c == "crawl" else int(r[c]))
                               for c in cols}, sort_keys=True), file=f)
        else:
            print(" ".join(str(r[c]) for c in cols), file=f)


def crawler(cmd, out=None) -> None:
    """`cdxt-ray crawl`: the integrated loop the reference leaves to
    its users, resumable and polite (pipelines/crawl.py run_crawl)."""
    from .pipelines.crawl import run_crawl

    r = run_crawl(cmd.pages, cmd.out, seed_suffix=cmd.seed_suffix,
                  max_waves=cmd.max_waves, max_attempts=cmd.max_attempts,
                  robots_path=cmd.robots,
                  default_delay_ms=cmd.delay_ms,
                  max_per_host=cmd.max_per_host,
                  warc_prefix=cmd.warc_prefix)
    print(json.dumps(r, sort_keys=True), file=out or sys.stdout)


def curator(cmd, out=None) -> None:
    """`cdxt-ray curate`: the end-to-end curation chain as a CLI —
    writes the selected (doc_id, source, n_tok, cum_before) mixture
    as partitioned parquet and prints the summary line."""
    from .queries import q_corpus_pipeline

    ds = q_corpus_pipeline(cmd.sf_dir)
    ds.write_parquet(cmd.out)
    import pyarrow.parquet as pq

    # summary from the one needed column — never re-read the full
    # mixture table onto the driver
    got = pq.read_table(cmd.out, columns=["n_tok"])
    n_tok = sum(got["n_tok"].to_pylist())
    print(json.dumps({"rows": got.num_rows, "tokens": int(n_tok),
                      "out": cmd.out}, sort_keys=True),
          file=out or sys.stdout)


def indexer(cmd, out=None) -> None:
    """`cdxt-ray index`: captures table -> zipnum cluster(s); prints
    one JSON summary line per cluster built."""
    import glob as _glob

    import ray.data

    from .sources.zipnum import CDX_COLUMNS, build_zipnum

    def _read(path):
        import pyarrow.parquet as pq_

        try:
            names = pq_.read_schema(
                sorted(_glob.glob(os.path.join(path, "*.parquet"))
                       or [path])[0]).names
        except Exception:
            names = list(CDX_COLUMNS)
        cols = [c for c in CDX_COLUMNS if c in names] or None
        return ray.data.read_parquet(path, columns=cols)

    results = {}
    if cmd.per_crawl:
        parts = sorted(_glob.glob(os.path.join(cmd.captures,
                                               "crawl=*")))
        if not parts:
            raise SystemExit("no crawl= partitions under %s"
                             % cmd.captures)
        for d in parts:
            name = os.path.basename(d)
            results[name] = build_zipnum(
                _read(d), os.path.join(cmd.out, name),
                lines_per_block=cmd.lines_per_block,
                num_shards=cmd.shards)
    else:
        results["cluster"] = build_zipnum(
            _read(cmd.captures), cmd.out,
            lines_per_block=cmd.lines_per_block,
            num_shards=cmd.shards)
    for name, info in results.items():
        print(json.dumps({"cluster": name, **info}, sort_keys=True),
              file=out or sys.stdout)


def main(args=None) -> None:
    parser = make_parser()
    cmd = parser.parse_args(args=args)
    if cmd.cmd == "crawl":
        if not cmd.pages:
            parser.error("crawl requires --pages (the table the "
                         "transport fetches from)")
        cmd.captures_root = cmd.captures_root or cmd.pages
    if cmd.cmd == "index":
        cmd.captures_root = cmd.captures
    if cmd.cmd not in ("curate", "index") and not cmd.captures_root \
            and not cmd.source and not cmd.cc_mirror:
        # curate reads --sf-dir, not the captures table
        parser.error("--captures-root is required (or --source/"
                     "--cc-mirror naming a table)")
    if not cmd.captures_root:
        # subcommands that read the table directly (warc/report)
        cmd.captures_root = cmd.source or cmd.cc_mirror
    set_loglevel(cmd)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cmd.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    cmd.func(cmd)


if __name__ == "__main__":  # pragma: no cover
    main()
