"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() side by side on one sf dir,
compare row count, column set, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
       GRAFT_CHECK_JSON=<path> writes the per-entry record
       ({name: {rows, oracle_rows, cols_ok, hash, oracle_hash, ok,
       sec}}) alongside the console output — the builder-side twin of
       the driver's CORRECTNESS file, covering the WHOLE catalog.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist()) if len(df) else []
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return h[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t))

    failures = []
    record: dict = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print("%-20s ERROR %s" % (name, e))
            failures.append(name)
            record[name] = {"ok": False, "error": str(e)[:200]}
            continue
        dt = time.time() - t0
        if name not in oracles:
            print("%-20s rows-only  rows=%d  %.1fs" % (name, len(got), dt))
            record[name] = {"ok": None, "rows": len(got),
                            "sec": round(dt, 2)}
            continue
        exp = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        hg, he = value_hash(got), value_hash(exp)
        ok = ok_rows and ok_cols and hg == he
        print("%-20s %s rows=%d/%d cols=%s hash=%s/%s  %.1fs"
              % (name, "OK " if ok else "FAIL", len(got), len(exp),
                 "ok" if ok_cols else "%s vs %s" % (sorted(got.columns),
                                                    sorted(exp.columns)),
                 hg, he, dt))
        record[name] = {"ok": bool(ok), "rows": int(len(got)),
                        "oracle_rows": int(len(exp)),
                        "cols_ok": bool(ok_cols), "hash": hg,
                        "oracle_hash": he, "sec": round(dt, 2)}
        if not ok:
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    out_json = os.environ.get("GRAFT_CHECK_JSON")
    if out_json:
        import json as _json

        with open(out_json, "w") as f:
            _json.dump({"sf_dir": sf_dir, "entries": record,
                        "n_entries": len(record),
                        "n_failures": len(failures)}, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
