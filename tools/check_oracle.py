"""Local stand-in for the driver's correctness gate.

Runs every queries() entry and its oracle_sql() (when present) at the given
sf dir, comparing row count, sorted column names, and an order-insensitive
value hash (floats rounded to 9 dp before hashing, mirroring a tolerant
driver compare; mismatches print a sample diff).

Usage: python tools/check_oracle.py [sf_dir] [--json out.json] [query_name ...]
(with query names given, only those entries run; --json writes a
per-query record in the driver's CORRECTNESS_r{N} shape so rounds can
commit a local-gate record covering entries past the driver's 50-slot cap)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
# allocator retention: see package __init__ (slow-fault host; keep freed
# memory resident so first-touch faults are paid once, not per batch)
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")
os.environ.setdefault("MIMALLOC_PAGE_RESET", "0")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")  # see package __init__

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"  [{name}] SCHEMA mismatch: {sorted(got.columns)} vs {sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"  [{name}] ROWCOUNT mismatch: {len(got)} vs {len(want)}")
        ok = False
    # Dtype-strict, mirroring the driver's value hash: an int64 engine column
    # vs a float64 oracle column hashes differently even when every value is
    # numerically equal (bit us in r2: DuckDB HUGEINT SUM -> float64 via .df()).
    for c in sorted(got.columns):
        gk = got[c].dtype.kind
        wk = want[c].dtype.kind
        gk = "i" if gk == "u" else gk
        wk = "i" if wk == "u" else wk
        if gk != wk:
            print(f"  [{name}] DTYPE mismatch on '{c}': "
                  f"{got[c].dtype} (engine) vs {want[c].dtype} (oracle)")
            ok = False
    g, w = _canon(got), _canon(want)
    if len(g) == len(w):
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False,
                                          rtol=1e-9, atol=1e-9)
        except AssertionError as e:
            print(f"  [{name}] VALUE mismatch: {str(e).splitlines()[-1][:200]}")
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(pd.concat([g[bad].head(3), w[bad].head(3)], axis=1).to_string()[:1500])
            ok = False
    return ok


def main(sf_dir: str, only: list[str] | None = None,
         json_out: str | None = None):
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    passed = failed = rows_only = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        try:
            got = fn(sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
        except Exception as e:
            print(f"[{name}] QUERY ERROR: {type(e).__name__}: {e}")
            records[name] = {"status": "error", "error": f"{type(e).__name__}: {e}"}
            failed += 1
            continue
        if name not in sqls:
            print(f"[{name}] rows-only: {len(got)} rows")
            records[name] = {"status": "rows_only", "rows": int(len(got))}
            rows_only += 1
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"[{name}] SQL ERROR: {e}")
            records[name] = {"status": "sql_error", "error": str(e)}
            failed += 1
            continue
        ok = compare(name, got, want)
        records[name] = {
            "status": "ok" if ok else "mismatch",
            "rows": int(len(got)), "oracle_rows": int(len(want)),
            "rows_match": len(got) == len(want),
            "schema_match": sorted(got.columns) == sorted(want.columns),
            "values_match": ok,
        }
        if ok:
            print(f"[{name}] OK ({len(got)} rows)")
            passed += 1
        else:
            failed += 1
    print(f"\n{passed} ok, {failed} failed, {rows_only} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "ok": passed, "failed": failed,
                       "rows_only": rows_only, "queries": records}, f, indent=1)
        print(f"wrote {json_out}")
    ray.shutdown()
    return failed


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    sys.exit(1 if main(sf, argv[1:] or None, json_out=json_out) else 0)
