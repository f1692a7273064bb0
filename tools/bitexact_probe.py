"""Bit-exact oracle probe — stricter than tools/check_oracle.py.

The driver's correctness gate hashes EXACT column values; check_oracle
compares at rtol 1e-9, so a last-ulp drift passes locally and fails at
the driver. This probe runs each named query and its oracle side by side
and requires np.array_equal (equal_nan) per column after a whole-frame
sort — the same standard the driver's value hash implies.

    python tools/bitexact_probe.py /root/testdata/sf0.01 [query ...]

With no names given, probes every SQL-oracled queries() entry.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, only: list[str] | None = None) -> bool:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    names = only or [n for n in qs if n in osql]
    bad = []
    for name in names:
        if name not in qs or name not in osql:
            print(f"{name}: SKIP (unknown or rows-only)")
            continue
        got = qs[name](sf_dir)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.execute(osql[name]).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols, ignore_index=True)
        w = want[sorted(want.columns)].sort_values(sorted(want.columns),
                                                   ignore_index=True)
        if len(g) != len(w) or sorted(want.columns) != cols:
            print(f"{name}: ROWS/SCHEMA {len(g)} vs {len(w)}")
            bad.append(name)
            continue
        exact = True
        for c in cols:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = np.array_equal(a.astype(np.float64),
                                    b.astype(np.float64), equal_nan=True)
                if not eq:
                    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
                    print(f"  {name}.{c}: max |diff| = {np.nanmax(d):.3e}, "
                          f"n_diff = {int((d > 0).sum())}")
            elif a.dtype.kind == "M" or b.dtype.kind == "M":
                # int64 view so NaT (int64 min) compares equal to NaT
                eq = np.array_equal(
                    a.astype("datetime64[us]").view(np.int64),
                    b.astype("datetime64[us]").view(np.int64))
            elif a.dtype.kind in "OU" or b.dtype.kind in "OU":
                eq = list(map(str, a)) == list(map(str, b))
            else:
                eq = np.array_equal(a, b)
            exact &= bool(eq)
        print(f"{name}: {'BIT-EXACT' if exact else 'NOT EXACT'} ({len(g)} rows)")
        if not exact:
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} bit-exact; failing: {bad}")
    ray.shutdown()
    return not bad


if __name__ == "__main__":
    argv = sys.argv[1:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    sys.exit(0 if main(sf, argv[1:] or None) else 1)
