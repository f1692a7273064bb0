"""Degenerate-input property test over the ENTIRE ``queries()`` surface
(VERDICT r4 item 4).

The q11 sf0.1 crash class: a threshold/filter that eliminates every row
mid-pipeline yields a column-less ``to_pandas()`` frame, and any
driver-side ``df["col"]`` / ``sort_values`` then raises KeyError — a
failure mode the value-compare gates structurally cannot see because it
only appears at scales where the predicate goes vacuous.  This test runs
every queries() entry against a ZERO-ROW table set (every filter is
vacuous by construction) and asserts each returns a TYPED (possibly
empty) frame instead of raising.

Contract asserted per query: the callable returns a pandas DataFrame /
pyarrow Table / Ray Dataset without raising, and an empty result still
carries its column schema (``len(df.columns) > 0``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        sch = pq.read_schema(f"{SRC}/{t}.parquet")
        pq.write_table(sch.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_empty_tables(empty_sf):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    failures: dict[str, str] = {}
    for name, fn in E.queries().items():
        try:
            r = fn(empty_sf)
            if hasattr(r, "to_pandas"):
                r = r.to_pandas()
            if isinstance(r, pd.DataFrame):
                # typed-empty contract: schema survives a vacuous filter
                assert len(r.columns) > 0, "column-less frame"
            else:
                assert r is not None, "query returned None"
        except Exception as e:  # noqa: BLE001 - we aggregate all failures
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, (
        f"{len(failures)} queries break on the all-empty fixture:\n"
        + "\n".join(f"  {k}: {v[:200]}" for k, v in sorted(failures.items()))
    )
