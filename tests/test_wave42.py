"""Wave-42 operators: JSONL / CSV round-trip format edges.

The census operators are SQL-oracled (the oracle censuses the ORIGINAL
parquet; any loss in the format edge fails the compare); these tests pin
the round-trip at row level."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _want():
    d = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return (
        d.assign(source=d["source"].astype(str))
        .groupby("source")
        .agg(n_docs=("doc_id", "size"), sum_ids=("doc_id", "sum"),
             sum_chars=("n_chars", "sum"))
        .sort_index()
    )


def test_jsonl_roundtrip_lossless():
    from ecov003_l2t_stars_ray.sources.formats import jsonl_roundtrip_census

    got = jsonl_roundtrip_census(SF).set_index("source")
    want = _want()
    assert list(got.index) == list(want.index)
    for c in ("n_docs", "sum_ids", "sum_chars"):
        assert np.array_equal(got[c].to_numpy(np.int64),
                              want[c].to_numpy(np.int64)), c


def test_csv_roundtrip_lossless():
    from ecov003_l2t_stars_ray.sources.formats import csv_roundtrip_census

    got = csv_roundtrip_census(SF).set_index("source")
    want = _want()
    assert list(got.index) == list(want.index)
    for c in ("n_docs", "sum_ids", "sum_chars"):
        assert np.array_equal(got[c].to_numpy(np.int64),
                              want[c].to_numpy(np.int64)), c
