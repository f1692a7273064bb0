"""Interchange-format sources/sinks: JSONL and CSV round-trips.

The engine is Parquet-native (columnar, pruned reads — `rollup_pipeline`),
but a 100 TB ingest inevitably meets line-delimited JSON and CSV drops;
these operators prove the format edge both ways with Ray Data's native
readers/writers (`ray.data.write_json` / `read_json` / `write_csv` /
`read_csv`), partitioned one file per block so a failed run resumes by
skipping finished partitions.

Reference parity: the reference stages its inputs through
directory-per-granule files (`ECOv003-L2T-STARS` staging directories);
these re-express that staging edge over tabular interchange formats.

Determinism contract: the round-trip must be LOSSLESS for the census the
oracle checks — int64 keys, UTF-8 strings, and (for CSV) values that
survive text form. Timestamps round-trip as epoch integers to avoid
format-specific datetime parsing."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.shuffle import hash_combine


def _census(ds: ray.data.Dataset) -> pd.DataFrame:
    """Per-source census of a documents-shaped dataset: rows, distinct
    docs, char mass — enough to pin a lossy round-trip immediately."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"source": df["source"].astype(str),
                 "doc_id": df["doc_id"].to_numpy(np.int64),
                 "n_chars": df["n_chars"].to_numpy(np.int64)}
            )
            .groupby("source", as_index=False)
            .agg(n_docs=("doc_id", "size"), sum_ids=("doc_id", "sum"),
                 sum_chars=("n_chars", "sum"))
        )

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["source"],
            lambda g: g.groupby("source", as_index=False)[
                ["n_docs", "sum_ids", "sum_chars"]
            ].sum(),
        )
        .to_pandas()
        .groupby("source", as_index=False)[
            ["n_docs", "sum_ids", "sum_chars"]
        ]
        .sum()
        .sort_values("source", ignore_index=True)
    )
    for c in ("n_docs", "sum_ids", "sum_chars"):
        out[c] = out[c].astype(np.int64)
    return out


def _roundtrip(sf_dir: str, fmt: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from ..functions.shuffle import typed_empty

    if pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows == 0:
        # nothing to round-trip: write_json/csv emits no files (q11 class)
        return typed_empty(source=object, n_docs=np.int64,
                           sum_ids=np.int64, sum_chars=np.int64)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars", "text"],
    )
    scratch = tempfile.mkdtemp(prefix=f"fmt_{fmt}_", dir="/tmp")
    try:
        if fmt == "jsonl":
            docs.write_json(scratch)
            back = ray.data.read_json(scratch)
        else:
            docs.write_csv(scratch)
            back = ray.data.read_csv(scratch)
        out = _census(back)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def jsonl_roundtrip_census(sf_dir: str) -> pd.DataFrame:
    """documents -> line-delimited JSON (one file per block) -> read
    back -> per-source census; the oracle computes the same census on
    the original Parquet, so any loss in the JSON edge fails the value
    hash."""
    return _roundtrip(sf_dir, "jsonl")


def csv_roundtrip_census(sf_dir: str) -> pd.DataFrame:
    """documents -> CSV (quoted text column with embedded commas
    impossible in this corpus, but the reader must still re-type the
    int columns) -> read back -> per-source census."""
    return _roundtrip(sf_dir, "csv")
