"""Wave-45 operators: Wilson-interval daily conversion, deterministic
train/val/test split census."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def test_daily_conversion_wilson_bounds():
    from ecov003_l2t_stars_ray.pipelines.stats import (
        daily_conversion_wilson,
    )

    got = daily_conversion_wilson(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    )
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    cells = (
        pd.DataFrame({"day": day,
                      "k": (ev["event_type"] == "purchase").astype(int)})
        .groupby("day")
        .agg(k=("k", "sum"), n=("k", "size"))
    )
    assert list(got["day"]) == list(cells.index)
    assert np.array_equal(got["n_purchases"].to_numpy(np.int64),
                          cells["k"].to_numpy(np.int64))
    assert np.array_equal(got["n_events"].to_numpy(np.int64),
                          cells["n"].to_numpy(np.int64))
    # interval properties: lo <= rate <= hi, both within [0, 1],
    # and the band tightens with n (check one literal value)
    assert (got["wilson_lo"] <= got["rate"] + 1e-9).all()
    assert (got["rate"] <= got["wilson_hi"] + 1e-9).all()
    assert (got["wilson_lo"] >= -1e-9).all()
    assert (got["wilson_hi"] <= 1 + 1e-9).all()
    r = got.iloc[0]
    k, n = float(r["n_purchases"]), float(r["n_events"])
    p = k / n
    center = (p + 4 / (2 * n)) / (1 + 4 / n)
    half = 2 * np.sqrt(p * (1 - p) / n + 4 / (4 * n * n)) / (1 + 4 / n)
    assert abs(r["wilson_lo"] - (center - half)) < 2e-6
    assert abs(r["wilson_hi"] - (center + half)) < 2e-6


def test_dataset_split_census_deterministic():
    from ecov003_l2t_stars_ray.pipelines.stats import dataset_split_census

    got = dataset_split_census(SF)
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    h1 = docs["doc_id"].astype(str).map(
        lambda s: hashlib.md5(s.encode()).hexdigest()[0]
    )
    split = np.where(h1 <= "a", "train",
                     np.where(h1 <= "c", "val", "test"))
    want = (
        docs.assign(split=split, source=docs["source"].astype(str))
        .groupby(["source", "split"])
        .agg(n_docs=("doc_id", "size"), sum_ids=("doc_id", "sum"))
        .reset_index()
        .sort_values(["source", "split"], ignore_index=True)
    )
    assert len(got) == len(want)
    assert list(got["split"]) == list(want["split"])
    assert np.array_equal(got["n_docs"].to_numpy(np.int64),
                          want["n_docs"].to_numpy(np.int64))
    assert np.array_equal(got["sum_ids"].to_numpy(np.int64),
                          want["sum_ids"].to_numpy(np.int64))
    # the three splits partition the corpus
    assert int(got["n_docs"].sum()) == len(docs)
    assert set(got["split"]) == {"train", "val", "test"}
    # expected proportions hold loosely (11/2/3 of 16)
    tot = got.groupby("split")["n_docs"].sum()
    assert tot["train"] > tot["test"] > 0 and tot["val"] > 0
