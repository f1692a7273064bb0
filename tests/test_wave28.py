"""Wave-28 operators: exact tie-corrected Spearman on the value lattice
x hour axis, and the exact per-user type-SET bitmask census.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def _midranks(a: np.ndarray) -> np.ndarray:
    """Tie-averaged ranks (1-based) via the standard average-rank rule."""
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=np.float64)
    s = a[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_spearman_value_hour_matches_rank_pearson():
    from ecov003_l2t_stars_ray.pipelines.stats import spearman_value_hour

    got = spearman_value_hour(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value", "ts"]
    )
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )
    h = ((us // HOUR_US) % 24).to_numpy()
    rows = []
    for et, g in pd.DataFrame(
        {"t": ev["event_type"].astype(str), "q": q, "h": h}
    ).groupby("t"):
        rx = _midranks(g["q"].to_numpy())
        ry = _midranks(g["h"].to_numpy())
        rho = np.corrcoef(rx, ry)[0, 1]
        rows.append((et, len(g), rho))
    exp = pd.DataFrame(rows, columns=["event_type", "n", "rho"]).sort_values(
        "event_type", ignore_index=True
    )
    assert np.array_equal(got["event_type"].to_numpy(),
                          exp["event_type"].to_numpy())
    assert np.array_equal(got["n"].to_numpy(np.int64),
                          exp["n"].to_numpy(np.int64))
    assert np.allclose(got["spearman"], exp["rho"], atol=1e-6, equal_nan=True)
    assert (got["spearman"].abs() <= 1.0 + 1e-9).all()


def test_user_type_set_segments_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        user_type_set_segments,
    )

    got = user_type_set_segments(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    )
    vocab = np.sort(ev["event_type"].astype(str).unique())
    idx = {t: i for i, t in enumerate(vocab)}
    bits = ev["event_type"].astype(str).map(idx).to_numpy(np.int64)
    d = pd.DataFrame({"u": ev["user_id"], "b": np.int64(1) << bits})
    masks = (
        d.drop_duplicates().groupby("u")["b"].sum().rename("mask")
    )
    exp = (
        masks.value_counts()
        .rename("n_users")
        .reset_index()
        .sort_values("mask", ignore_index=True)
    )
    assert np.array_equal(got["mask"].to_numpy(np.int64),
                          exp["mask"].to_numpy(np.int64))
    assert np.array_equal(got["n_users"].to_numpy(np.int64),
                          exp["n_users"].to_numpy(np.int64))
    # popcount column is the actual set size
    pc = np.array([bin(m).count("1") for m in got["mask"]], dtype=np.int64)
    assert np.array_equal(got["n_types"].to_numpy(np.int64), pc)
    # census conservation: segment sizes sum to the distinct-user count
    assert got["n_users"].sum() == ev["user_id"].nunique()
