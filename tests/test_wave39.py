"""Wave-39 operators: daily type-set Jaccard matrix, Holt level+trend
smoothing.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def test_typeset_jaccard_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        typeset_jaccard_matrix,
    )

    got = typeset_jaccard_matrix(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    vocab = sorted(ev["event_type"].astype(str).unique())
    ix = {t: i for i, t in enumerate(vocab)}
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    masks = {}
    for (u, d), g in ev.assign(day=day).groupby(["user_id", "day"]):
        m = 0
        for t in g["event_type"].astype(str):
            m |= 1 << ix[t]
        masks[(u, d)] = m
    census = {}
    for m in masks.values():
        census[m] = census.get(m, 0) + 1
    keys = sorted(census)
    want = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            jac = bin(a & b).count("1") / bin(a | b).count("1")
            want.append((a, b, census[a], census[b], round(jac, 6)))
    g = got.reset_index(drop=True)
    assert len(g) == len(want)
    for row, w in zip(g.itertuples(index=False), want):
        assert (row.mask_a, row.mask_b, row.n_cells_a,
                row.n_cells_b) == w[:4]
        assert abs(row.jaccard - w[4]) < 2e-6
    assert (g["jaccard"] > 0).any() and (g["jaccard"] < 1).all()


def test_holt_linear_matches_literal_recurrence():
    from ecov003_l2t_stars_ray.pipelines.grouping import holt_linear_1h

    got = holt_linear_1h(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    )
    b = (
        ev["ts"].astype("datetime64[us]").astype(np.int64)
        // HOUR_US * HOUR_US
    )
    c = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    h = (
        pd.DataFrame({"u": ev["user_id"], "b": b, "c": c})
        .groupby(["u", "b"], as_index=False)["c"]
        .sum()
        .sort_values(["u", "b"])
    )
    rows = []
    for u, g in h.groupby("u"):
        x = g["c"].to_numpy(np.float64) / 100.0
        s, t = x[0], 0.0
        rows.append((u, g["b"].iloc[0], s, t))
        for i in range(1, len(x)):
            s_new = 0.5 * x[i] + 0.5 * (s + t)
            t = 0.5 * (s_new - s) + 0.5 * t
            s = s_new
            rows.append((u, g["b"].iloc[i], s, t))
    want = pd.DataFrame(rows, columns=["u", "b", "level", "trend"])
    assert len(got) == len(want)
    # bitwise before rounding is the contract; compare at the rounded emit
    assert np.allclose(got["level"], np.sign(want["level"]) * np.floor(
        np.abs(want["level"]) * 1e6 + 0.5) / 1e6, atol=0, rtol=0)
    assert np.allclose(got["trend"], np.sign(want["trend"]) * np.floor(
        np.abs(want["trend"]) * 1e6 + 0.5) / 1e6, atol=0, rtol=0)
    # trend of a monotone level sequence stays bounded by the level range
    assert got["trend"].abs().max() <= (
        got["level"].max() - got["level"].min()
    )
