"""Wave-26 operators: calendar-day activity streaks (gaps-and-islands
over days) and per-customer RFM featurization over orders.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 24 * 3_600_000_000


def test_active_day_streaks_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import active_day_streaks

    got = active_day_streaks(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    d = (
        pd.DataFrame({"u": ev["user_id"], "d": day})
        .drop_duplicates()
        .sort_values(["u", "d"])
    )
    rows = []
    for u, g in d.groupby("u"):
        ds = g["d"].to_numpy(np.int64)
        breaks = 1 + int((ds[1:] != ds[:-1] + 1).sum())
        # longest streak by literal scan
        best, cur = 1, 1
        for i in range(1, len(ds)):
            cur = cur + 1 if ds[i] == ds[i - 1] + 1 else 1
            best = max(best, cur)
        rows.append((int(u), len(ds), breaks, best))
    exp = pd.DataFrame(
        rows, columns=["user_id", "n_days", "n_streaks", "max_streak"]
    ).sort_values("user_id", ignore_index=True)
    for c in exp.columns:
        assert np.array_equal(
            got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64)
        ), c
    # islands partition the active days: sum of streak lengths == n_days
    assert (got["max_streak"] <= got["n_days"]).all()
    assert (got["n_streaks"] <= got["n_days"]).all()


def test_rfm_segments_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import rfm_segments

    got = rfm_segments(SF)
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    )
    day = o["o_orderdate"].astype("datetime64[us]").astype(np.int64) // DAY_US
    cents = np.round(o["o_totalprice"].to_numpy(np.float64) * 100).astype(
        np.int64
    )
    t = pd.DataFrame({"c": o["o_custkey"], "cents": cents, "d": day})
    agg = t.groupby("c").agg(
        frequency=("cents", "size"), cents=("cents", "sum"), maxday=("d", "max")
    )
    anchor = int(day.max())
    exp = (
        pd.DataFrame(
            {
                "custkey": agg.index.to_numpy(np.int64),
                "recency_days": anchor - agg["maxday"].to_numpy(np.int64),
                "frequency": agg["frequency"].to_numpy(np.int64),
                "monetary": agg["cents"].to_numpy(np.float64) / 100.0,
            }
        )
        .sort_values("custkey", ignore_index=True)
    )
    assert np.array_equal(got["custkey"].to_numpy(np.int64),
                          exp["custkey"].to_numpy(np.int64))
    assert np.array_equal(got["recency_days"].to_numpy(np.int64),
                          exp["recency_days"].to_numpy(np.int64))
    assert np.array_equal(got["frequency"].to_numpy(np.int64),
                          exp["frequency"].to_numpy(np.int64))
    # cents-lane sum then one division: bit-identical to the replay
    assert np.array_equal(got["monetary"].to_numpy(), exp["monetary"].to_numpy())
    assert (got["recency_days"] >= 0).all()
