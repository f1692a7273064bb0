"""Wave-27 operators: Benford first-digit screen over order totals and
the event_type x dow x hod seasonality heat-map.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US


def test_benford_first_digit_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.stats import benford_first_digit

    got = benford_first_digit(SF)
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cents = np.round(o["o_totalprice"].to_numpy(np.float64) * 100).astype(
        np.int64
    )
    cents = cents[cents > 0]
    # leading digit via decimal-string replay (engine uses //10 sweeps)
    dig = np.array([int(str(c)[0]) for c in cents], dtype=np.int64)
    exp = (
        pd.Series(dig).value_counts().sort_index().rename("n").reset_index()
    )
    assert np.array_equal(
        got["digit"].to_numpy(np.int64), exp["index"].to_numpy(np.int64)
    ) or np.array_equal(
        got["digit"].to_numpy(np.int64), exp.iloc[:, 0].to_numpy(np.int64)
    )
    assert np.array_equal(
        got["n"].to_numpy(np.int64), exp["n"].to_numpy(np.int64)
    )
    assert abs(got["share"].sum() - 1.0) < 1e-4
    # benford_p is the analytic constant
    p = np.log10(1.0 + 1.0 / got["digit"].to_numpy(np.float64))
    assert np.allclose(got["benford_p"], p, atol=1e-6)


def test_seasonality_profile_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.stats import seasonality_profile

    got = seasonality_profile(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    df = pd.DataFrame(
        {
            "event_type": ev["event_type"].astype(str),
            "dow": (us // DAY_US + 4) % 7,
            "hod": (us // HOUR_US) % 24,
        }
    )
    exp = (
        df.groupby(["event_type", "dow", "hod"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "dow", "hod"], ignore_index=True)
    )
    assert len(got) == len(exp)
    assert np.array_equal(got["n"].to_numpy(np.int64),
                          exp["n"].to_numpy(np.int64))
    assert np.array_equal(got["dow"].to_numpy(np.int64),
                          exp["dow"].to_numpy(np.int64))
    # engine dow convention matches pandas' (dayofweek+1)%7 = Sunday-0
    pdow = (ev["ts"].dt.dayofweek.to_numpy(np.int64) + 1) % 7
    assert np.array_equal(np.sort(np.unique(pdow)),
                          np.sort(got["dow"].unique()))
    mism = (df["dow"].to_numpy() != pdow)
    assert not mism.any()
    # shares sum to 1 within each type
    s = got.groupby("event_type")["share"].sum()
    assert np.allclose(s.to_numpy(), 1.0, atol=1e-3)
