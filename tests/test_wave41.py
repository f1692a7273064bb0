"""Wave-41 operators: seasonal-baseline anomaly cells, repeat-purchase
acquisition cohorts.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000
WEEK_US = 7 * DAY_US


def test_seasonal_baseline_anomaly_expanding_mean():
    from ecov003_l2t_stars_ray.pipelines.stats import (
        seasonal_baseline_anomaly,
    )

    got = seasonal_baseline_anomaly(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
    )
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cells = (
        pd.DataFrame(
            {"t": ev["event_type"].astype(str),
             "week": us // WEEK_US,
             "dow": (us // DAY_US + 3) % 7,
             "hod": (us // HOUR_US) % 24,
             "lat": np.floor(ev["value"].to_numpy() * 1024.0 + 0.5)
             .astype(np.int64)}
        )
        .groupby(["t", "week", "dow", "hod"])
        .agg(lat=("lat", "sum"), n=("lat", "size"))
        .reset_index()
    )
    assert len(got) == len(cells)
    # replay a sample of slots literally
    for (t, dow, hod), g in list(
        cells.groupby(["t", "dow", "hod"])
    )[:30]:
        g = g.sort_values("week")
        pl = pn = 0
        for _, r in g.iterrows():
            row = got[
                (got["event_type"] == t) & (got["week"] == r["week"])
                & (got["dow"] == dow) & (got["hod"] == hod)
            ].iloc[0]
            mean = r["lat"] / (1024.0 * r["n"])
            assert abs(row["cell_mean"] - mean) < 2e-6
            if pn == 0:
                assert np.isnan(row["baseline"])
                assert not row["is_anomaly"]
            else:
                base = pl / (1024.0 * pn)
                assert abs(row["baseline"] - base) < 2e-6
                assert bool(row["is_anomaly"]) == (mean > 2.0 * base)
            pl += r["lat"]
            pn += int(r["n"])
    # first week of any slot never flags
    first = got.sort_values("week").groupby(
        ["event_type", "dow", "hod"]
    ).head(1)
    assert not first["is_anomaly"].any()


def test_customer_repeat_cohorts_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        customer_repeat_cohorts,
    )

    got = customer_repeat_cohorts(SF)
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    pc = o.groupby("o_custkey").agg(
        first=("o_orderdate", "min"), n=("o_orderdate", "size")
    )
    pc["cohort"] = pc["first"].dt.strftime("%Y-%m")
    want = pc.groupby("cohort").agg(
        n_customers=("n", "size"),
        n_repeat=("n", lambda s: int((s >= 2).sum())),
        n_orders=("n", "sum"),
    )
    assert list(got["cohort_month"]) == list(want.index)
    assert np.array_equal(got["n_customers"].to_numpy(np.int64),
                          want["n_customers"].to_numpy(np.int64))
    assert np.array_equal(got["n_repeat"].to_numpy(np.int64),
                          want["n_repeat"].to_numpy(np.int64))
    assert np.array_equal(got["n_orders"].to_numpy(np.int64),
                          want["n_orders"].to_numpy(np.int64))
    assert np.allclose(got["repeat_rate"],
                       got["n_repeat"] / got["n_customers"], atol=1e-6)
    assert int(got["n_orders"].sum()) == len(o)
