"""Wave-46 operators: order-size dispersion index, daily load factor."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def test_order_size_dispersion_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.stats import order_size_dispersion

    got = order_size_dispersion(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    sizes = li.groupby("l_orderkey").size()
    hist = sizes.value_counts().sort_index()
    assert list(got["n_lines"]) == list(hist.index)
    assert list(got["n_orders"]) == list(hist.values)
    mean = sizes.mean()
    var = sizes.var(ddof=0)
    assert abs(got["mean_size"].iloc[0] - mean) < 2e-6
    assert abs(got["var_size"].iloc[0] - var) < 2e-6
    assert abs(got["dispersion"].iloc[0] - var / mean) < 2e-6
    assert got["mean_size"].nunique() == 1  # constant moment columns


def test_daily_load_factor_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.stats import daily_load_factor

    got = daily_load_factor(SF).set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cells = (
        pd.DataFrame({"day": us // DAY_US, "hod": (us // HOUR_US) % 24})
        .groupby(["day", "hod"])
        .size()
    )
    for day, g in cells.groupby(level=0):
        row = got.loc[day]
        assert int(row["n_hours"]) == len(g)
        assert int(row["peak_hour_events"]) == int(g.max())
        assert int(row["total_events"]) == int(g.sum())
        lf = g.max() * len(g) / g.sum()
        assert abs(row["load_factor"] - lf) < 2e-6
    # load factor >= 1 by construction (peak >= mean)
    assert (got["load_factor"] >= 1 - 1e-9).all()
