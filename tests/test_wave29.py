"""Wave-29 operators: per-column table profiling and the exact
quantity-weighted lower median price.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_table_profile_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.analytics import table_profile

    got = table_profile(SF).set_index("column")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert sorted(got.index) == sorted(ev.columns)
    for c in ev.columns:
        r = got.loc[c]
        assert r["n"] == len(ev)
        assert r["nulls"] == int(ev[c].isna().sum())
        assert r["n_distinct"] == ev[c].nunique(dropna=True), c
    # numeric extremes
    assert got.loc["user_id", "min_num"] == float(ev["user_id"].min())
    assert got.loc["user_id", "max_num"] == float(ev["user_id"].max())
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    assert got.loc["ts", "min_num"] == float(us.min())
    assert abs(got.loc["value", "min_num"] - round(ev["value"].min(), 6)) \
        < 1e-12
    # string extremes, numeric lanes NULL for strings and vice versa
    assert got.loc["event_type", "min_str"] == ev["event_type"].min()
    assert got.loc["props", "max_str"] == ev["props"].astype(str).max()
    assert np.isnan(got.loc["event_type", "min_num"])
    assert got.loc["user_id", "min_str"] is None or (
        got.loc["user_id", "min_str"] != got.loc["user_id", "min_str"]
    )


def test_weighted_median_price_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.stats import weighted_median_price

    got = weighted_median_price(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    cents = np.floor(
        li["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
    ).astype(np.int64)
    w = li["l_quantity"].to_numpy(np.float64).astype(np.int64)
    rows = []
    for flag, g in pd.DataFrame(
        {"f": li["l_returnflag"].astype(str), "c": cents, "w": w}
    ).groupby("f"):
        # literal expansion: repeat each price by its quantity weight
        expanded = np.sort(np.repeat(g["c"].to_numpy(), g["w"].to_numpy()))
        tot = int(g["w"].sum())
        # lower weighted median = element at ceil(tot/2) - 1 (1-based
        # smallest index i with 2i >= tot)
        med = expanded[(tot + 1) // 2 - 1]
        rows.append((flag, tot, med / 100.0))
    exp = pd.DataFrame(
        rows, columns=["l_returnflag", "total_qty", "wm"]
    ).sort_values("l_returnflag", ignore_index=True)
    assert np.array_equal(got["l_returnflag"].to_numpy(),
                          exp["l_returnflag"].to_numpy())
    assert np.array_equal(got["total_qty"].to_numpy(np.int64),
                          exp["total_qty"].to_numpy(np.int64))
    assert np.array_equal(got["wmedian_price"].to_numpy(),
                          exp["wm"].to_numpy())
