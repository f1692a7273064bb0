"""Wave-31 operators: hourly ACF profile (lags 1..24) and per-user
ordered top-k STRING_AGG.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_acf_profile_matches_replay_and_lag1():
    from ecov003_l2t_stars_ray.pipelines.stats import (
        acf_profile_hourly,
        autocorr_lag1_hourly,
    )

    got = acf_profile_hourly(SF)
    assert set(got["lag"]) == set(range(1, 25))
    # lag-1 slice must agree with the dedicated lag-1 operator
    l1 = autocorr_lag1_hourly(SF).set_index("event_type")
    g1 = got[got["lag"] == 1].set_index("event_type")
    assert np.allclose(
        g1["autocorr"].to_numpy(), l1["autocorr"].to_numpy(), atol=1e-9
    )
    assert np.array_equal(g1["n_pairs"].to_numpy(np.int64),
                          l1["n_pairs"].to_numpy(np.int64))
    # replay one type at lag 7 against a literal numpy corrcoef
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    hr = ev["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
    t0 = sorted(ev["event_type"].astype(str).unique())[0]
    h = hr[ev["event_type"].astype(str) == t0].value_counts().sort_index()
    lo, hi = int(hr.min()), int(hr.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[h.index.to_numpy(np.int64) - lo] = h.to_numpy(np.int64)
    r7 = np.corrcoef(dense[:-7].astype(float), dense[7:].astype(float))[0, 1]
    got7 = got[(got["event_type"] == t0) & (got["lag"] == 7)][
        "autocorr"
    ].iloc[0]
    assert abs(got7 - r7) < 1e-6
    assert (got["autocorr"].abs() <= 1 + 1e-9).all()


def test_user_top_types_concat_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        user_top_types_concat,
    )

    got = user_top_types_concat(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    )
    c = (
        ev.assign(event_type=ev["event_type"].astype(str))
        .groupby(["user_id", "event_type"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        )
    )
    rows = []
    for u, g in c.groupby("user_id"):
        top = g.head(3)
        rows.append((int(u), ",".join(top["event_type"]), int(top["n"].sum())))
    exp = pd.DataFrame(
        rows, columns=["user_id", "top_types", "n_top"]
    ).sort_values("user_id", ignore_index=True)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["top_types"].to_numpy(object),
                          exp["top_types"].to_numpy(object))
    assert np.array_equal(got["n_top"].to_numpy(np.int64),
                          exp["n_top"].to_numpy(np.int64))
    # users with fewer than 3 types join fewer tokens, never a dangling sep
    assert not got["top_types"].str.contains(",,").any()
    assert not got["top_types"].str.endswith(",").any()
