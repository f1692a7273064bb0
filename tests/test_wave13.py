"""Wave-13 operators: sweep-line peak concurrency, dense-axis lag-1
autocorrelation, exact two-sample KS distance, first-seen daily cohorts.

Local pandas/numpy replays over raw parquet pin the ENGINE (block-offset
prefix rebase, dense scatter, cross-multiplied ECDF max, distributed
first-occurrence) against refactors; the SQL oracles run at the driver /
check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"
US = 1_000_000
HOLD_US = 300 * US


def _events() -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()


def test_peak_concurrency_matches_full_sweep():
    from ecov003_l2t_stars_ray.pipelines.analytics import peak_concurrency

    got = peak_concurrency(SF)
    ev = _events()
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    et = ev["event_type"].astype(str).to_numpy()
    want = {}
    for ty in np.unique(et):
        s = np.sort(t[et == ty])
        # single-pass sweep: merge net deltas per boundary, running max
        d = pd.Series(
            np.concatenate(
                [np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]
            ),
            index=np.concatenate([s, s + HOLD_US]),
        )
        net = d.groupby(level=0).sum().sort_index()
        want[ty] = int(np.cumsum(net.to_numpy()).max())
    assert dict(zip(got["event_type"], got["peak_concurrent"])) == want
    # sanity: peak is at least 1 and never exceeds the type's row count
    cnt = pd.Series(et).value_counts()
    for ty, pk in want.items():
        assert 1 <= pk <= int(cnt[ty])
    assert list(got["event_type"]) == sorted(got["event_type"])


def test_peak_concurrency_end_before_start_at_equal_ts():
    # an interval ending exactly when another starts must NOT overlap it:
    # with hold 300 s, events at t and t+300s for one type peak at 1
    from ecov003_l2t_stars_ray.pipelines.analytics import peak_concurrency

    ev = _events()
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    et = ev["event_type"].astype(str).to_numpy()
    got = dict(
        zip(
            peak_concurrency(SF)["event_type"],
            peak_concurrency(SF)["peak_concurrent"],
        )
    )
    # replay with the WRONG convention (starts before ends) as an upper
    # bound: correct close-open peaks can only be <= that
    for ty in np.unique(et)[:2]:
        s = np.sort(t[et == ty])
        ends = s + HOLD_US
        allb = np.concatenate([s, ends])
        delta = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]
        )
        order = np.lexsort((-delta, allb))  # starts first at equal ts
        upper = int(np.cumsum(delta[order]).max())
        assert got[ty] <= upper


def test_autocorr_lag1_dense_axis_and_moments():
    from ecov003_l2t_stars_ray.pipelines.stats import autocorr_lag1_hourly

    got = autocorr_lag1_hourly(SF)
    ev = _events()
    hr = ev["ts"].astype("datetime64[us]").astype(np.int64) // (3600 * US)
    et = ev["event_type"].astype(str)
    lo, hi = int(hr.min()), int(hr.max())
    H = hi - lo + 1
    for _, row in got.iterrows():
        g = hr[et == row["event_type"]]
        dense = np.zeros(H, np.int64)
        cnt = g.value_counts()
        dense[cnt.index.to_numpy(np.int64) - lo] = cnt.to_numpy(np.int64)
        x, y = dense[:-1].astype(float), dense[1:].astype(float)
        want = np.corrcoef(x, y)[0, 1]
        assert row["n_pairs"] == H - 1
        assert abs(row["autocorr"] - want) < 1e-6
        assert -1.0 <= row["autocorr"] <= 1.0


def test_ks_statistic_matches_scipy_style_ecdf_max():
    from ecov003_l2t_stars_ray.pipelines.stats import ks_test_values

    got = ks_test_values(SF)
    ev = _events()
    q = np.floor(
        ev["value"].to_numpy(np.float64) * 1024.0 + 0.5
    ).astype(np.int64)
    et = ev["event_type"].astype(str).to_numpy()
    a = np.sort(q[et == "view"])
    b = np.sort(q[et == "purchase"])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    want = float(np.abs(fa - fb).max())
    assert int(got["n_a"].iloc[0]) == len(a)
    assert int(got["n_b"].iloc[0]) == len(b)
    assert abs(float(got["ks_stat"].iloc[0]) - want) < 1e-6
    # integer carrier consistency: ks_num / (n_a*n_b) == ks_stat pre-round
    dn = int(got["ks_num"].iloc[0])
    assert abs(dn / (len(a) * len(b)) - want) < 1e-12


def test_user_first_seen_daily_cohorts():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        user_first_seen_daily,
    )

    got = user_first_seen_daily(SF)
    ev = _events()
    t = ev["ts"].astype("datetime64[us]").astype(np.int64)
    first = (
        pd.DataFrame({"u": ev["user_id"], "t": t}).groupby("u")["t"].min()
    )
    day = first // (86400 * US)
    want = day.value_counts().sort_index()
    assert list(got["day"]) == list(want.index)
    assert list(got["new_users"]) == list(want.to_numpy())
    assert int(got["cum_users"].iloc[-1]) == ev["user_id"].nunique()
    assert (got["cum_users"].diff().fillna(got["cum_users"].iloc[0])
            == got["new_users"]).all()
