"""Wave-32 operators: SCD2 validity-interval history, per-user Kendall
tau-b on the day axis, and dense-axis linear interpolation fill.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
MIN_US = 60_000_000


def test_scd2_intervals_contiguous_and_collapsed():
    from ecov003_l2t_stars_ray.pipelines.grouping import scd2_intervals

    got = scd2_intervals(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    # literal replay: consecutive-dedup per user
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        et = g["event_type"].astype(str).to_numpy()
        ts = g["ts"].to_numpy()
        keep = np.concatenate([[True], et[1:] != et[:-1]])
        idx = np.flatnonzero(keep)
        for v, i in enumerate(idx):
            vt = ts[idx[v + 1]] if v + 1 < len(idx) else None
            rows.append((uid, v + 1, et[i], ts[i], vt))
    want = pd.DataFrame(
        rows, columns=["user_id", "version", "event_type", "valid_from",
                       "valid_to"]
    )
    assert len(got) == len(want)
    g = got.reset_index(drop=True)
    assert np.array_equal(g["user_id"].to_numpy(np.int64),
                          want["user_id"].to_numpy(np.int64))
    assert np.array_equal(g["version"].to_numpy(np.int64),
                          want["version"].to_numpy(np.int64))
    assert list(g["event_type"]) == list(want["event_type"])
    assert np.array_equal(
        g["valid_from"].to_numpy("datetime64[us]"),
        want["valid_from"].to_numpy().astype("datetime64[us]"),
    )
    # intervals tile: valid_to of v == valid_from of v+1; one open
    # (sentinel) row per user, flagged is_current
    cur = g[g["is_current"]]
    assert len(cur) == g["user_id"].nunique()
    assert (cur["valid_to"] == np.datetime64("9999-12-31T23:59:59")).all()
    nxt = g.groupby("user_id")["valid_from"].shift(-1)
    closed = g["valid_to"][~g["is_current"]]
    assert (closed == nxt[~g["is_current"]]).all()
    # no consecutive equal types within a user
    same = (g["user_id"].shift() == g["user_id"]) & (
        g["event_type"].shift() == g["event_type"]
    )
    assert not same.any()


def test_kendall_tau_daily_matches_literal_pairs():
    from ecov003_l2t_stars_ray.pipelines.stats import kendall_tau_daily

    got = kendall_tau_daily(SF).set_index("user_id")
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    )
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    lat = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )
    d = (
        pd.DataFrame({"u": ev["user_id"], "day": day, "lat": lat})
        .groupby(["u", "day"], as_index=False)["lat"]
        .sum()
    )
    for uid, g in list(d.groupby("u"))[:12]:
        y = g.sort_values("day")["lat"].to_numpy(np.int64)
        k = len(y)
        c = disc = t = 0
        for i in range(k):
            for j in range(i + 1, k):
                if y[j] > y[i]:
                    c += 1
                elif y[j] < y[i]:
                    disc += 1
                else:
                    t += 1
        n0 = k * (k - 1) // 2
        row = got.loc[uid]
        assert int(row["n_days"]) == k
        assert int(row["n_pairs"]) == n0
        if n0 == 0 or n0 == t:
            assert np.isnan(row["tau_b"])
        else:
            tau = (c - disc) / np.sqrt(float(n0) * float(n0 - t))
            assert abs(row["tau_b"] - tau) < 2e-6
    assert (got["tau_b"].dropna().abs() <= 1 + 1e-9).all()


def test_interp_fill_dense_axis_and_linearity():
    from ecov003_l2t_stars_ray.pipelines.stats import interp_fill_1m

    got = interp_fill_1m(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
    )
    b = ev["ts"].astype("datetime64[us]").astype(np.int64) // MIN_US
    lat = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )
    obs = (
        pd.DataFrame({"t": ev["event_type"].astype(str), "b": b,
                      "lat": lat})
        .groupby(["t", "b"])
        .agg(lat=("lat", "sum"), n=("lat", "size"))
        .reset_index()
    )
    # dense axis: per type, every minute between min and max is present
    for t, g in got.groupby("event_type"):
        bk = g["bucket_min"].to_numpy(np.int64)
        assert np.array_equal(bk, np.arange(bk.min(), bk.max() + 1))
    # observed buckets carry the lattice mean
    o = got[~got["interpolated"]].set_index(["event_type", "bucket_min"])
    for _, r in obs.sample(n=min(50, len(obs)), random_state=7).iterrows():
        v = r["lat"] / (1024.0 * r["n"])
        assert abs(o.loc[(r["t"], r["b"])]["value"] - v) < 1e-6
    # interpolated buckets sit ON the line between their neighbours
    gi = got.sort_values(["event_type", "bucket_min"], ignore_index=True)
    vv = gi["value"].to_numpy(np.float64)
    ii = gi["interpolated"].to_numpy(bool)
    tt = gi["event_type"].to_numpy()
    # every maximal interpolated run must be an arithmetic progression
    run = 0
    for i in range(1, len(gi) - 1):
        if ii[i] and tt[i - 1] == tt[i] == tt[i + 1]:
            run += 1
            if not (ii[i - 1] or ii[i + 1]):  # isolated gap of length 1
                mid = vv[i - 1] + (vv[i + 1] - vv[i - 1]) * 0.5
                assert abs(vv[i] - mid) < 2e-6
    assert ii.sum() > 0 and (~ii).sum() == len(obs)
