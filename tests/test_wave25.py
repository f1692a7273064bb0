"""Wave-25 operators: gaps-and-islands run lengths over the event
sequence and per-user weekly-cadence regularity moments.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
WEEK_US = 7 * 24 * 3_600_000_000


def test_event_run_lengths_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import event_run_lengths

    got = event_run_lengths(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    ).sort_values(["user_id", "ts", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        et = g["event_type"].to_numpy()
        runs = 1 + int((et[1:] != et[:-1]).sum())
        # longest run by literal scan
        best, cur = 1, 1
        for i in range(1, len(et)):
            cur = cur + 1 if et[i] == et[i - 1] else 1
            best = max(best, cur)
        rows.append((int(u), runs, best))
    exp = pd.DataFrame(
        rows, columns=["user_id", "n_runs", "max_run"]
    ).sort_values("user_id", ignore_index=True)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["n_runs"].to_numpy(np.int64),
                          exp["n_runs"].to_numpy(np.int64))
    assert np.array_equal(got["max_run"].to_numpy(np.int64),
                          exp["max_run"].to_numpy(np.int64))
    assert (got["max_run"] >= 1).all()


def test_weekly_regularity_matches_moments():
    from ecov003_l2t_stars_ray.pipelines.grouping import weekly_regularity

    got = weekly_regularity(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    wk = ev["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
    rows = []
    for u, g in pd.DataFrame({"u": ev["user_id"], "w": wk}).groupby("u"):
        c = g.groupby("w").size().to_numpy(np.float64)
        var = c.var(ddof=1) if len(c) > 1 else np.nan
        rows.append((int(u), len(c), c.mean(), var))
    exp = pd.DataFrame(
        rows, columns=["user_id", "n_weeks", "mean_w", "var_w"]
    ).sort_values("user_id", ignore_index=True)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["n_weeks"].to_numpy(np.int64),
                          exp["n_weeks"].to_numpy(np.int64))
    assert np.allclose(got["mean_weekly"], exp["mean_w"], atol=1e-6)
    assert np.allclose(got["var_weekly"], exp["var_w"],
                       atol=1e-6, equal_nan=True)
    # conservation: per-user weekly sums equal total event counts
    tot = ev.groupby("user_id").size()
    approx = got["mean_weekly"].to_numpy() * got["n_weeks"].to_numpy()
    assert np.allclose(approx, tot.to_numpy(), atol=1e-3)
