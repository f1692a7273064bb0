"""Wave-23 operators: integer CUSUM change-point (prefix-min identity)
and k-anonymity quasi-identifier audit.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate (both bit-exact at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_cusum_matches_stepwise_recurrence():
    from ecov003_l2t_stars_ray.pipelines.stats import cusum_changepoint

    got = cusum_changepoint(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    hr = ev["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
    h0, h1 = int(hr.min()), int(hr.max())
    H = h1 - h0 + 1
    rows = []
    for t, g in pd.DataFrame({"t": ev["event_type"], "h": hr}).groupby("t"):
        x = np.zeros(H, dtype=np.int64)
        cnt = g.groupby("h").size()
        x[cnt.index.to_numpy() - h0] = cnt.to_numpy()
        k = (int(x.sum()) + H - 1) // H
        s = 0
        best, best_i = -1, -1
        for i in range(H):  # literal stepwise recurrence
            s = max(0, s + int(x[i]) - k)
            if s > best:
                best, best_i = s, i
        rows.append((t, best, h0 + best_i))
    exp = pd.DataFrame(
        rows, columns=["event_type", "max_cusum", "first_hour"]
    ).sort_values("event_type", ignore_index=True)
    assert list(got["event_type"]) == list(exp["event_type"])
    assert np.array_equal(got["max_cusum"].to_numpy(np.int64),
                          exp["max_cusum"].to_numpy(np.int64))
    assert np.array_equal(got["first_hour"].to_numpy(np.int64),
                          exp["first_hour"].to_numpy(np.int64))
    assert (got["max_cusum"] >= 0).all()


def test_cusum_planted_burst_is_detected(tmp_path):
    """A planted 1-hour burst must move the change-point to that hour."""
    import shutil

    from ecov003_l2t_stars_ray.pipelines.stats import cusum_changepoint

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    ev = pd.read_parquet(d / "events.parquet")
    burst = ev.head(200).copy()
    burst_ts = ev["ts"].min() + pd.Timedelta(hours=100)
    burst["ts"] = burst_ts
    burst["event_type"] = "error"
    pd.concat([ev, burst]).to_parquet(d / "events.parquet", index=False)

    got = cusum_changepoint(str(d)).set_index("event_type")
    burst_hour = (
        burst_ts.to_datetime64().astype("datetime64[us]").astype(np.int64)
        // HOUR_US
    )
    assert got.loc["error", "first_hour"] == burst_hour
    assert got.loc["error", "max_cusum"] >= 190


def test_k_anonymity_audit_matches_group_sizes():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        k_anonymity_audit,
    )

    got = k_anonymity_audit(SF, k=10)
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "source"])
    c = d.groupby(["lang", "source"]).size()
    assert int(got["n_groups"].iloc[0]) == len(c)
    assert int(got["min_group_size"].iloc[0]) == int(c.min())
    assert int(got["n_groups_below_k"].iloc[0]) == int((c < 10).sum())
    assert int(got["n_docs_below_k"].iloc[0]) == int(c[c < 10].sum())
