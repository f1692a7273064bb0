"""Wave-24 operators: Theil-Sen robust slope per user and the type-pair
Pearson co-movement matrix on the dense hourly axis.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_theil_sen_matches_bruteforce_median():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        theil_sen_slope_per_user,
    )

    got = theil_sen_slope_per_user(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    rows = []
    for u, g in ev.groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        v = g["value"].to_numpy(np.float64)
        slopes = []
        for i, j in itertools.combinations(range(len(t)), 2):
            a, b = (i, j) if t[i] < t[j] else (j, i)
            if t[a] == t[b]:
                continue
            slopes.append((v[b] - v[a]) * 3600000000.0 / (t[b] - t[a]))
        if not slopes:
            continue
        s = np.sort(np.array(slopes))
        n = len(s)
        lo, hi = s[(n - 1) // 2], s[n // 2]
        rows.append((int(u), n, lo + (hi - lo) * 0.5))
    exp = pd.DataFrame(
        rows, columns=["user_id", "n_pairs", "med"]
    ).sort_values("user_id", ignore_index=True)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["n_pairs"].to_numpy(np.int64),
                          exp["n_pairs"].to_numpy(np.int64))
    assert np.allclose(got["slope_per_hour"], exp["med"], atol=1e-6)


def test_type_cross_correlation_matches_corrcoef():
    from ecov003_l2t_stars_ray.pipelines.stats import type_cross_correlation

    got = type_cross_correlation(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    hr = ev["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
    h0, h1 = int(hr.min()), int(hr.max())
    H = h1 - h0 + 1
    dense = {}
    for t, g in pd.DataFrame({"t": ev["event_type"], "h": hr}).groupby("t"):
        x = np.zeros(H)
        c = g.groupby("h").size()
        x[c.index.to_numpy() - h0] = c.to_numpy()
        dense[t] = x
    types = sorted(dense)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for _, r in got.iterrows():
        expected = np.corrcoef(dense[r["type_a"]], dense[r["type_b"]])[0, 1]
        assert abs(r["corr"] - expected) < 1e-6, (r["type_a"], r["type_b"])
    assert (got["corr"].abs() <= 1.0 + 1e-9).all()
