"""Wave-30 operators: PSI distribution-drift cells and per-user max
drawdown of the running lattice total.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 24 * 3_600_000_000


def test_psi_value_drift_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.stats import psi_value_drift

    got = psi_value_drift(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value", "ts"]
    )
    d = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    cut = (int(d.min()) + int(d.max())) // 2
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )
    df = pd.DataFrame(
        {
            "t": ev["event_type"].astype(str),
            "bin": q // 32768,
            "early": (d <= cut).astype(int),
        }
    )
    c = df.groupby(["t", "bin"]).agg(
        n_early=("early", "sum"), n=("early", "size")
    ).reset_index()
    c["n_late"] = c["n"] - c["n_early"]
    te = c.groupby("t")["n_early"].transform("sum")
    tl = c.groupby("t")["n_late"].transform("sum")
    keep = (c["n_early"] > 0) & (c["n_late"] > 0)
    p = c["n_early"] / te
    ql = c["n_late"] / tl
    c["term"] = (p - ql) * np.log(p / ql)
    exp = c[keep].sort_values(["t", "bin"], ignore_index=True)
    assert np.array_equal(got["event_type"].to_numpy(), exp["t"].to_numpy())
    assert np.array_equal(got["bin"].to_numpy(np.int64),
                          exp["bin"].to_numpy(np.int64))
    assert np.array_equal(got["n_early"].to_numpy(np.int64),
                          exp["n_early"].to_numpy(np.int64))
    assert np.allclose(got["psi_term"], exp["term"], atol=1e-6)
    # PSI terms are non-negative by construction: (p-q) ln(p/q) >= 0
    assert (got["psi_term"] >= 0).all()
    # marginal conservation inside kept cells never exceeds the corpus
    assert got["n_early"].sum() + got["n_late"].sum() <= len(ev)


def test_max_drawdown_matches_literal_scan():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        max_drawdown_per_user,
    )

    got = max_drawdown_per_user(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "value", "ts", "event_id"],
    ).sort_values(["user_id", "ts", "event_id"])
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )
    ev = ev.assign(q=q)
    rows = []
    for u, g in ev.groupby("user_id"):
        run = peak = dd = 0
        for x in g["q"]:
            run += int(x)
            peak = max(peak, run)
            dd = max(dd, peak - run)
        rows.append((int(u), dd / 1024.0, peak / 1024.0, run / 1024.0))
    exp = pd.DataFrame(
        rows, columns=["user_id", "dd", "pk", "fin"]
    ).sort_values("user_id", ignore_index=True)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    # exact int lattice chain: bitwise equality after /1024.0
    assert np.array_equal(got["max_drawdown"].to_numpy(),
                          exp["dd"].to_numpy())
    assert np.array_equal(got["peak_cum"].to_numpy(), exp["pk"].to_numpy())
    assert np.array_equal(got["final_cum"].to_numpy(), exp["fin"].to_numpy())
    assert (got["max_drawdown"] >= 0).all()
    assert (got["peak_cum"] >= got["final_cum"] - 1e-12).all()
