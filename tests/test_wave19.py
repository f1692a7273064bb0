"""Wave-19 operators: step-function time-weighted average, conversion
latency (signup -> first purchase), data-quality assertion audit.

Local pandas replays pin the ENGINE against refactors; the SQL oracles
run at the driver / check_oracle gate (all three bit-exact at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
US = 1_000_000


def _events(columns=None) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet", columns=columns)


def test_time_weighted_avg_matches_stepwise_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        time_weighted_avg_value,
    )

    got = time_weighted_avg_value(SF)
    ev = _events(["user_id", "ts", "event_id", "value"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    rows = []
    for u, g in ev.groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        q = np.floor(g["value"].to_numpy(np.float64) * 1024 + 0.5).astype(
            np.int64
        )
        gap = (t[1:] - t[:-1]) // US
        if gap.sum() <= 0:
            continue
        rows.append((int(u), int(gap.sum()),
                     (q[:-1] * gap).sum() / gap.sum() / 1024.0))
    exp = pd.DataFrame(rows, columns=["user_id", "dwell_s", "twa"])
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["dwell_s"].to_numpy(np.int64),
                          exp["dwell_s"].to_numpy(np.int64))
    assert np.allclose(got["twa"], exp["twa"], atol=1e-6)
    # TWA must lie within the raw value envelope per user
    env = ev.groupby("user_id")["value"].agg(["min", "max"])
    assert (got["twa"].to_numpy()
            >= env["min"].reindex(got["user_id"]).to_numpy() - 1e-3).all()
    assert (got["twa"].to_numpy()
            <= env["max"].reindex(got["user_id"]).to_numpy() + 1e-3).all()


def test_signup_to_purchase_lag_matches_replay():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        signup_to_purchase_lag,
    )

    got = signup_to_purchase_lag(SF)
    ev = _events(["user_id", "ts", "event_type"])
    rows = []
    for u, g in ev.groupby("user_id"):
        s = g.loc[g["event_type"] == "signup", "ts"]
        if s.empty:
            continue
        s0 = s.min()
        p = g.loc[(g["event_type"] == "purchase") & (g["ts"] >= s0), "ts"]
        if p.empty:
            continue
        lag = (
            p.min().to_datetime64().astype("datetime64[us]").astype(np.int64)
            - s0.to_datetime64().astype("datetime64[us]").astype(np.int64)
        ) // (3600 * US)
        rows.append((int(u), s0, p.min(), int(lag)))
    exp = pd.DataFrame(
        rows, columns=["user_id", "s", "p", "lag"]
    ).sort_values("user_id", ignore_index=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert (got["signup_ts"].to_numpy() == exp["s"].to_numpy()).all()
    assert (got["first_purchase_ts"].to_numpy() == exp["p"].to_numpy()).all()
    assert np.array_equal(got["lag_hours"].to_numpy(np.int64),
                          exp["lag"].to_numpy(np.int64))
    assert (got["lag_hours"] >= 0).all()


def test_dq_audit_detects_planted_violations(tmp_path):
    """Plant one of each violation class in a copied mini-corpus and
    assert the audit counts them exactly."""
    import shutil

    from ecov003_l2t_stars_ray.pipelines.analytics import dq_audit

    d = tmp_path / "sf"
    d.mkdir()
    for t in ["events", "lineitem", "orders", "customer"]:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    ev = pd.read_parquet(d / "events.parquet")
    bad = ev.head(3).copy()
    bad.loc[:, "event_id"] = ev["event_id"].iloc[0]  # id now appears 4x
    bad.loc[:, "value"] = 9999.0  # 3 out-of-range
    bad.loc[:, "props"] = ""  # 3 blank props
    pd.concat([ev, bad]).to_parquet(d / "events.parquet", index=False)
    li = pd.read_parquet(d / "lineitem.parquet")
    li.loc[li.index[:2], "l_orderkey"] = -1  # 2 orphans
    li.to_parquet(d / "lineitem.parquet", index=False)

    got = dq_audit(str(d)).set_index("rule")["n_violations"]
    assert got["events_dup_event_id"] == 3
    assert got["events_null_props"] == 3
    assert got["events_value_out_of_range"] == 3
    assert got["lineitem_orphan_orderkey"] == 2
    assert got["orders_orphan_custkey"] == 0

    clean = dq_audit(SF).set_index("rule")["n_violations"]
    assert int(clean.drop("events_value_out_of_range").sum()) == 0
