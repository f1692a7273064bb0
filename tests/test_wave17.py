"""Wave-17 operators: IQR-winsorized robust mean from the lattice
histogram, presence-mask Venn segmentation over (user, day) cells, CDC
latest-wins compaction.

Local pandas/numpy replays pin the ENGINE against refactors; the SQL
oracles run at the driver / check_oracle gate (all three bit-exact at
sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _events(columns=None) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet", columns=columns)


def test_winsorized_mean_matches_numpy_clip():
    from ecov003_l2t_stars_ray.pipelines.stats import winsorized_mean_by_type

    got = winsorized_mean_by_type(SF)
    ev = _events(["event_type", "value"])
    rows = []
    for t, g in ev.groupby("event_type"):
        q = np.floor(g["value"].to_numpy(np.float64) * 1024 + 0.5).astype(
            np.int64
        )
        lo, hi = np.quantile(q, [0.25, 0.75])  # exact on binary fractions
        w = np.clip(q.astype(np.float64), lo, hi)
        rows.append((t, len(q), w.mean() / 1024.0))
    exp = pd.DataFrame(rows, columns=["event_type", "n", "wm"]).sort_values(
        "event_type", ignore_index=True
    )
    assert list(got["event_type"]) == list(exp["event_type"])
    assert np.array_equal(got["n"].to_numpy(np.int64),
                          exp["n"].to_numpy(np.int64))
    assert np.allclose(got["wmean"], exp["wm"], atol=1e-6)
    # winsorized mean must sit strictly inside the raw min/max whenever
    # the type has outliers beyond the IQR
    raw = ev.groupby("event_type")["value"].agg(["min", "max"])
    assert (got["wmean"].to_numpy() >= raw["min"].to_numpy() - 1e-9).all()
    assert (got["wmean"].to_numpy() <= raw["max"].to_numpy() + 1e-9).all()


def test_daily_mix_segments_matches_pandas():
    from ecov003_l2t_stars_ray.pipelines.grouping import daily_mix_segments

    types = ("click", "error", "purchase", "signup", "view")
    got = daily_mix_segments(SF, types=types)
    ev = _events(["user_id", "ts", "event_type"])
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    bit = ev["event_type"].map({t: 1 << i for i, t in enumerate(types)})
    cells = (
        pd.DataFrame({"u": ev["user_id"], "d": day, "b": bit})
        .drop_duplicates()
        .groupby(["u", "d"])["b"]
        .sum()
    )
    exp = cells.value_counts().sort_index()
    assert list(got["mask"]) == list(exp.index)
    assert np.array_equal(got["n_cells"].to_numpy(np.int64),
                          exp.to_numpy(np.int64))
    # conservation: total cells == distinct (user, day) pairs
    assert int(got["n_cells"].sum()) == len(cells)


def test_latest_event_state_matches_pandas():
    from ecov003_l2t_stars_ray.pipelines.grouping import latest_event_state

    got = latest_event_state(SF)
    ev = _events()
    exp = (
        ev.sort_values(["user_id", "event_type", "ts", "event_id"],
                       ascending=[True, True, False, False])
        .groupby(["user_id", "event_type"], as_index=False)
        .first()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    assert len(got) == len(exp)
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert list(got["event_type"]) == list(exp["event_type"])
    assert np.array_equal(
        got["last_ts"].astype("datetime64[us]").astype(np.int64).to_numpy(),
        exp["ts"].astype("datetime64[us]").astype(np.int64).to_numpy(),
    )
    assert np.array_equal(got["last_value"].to_numpy(np.float64),
                          exp["value"].to_numpy(np.float64))
    assert np.array_equal(got["last_event_id"].to_numpy(np.int64),
                          exp["event_id"].to_numpy(np.int64))
