"""Wave-37 operators: weekly growth accounting, daily p10/p90 value
envelope.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
WEEK_US = 7 * 86_400_000_000
DAY_US = 86_400_000_000


def test_growth_accounting_identity_and_literal():
    from ecov003_l2t_stars_ray.pipelines.grouping import growth_accounting

    got = growth_accounting(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    w = ev["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
    uw = (
        pd.DataFrame({"u": ev["user_id"], "w": w})
        .drop_duplicates()
        .sort_values(["u", "w"])
    )
    cells = {}
    mw = int(uw["w"].max())
    for _, g in uw.groupby("u"):
        ws = g["w"].to_numpy(np.int64)
        for i, x in enumerate(ws):
            if i == 0:
                st = "new"
            elif x - ws[i - 1] == 1:
                st = "retained"
            else:
                st = "resurrected"
            cells[(x, st)] = cells.get((x, st), 0) + 1
            nxt = ws[i + 1] if i + 1 < len(ws) else None
            if (nxt is None or nxt - x > 1) and x + 1 <= mw:
                cells[(x + 1, "churned")] = cells.get(
                    (x + 1, "churned"), 0
                ) + 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(cells.items())],
        columns=["week", "status", "n"],
    )
    g = got.reset_index(drop=True)
    assert len(g) == len(want)
    assert list(map(tuple, g.to_numpy())) == list(map(tuple, want.to_numpy()))
    # ledger identity: actives(w) == new + retained + resurrected, and
    # churned(w) == actives(w-1) - retained(w)
    p = g.pivot_table(index="week", columns="status", values="n",
                      aggfunc="sum", fill_value=0)
    for c in ("new", "retained", "resurrected", "churned"):
        if c not in p:
            p[c] = 0
    actives = p["new"] + p["retained"] + p["resurrected"]
    for wk in p.index[1:]:
        if wk - 1 in p.index:
            assert p.loc[wk, "churned"] == (
                actives.loc[wk - 1] - p.loc[wk, "retained"]
            )


def test_daily_value_envelope_crossing():
    from ecov003_l2t_stars_ray.pipelines.grouping import daily_value_envelope

    got = daily_value_envelope(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
    )
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    lat = np.floor(ev["value"].to_numpy() * 1024.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev["event_type"].astype(str), "d": day,
                       "lat": lat})
    for (t, d), g in list(df.groupby(["t", "d"]))[:40]:
        v = np.sort(g["lat"].to_numpy())
        n = len(v)
        row = got[(got["event_type"] == t) & (got["day"] == d)].iloc[0]
        assert int(row["n"]) == n
        assert int(row["p10_lat"]) == v[(n + 9) // 10 - 1]
        assert int(row["p90_lat"]) == v[(9 * n + 9) // 10 - 1]
        assert row["p10"] == row["p10_lat"] / 1024.0
    assert (got["p90_lat"] >= got["p10_lat"]).all()
