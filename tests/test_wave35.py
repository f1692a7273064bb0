"""Wave-35 operators: discrete survival/hazard table, exact doc-length
quantiles (crossing rule), daily open-order backlog sweep.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def test_survival_curve_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.stats import survival_curve

    got = survival_curve(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    span = (
        pd.DataFrame({"u": ev["user_id"], "d": day})
        .groupby("u")["d"]
        .agg(lambda s: s.max() - s.min())
    )
    hist = span.value_counts().sort_index()
    assert list(got["lifespan"]) == list(hist.index)
    assert list(got["n_churned"]) == list(hist.values)
    # at-risk telescopes: risk(t) = churned at >= t; first row = n_users
    want_risk = hist[::-1].cumsum()[::-1]
    assert list(got["n_at_risk"]) == list(want_risk.values)
    assert int(got["n_at_risk"].iloc[0]) == span.size
    assert np.allclose(got["hazard"],
                       got["n_churned"] / got["n_at_risk"], atol=1e-6)


def test_doc_length_quantiles_crossing_rule():
    from ecov003_l2t_stars_ray.pipelines.stats import doc_length_quantiles

    got = doc_length_quantiles(SF)
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "n_chars"]
    )
    for lang, g in docs.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        for q in (25, 50, 75):
            k = (q * n + 99) // 100
            want = int(v[k - 1])
            row = got[(got["lang"] == str(lang)) & (got["q"] == q)]
            assert int(row["p_value"].iloc[0]) == want
            assert int(row["n_docs"].iloc[0]) == n
    # quantiles are monotone within a lang
    for _, g in got.groupby("lang"):
        p = g.sort_values("q")["p_value"].to_numpy()
        assert (np.diff(p) >= 0).all()


def test_order_backlog_daily_matches_literal_sweep():
    from ecov003_l2t_stars_ray.pipelines.joins import order_backlog_daily

    got = order_backlog_daily(SF)
    o = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    ship = (
        li.assign(
            d=li["l_shipdate"].astype("datetime64[us]").astype(np.int64)
            // DAY_US
        )
        .groupby("l_orderkey")["d"]
        .max()
    )
    od = o.assign(
        d=o["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        // DAY_US
    ).set_index("o_orderkey")["d"]
    j = pd.concat([od.rename("open"), ship.rename("ship")], axis=1).dropna()
    j["ship"] = np.maximum(j["ship"], j["open"]).astype(np.int64)
    deltas = {}
    for _, r in j.iterrows():
        deltas[int(r["open"])] = deltas.get(int(r["open"]), 0) + 1
        deltas[int(r["ship"]) + 1] = deltas.get(int(r["ship"]) + 1, 0) - 1
    days = sorted(deltas)
    run, want = 0, []
    for d in days:
        run += deltas[d]
        want.append((d, run))
    assert list(map(tuple, got[["day", "backlog"]].to_numpy())) == want
    # sweep closes: final backlog is zero
    assert int(got["backlog"].iloc[-1]) == 0
