"""Wave-36 operators: nearest-neighbour temporal join, business-day ship
lag, deterministic weighted sampling (A-Res).

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate (weighted_sample is rows-only by
contract — its key chain has no reasonable SQL mirror)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_nearest_event_join_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.grouping import nearest_event_join

    got = nearest_event_join(SF).set_index("event_id")
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    ev = ev[ev["event_type"].isin(["purchase", "click"])]
    band = np.timedelta64(600, "s")
    n_targets = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        et = g["event_type"].astype(str).to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        for i in np.flatnonzero(et == "purchase"):
            n_targets += 1
            prevs = [j for j in range(i) if et[j] == "click"]
            nexts = [j for j in range(i + 1, len(g)) if et[j] == "click"]
            pg = (ts[i] - ts[prevs[-1]]) if prevs else None
            ng = (ts[nexts[0]] - ts[i]) if nexts else None
            pg = pg if (pg is not None and pg <= band) else None
            ng = ng if (ng is not None and ng <= band) else None
            row = got.loc[eid[i]]
            if pg is not None and (ng is None or pg <= ng):
                assert row["side"] == "prev"
                assert int(row["nearest_id"]) == eid[prevs[-1]]
                assert int(row["gap_us"]) == pg.astype(
                    "timedelta64[us]").astype(np.int64)
            elif ng is not None:
                assert row["side"] == "next"
                assert int(row["nearest_id"]) == eid[nexts[0]]
            else:
                assert row["side"] == "none"
                assert np.isnan(row["nearest_id"])
    assert len(got) == n_targets


def test_business_day_lag_weekday_formula():
    from ecov003_l2t_stars_ray.pipelines.joins import business_day_lag

    # the closed-form weekday count agrees with np.busday_count
    def g(d):
        s = d + 3
        return 5 * (s // 7) + np.minimum(s % 7 + 1, 5) - 3

    days = np.arange(9000, 12000)
    lag = g(days + 7) - g(days)
    assert (lag == 5).all()  # any 7-day window holds 5 weekdays
    d0 = np.datetime64("1970-01-01")
    for o, s in [(10000, 10003), (10001, 10010), (10004, 10004),
                 (10005, 10006)]:
        want = np.busday_count(
            d0 + o + 1, d0 + s + 1
        )  # busday_count is [begin, end): shift both to get (o, s]
        assert g(np.int64(s)) - g(np.int64(o)) == want
    got = business_day_lag(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    assert int(got["n_lines"].sum()) == len(j)
    assert (got["max_bdays"] >= 0).all()
    assert np.allclose(got["mean_bdays"],
                       got["sum_bdays"] / got["n_lines"], atol=1e-6)


def test_weighted_sample_ares_invariants():
    from ecov003_l2t_stars_ray.pipelines.sketches import (
        _splitmix64,
        weighted_sample,
    )

    got = weighted_sample(SF, k=50)
    o = pd.read_parquet(f"{SF}/orders.parquet")
    h = _splitmix64(o["o_orderkey"].to_numpy(np.int64).view(np.uint64))
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0**-53
    key = -np.log(u) / o["o_totalprice"].to_numpy(np.float64)
    want = (
        o.assign(key=key)
        .sort_values(["key", "o_orderkey"], kind="mergesort")
        .head(50)
    )
    assert list(got["o_orderkey"]) == list(want["o_orderkey"])
    assert np.allclose(got["key"], want["key"], rtol=0, atol=0)
    # the winning keys are exactly the 50 smallest
    assert got["key"].max() <= np.partition(key, 50)[50]
