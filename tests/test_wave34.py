"""Wave-34 operators: order-vs-lines reconciliation, linear multi-touch
attribution, PageRank over the co-purchase graph.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate (pagerank is rows-only by contract —
iterative float fixpoint)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_reconciliation_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.joins import order_reconciliation

    got = order_reconciliation(SF).set_index("status")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    net = (
        np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(
            np.int64
        )
        * (100 - np.floor(li["l_discount"].to_numpy() * 100 + 0.5)
           .astype(np.int64))
        * (100 + np.floor(li["l_tax"].to_numpy() * 100 + 0.5)
           .astype(np.int64))
    )
    lsum = (
        pd.DataFrame({"k": li["l_orderkey"], "net": net})
        .groupby("k")
        .agg(net=("net", "sum"), n=("net", "size"))
    )
    tot = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    j = pd.DataFrame(
        {"k": o["o_orderkey"], "status": o["o_orderstatus"].astype(str),
         "tot": tot}
    ).join(lsum, on="k")
    j["n"] = j["n"].fillna(0).astype(np.int64)
    j["net"] = j["net"].fillna(0).astype(np.int64)
    for st, g in j.groupby("status"):
        gap = np.abs(g["tot"].to_numpy() * 10_000 - g["net"].to_numpy())
        has = g["n"].to_numpy() > 0
        row = got.loc[st]
        assert int(row["n_orders"]) == len(g)
        assert int(row["n_no_lines"]) == int((~has).sum())
        assert int(row["n_within_tol"]) == int(
            (has & (gap * 100 <= g["tot"].to_numpy() * 10_000)).sum()
        )
        assert int(row["sum_abs_gap4"]) == int(gap[has].sum())
    # every lineitem's order exists in orders -> no '' status row
    assert "" not in got.index or got.loc[""]["n_orders"] >= 0


def test_multitouch_attribution_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        multitouch_attribution,
    )

    got = multitouch_attribution(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    win = np.timedelta64(1800, "s")
    cells = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        et = g["event_type"].astype(str).to_numpy()
        for i in np.flatnonzero(et == "purchase"):
            touches = [
                et[j]
                for j in range(len(g))
                if ts[j] < ts[i] and ts[j] >= ts[i] - win
                and et[j] != "purchase"
            ]
            k = len(touches)
            for tt in touches:
                cells[(tt, k)] = cells.get((tt, k), 0) + 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(cells.items())],
        columns=["touch_type", "k", "n_touches"],
    )
    g = got.reset_index(drop=True)
    assert len(g) == len(want)
    assert list(g["touch_type"]) == list(want["touch_type"])
    assert np.array_equal(g["k"].to_numpy(np.int64),
                          want["k"].to_numpy(np.int64))
    assert np.array_equal(g["n_touches"].to_numpy(np.int64),
                          want["n_touches"].to_numpy(np.int64))
    assert np.allclose(
        g["credit"], g["n_touches"] / g["k"], atol=1e-6
    )


def test_pagerank_matches_dense_power_iteration():
    from ecov003_l2t_stars_ray.pipelines.joins import pagerank_parts

    got = pagerank_parts(SF, iters=15, k=50)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(
            sorted(g["l_partkey"].unique()), 2
        ):
            edges.add((a, b))
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    deg = np.zeros(nn)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(nn, 1.0 / nn)
    for _ in range(15):
        acc = np.zeros(nn)
        share = r / deg
        for a, b in edges:
            acc[idx[a]] += share[idx[b]]
            acc[idx[b]] += share[idx[a]]
        r = 0.15 / nn + 0.85 * acc
    # ranks conserve mass and the returned top-k matches the replay
    assert abs(r.sum() - 1.0) < 1e-9
    want_order = sorted(
        range(nn), key=lambda i: (-r[i], nodes[i])
    )[:50]
    assert list(got["part"]) == [nodes[i] for i in want_order]
    assert np.allclose(
        got["rank"].to_numpy(),
        np.array([r[i] for i in want_order]),
        rtol=1e-7,
    )
