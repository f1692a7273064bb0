"""Wave-10 operators: order-statistics family + TPC-H composites.

Each test pins the distributed result against an independent local pandas
/ numpy replay over the raw parquet (the SQL oracles run at the driver /
check_oracle gate; these guard the ENGINE implementation — block-offset
rank rebasing, early-stopping stream, lattice histograms — against
refactors)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _orders_pdf() -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/orders.parquet").to_pandas()


def _cust_cents() -> np.ndarray:
    o = _orders_pdf()
    cents = np.floor(o["o_totalprice"].to_numpy(np.float64) * 100 + 0.5)
    return (
        pd.DataFrame({"c": o["o_custkey"], "x": cents.astype(np.int64)})
        .groupby("c")["x"]
        .sum()
        .to_numpy(np.int64)
    )


def test_gini_matches_local_replay_and_bounds():
    from ecov003_l2t_stars_ray.pipelines.stats import gini_revenue

    got = gini_revenue(SF)
    x = np.sort(_cust_cents())
    n, sx = len(x), int(x.sum())
    swx = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
    want = 2.0 * swx / n / sx - (n + 1.0) / n
    assert int(got["n_customers"].iloc[0]) == n
    assert got["total_revenue"].iloc[0] == sx / 100.0
    # engine rounds half-away at 6dp; replay the same rounding
    want_r = np.sign(want) * np.floor(abs(want) * 1e6 + 0.5) / 1e6
    assert got["gini"].iloc[0] == want_r
    assert 0.0 <= got["gini"].iloc[0] < 1.0


def test_pareto_early_stop_matches_full_scan():
    from ecov003_l2t_stars_ray.pipelines.stats import pareto_revenue_share

    got = pareto_revenue_share(SF)
    x = np.sort(_cust_cents())[::-1]
    sx = int(x.sum())
    cum = np.cumsum(x)
    for _, row in got.iterrows():
        p = int(row["pct"])
        k = int(np.searchsorted(cum * 100, p * sx, side="left")) + 1
        assert int(row["n_customers"]) == k
        assert row["revenue_covered"] == int(cum[k - 1]) / 100.0
    # monotone: higher coverage needs at least as many customers
    ncs = got.sort_values("pct")["n_customers"].to_numpy()
    assert (np.diff(ncs) >= 0).all()


def test_median_mad_lattice_matches_numpy():
    from ecov003_l2t_stars_ray.pipelines.stats import median_mad_by_type

    got = median_mad_by_type(SF)
    ev = ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5)
    df = pd.DataFrame({"t": ev["event_type"].astype(str), "q": q})
    for _, row in got.iterrows():
        g = np.sort(df.loc[df["t"] == row["event_type"], "q"].to_numpy())
        assert int(row["n"]) == len(g)
        med = np.median(g)
        mad = np.median(np.abs(g - med))

        def r6(v):
            return np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6

        assert row["median_value"] == r6(med / 1024.0)
        assert row["mad_value"] == r6(mad / 1024.0)


def test_q18_threshold_and_join_integrity():
    from ecov003_l2t_stars_ray.pipelines.joins import q18_large_orders

    got = q18_large_orders(SF, qty_threshold=150)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet").to_pandas()
    q = np.floor(li["l_quantity"].to_numpy(np.float64) + 0.5).astype(np.int64)
    per = (
        pd.DataFrame({"k": li["l_orderkey"], "q": q})
        .groupby("k")["q"]
        .sum()
    )
    want_keys = set(per[per > 150].index.astype(np.int64))
    assert set(got["l_orderkey"].astype(np.int64)) == want_keys
    assert (got["sum_qty"] > 150).all()
    orders = _orders_pdf().set_index("o_orderkey")
    picked = orders.loc[got["l_orderkey"].to_numpy(np.int64)]
    assert (
        got["o_custkey"].to_numpy(np.int64)
        == picked["o_custkey"].to_numpy(np.int64)
    ).all()


def test_q10_topk_matches_local_join():
    from ecov003_l2t_stars_ray.pipelines.joins import q10_returned_items

    got = q10_returned_items(SF, k=5)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet").to_pandas()
    li = li[li["l_returnflag"].astype(str) == "R"]
    ep = np.floor(li["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5)
    dm = np.floor(li["l_discount"].to_numpy(np.float64) * 1000 + 0.5)
    rev = (ep * (1000 - dm)).astype(np.int64)
    o = _orders_pdf().set_index("o_orderkey")["o_custkey"]
    per = (
        pd.DataFrame({"c": li["l_orderkey"].map(o).to_numpy(np.int64),
                      "r": rev})
        .groupby("c")["r"]
        .sum()
        .reset_index()
        .sort_values(["r", "c"], ascending=[False, True], kind="mergesort")
        .head(5)
    )
    assert got["c_custkey"].tolist() == per["c"].tolist()
    assert got["revenue"].tolist() == (per["r"] / 100000.0).tolist()


def test_hapax_additivity_across_partitions():
    """vocab/hapax must be exact despite the per-partition reduce: verify
    against a single-frame pandas count."""
    from ecov003_l2t_stars_ray.pipelines.stats import hapax_stats

    got = hapax_stats(SF)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    ex = docs.set_index("source")["text"].str.split(" ").explode()
    c = ex.groupby([ex.index, ex.values]).size().rename("cnt").reset_index()
    c.columns = ["source", "word", "cnt"]
    want = c.groupby("source").agg(
        n_tokens=("cnt", "sum"), n_vocab=("cnt", "size")
    )
    h = c[c["cnt"] == 1].groupby("source").size()
    for _, row in got.iterrows():
        s = row["source"]
        assert int(row["n_tokens"]) == int(want.loc[s, "n_tokens"])
        assert int(row["n_vocab"]) == int(want.loc[s, "n_vocab"])
        assert int(row["n_hapax"]) == int(h.get(s, 0))
