"""Wave-12 operators: Q13 count histogram, Q17 correlated-avg threshold,
Q15 argmax-over-aggregate, Q19 OR-band revenue, Q8 market share.

Local pandas/numpy replays over raw parquet pin the ENGINE (broadcast
threshold tables, local-max reduction, band maps) against refactors; the
SQL oracles run at the driver / check_oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _pdf(name: str) -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/{name}.parquet").to_pandas()


def test_q13_histogram_sums_to_customer_count():
    from ecov003_l2t_stars_ray.pipelines.joins import q13_custdist

    got = q13_custdist(SF)
    orders = _pdf("orders")
    cust = _pdf("customer")
    per = orders.groupby("o_custkey").size()
    h = per.value_counts()
    zero = len(cust) - len(per)
    want = {int(k): int(v) for k, v in h.items()}
    if zero > 0:
        want[0] = zero
    assert dict(zip(got["c_count"].astype(int), got["custdist"].astype(int))) == want
    assert int(got["custdist"].sum()) == len(cust)
    # sorted custdist desc then c_count desc
    key = list(zip(-got["custdist"], -got["c_count"]))
    assert key == sorted(key)


def test_q17_integer_threshold_matches_float_avg():
    from ecov003_l2t_stars_ray.pipelines.joins import q17_small_qty_revenue

    got = q17_small_qty_revenue(SF, brand="Brand#23")
    li = _pdf("lineitem")
    part = _pdf("part")
    bp = set(part.loc[part["p_brand"].astype(str) == "Brand#23", "p_partkey"])
    sub = li[li["l_partkey"].isin(bp)].copy()
    q = np.floor(sub["l_quantity"].to_numpy(np.float64) + 0.5).astype(np.int64)
    sub["q"] = q
    avg = sub.groupby("l_partkey")["q"].transform("mean")
    keep = sub["q"].to_numpy() < 0.2 * avg.to_numpy()
    ep = np.floor(
        sub["l_extendedprice"].to_numpy(np.float64)[keep] * 100 + 0.5
    ).astype(np.int64)
    assert int(got["n_lines"].iloc[0]) == int(keep.sum()) > 0
    assert got["avg_yearly"].iloc[0] == int(ep.sum()) / 700.0


def test_q15_max_with_ties_and_name_join():
    from ecov003_l2t_stars_ray.pipelines.joins import q15_top_supplier

    got = q15_top_supplier(SF)
    li = _pdf("lineitem")
    sd = li["l_shipdate"].astype("datetime64[us]")
    m = (sd >= pd.Timestamp("1997-01-01")).to_numpy() & (
        sd < pd.Timestamp("1997-04-01")
    ).to_numpy()
    sub = li[m]
    ep = np.floor(sub["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5)
    dm = np.floor(sub["l_discount"].to_numpy(np.float64) * 1000 + 0.5)
    u = (ep * (1000 - dm)).astype(np.int64)
    per = (
        pd.DataFrame({"s": sub["l_suppkey"].to_numpy(np.int64), "u": u})
        .groupby("s")["u"]
        .sum()
    )
    best = per[per == per.max()]
    assert sorted(got["s_suppkey"].astype(int)) == sorted(best.index.astype(int))
    assert (got["total_revenue"] == int(per.max()) / 100000.0).all()
    names = _pdf("supplier").set_index("s_suppkey")["s_name"]
    assert got["s_name"].tolist() == [
        names[k] for k in got["s_suppkey"].astype(int)
    ]


def test_q19_bands_match_pandas_or_filter():
    from ecov003_l2t_stars_ray.pipelines.joins import (
        _Q19_BANDS,
        q19_banded_revenue,
    )

    got = q19_banded_revenue(SF)
    li = _pdf("lineitem")
    part = _pdf("part").set_index("p_partkey")
    brand = li["l_partkey"].map(part["p_brand"]).astype(str)
    size = li["l_partkey"].map(part["p_size"]).to_numpy(np.int64)
    q = np.floor(li["l_quantity"].to_numpy(np.float64) + 0.5).astype(np.int64)
    keep = np.zeros(len(li), bool)
    for b, qlo, qhi, slo, shi in _Q19_BANDS:
        keep |= (
            (brand == b).to_numpy()
            & (q >= qlo) & (q <= qhi) & (size >= slo) & (size <= shi)
        )
    ep = np.floor(
        li["l_extendedprice"].to_numpy(np.float64)[keep] * 100 + 0.5
    ).astype(np.int64)
    dm = np.floor(
        li["l_discount"].to_numpy(np.float64)[keep] * 1000 + 0.5
    ).astype(np.int64)
    assert int(got["n_lines"].iloc[0]) == int(keep.sum()) > 0
    assert got["revenue"].iloc[0] == int((ep * (1000 - dm)).sum()) / 100000.0


def test_q8_share_bounds_and_replay():
    from ecov003_l2t_stars_ray.pipelines.joins import q8_market_share

    got = q8_market_share(SF)
    li = _pdf("lineitem")
    orders = _pdf("orders").set_index("o_orderkey")
    cust = _pdf("customer").set_index("c_custkey")
    nat = _pdf("nation").set_index("n_nationkey")
    reg = _pdf("region")
    part = _pdf("part")
    supp = _pdf("supplier").set_index("s_suppkey")

    rk = reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    asia_nat = set(nat.index[nat["n_regionkey"] == rk])
    pkeys = set(part.loc[part["p_type"].astype(str) == "STANDARD", "p_partkey"])

    sub = li[li["l_partkey"].isin(pkeys)].copy()
    ckey = sub["l_orderkey"].map(orders["o_custkey"])
    cnat = ckey.map(cust["c_nationkey"])
    sub = sub[cnat.isin(asia_nat).to_numpy()]
    ep = np.floor(sub["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5)
    dm = np.floor(sub["l_discount"].to_numpy(np.float64) * 1000 + 0.5)
    u = (ep * (1000 - dm)).astype(np.int64)
    snat = sub["l_suppkey"].map(supp["s_nationkey"]).map(nat["n_name"])
    year = (
        sub["l_orderkey"]
        .map(orders["o_orderdate"])
        .astype("datetime64[us]")
        .dt.year.to_numpy(np.int64)
    )
    df = pd.DataFrame(
        {"y": year, "u": u, "t": np.where((snat == "NATION_19").to_numpy(), u, 0)}
    )
    want = df.groupby("y")[["u", "t"]].sum()
    assert got["o_year"].tolist() == sorted(want.index)
    for _, row in got.iterrows():
        w = want.loc[int(row["o_year"])]
        ratio = int(w["t"]) / int(w["u"])
        assert row["mkt_share"] == np.floor(ratio * 1e6 + 0.5) / 1e6
        assert row["total_revenue"] == int(w["u"]) / 100000.0
        assert 0.0 <= row["mkt_share"] <= 1.0
