"""Wave-20 operators: market-basket co-purchase pairs (within-group pair
explosion) and per-nation revenue HHI concentration.

Local pandas replays pin the ENGINE (segment-arithmetic pair generation,
int64 sum-of-squares lanes) against refactors; the SQL oracles run at the
driver / check_oracle gate (both bit-exact at sf0.01)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_copurchase_pairs_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.joins import copurchase_pairs

    got = copurchase_pairs(SF, k=20)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    d = li.drop_duplicates()
    counts: dict = {}
    for _, g in d.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(g["l_partkey"]), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    exp = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in counts.items()],
            columns=["pa", "pb", "n"],
        )
        .sort_values(["n", "pa", "pb"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.array_equal(got["pa"].to_numpy(np.int64),
                          exp["pa"].to_numpy(np.int64))
    assert np.array_equal(got["pb"].to_numpy(np.int64),
                          exp["pb"].to_numpy(np.int64))
    assert np.array_equal(got["n"].to_numpy(np.int64),
                          exp["n"].to_numpy(np.int64))
    # strict pair ordering invariant
    assert (got["pa"] < got["pb"]).all()


def test_nation_revenue_hhi_matches_shares():
    from ecov003_l2t_stars_ray.pipelines.stats import nation_revenue_hhi

    got = nation_revenue_hhi(SF)
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    o["cents"] = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    c = o.groupby("o_custkey", as_index=False)["cents"].sum()
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    j = c.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    rows = []
    for n, g in j.groupby("n_name"):
        cents = g["cents"].to_numpy(np.float64)
        shares = cents / cents.sum()
        rows.append((n, len(g), int(g["cents"].sum()),
                     float((shares ** 2).sum())))
    exp = pd.DataFrame(
        rows, columns=["n_name", "nc", "tot", "hhi"]
    ).sort_values("n_name", ignore_index=True)
    assert list(got["n_name"]) == list(exp["n_name"])
    assert np.array_equal(got["n_customers"].to_numpy(np.int64),
                          exp["nc"].to_numpy(np.int64))
    assert np.array_equal(got["total_cents"].to_numpy(np.int64),
                          exp["tot"].to_numpy(np.int64))
    assert np.allclose(got["hhi"], exp["hhi"], atol=1e-6)
    # HHI bounds: 1/n <= hhi <= 1
    lo = 1.0 / got["n_customers"].to_numpy(np.float64)
    assert (got["hhi"].to_numpy() >= lo - 1e-9).all()
    assert (got["hhi"].to_numpy() <= 1.0 + 1e-9).all()
