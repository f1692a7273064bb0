"""Wave-15/16 operators: TPC-H Q2/Q12/Q20 composites, 2-D skyline
(Pareto frontier), per-user event-mix entropy, inverted-index posting
stats.

Local pandas/numpy brute-force replays over raw parquet pin the ENGINE
(block-prefix-min sweep, pivot entropy, per-term argmax reduce, the
broadcast-prune + partial-MIN join shapes) against refactors; the SQL
oracles run at the driver / check_oracle gate (all six bit-exact-probed
at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _read(table: str, columns=None) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/{table}.parquet", columns=columns)


def test_pareto_frontier_matches_quadratic_dominance():
    from ecov003_l2t_stars_ray.pipelines.stats import pareto_frontier_events

    got = pareto_frontier_events(SF)
    ev = _read("events", ["value", "ts"]).drop_duplicates()
    v = ev["value"].to_numpy(np.float64)
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    keep = []
    for i in range(len(v)):
        dominated = np.any(
            (v >= v[i]) & (t <= t[i]) & ((v > v[i]) | (t < t[i]))
        )
        if not dominated:
            keep.append(i)
    exp = (
        pd.DataFrame({"value": v[keep], "ts_us": t[keep]})
        .sort_values(["value", "ts_us"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.array_equal(got["value"].to_numpy(np.float64),
                          exp["value"].to_numpy(np.float64))
    assert np.array_equal(
        got["ts"].astype("datetime64[us]").astype(np.int64).to_numpy(),
        exp["ts_us"].to_numpy(),
    )
    # frontier invariant: along value DESC the surviving ts strictly
    # improves (decreases) — each point beats every preceding minimum
    assert np.all(np.diff(got["value"].to_numpy(np.float64)) < 0)
    assert np.all(np.diff(got["ts"].astype(np.int64).to_numpy()) < 0)


def test_user_event_entropy_matches_direct():
    from ecov003_l2t_stars_ray.pipelines.grouping import user_event_entropy

    got = user_event_entropy(SF)
    ev = _read("events", ["user_id", "event_type"])
    rows = []
    for u, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts().to_numpy(np.float64)
        n = c.sum()
        h = np.log2(n) - (c * np.log2(c)).sum() / n
        rows.append((int(u), int(n), h))
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "h"]).sort_values(
        "user_id", ignore_index=True
    )
    assert np.array_equal(got["user_id"].to_numpy(np.int64),
                          exp["user_id"].to_numpy(np.int64))
    assert np.array_equal(got["n_events"].to_numpy(np.int64),
                          exp["n_events"].to_numpy(np.int64))
    assert np.allclose(got["entropy"].to_numpy(np.float64),
                       exp["h"].to_numpy(np.float64), atol=1e-6)
    # a single-type user would have H == 0; all-H bounded by log2(|vocab|)
    assert (got["entropy"].to_numpy() >= 0).all()
    assert (got["entropy"].to_numpy() <= np.log2(
        ev["event_type"].nunique()) + 1e-9).all()


def test_term_postings_matches_pandas_replay():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import term_postings

    got = term_postings(SF, min_df=3)
    docs = _read("documents", ["doc_id", "text"])
    ex = docs.set_index("doc_id")["text"].astype(str).str.split(" ").explode()
    tf = (
        ex.rename("term")
        .reset_index()
        .groupby(["term", "doc_id"])
        .size()
        .rename("tf")
        .reset_index()
    )
    agg = tf.groupby("term").agg(df=("tf", "size"), cf=("tf", "sum"))
    agg = agg[agg["df"] >= 3]
    top = (
        tf.sort_values(["term", "tf", "doc_id"],
                       ascending=[True, False, True])
        .groupby("term")
        .first()
    )
    exp = agg.join(top).reset_index().sort_values("term", ignore_index=True)
    assert len(got) == len(exp) > 0
    assert list(got["term"]) == list(exp["term"])
    for col, ecol in [("df", "df"), ("cf", "cf"), ("top_doc_id", "doc_id"),
                      ("top_tf", "tf")]:
        assert np.array_equal(got[col].to_numpy(np.int64),
                              exp[ecol].to_numpy(np.int64)), col


def test_q12_delay_priority_matches_pandas_join():
    from ecov003_l2t_stars_ray.pipelines.joins import q12_delay_priority

    got = q12_delay_priority(SF)
    li = _read("lineitem", ["l_orderkey", "l_shipdate"])
    o = _read("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    d = (
        j["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        - j["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    ) // (86_400_000_000)
    band = np.where(d <= 30, "00-30d", np.where(d <= 90, "31-90d", "91d+"))
    high = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
    exp = (
        pd.DataFrame({"band": band, "hi": high.astype(np.int64)})
        .groupby("band")
        .agg(high_line_count=("hi", "sum"), n=("hi", "size"))
        .reset_index()
        .sort_values("band", ignore_index=True)
    )
    exp["low_line_count"] = exp["n"] - exp["high_line_count"]
    assert list(got["band"]) == list(exp["band"])
    assert np.array_equal(got["high_line_count"].to_numpy(np.int64),
                          exp["high_line_count"].to_numpy(np.int64))
    assert np.array_equal(got["low_line_count"].to_numpy(np.int64),
                          exp["low_line_count"].to_numpy(np.int64))


def test_q2_min_cost_supplier_ties_and_order():
    from ecov003_l2t_stars_ray.pipelines.joins import q2_min_cost_supplier

    got = q2_min_cost_supplier(SF, region="EUROPE", size_max=10, k=100)
    nat = _read("nation").merge(
        _read("region"), left_on="n_regionkey", right_on="r_regionkey"
    )
    nat = nat[nat["r_name"] == "EUROPE"]
    supp = _read("supplier").merge(
        nat[["n_nationkey", "n_name"]],
        left_on="s_nationkey", right_on="n_nationkey",
    )
    part = _read("part", ["p_partkey", "p_size"])
    pk = set(part.loc[part["p_size"] <= 10, "p_partkey"])
    li = _read("lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    li = li[li["l_partkey"].isin(pk)
            & li["l_suppkey"].isin(set(supp["s_suppkey"]))]
    li = li.assign(
        cost_u=np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(
            np.int64
        )
    )
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False)[
        "cost_u"].min()
    mc = ps.groupby("l_partkey")["cost_u"].transform("min")
    best = ps[ps["cost_u"] == mc].merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    )
    exp = best.sort_values(
        ["s_acctbal", "n_name", "s_name", "l_partkey"],
        ascending=[False, True, True, True],
    ).head(100)
    assert len(got) == len(exp)
    assert np.array_equal(got["partkey"].to_numpy(np.int64),
                          exp["l_partkey"].to_numpy(np.int64))
    assert np.array_equal(
        got["min_cost"].to_numpy(np.float64),
        (exp["cost_u"].to_numpy(np.int64) / 100.0),
    )
    assert list(got["s_name"]) == list(exp["s_name"])


def test_q20_excess_suppliers_matches_pandas():
    from ecov003_l2t_stars_ray.pipelines.joins import q20_excess_suppliers

    got = q20_excess_suppliers(SF, prefix="small", cutoff="1999-01-01")
    part = _read("part", ["p_partkey", "p_name"])
    pk = set(part.loc[part["p_name"].str.startswith("small"), "p_partkey"])
    li = _read("lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    li = li[li["l_partkey"].isin(pk)].copy()
    li["qty"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    li["recent"] = np.where(
        li["l_shipdate"] >= pd.Timestamp("1999-01-01"), li["qty"], 0
    )
    agg = li.groupby(["l_suppkey", "l_partkey"], as_index=False)[
        ["qty", "recent"]].sum()
    sks = set(agg.loc[2 * agg["recent"] > agg["qty"], "l_suppkey"])
    supp = _read("supplier").merge(
        _read("nation"), left_on="s_nationkey", right_on="n_nationkey"
    )
    exp = (
        supp[supp["s_suppkey"].isin(sks)][["s_name", "n_name"]]
        .drop_duplicates()
        .sort_values(["s_name", "n_name"], ignore_index=True)
    )
    assert len(got) == len(exp)
    assert list(got["s_name"]) == list(exp["s_name"])
    assert list(got["n_name"]) == list(exp["n_name"])
