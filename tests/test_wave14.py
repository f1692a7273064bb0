"""Wave-14 operators: Q9 five-table star profit, Q11 global-share
HAVING, Q21 sole-late-supplier double-correlated reduction, and the
integer-carrier unigram-rarity document score.

Local pandas/numpy replays over raw parquet pin the ENGINE (broadcast
prunes, per-order grouped EXISTS reduction, exact bit-cost rarity)
against refactors; the SQL oracles run at the driver / check_oracle
gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _pdf(name: str) -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/{name}.parquet").to_pandas()


def _profit_u(li: pd.DataFrame) -> np.ndarray:
    ep = np.floor(li["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5)
    dc = np.floor(li["l_discount"].to_numpy(np.float64) * 100 + 0.5)
    return (ep.astype(np.int64)) * (100 - dc.astype(np.int64))


def test_q9_profit_star_matches_local_join():
    from ecov003_l2t_stars_ray.pipelines.joins import q9_nation_profit

    got = q9_nation_profit(SF)
    li, part = _pdf("lineitem"), _pdf("part")
    supp, nat, orders = _pdf("supplier"), _pdf("nation"), _pdf("orders")
    red = set(part.loc[part["p_name"].str.contains("red"), "p_partkey"])
    d = li[li["l_partkey"].isin(red)].copy()
    d["u"] = _profit_u(d)
    d = d.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    d = d.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    d = d.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    d["o_year"] = d["o_orderdate"].dt.year
    want = (
        d.groupby([d["n_name"].astype(str), "o_year"])["u"]
        .sum()
        .reset_index()
        .sort_values(["n_name", "o_year"], ignore_index=True)
    )
    assert list(got["nation"]) == list(want["n_name"])
    assert list(got["o_year"]) == list(want["o_year"])
    assert list(got["profit_u"]) == list(want["u"])
    assert (got["profit"] == got["profit_u"] / 10000.0).all()


def test_q11_threshold_is_int_exact_and_bites():
    from ecov003_l2t_stars_ray.pipelines.joins import q11_concentrated_parts

    li = _pdf("lineitem").copy()
    li["u"] = _profit_u(li)
    per = li.groupby("l_partkey")["u"].sum()
    total = int(per.sum())

    # default: scale-free 1.25x-mean-share threshold (oracle parity)
    got = q11_concentrated_parts(SF)
    n_parts = int(per.size)
    thr = (5 * total) // (4 * n_parts)
    want = per[per > thr].sort_values(ascending=False)
    assert 0 < len(want) < per.size  # the filter bites at every sf
    assert set(got["partkey"]) == set(want.index)
    assert int(got["value_u"].sum()) == int(want.sum())
    # integer-threshold equivalence: u*4n > 5*total <=> u > (5t)//(4n)
    u = per.to_numpy(np.int64)
    assert (((u.astype(object) * 4 * n_parts) > 5 * total)
            == (u > thr)).all()
    # ordering: value desc, partkey asc on ties
    key = list(zip(-got["value_u"], got["partkey"]))
    assert key == sorted(key)

    # tight denom: the filter must actually drop parts at sf0.001 (200
    # parts -> mean share 1/200, so 1/160 keeps only above-average ones)
    tight = q11_concentrated_parts(SF, denom=160)
    want_t = per[per > total // 160]
    assert 0 < len(want_t) < per.size
    assert set(tight["partkey"]) == set(want_t.index)

    # zero-survivor path stays TYPED (the r4 sf0.1 crash class):
    # denom=1 -> thr = total -> nothing passes; must return a 0-row
    # frame with the declared columns, not raise KeyError
    empty = q11_concentrated_parts(SF, denom=1)
    assert len(empty) == 0
    assert list(empty.columns) == ["partkey", "value_u", "part_value"]


def test_q21_sole_late_supplier_reduction():
    from ecov003_l2t_stars_ray.pipelines.joins import q21_sole_late_supplier

    got = q21_sole_late_supplier(SF)
    li, orders, supp = _pdf("lineitem"), _pdf("orders"), _pdf("supplier")
    g = (
        li.groupby(["l_orderkey", "l_suppkey"])["l_shipdate"]
        .max()
        .reset_index()
    )
    g = g.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    grace = pd.Timedelta(days=30)
    g["late"] = g["l_shipdate"] > g["o_orderdate"] + grace
    o = g.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "size"), n_late=("late", "sum")
    )
    hits = o[(o["n_supp"] > 1) & (o["n_late"] == 1)]
    lk = g[g["late"]].set_index("l_orderkey")["l_suppkey"]
    counts = lk.loc[hits.index].value_counts()
    sname = dict(zip(supp["s_suppkey"], supp["s_name"].astype(str)))
    want = {sname[k]: int(v) for k, v in counts.items()}
    assert dict(zip(got["s_name"], got["numwait"])) == want
    # sorted numwait desc, name asc
    key = list(zip(-got["numwait"], got["s_name"]))
    assert key == sorted(key)
    # every counted order genuinely has >1 supplier and exactly 1 late
    assert (hits["n_late"] == 1).all() and (hits["n_supp"] > 1).all()


def test_doc_rarity_integer_bit_cost():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        doc_rarity_score,
    )

    got = doc_rarity_score(SF)
    docs = _pdf("documents")
    ex = docs.set_index("doc_id")["text"].str.split(" ").explode()
    cnt = ex.value_counts()
    total = int(cnt.sum())
    q = total // cnt.to_numpy(np.int64)
    # frexp bit-cost == floor(log2(q)) == int.bit_length(q) - 1
    b = pd.Series(
        np.frexp(q.astype(np.float64))[1].astype(np.int64) - 1,
        index=cnt.index,
    )
    assert (b.to_numpy() == [int(x).bit_length() - 1 for x in q]).all()
    rar = ex.map(b)
    want_sum = rar.groupby(level=0).sum()
    want_n = ex.groupby(level=0).size()
    assert list(got["doc_id"]) == list(want_sum.index)
    assert list(got["rarity_u"]) == list(want_sum.to_numpy(np.int64))
    assert list(got["n_tokens"]) == list(want_n.to_numpy(np.int64))
    # mean carrier: one division, half-away round
    m = want_sum.to_numpy(np.int64) / want_n.to_numpy(np.int64)
    assert np.allclose(
        got["rarity_mean"], np.floor(m * 1e6 + 0.5) / 1e6, atol=0
    )
    # rare-token docs score higher: rarest-vocab doc beats commonest
    assert got["rarity_mean"].max() > got["rarity_mean"].min()
