"""Wave-11 operators: Mann-Whitney U/AUC, exact lattice quantiles,
cross-source k-gram contamination matrix, TPC-H Q4/Q6 shapes.

Each test pins the distributed result against an independent local
pandas / numpy replay over the raw parquet (SQL oracles run at the
driver / check_oracle gate; these guard the ENGINE against refactors)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()


def _r6(v: float) -> float:
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6)


def test_mann_whitney_matches_scipy_style_ranks():
    from ecov003_l2t_stars_ray.pipelines.stats import mann_whitney_auc

    got = mann_whitney_auc(SF)
    ev = _events_pdf()
    t = ev["event_type"].astype(str)
    m = t.isin(["view", "purchase"])
    q = np.floor(ev.loc[m, "value"].to_numpy(np.float64) * 1024.0 + 0.5)
    isa = (t[m] == "view").to_numpy()
    # average (midrank) ranks with ties, computed the textbook way
    ranks = pd.Series(q).rank(method="average").to_numpy()
    r1 = float(ranks[isa].sum())
    n1, n2 = int(isa.sum()), int((~isa).sum())
    u = r1 - n1 * (n1 + 1) / 2.0
    assert int(got["n_a"].iloc[0]) == n1
    assert int(got["n_b"].iloc[0]) == n2
    assert got["u_stat"].iloc[0] == u
    assert got["auc"].iloc[0] == _r6(u / (n1 * n2))
    assert 0.0 <= got["auc"].iloc[0] <= 1.0


def test_lattice_quantiles_match_numpy_linear():
    from ecov003_l2t_stars_ray.pipelines.stats import lattice_quantiles

    got = lattice_quantiles(SF)
    ev = _events_pdf()
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024.0 + 0.5)
    df = pd.DataFrame({"t": ev["event_type"].astype(str), "q": q})
    for _, row in got.iterrows():
        g = df.loc[df["t"] == row["event_type"], "q"].to_numpy()
        want = float(np.quantile(g, row["p"], method="linear"))
        assert row["q_value"] == _r6(want / 1024.0)
    # median column must agree with the dedicated median operator
    from ecov003_l2t_stars_ray.pipelines.stats import median_mad_by_type

    med = median_mad_by_type(SF).set_index("event_type")["median_value"]
    mid = got[got["p"] == 0.5].set_index("event_type")["q_value"]
    for t_, v in mid.items():
        assert v == med[t_]


def test_cross_source_ngram_matrix_matches_pandas():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        cross_source_ngram_matrix,
    )

    got = cross_source_ngram_matrix(SF, k=4)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    rows = []
    for src, text in zip(docs["source"].astype(str), docs["text"]):
        ws = text.split(" ")
        for i in range(len(ws) - 3):
            rows.append((src, " ".join(ws[i : i + 4])))
    g = pd.DataFrame(rows, columns=["source", "gram"]).drop_duplicates()
    m = g.merge(g, on="gram")
    m = m[m["source_x"] < m["source_y"]]
    want = (
        m.groupby(["source_x", "source_y"])
        .size()
        .rename("n_shared")
        .reset_index()
        .rename(columns={"source_x": "src_a", "source_y": "src_b"})
        .sort_values(["src_a", "src_b"], ignore_index=True)
    )
    assert len(got) == len(want) > 0
    assert got["src_a"].tolist() == want["src_a"].tolist()
    assert got["src_b"].tolist() == want["src_b"].tolist()
    assert got["n_shared"].tolist() == want["n_shared"].tolist()
    # symmetric-pair sanity: no self pairs, strict ordering
    assert (got["src_a"] < got["src_b"]).all()


def test_q4_exists_semantics_with_multirow_orders():
    from ecov003_l2t_stars_ray.pipelines.joins import q4_late_orders

    got = q4_late_orders(SF, grace_days=30)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet").to_pandas()
    orders = ray.data.read_parquet(f"{SF}/orders.parquet").to_pandas()
    mx = (
        li.assign(s=li["l_shipdate"].astype("datetime64[us]"))
        .groupby("l_orderkey")["s"]
        .max()
    )
    o = orders.set_index("o_orderkey")
    od = o["o_orderdate"].astype("datetime64[us]")
    late = mx[mx > od.loc[mx.index] + pd.Timedelta(days=30)]
    want = (
        o.loc[late.index, "o_orderpriority"]
        .astype(str)
        .value_counts()
        .sort_index()
    )
    assert got["o_orderpriority"].tolist() == want.index.tolist()
    assert got["order_count"].tolist() == want.tolist()


def test_q6_matches_local_filter_agg():
    from ecov003_l2t_stars_ray.pipelines.joins import q6_revenue_delta

    got = q6_revenue_delta(SF)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet").to_pandas()
    sd = li["l_shipdate"].astype("datetime64[us]")
    dm = np.floor(li["l_discount"].to_numpy(np.float64) * 1000 + 0.5).astype(
        np.int64
    )
    m = (
        (sd >= pd.Timestamp("1997-01-01")).to_numpy()
        & (sd < pd.Timestamp("1998-01-01")).to_numpy()
        & (li["l_quantity"].to_numpy(np.float64) < 24.0)
        & (dm >= 50)
        & (dm <= 70)
    )
    ep = np.floor(
        li["l_extendedprice"].to_numpy(np.float64)[m] * 100 + 0.5
    ).astype(np.int64)
    assert int(got["n_lines"].iloc[0]) == int(m.sum())
    assert got["revenue_delta"].iloc[0] == int((ep * dm[m]).sum()) / 100000.0
