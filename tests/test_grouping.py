"""Wave-3 grouped-shape operators (pipelines/grouping.py): each pinned to an
independent pandas brute-force replay (SQL oracles run at the driver /
check_oracle gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"

HOUR_US = 3600 * 1_000_000


def _events_pdf() -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()


def test_mode_per_user_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import mode_per_user

    got = mode_per_user(SF)
    ev = _events_pdf()
    c = (
        ev.groupby(["user_id", "event_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    c = c.sort_values(
        ["user_id", "n", "event_type"], ascending=[True, False, True]
    )
    want = (
        c.drop_duplicates("user_id")
        .rename(columns={"event_type": "mode_event", "n": "n_mode"})
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pivot_event_counts_matches_crosstab():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        _EVENT_VOCAB, pivot_event_counts,
    )

    got = pivot_event_counts(SF)
    ev = _events_pdf()
    ct = pd.crosstab(ev["user_id"], ev["event_type"])
    for t in _EVENT_VOCAB:
        np.testing.assert_array_equal(
            got.set_index("user_id")[f"n_{t}"].to_numpy(),
            ct[t].reindex(got["user_id"]).fillna(0).to_numpy(),
        )
    assert (got["n_other"] == 0).all()
    assert (got["n_total"].to_numpy() ==
            ev.groupby("user_id").size().reindex(got["user_id"]).to_numpy()).all()


def test_ntile_event_buckets_sql_ntile_semantics():
    from ecov003_l2t_stars_ray.pipelines.grouping import ntile_event_buckets

    got = ntile_event_buckets(SF, k=7)
    ev = _events_pdf()
    u = (
        ev.groupby("user_id").size().rename("n").reset_index()
        .sort_values(["n", "user_id"], ignore_index=True)
    )
    n, k = len(u), 7
    base, rem = divmod(n, k)
    # SQL NTILE: first rem buckets get base+1 rows
    assert got["n_users"].tolist() == [base + 1] * rem + [base] * (k - rem)
    # bucket boundaries are non-decreasing in n
    assert (got["min_n"].to_numpy()[1:] >= got["max_n"].to_numpy()[:-1] - 0).all()
    assert got["sum_n"].sum() == len(ev)
    np.testing.assert_allclose(
        got["avg_n"].to_numpy(),
        np.round(got["sum_n"].to_numpy() / got["n_users"].to_numpy(), 6),
    )


def test_source_mixture_sample_quota_and_rank():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        _MIX_MOD, _MIX_MULT, source_mixture_sample,
    )

    got = source_mixture_sample(SF, per_unit=4)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    docs["rk"] = (docs["doc_id"].astype(np.int64) * _MIX_MULT) % _MIX_MOD
    for src, g in docs.groupby("source"):
        quota = 4 * (1 + int(src[3:]) % 3)
        want = g.sort_values(["rk", "doc_id"]).head(quota)
        sub = got[got["source"] == src]
        assert len(sub) == min(quota, len(g)), src
        assert set(sub["doc_id"]) == set(want["doc_id"]), src
    # deterministic: same call twice -> identical frame
    again = source_mixture_sample(SF, per_unit=4)
    pd.testing.assert_frame_equal(got, again)


def test_rolling_median_24h_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import rolling_median_24h

    got = rolling_median_24h(SF)
    ev = _events_pdf()
    b = (
        ev["ts"].astype("datetime64[us]").astype(np.int64)
        // HOUR_US * HOUR_US
    )
    c = (
        pd.DataFrame({"u": ev["user_id"], "t": b})
        .groupby(["u", "t"], as_index=False)
        .size()
        .sort_values(["u", "t"], ignore_index=True)
    )
    med = np.empty(len(c))
    for i in range(len(c)):
        lo_t = c["t"][i] - 23 * HOUR_US
        w = c[(c["u"] == c["u"][i]) & (c["t"] >= lo_t) & (c["t"] <= c["t"][i])]
        med[i] = np.median(w["size"].to_numpy(np.float64))
    want = c.rename(columns={"u": "user_id", "size": "n"})
    want["bucket_start"] = want.pop("t").to_numpy().view("datetime64[us]")
    want["med_24h"] = np.round(med, 6)
    pd.testing.assert_frame_equal(
        got, want[["user_id", "bucket_start", "n", "med_24h"]],
        check_dtype=False,
    )


def test_transition_matrix_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import transition_matrix

    got = transition_matrix(SF)
    ev = _events_pdf().sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    u = ev["user_id"].to_numpy()
    et = ev["event_type"].astype(str).to_numpy()
    same = u[1:] == u[:-1]
    want = (
        pd.DataFrame({"from_event": et[:-1][same], "to_event": et[1:][same]})
        .groupby(["from_event", "to_event"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["from_event", "to_event"], ignore_index=True)
    )
    tot = want.groupby("from_event")["n"].transform("sum")
    want["p"] = np.floor(want["n"] / tot * 1e6 + 0.5) / 1e6
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # probabilities are conditional: each row sums to ~1
    rs = got.groupby("from_event")["p"].sum()
    assert ((rs - 1).abs() < 1e-4).all()


def test_cohort_retention_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        WEEK_US, cohort_retention,
    )

    got = cohort_retention(SF)
    ev = _events_pdf()
    w = ev["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
    uw = pd.DataFrame({"user_id": ev["user_id"], "w": w}).drop_duplicates()
    cw = uw.groupby("user_id")["w"].transform("min")
    want = (
        pd.DataFrame({"cohort_week": cw, "age_weeks": uw["w"] - cw})
        .groupby(["cohort_week", "age_weeks"], as_index=False)
        .size()
        .rename(columns={"size": "n_active"})
        .sort_values(["cohort_week", "age_weeks"], ignore_index=True)
    )
    size0 = want[want["age_weeks"] == 0].set_index("cohort_week")["n_active"]
    want["retention"] = np.floor(
        want["n_active"] / want["cohort_week"].map(size0) * 1e6 + 0.5
    ) / 1e6
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # age-0 retention is exactly 1 for every cohort
    assert (got.loc[got["age_weeks"] == 0, "retention"] == 1.0).all()


def test_m4_downsample_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import (
        M4_W_US, m4_downsample_15m,
    )

    got = m4_downsample_15m(SF)
    ev = _events_pdf()
    ev["b"] = (
        ev["ts"].astype("datetime64[us]").astype(np.int64)
        // M4_W_US * M4_W_US
    )
    ev = ev.sort_values(["user_id", "b", "event_id"], ignore_index=True)
    want = ev.groupby(["user_id", "b"], as_index=False).agg(
        n=("value", "size"), v_min=("value", "min"), v_max=("value", "max"),
        v_first=("value", "first"), v_last=("value", "last"),
    )
    want["bucket_start"] = want.pop("b").to_numpy().view("datetime64[us]")
    want = want[
        ["user_id", "bucket_start", "n", "v_min", "v_max", "v_first", "v_last"]
    ].sort_values(["user_id", "bucket_start"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # picks are exact selections: every v_* exists among the bucket's values
    assert (got["v_min"] <= got["v_max"]).all()


def test_tfidf_topk_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import tfidf_topk

    got = tfidf_topk(SF, k=3)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    ex = docs["text"].astype(str).str.split(" ").explode()
    pairs = pd.DataFrame(
        {"doc_id": docs["doc_id"].reindex(ex.index), "term": ex}
    )
    tf = pairs.groupby(["doc_id", "term"], as_index=False).size().rename(
        columns={"size": "tf"}
    )
    dfq = pairs.drop_duplicates().groupby("term").size()
    n_docs = len(docs)
    tf["df"] = dfq.reindex(tf["term"]).to_numpy(np.int64)
    s = tf["tf"].to_numpy(np.float64) * np.log(
        n_docs / tf["df"].to_numpy(np.float64)
    )
    tf["score_milli"] = np.floor(s * 1e3 + 0.5).astype(np.int64)
    tf["score"] = np.floor(s * 1e6 + 0.5) / 1e6
    tf = tf.sort_values(
        ["doc_id", "score_milli", "term"], ascending=[True, False, True],
        kind="mergesort",
    )
    want = (
        tf.groupby("doc_id", sort=False)
        .head(3)[["doc_id", "term", "tf", "df", "score"]]
        .sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            ignore_index=True,
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.groupby("doc_id").size().max() <= 3


def test_forecast_mae_24h_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import forecast_mae_24h

    got = forecast_mae_24h(SF)
    ev = _events_pdf()
    b = (
        ev["ts"].astype("datetime64[us]").astype(np.int64)
        // HOUR_US * HOUR_US
    )
    c = (
        pd.DataFrame({"u": ev["user_id"], "t": b})
        .groupby(["u", "t"], as_index=False)
        .size()
    )
    f = c.rename(columns={"size": "f"}).copy()
    f["t"] = f["t"] + 24 * HOUR_US
    m = c.merge(f, on=["u", "t"])
    err = m["size"].to_numpy(np.int64) - m["f"].to_numpy(np.int64)
    m["abs"] = np.abs(err)
    m["d"] = err
    w = m.groupby("u", as_index=False).agg(
        n_matched=("abs", "size"), s_abs=("abs", "sum"), s_d=("d", "sum")
    )
    w["mae"] = np.floor(w["s_abs"] / w["n_matched"] * 1e6 + 0.5) / 1e6
    sgn = np.sign(w["s_d"].to_numpy(np.float64))
    w["bias"] = sgn * np.floor(
        np.abs(w["s_d"] / w["n_matched"]) * 1e6 + 0.5
    ) / 1e6
    want = w.rename(columns={"u": "user_id"}).sort_values(
        "user_id", ignore_index=True
    )[["user_id", "n_matched", "mae", "bias"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_interarrival_stats_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import interarrival_stats

    got = interarrival_stats(SF)
    ev = _events_pdf().sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    u = ev["user_id"].to_numpy()
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    same = u[1:] == u[:-1]
    d = pd.DataFrame({"user_id": u[1:][same], "gap": (t[1:] - t[:-1])[same]})
    w = d.groupby("user_id", as_index=False).agg(
        n_gaps=("gap", "size"), median_gap_us=("gap", "median"),
        max_gap_us=("gap", "max"), s=("gap", "sum"),
    )
    w["mean_gap_us"] = np.floor(w["s"] / w["n_gaps"] * 1e6 + 0.5) / 1e6
    want = w.drop(columns="s").sort_values("user_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q22_no_orders_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.joins import q22_no_orders

    got = q22_no_orders(SF)
    cust = ray.data.read_parquet(f"{SF}/customer.parquet").to_pandas()
    orders = ray.data.read_parquet(f"{SF}/orders.parquet").to_pandas()
    f = cust[cust["c_nationkey"].isin([1, 3, 5, 7, 9, 11, 13])].copy()
    f["cents"] = np.rint(f["c_acctbal"].to_numpy(np.float64) * 100).astype(
        np.int64
    )
    pos = f[f["cents"] > 0]
    n_pos, s_pos = len(pos), int(pos["cents"].sum())
    urgent = orders[orders["o_orderpriority"] == "1-URGENT"]
    keep = f[
        (f["cents"] * n_pos > s_pos)
        & ~f["c_custkey"].isin(set(urgent["o_custkey"]))
    ]
    want = (
        keep.groupby("c_nationkey", as_index=False)
        .agg(numcust=("c_custkey", "size"), s=("cents", "sum"))
        .rename(columns={"c_nationkey": "cntrycode"})
    )
    want["totacctbal"] = want.pop("s").to_numpy(np.float64) / 100.0
    want = want.sort_values("cntrycode", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # the fixture has order-less customers


def test_funnel_stages_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import funnel_stages

    got = funnel_stages(SF)
    ev = _events_pdf()
    ev = ev.assign(ts_us=ev["ts"].astype("datetime64[us]").astype(np.int64))
    t1 = ev[ev.event_type == "view"].groupby("user_id")["ts_us"].min()
    c = ev[ev.event_type == "click"].merge(
        t1.rename("t1"), left_on="user_id", right_index=True
    )
    c = c[c.ts_us > c.t1]
    t2 = c.groupby("user_id")["ts_us"].min()
    gap1 = (t2 - t1.reindex(t2.index)).to_numpy()
    p = ev[ev.event_type == "purchase"].merge(
        t2.rename("t2"), left_on="user_id", right_index=True
    )
    p = p[p.ts_us > p.t2]
    t3 = p.groupby("user_id")["ts_us"].min()
    gap2 = (t3 - t2.reindex(t3.index)).to_numpy()
    assert got["n_users"].tolist() == [len(t1), len(t2), len(t3)]
    assert len(t2) > 0 and len(t3) > 0  # the synthetic stream funnels
    np.testing.assert_allclose(
        got["mean_gap_us"].to_numpy()[1:],
        [gap1.mean(), gap2.mean()],
        rtol=0, atol=5e-7,
    )
    assert got["mean_gap_us"].iloc[0] == 0.0
    # monotone survivorship
    assert got["n_users"].is_monotonic_decreasing


def test_rollup_grouping_sets_levels_consistent():
    from ecov003_l2t_stars_ray.pipelines.grouping import rollup_grouping_sets

    got = rollup_grouping_sets(SF)
    orders = ray.data.read_parquet(f"{SF}/orders.parquet").to_pandas()
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    # level 0 matches a direct groupby
    want0 = (
        orders.assign(cents=cents)
        .groupby(["o_orderpriority", "o_orderstatus"], as_index=False)
        .agg(n_orders=("cents", "size"), s=("cents", "sum"))
    )
    lv0 = got[got.gid == 0].merge(
        want0,
        left_on=["priority", "status"],
        right_on=["o_orderpriority", "o_orderstatus"],
    )
    assert len(lv0) == len(want0) == (got.gid == 0).sum()
    assert (lv0["n_orders_x"] == lv0["n_orders_y"]).all()
    np.testing.assert_array_equal(
        lv0["total_price"].to_numpy(), lv0["s"].to_numpy() / 100.0
    )
    # each level's totals reconcile upward exactly
    assert (got.gid == 3).sum() == 1
    for g in (0, 1):
        assert got[got.gid == g]["n_orders"].sum() == len(orders)
        np.testing.assert_array_equal(
            np.float64(got[got.gid == g]["total_price"].sum()),
            np.float64(cents.sum() / 100.0),
        )
    assert int(got[got.gid == 3]["n_orders"].iloc[0]) == len(orders)


def test_corr_value_props_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import corr_value_props

    got = corr_value_props(SF)
    ev = _events_pdf()
    S = 1024.0
    v = ev["value"].to_numpy(np.float64)
    ev = ev.assign(
        q=np.floor(v * S + 0.5).astype(np.int64),
        y=ev["props"].astype(str).str.len().astype(np.int64),
    )
    for _, row in got.iterrows():
        g = ev[ev.event_type == row["event_type"]]
        assert row["n"] == len(g)
        # mean of snapped fixed-point == emitted mean to the 6th decimal
        np.testing.assert_allclose(
            row["mean_value"], g["q"].mean() / S, rtol=0, atol=5e-7
        )
        # Pearson on the snapped lanes (numpy corrcoef reference)
        ref = np.corrcoef(
            g["q"].to_numpy(np.float64), g["y"].to_numpy(np.float64)
        )[0, 1]
        np.testing.assert_allclose(row["corr_len"], ref, rtol=0, atol=1e-4)
    # determinism under re-run (order-independent int accumulation)
    again = corr_value_props(SF)
    pd.testing.assert_frame_equal(got, again)


def test_path_signature_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import path_signature

    got = path_signature(SF)
    ev = _events_pdf()
    ev = ev.assign(
        ts_us=ev["ts"].astype("datetime64[us]").astype(np.int64),
        c=ev["event_type"].astype(str).str[0],
    ).sort_values(["user_id", "ts_us", "event_id"])
    want = (
        ev.groupby("user_id")["c"]
        .apply(lambda s: "".join(s.iloc[:8]))
        .value_counts()
        .rename_axis("path")
        .rename("n_users")
        .reset_index()
        .sort_values("path", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_pmi_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import event_pmi

    got = event_pmi(SF)
    ev = _events_pdf()
    d = ev[["user_id", "event_type"]].drop_duplicates()
    sets = d.groupby("user_id")["event_type"].agg(frozenset)
    N = len(sets)
    types = sorted(d["event_type"].unique())
    for _, row in got.iterrows():
        a, b = row["event_a"], row["event_b"]
        assert a < b
        n_a = int(sum(a in s for s in sets))
        n_b = int(sum(b in s for s in sets))
        n_ab = int(sum((a in s and b in s) for s in sets))
        assert row["n_both"] == n_ab
        np.testing.assert_allclose(
            row["pmi"], np.log(n_ab * N / (n_a * n_b)), rtol=0, atol=5e-7
        )
    # every co-occurring pair present
    pairs = {(a, b) for i, a in enumerate(types) for b in types[i + 1:]
             if any(a in s and b in s for s in sets)}
    assert set(zip(got["event_a"], got["event_b"])) == pairs


def test_promo_revenue_share_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.joins import promo_revenue_share

    got = promo_revenue_share(SF)
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet").to_pandas()
    part = ray.data.read_parquet(f"{SF}/part.parquet").to_pandas()
    # FK integrity makes broadcast membership == inner join
    assert li["l_partkey"].isin(part["p_partkey"]).all()
    sd = li["l_shipdate"].astype("datetime64[us]")
    m = (sd >= pd.Timestamp("1996-01-01")) & (sd < pd.Timestamp("1997-01-01"))
    li = li[m]
    pc_ = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    dc = np.floor(li["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
    rc = pc_ * (100 - dc)
    promo_keys = set(
        part.loc[part["p_type"].str.startswith("PROMO"), "p_partkey"]
    )
    isp = li["l_partkey"].isin(promo_keys).to_numpy()
    sp, sa = rc[isp].sum(), rc.sum()
    assert got["promo_revenue"].iloc[0] == sp / 10000.0
    assert got["total_revenue"].iloc[0] == sa / 10000.0
    np.testing.assert_allclose(
        got["promo_share_pct"].iloc[0], 100.0 * sp / sa, rtol=0, atol=5e-7
    )


def test_active_users_7d_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import active_users_7d

    got = active_users_7d(SF)
    ev = _events_pdf()
    DAY_US = 86400 * 1_000_000
    d = pd.DataFrame(
        {
            "user_id": ev["user_id"],
            "day": ev["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US,
        }
    ).drop_duplicates()
    days = np.sort(d["day"].unique())
    for _, row in got.iterrows():
        day = row["day"]
        w = d[(d["day"] >= day - 6) & (d["day"] <= day)]
        assert row["wau"] == w["user_id"].nunique(), day
        assert row["dau"] == (d["day"] == day).sum(), day
        np.testing.assert_allclose(
            row["stickiness"], row["dau"] / row["wau"], rtol=0, atol=5e-7
        )
    assert got["day"].tolist() == list(days)
    assert (got["wau"] >= got["dau"]).all()


def test_ab_conversion_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.grouping import ab_conversion

    got = ab_conversion(SF)
    ev = _events_pdf()
    pu = ev.groupby("user_id").agg(
        conv=("event_type", lambda s: int((s == "purchase").any())),
        n_ev=("event_type", "size"),
    )
    pu["arm"] = pu.index % 2
    want = pu.groupby("arm").agg(
        n_users=("conv", "size"), n_conv=("conv", "sum"), s_ev=("n_ev", "sum")
    )
    assert got["n_users"].tolist() == want["n_users"].tolist()
    assert got["n_conv"].tolist() == want["n_conv"].tolist()
    np.testing.assert_allclose(
        got["conv_rate"],
        want["n_conv"].to_numpy() / want["n_users"].to_numpy(),
        rtol=0, atol=5e-7,
    )
    np.testing.assert_allclose(
        got["events_per_user"],
        want["s_ev"].to_numpy() / want["n_users"].to_numpy(),
        rtol=0, atol=5e-7,
    )


def test_vocab_growth_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import vocab_growth

    got = vocab_growth(SF, bucket_docs=64)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    rows = []
    for _, r in docs.iterrows():
        for t in str(r["text"]).split(" "):
            rows.append((r["source"], t, r["doc_id"]))
    f = (
        pd.DataFrame(rows, columns=["source", "term", "doc_id"])
        .groupby(["source", "term"], as_index=False)["doc_id"]
        .min()
    )
    f["bucket"] = f["doc_id"] // 64
    want = (
        f.groupby(["source", "bucket"], as_index=False)
        .size()
        .rename(columns={"size": "new_terms"})
        .sort_values(["source", "bucket"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # growth curves are monotone in cumulative terms and positive
    assert (got["new_terms"] > 0).all()
