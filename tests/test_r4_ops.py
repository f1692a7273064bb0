"""Round-4 operators: GROUPING SETS cube, trailing range join, ordered
funnel, TPC-H Q5-shaped multi-join — each pinned to an independent local
pandas oracle (the SQL oracles run at the driver / check_oracle gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    return ray.data.read_parquet(f"{SF}/events.parquet").to_pandas()


def test_grouping_sets_day_internally_consistent():
    """Cube identity: every coarser grouping set must equal the sum of the
    finest level's cells — computed from raw events, not from the op."""
    from ecov003_l2t_stars_ray.pipelines.analytics import grouping_sets_day

    got = grouping_sets_day(SF)
    ev = _events_pdf()
    vc = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    d = ev["ts"].astype("datetime64[us]").dt.floor("D")
    fine = (
        pd.DataFrame({"event_type": ev["event_type"], "bucket_day": d, "vc": vc})
        .groupby(["event_type", "bucket_day"], as_index=False)
        .agg(n=("vc", "size"), s=("vc", "sum"))
    )
    sent = pd.Timestamp("1900-01-01")

    fine_got = got[(got["event_type"] != "ALL") & (got["bucket_day"] != sent)]
    assert len(fine_got) == len(fine)
    m = fine_got.merge(fine, on=["event_type", "bucket_day"])
    assert (m["n_x"] == m["n_y"]).all()
    np.testing.assert_allclose(
        m["sum_value"].to_numpy(), np.round(m["s"].to_numpy() / 100.0, 6)
    )

    by_type = got[(got["event_type"] != "ALL") & (got["bucket_day"] == sent)]
    want_t = fine.groupby("event_type", as_index=False)[["n", "s"]].sum()
    m = by_type.merge(want_t, on="event_type")
    assert len(m) == len(want_t) and (m["n_x"] == m["n_y"]).all()

    total = got[(got["event_type"] == "ALL") & (got["bucket_day"] == sent)]
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == len(ev)
    np.testing.assert_allclose(
        total["sum_value"].iloc[0], round(vc.sum() / 100.0, 6)
    )
    # 4 set shapes present: fine + by-type + by-day + total
    by_day = got[(got["event_type"] == "ALL") & (got["bucket_day"] != sent)]
    assert len(got) == len(fine_got) + len(by_type) + len(by_day) + 1


def test_attribution_window_30m_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.analytics import attribution_window_30m

    got = attribution_window_30m(SF)
    ev = _events_pdf()
    p = ev[ev["event_type"] == "purchase"]
    v = ev[ev["event_type"] == "view"]
    lo = p["ts"] - pd.Timedelta(minutes=30)
    want = []
    for eid, uid, ts, lo_ts in zip(p["event_id"], p["user_id"], p["ts"], lo):
        vs = v[v["user_id"] == uid]["ts"]
        want.append((eid, int(((vs > lo_ts) & (vs <= ts)).sum())))
    want = pd.DataFrame(want, columns=["event_id", "n"]).sort_values(
        "event_id", ignore_index=True
    )
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["event_id"].to_numpy(), want["event_id"])
    np.testing.assert_array_equal(got["n_views_30m"].to_numpy(), want["n"])
    assert (got["n_views_30m"] > 0).any()  # corpus exercises the window


def test_funnel_conversion_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.analytics import funnel_conversion

    got = funnel_conversion(SF).set_index("user_id")
    ev = _events_pdf()
    assert len(got) == ev["user_id"].nunique()
    for uid, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        fv = views.min() if len(views) else None
        fc = fp = None
        if fv is not None:
            clicks = g.loc[(g["event_type"] == "click") & (g["ts"] > fv), "ts"]
            fc = clicks.min() if len(clicks) else None
        if fc is not None:
            buys = g.loc[(g["event_type"] == "purchase") & (g["ts"] > fc), "ts"]
            fp = buys.min() if len(buys) else None
        row = got.loc[uid]
        assert bool(row["reached_view"]) == (fv is not None)
        assert bool(row["reached_click"]) == (fc is not None)
        assert bool(row["reached_purchase"]) == (fp is not None)
    # all three stages are exercised somewhere in the corpus
    assert got["reached_purchase"].any()


def test_funnel_partial_stages(tmp_path):
    """sf0.001 users all complete the funnel, so pin the strict-ordering
    semantics (click must be AFTER first view, purchase AFTER that click)
    on a synthetic corpus with every partial shape."""
    from ecov003_l2t_stars_ray.pipelines.analytics import funnel_conversion

    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [
        # u0: full funnel in order
        (0, "view", t0), (0, "click", t0 + m), (0, "purchase", t0 + 2 * m),
        # u1: view only
        (1, "view", t0),
        # u2: view + click, no purchase
        (2, "view", t0), (2, "click", t0 + m),
        # u3: click BEFORE any view — never reaches click stage
        (3, "click", t0), (3, "view", t0 + m),
        # u4: purchase before click — purchase stage not reached
        (4, "view", t0), (4, "purchase", t0 + m), (4, "click", t0 + 2 * m),
        # u5: no funnel events at all (only an unrelated type)
        (5, "error", t0),
        # u6: click at the SAME ts as first view (strictly-after ⇒ no)
        (6, "view", t0), (6, "click", t0),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    ev["value"] = 1.0
    ev.to_parquet(tmp_path / "events.parquet")
    got = funnel_conversion(str(tmp_path)).set_index("user_id")
    want = {
        0: (True, True, True),
        1: (True, False, False),
        2: (True, True, False),
        3: (True, False, False),
        4: (True, True, False),
        5: (False, False, False),
        6: (True, False, False),
    }
    assert len(got) == len(want)
    for uid, (wv, wc, wp) in want.items():
        r = got.loc[uid]
        assert (bool(r["reached_view"]), bool(r["reached_click"]),
                bool(r["reached_purchase"])) == (wv, wc, wp), uid


def test_q5_local_supplier_matches_pandas_join():
    from ecov003_l2t_stars_ray.pipelines.joins import q5_local_supplier

    got = q5_local_supplier(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    asia = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nat = nation[nation["n_regionkey"] == asia]
    o = orders[
        (orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
        & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))
    ]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )
    j = j[j["s_nationkey"] == j["c_nationkey"]]
    rev_u = (
        np.round(j["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        * (100 - np.round(j["l_discount"].to_numpy() * 100.0).astype(np.int64))
    )
    want = (
        pd.DataFrame({"n_name": j["n_name"].to_numpy(), "rev_u": rev_u})
        .groupby("n_name", as_index=False)["rev_u"].sum()
        .sort_values("n_name", ignore_index=True)
    )
    want["revenue"] = np.round(want["rev_u"].to_numpy(np.float64) / 10000.0, 6)
    assert len(got) == len(want) > 0
    assert (got["n_name"].to_numpy() == want["n_name"].to_numpy()).all()
    np.testing.assert_allclose(got["revenue"].to_numpy(), want["revenue"].to_numpy())


def _lev_ref(a: str, b: str) -> int:
    """Tiny reference DP (test oracle only)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_levenshtein_pairs_matches_bruteforce():
    from ecov003_l2t_stars_ray.pipelines.dedup import levenshtein_pairs

    strs = [
        "alpha", "alpha", "alphA", "alpH", "alphaa", "beta", "betta",
        "bet", "", "a", "b", "gamma-12", "gamma-13", "gamma-123",
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"s": strs})).repartition(3)
    got = levenshtein_pairs(ds, k=1, n_chunks=4)
    uniq = sorted(set(strs))
    want = []
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            if abs(len(a) - len(b)) <= 1:
                d = _lev_ref(a, b)
                if d <= 1:
                    want.append((a, b, d))
    want = pd.DataFrame(want, columns=["s_a", "s_b", "dist"]).sort_values(
        ["s_a", "s_b"], ignore_index=True
    )
    assert len(want) > 3  # the fixture exercises sub/ins/del and edges
    pd.testing.assert_frame_equal(
        got.astype({"dist": "int64"}), want.astype({"dist": "int64"})
    )


def test_state_duration_matches_bruteforce():
    """Per-user lead() replay in plain pandas must reproduce the op."""
    from ecov003_l2t_stars_ray.pipelines.analytics import state_duration

    got = state_duration(SF)
    ev = _events_pdf().sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = ev["user_id"].to_numpy()
    dur = np.zeros(len(ev), dtype=np.int64)
    dur[:-1] = np.where(u[1:] == u[:-1], t[1:] - t[:-1], 0)
    want = (
        pd.DataFrame(
            {"user_id": u, "event_type": ev["event_type"].to_numpy(), "d": dur}
        )
        .groupby(["user_id", "event_type"], as_index=False)
        .agg(n_events=("d", "size"), d=("d", "sum"))
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    want["state_s"] = np.round(want.pop("d").to_numpy(np.float64) / 1e6, 6)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # invariant: total held time per user == span first..last event
    span = (
        pd.DataFrame({"u": u, "t": t}).groupby("u")["t"].agg(["min", "max"])
    )
    per_user = got.groupby("user_id")["state_s"].sum()
    np.testing.assert_allclose(
        per_user.to_numpy(),
        np.round((span["max"] - span["min"]).to_numpy(np.float64) / 1e6, 6),
        atol=1e-5,  # per-group 6-dp rounding accumulates across event types
    )


def test_interval_coverage_matches_bruteforce():
    """Scalar sweep-line replay per user must reproduce the op."""
    from ecov003_l2t_stars_ray.pipelines.analytics import interval_coverage

    hold = 300 * 1_000_000
    got = interval_coverage(SF)
    ev = _events_pdf()
    t = ev["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for uid, g in pd.DataFrame({"u": ev["user_id"], "t": t}).groupby("u"):
        ts = np.sort(g["t"].to_numpy())
        n_iv, cov, cur_s, cur_e = 0, 0, ts[0], ts[0] + hold
        for x in ts[1:]:
            if x > cur_e:
                n_iv += 1
                cov += cur_e - cur_s
                cur_s, cur_e = x, x + hold
            else:
                cur_e = max(cur_e, x + hold)
        n_iv += 1
        cov += cur_e - cur_s
        rows.append((uid, n_iv, round(cov / 1e6, 6)))
    want = pd.DataFrame(rows, columns=["user_id", "n_intervals", "covered_s"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_decontaminate_matches_bruteforce():
    """Python set replay of the 8-gram eval-overlap must reproduce the op
    (exercises hash-vs-string parity end to end)."""
    from ecov003_l2t_stars_ray.pipelines.text_analysis import decontaminate

    k, mod = 8, 97
    got = decontaminate(SF)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()

    def shingles(text: str) -> set[str]:
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        } if len(toks) >= k else set()

    ev: set[str] = set()
    for _, r in docs[docs["doc_id"] % mod == 0].iterrows():
        ev |= shingles(r["text"])
    rows = []
    for _, r in docs[docs["doc_id"] % mod != 0].iterrows():
        n = len(shingles(r["text"]) & ev)
        if n:
            rows.append((r["doc_id"], n))
    want = pd.DataFrame(rows, columns=["doc_id", "n_hit_shingles"]).sort_values(
        "doc_id", ignore_index=True
    )
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted eval slice must never flag itself
    assert not (got["doc_id"] % mod == 0).any()


def test_decontaminate_planted_overlap(tmp_path):
    """Synthetic corpus with KNOWN contamination: doc 97*2 is an eval doc;
    doc 5 copies one of its 8-gram windows, doc 6 copies two distinct
    windows, doc 7 shares nothing."""
    from ecov003_l2t_stars_ray.pipelines.text_analysis import decontaminate

    w = [f"w{i:03d}" for i in range(40)]
    eval_text = " ".join(w)  # 40 tokens -> 33 shingles
    clean = " ".join(f"z{i:03d}" for i in range(30))
    doc5 = " ".join(w[0:8]) + " " + clean  # one shared shingle
    # two disjoint windows, separated so no bridging shingle matches
    doc6 = " ".join(w[10:18]) + " qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8 " + " ".join(
        w[20:28]
    )
    docs = pd.DataFrame(
        {
            "doc_id": [97 * 2, 5, 6, 7],
            "text": [eval_text, doc5, doc6, clean],
            "lang": "en",
            "source": "synth",
            "n_chars": 0,
        }
    )
    d = tmp_path / "documents.parquet"
    docs.to_parquet(d)
    got = decontaminate(str(tmp_path))
    got = got.set_index("doc_id")["n_hit_shingles"]
    assert got.to_dict() == {5: 1, 6: 2}
    # no-overlap corpus: result must be typed-empty, not schemaless
    empty = decontaminate(str(tmp_path), k=30)
    assert list(empty.columns) == ["doc_id", "n_hit_shingles"]
    assert len(empty) == 0
