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
