"""Wave-22 operators: event debouncing (raw-predecessor LAG rule),
per-dimension embedding moment profile, brand price realization.

Local pandas replays pin the ENGINE against refactors; the SQL oracles
run at the driver / check_oracle gate (all three bit-exact at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
US = 1_000_000


def test_debounce_matches_lag_replay():
    from ecov003_l2t_stars_ray.pipelines.analytics import debounce_events

    w = 300
    got = debounce_events(SF, window_s=w)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    key = (ev["user_id"].astype(str) + "|" + ev["event_type"]).to_numpy()
    dropped = np.zeros(len(ev), dtype=bool)
    dropped[1:] = (key[1:] == key[:-1]) & ((t[1:] - t[:-1]) <= w * US)
    exp = (
        pd.DataFrame({"event_type": ev["event_type"].to_numpy(),
                      "d": dropped})
        .groupby("event_type")
        .agg(n_dropped=("d", "sum"), n=("d", "size"))
        .reset_index()
        .sort_values("event_type", ignore_index=True)
    )
    exp["n_kept"] = exp["n"] - exp["n_dropped"]
    assert list(got["event_type"]) == list(exp["event_type"])
    assert np.array_equal(got["n_kept"].to_numpy(np.int64),
                          exp["n_kept"].to_numpy(np.int64))
    assert np.array_equal(got["n_dropped"].to_numpy(np.int64),
                          exp["n_dropped"].to_numpy(np.int64))
    # conservation
    assert int((got["n_kept"] + got["n_dropped"]).sum()) == len(ev)


def test_embedding_dim_variance_matches_numpy():
    from ecov003_l2t_stars_ray.pipelines.similarity import (
        embedding_dim_variance,
    )

    got = embedding_dim_variance(SF)
    m = np.stack(
        pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"].to_numpy()
    ).astype(np.float64)
    assert len(got) == m.shape[1]
    assert np.allclose(got["mean_x"], m.mean(axis=0), atol=1e-6)
    assert np.allclose(got["var_x"], m.var(axis=0, ddof=1), atol=1e-6)
    assert (got["var_x"] > 0).all()


def test_brand_price_realization_matches_join_replay():
    from ecov003_l2t_stars_ray.pipelines.joins import brand_price_realization

    got = brand_price_realization(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = pd.read_parquet(
        f"{SF}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"],
    )
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["ext_c"] = np.floor(j["l_extendedprice"] * 100 + 0.5).astype(np.int64)
    j["qr_c"] = np.floor(j["l_quantity"] + 0.5).astype(np.int64) * np.floor(
        j["p_retailprice"] * 100 + 0.5
    ).astype(np.int64)
    exp = (
        j.groupby("p_brand")
        .agg(n_lines=("ext_c", "size"), ext=("ext_c", "sum"),
             qr=("qr_c", "sum"))
        .reset_index()
        .sort_values("p_brand", ignore_index=True)
    )
    assert list(got["p_brand"]) == list(exp["p_brand"])
    assert np.array_equal(got["n_lines"].to_numpy(np.int64),
                          exp["n_lines"].to_numpy(np.int64))
    assert np.allclose(got["realized_ratio"],
                       exp["ext"] / exp["qr"], atol=1e-6)
    # ratio is positive and finite (this synthetic corpus prices lines
    # independently of the catalog, so no tight upper bound applies)
    assert (got["realized_ratio"] > 0).all()
    assert np.isfinite(got["realized_ratio"]).all()
