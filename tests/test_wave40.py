"""Wave-40 operators: per-epoch shuffle manifest, point-in-time state
panel.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_epoch_shuffle_deterministic_and_distinct():
    from ecov003_l2t_stars_ray.pipelines.sketches import epoch_shuffle

    got = epoch_shuffle(SF, epochs=2, k=50)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    for e in (0, 1):
        h = docs["doc_id"].astype(str).map(
            lambda s, e=e: hashlib.md5(f"{e}:{s}".encode()).hexdigest()
        )
        want = (
            docs.assign(h=h)
            .sort_values(["h", "doc_id"], kind="mergesort")
            .head(50)["doc_id"]
            .tolist()
        )
        sub = got[got["epoch"] == e].sort_values("position")
        assert list(sub["doc_id"]) == want
        assert list(sub["position"]) == list(range(50))
    # the two epochs order the corpus differently
    assert list(got[got["epoch"] == 0]["doc_id"]) != list(
        got[got["epoch"] == 1]["doc_id"]
    )
    # rerun is bit-identical (restart reproducibility)
    again = epoch_shuffle(SF, epochs=2, k=50)
    assert got.equals(again)


def test_state_panel_matches_literal_asof():
    from ecov003_l2t_stars_ray.pipelines.grouping import state_panel_1h

    got = state_panel_1h(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    n_rows = 0
    for uid, g in list(ev.groupby("user_id"))[:25]:
        g = g.sort_values(["us", "event_id"])
        us = g["us"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        h0, h1 = us[0] // HOUR_US, us[-1] // HOUR_US
        sub = got[got["user_id"] == uid].sort_values("tick")
        assert len(sub) == h1 - h0 + 1
        for tick_i, row in zip(range(h0, h1 + 1), sub.itertuples()):
            tick = tick_i * HOUR_US
            idx = np.searchsorted(us, tick, side="right") - 1
            if idx < 0:
                want = "none"
            elif tick - us[idx] > 6 * HOUR_US:
                want = "expired"
            else:
                want = et[idx]
            assert row.state == want
        n_rows += len(sub)
    assert n_rows > 0
    # panel is dense per user and states come from the type vocabulary
    vocab = set(ev["event_type"].astype(str)) | {"none", "expired"}
    assert set(got["state"]) <= vocab
