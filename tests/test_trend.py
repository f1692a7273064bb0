"""Windowed WLS trend stage (K3 analog) vs an independent numpy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ecov003_l2t_stars_ray.schema import RECENCY_TAU
from ecov003_l2t_stars_ray.stages.trend import _wls_window, trend_per_series, trend_stage


def test_wls_matches_polyfit():
    rng = np.random.default_rng(3)
    y = np.cumsum(rng.normal(0.5, 1.0, 60))
    slope, r2, nobs = _wls_window(y, window=16, min_support=7, tau=RECENCY_TAU)
    # independent check at a few positions via weighted polyfit
    for i in [20, 40, 59]:
        lo = i - 15
        t = np.arange(lo, i + 1, dtype=float)
        w = np.exp(-0.5 * (i - t) / RECENCY_TAU)
        coef = np.polyfit(t, y[lo : i + 1], 1, w=np.sqrt(w))
        np.testing.assert_allclose(slope[i], coef[0], rtol=1e-8)
    assert nobs[-1] == 16


def test_min_support_guard():
    y = np.array([1.0, 2.0, np.nan, np.nan, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    slope, r2, nobs = _wls_window(y, window=10, min_support=7, tau=RECENCY_TAU)
    assert np.isnan(slope[:7]).all()  # < 7 finite obs so far
    assert np.isfinite(slope[-1])  # 8 finite obs in window


def test_trend_stage_on_tiers(small_transcripts):
    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import rollup_tiers

    ds = ray.data.from_arrow(small_transcripts)
    tiers = rollup_tiers(ds, smooth=True)
    out = trend_stage(tiers, tier="1h", window=16).to_pandas()
    assert len(out) > 0
    assert {"conv_id", "metric", "bucket_start", "slope", "r2", "n_obs"} <= set(out.columns)
    # guard respected: slope NaN wherever support below threshold
    low = out[out["n_obs"] < 7]
    assert low["slope"].isna().all()
    # per-series oracle replay for one series
    tdf = tiers.to_pandas()
    for c in ("conv_id", "metric", "tier"):
        tdf[c] = tdf[c].astype(str)
    tdf = tdf[(tdf.tier == "1h") & (tdf.metric == "turn_rate")]
    conv = tdf["conv_id"].iloc[0]
    s = tdf[tdf.conv_id == conv].sort_values("bucket_start")
    want = trend_per_series(
        s.assign(metric="turn_rate")[["conv_id", "metric", "bucket_start", "value"]]
    )
    got = out[(out.conv_id == conv) & (out.metric == "turn_rate")].sort_values(
        "bucket_start", ignore_index=True
    )
    np.testing.assert_allclose(
        got["slope"].to_numpy(), want["slope"].to_numpy(), rtol=1e-10, equal_nan=True
    )
