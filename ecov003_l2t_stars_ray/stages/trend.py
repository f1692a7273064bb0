"""Windowed weighted-least-squares trend stage (the K3 / NRT-BRDF analog).

Reference: per-series WLS over a lagged 17-day window with exponential
recency weights ``exp(-0.5 * age / 1.87)`` and a minimum-support guard
(>=7 finite obs else NaN) — ``VNP43NRT_jl/src/VNP43NRT.jl:310-394``
(weights ``:362``, guard ``:345-346``).

Engine form: for each (conv_id, metric) series at a tier, fit
``y ~ a + b*t`` over the trailing ``window`` buckets ending at each bucket,
with recency weights on bucket age, emitting slope / intercept / rmse / r2
/ n_obs per bucket. Runs vectorized-across-series inside the same
hash-partition ``map_groups`` shape as finalize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.shuffle import hash_combine
from ..schema import MIN_SUPPORT, RECENCY_TAU


def _wls_window(
    y: np.ndarray, window: int, min_support: int, tau: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Trailing-window WLS per position of ONE series (float64).

    Returns (slope, r2, n_obs) arrays, NaN where support < min_support.
    """
    n = len(y)
    slope = np.full(n, np.nan)
    r2 = np.full(n, np.nan)
    nobs = np.zeros(n, dtype=np.int64)
    ages = np.arange(window, dtype=np.float64)
    base_w = np.exp(-0.5 * ages / tau)  # age 0 = current bucket
    for i in range(n):
        lo = max(0, i - window + 1)
        yy = y[lo : i + 1]
        finite = np.isfinite(yy)
        k = int(finite.sum())
        nobs[i] = k
        if k < min_support:
            continue
        t = np.arange(lo, i + 1, dtype=np.float64)[finite]
        yv = yy[finite]
        w = base_w[(i - np.arange(lo, i + 1))[finite]]
        sw = w.sum()
        tm = (w * t).sum() / sw
        ym = (w * yv).sum() / sw
        stt = (w * (t - tm) ** 2).sum()
        if stt <= 0:
            continue
        b = (w * (t - tm) * (yv - ym)).sum() / stt
        slope[i] = b
        resid = yv - (ym + b * (t - tm))
        sst = (w * (yv - ym) ** 2).sum()
        r2[i] = 1.0 - ((w * resid**2).sum() / sst if sst > 0 else np.nan)
    return slope, r2, nobs


def trend_per_series(
    g: pd.DataFrame,
    value_col: str = "value",
    window: int = 16,
    min_support: int = MIN_SUPPORT,
    tau: float = RECENCY_TAU,
) -> pd.DataFrame:
    """Apply the windowed WLS to every (conv_id, metric) series in a
    partition's tier rows (sorted per series by bucket_start)."""
    g = g.sort_values(["conv_id", "metric", "bucket_start"], kind="mergesort")
    out = []
    for (conv, metric), s in g.groupby(["conv_id", "metric"], sort=False):
        y = s[value_col].to_numpy(dtype=np.float64)
        slope, r2, nobs = _wls_window(y, window, min_support, tau)
        out.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "metric": metric,
                    "bucket_start": s["bucket_start"].to_numpy(),
                    "slope": slope,
                    "r2": r2,
                    "n_obs": nobs,
                }
            )
        )
    if not out:
        return pd.DataFrame(
            columns=["conv_id", "metric", "bucket_start", "slope", "r2", "n_obs"]
        )
    return pd.concat(out, ignore_index=True)


def trend_stage(
    tiers: ray.data.Dataset,
    tier: str = "1h",
    window: int = 16,
    min_support: int = MIN_SUPPORT,
) -> ray.data.Dataset:
    """Tier rows -> per-bucket trailing trend estimates (K3 analog)."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        # plain object dtype: pandas groupby on categoricals materializes
        # the unobserved category cross-product (phantom NaN rows)
        df = df.copy()
        for c in ("conv_id", "metric", "tier"):
            df[c] = df[c].astype(str)
        df = df[(df["tier"] == tier) & ~df["metric"].str.startswith("_")]
        return df[["conv_id", "metric", "bucket_start", "value"]]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["conv_id", "metric", "bucket_start"], as_index=False).first()
        return trend_per_series(g, window=window, min_support=min_support)

    picked = tiers.map_batches(pick, batch_format="pandas")
    return hash_combine(picked, ["conv_id"], combine)
