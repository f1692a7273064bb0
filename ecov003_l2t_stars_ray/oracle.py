"""Single-process oracle engine (pandas/numpy, float64).

Independently computes the tier rollups + gap-filled values the Ray engine
must reproduce (FIXTURES.md "Oracle"). This is the golden reference the
upstream project lacks (its tests are import smoke tests only,
``tests/test_import_ECOv003_L2T_STARS.py:1-2``): semantics are defined HERE
and the distributed engine is required to match.

Semantics contract:
- ordering: stable (conv_id, turn_idx) sort defines turn order, never ts
  (ties in ts are legal) — analog of sorted filename globs (``jl:133,136``);
- latency obs: for every turn with a predecessor (turn_idx-1 present),
  value = (ts - ts_prev) / 1e6 seconds, bucketed at the LATER turn's ts;
- turn_rate obs: every turn contributes value 1.0;
- tier t aggregates count/min/max/sum over raw observations with
  bucket_start = floor(ts, width_t); mean = sum / count;
- dense axis per (conv, metric, tier) spans first..last observed bucket;
  empty buckets get count=0, NaN aggregates, gap_filled=True;
- gap-fill: bias-aware local-level Kalman filter (state = level + slowly
  drifting observation bias, mirroring the reference's per-pixel bias
  state ``jl:333-334``), cold-start mean 0.12 / sd 0.01 / bias 0 /
  bias sd 0.001 (reference defaults ``jl:42-47``), process var 0.05,
  bias process var 1e-7, smoothing the bucket mean for latency and the
  bucket count for turn_rate;
- adaptive observation noise (K2 coupling, ``jl:151-183,339-348``):
  default obs var 1e-6 during the first SPINUP_BUCKETS buckets of a
  series while observed values accumulate; then R = max(sample var,
  default) if >= MIN_SUPPORT observations, else the default, fixed for
  the series' remaining life.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .schema import (
    BIAS_PROCESS_NOISE_VAR,
    COLD_START,
    MIN_SUPPORT,
    OBS_NOISE_VAR,
    PROCESS_NOISE_VAR,
    SPINUP_BUCKETS,
    TIERS,
)

_SMOOTH_ON = {"turn_rate": "sum", "latency": "mean"}


def observations(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Per-turn observation stream: columns (conv_id, ts_us, metric, value)."""
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    conv = df["conv_id"].to_numpy()
    idx = df["turn_idx"].to_numpy()
    has_prev = np.zeros(len(df), dtype=bool)
    has_prev[1:] = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
    gap = np.full(len(df), np.nan)
    gap[has_prev] = (ts_us[has_prev] - np.roll(ts_us, 1)[has_prev]) / 1e6

    turn = pd.DataFrame(
        {"conv_id": conv, "ts_us": ts_us, "metric": "turn_rate", "value": 1.0}
    )
    lat = pd.DataFrame(
        {
            "conv_id": conv[has_prev],
            "ts_us": ts_us[has_prev],
            "metric": "latency",
            "value": gap[has_prev],
        }
    )
    return pd.concat([turn, lat], ignore_index=True)


def _kalman(y: np.ndarray, observed: np.ndarray,
            adaptive: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Independent re-implementation of the bias-aware adaptive filter
    (same op order as ``functions.kalman.kalman_gap_fill`` — the
    contract)."""
    m = COLD_START["mean"]
    b = COLD_START["bias_mean"]
    p00 = COLD_START["sd"] ** 2
    p01 = 0.0
    p11 = COLD_START["bias_sd"] ** 2
    r = OBS_NOISE_VAR
    q = PROCESS_NOISE_VAR
    qb = BIAS_PROCESS_NOISE_VAR
    seen, cn, s1, s2 = (0, 0, 0.0, 0.0) if adaptive else (SPINUP_BUCKETS, 0, 0.0, 0.0)
    done = seen >= SPINUP_BUCKETS
    value = np.empty(len(y))
    sd = np.empty(len(y))
    for i in range(len(y)):
        p00 = p00 + q
        p11 = p11 + qb
        if observed[i]:
            if not done:
                cn += 1
                s1 += y[i]
                s2 += y[i] * y[i]
            k0num = p00 + p01
            k1num = p01 + p11
            s = k0num + k1num + r
            k0 = k0num / s
            k1 = k1num / s
            nu = y[i] - (m + b)
            m = m + k0 * nu
            b = b + k1 * nu
            p00n = (1.0 - k0) * p00 - k0 * p01
            p01n = (1.0 - k0) * p01 - k0 * p11
            p11n = (1.0 - k1) * p11 - k1 * p01
            p00, p01, p11 = p00n, p01n, p11n
        if not done:
            seen += 1
            if seen >= SPINUP_BUCKETS:
                if cn >= MIN_SUPPORT:
                    var = (s2 - s1 * s1 / cn) / (cn - 1.0)
                    r = var if var > OBS_NOISE_VAR else OBS_NOISE_VAR
                else:
                    r = OBS_NOISE_VAR
                done = True
        value[i] = m + b
        sd[i] = math.sqrt((p00 + p01) + (p01 + p11))
    return value, sd


def tier_rollup(
    transcripts: pd.DataFrame, smooth: bool = True, include_raw: bool = False
) -> pd.DataFrame:
    """All tiers for all (conv, metric) series; the golden output table."""
    obs = observations(transcripts)
    out = []
    if include_raw:
        v = obs["value"].to_numpy(dtype=np.float64)
        out.append(
            pd.DataFrame(
                {
                    "conv_id": obs["conv_id"].to_numpy(),
                    "metric": obs["metric"].to_numpy(),
                    "tier": "raw",
                    "bucket_start": obs["ts_us"].to_numpy().view("datetime64[us]"),
                    "count": np.int64(1),
                    "min": v, "max": v, "sum": v, "mean": v, "value": v,
                    "value_sd": np.nan,
                    "gap_filled": False,
                }
            )
        )
    for tier, width in TIERS.items():
        obs_t = obs.copy()
        obs_t["bucket_us"] = obs_t["ts_us"] // width * width
        agg = (
            obs_t.groupby(["conv_id", "metric", "bucket_us"])["value"]
            .agg(["count", "min", "max", "sum"])
            .reset_index()
        )
        for (conv, metric), g in agg.groupby(["conv_id", "metric"]):
            g = g.sort_values("bucket_us")
            b = g["bucket_us"].to_numpy()
            axis = np.arange(b[0], b[-1] + width, width, dtype=np.int64)
            pos = np.searchsorted(axis, b)
            n = len(axis)
            count = np.zeros(n, dtype=np.int64)
            vmin = np.full(n, np.nan)
            vmax = np.full(n, np.nan)
            vsum = np.full(n, np.nan)
            count[pos] = g["count"].to_numpy()
            vmin[pos] = g["min"].to_numpy()
            vmax[pos] = g["max"].to_numpy()
            vsum[pos] = g["sum"].to_numpy()
            observed = count > 0
            mean = np.full(n, np.nan)
            mean[observed] = vsum[observed] / count[observed]
            if smooth:
                y = vsum if _SMOOTH_ON[metric] == "sum" else mean
                value, sd = _kalman(np.where(observed, y, 0.0), observed)
            else:
                value = np.where(observed, vsum if _SMOOTH_ON[metric] == "sum" else mean, np.nan)
                sd = np.full(n, np.nan)
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv,
                        "metric": metric,
                        "tier": tier,
                        "bucket_start": axis.view("datetime64[us]"),
                        "count": count,
                        "min": vmin,
                        "max": vmax,
                        "sum": vsum,
                        "mean": mean,
                        "value": value,
                        "value_sd": sd,
                        "gap_filled": ~observed,
                    }
                )
            )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["tier", "conv_id", "metric", "bucket_start"], ignore_index=True)
    )
