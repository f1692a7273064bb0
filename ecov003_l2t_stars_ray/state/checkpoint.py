"""Smoother state checkpoint chain (the K4 prior/posterior analog).

The reference carries 8 prior rasters from run N to run N+1 with
all-or-nothing validation (``load_prior.py:14-250``; gate ``:170-229``):
a partial prior means *run stateless*, never half-stateful. Here the state
is a compact Parquet table per epoch keyed by (conv_id, metric, tier)
(STATE_SCHEMA: level/bias means, P00/P01/P11, per-series obs noise R and
its spin-up accumulators — the bias-aware mirror of the reference's
mean/UQ/bias/bias-SD prior layers, ``prior.py:28-56``), written
atomically; loading validates the same all-or-nothing way: a
missing/partial epoch dir yields ``None`` and the pipeline cold-starts
(reference ``jl:42-47`` defaults).

State flows out of the engine as dedicated checkpoint ROWS in the tier
stream (emitted by ``stages.finalize._densify_and_smooth_tier``):

- ``metric = "_s:{metric}:{tier}"``: value=m, mean=b, min=P00, max=P01,
  sum=P11, value_sd=R, count=spin_seen, bucket_start=last emitted bucket;
- ``metric = "_p:{metric}:{tier}"`` (only while spin-up is open):
  count=spin_seen, min=spin_n, max=spin_s1, sum=spin_s2;
- ``metric = "_context*"``: cross-epoch latency boundary records
  (value=turn_idx, bucket_start=ts).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import OBS_NOISE_VAR, SPINUP_BUCKETS, STATE_SCHEMA


def state_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"state-e{epoch:05d}.parquet")


def derive_state(tiers: pd.DataFrame, epoch: int) -> pd.DataFrame:
    """Posterior state from the tier stream's checkpoint rows.

    ``tiers`` must contain the "_s:"/"_p:"/"_context*" rows emitted by
    finalize (each series emits at most one of each per epoch run)."""
    met = tiers["metric"].astype(str)
    out_frames = []

    srows = tiers[met.str.startswith("_s:")]
    if len(srows):
        parts = srows["metric"].astype(str).str.split(":", expand=True)
        base = pd.DataFrame(
            {
                "conv_id": srows["conv_id"].astype(str).to_numpy(),
                "metric": parts[1].to_numpy(),
                "tier": parts[2].to_numpy(),
                "mean": srows["value"].to_numpy(dtype=np.float64),
                "sd": np.sqrt(srows["min"].to_numpy(dtype=np.float64)),
                "bias_mean": srows["mean"].to_numpy(dtype=np.float64),
                "bias_sd": np.sqrt(srows["sum"].to_numpy(dtype=np.float64)),
                "bias_cov": srows["max"].to_numpy(dtype=np.float64),
                "obs_var": srows["value_sd"].to_numpy(dtype=np.float64),
                "spin_seen": srows["count"].to_numpy().astype(np.int32),
                "spin_n": np.int32(0),
                "spin_s1": 0.0,
                "spin_s2": 0.0,
                "last_bucket": srows["bucket_start"]
                .astype("datetime64[us]")
                .to_numpy(),
                "epoch": np.int32(epoch),
            }
        )
        prows = tiers[met.str.startswith("_p:")]
        if len(prows):
            pparts = prows["metric"].astype(str).str.split(":", expand=True)
            spin = pd.DataFrame(
                {
                    "conv_id": prows["conv_id"].astype(str).to_numpy(),
                    "metric": pparts[1].to_numpy(),
                    "tier": pparts[2].to_numpy(),
                    "_n": prows["min"].to_numpy(dtype=np.float64),
                    "_s1": prows["max"].to_numpy(dtype=np.float64),
                    "_s2": prows["sum"].to_numpy(dtype=np.float64),
                }
            )
            base = base.merge(spin, on=["conv_id", "metric", "tier"], how="left")
            has = base["_n"].notna()
            base["spin_n"] = np.where(has, base["_n"], 0).astype(np.int32)
            base["spin_s1"] = np.where(has, base["_s1"], 0.0)
            base["spin_s2"] = np.where(has, base["_s2"], 0.0)
            base = base.drop(columns=["_n", "_s1", "_s2"])
        out_frames.append(base)

    ctx = tiers[met.str.startswith("_context")]
    if len(ctx):
        out_frames.append(
            pd.DataFrame(
                {
                    "conv_id": ctx["conv_id"].astype(str).to_numpy(),
                    "metric": ctx["metric"].astype(str).to_numpy(),
                    "tier": "raw",
                    "mean": ctx["value"].to_numpy(dtype=np.float64),
                    "sd": np.nan,
                    "bias_mean": np.nan,
                    "bias_sd": np.nan,
                    "bias_cov": np.nan,
                    "obs_var": np.nan,
                    "spin_seen": np.int32(0),
                    "spin_n": np.int32(0),
                    "spin_s1": 0.0,
                    "spin_s2": 0.0,
                    "last_bucket": ctx["bucket_start"]
                    .astype("datetime64[us]")
                    .to_numpy(),
                    "epoch": np.int32(epoch),
                }
            )
        )

    cols = [f.name for f in STATE_SCHEMA]
    if not out_frames:
        return pd.DataFrame(
            {f.name: pd.Series(dtype=f.type.to_pandas_dtype()) for f in STATE_SCHEMA}
        )[cols]
    return pd.concat(out_frames, ignore_index=True)[cols]


def derive_state_from_dirs(out_root: str, epoch: int) -> pd.DataFrame:
    """Streaming variant of :func:`derive_state`: scan one (tier,
    partition) cell directory at a time, keeping only the checkpoint rows
    ("_s:"/"_p:"/"_context*"), so the driver never holds the full epoch
    output — the reduction is bounded by series-per-partition, not rows."""
    import glob as _glob

    import pyarrow.dataset as pads

    frames = []
    cols = ["conv_id", "metric", "bucket_start", "count", "min", "max",
            "sum", "mean", "value", "value_sd"]
    for tier_dir in sorted(_glob.glob(os.path.join(out_root, "tier=*"))):
        for part_dir in sorted(_glob.glob(os.path.join(tier_dir, "partition_id=*"))):
            df = pads.dataset(part_dir).to_table(columns=cols).to_pandas()
            if not len(df):
                continue
            df["metric"] = df["metric"].astype(str)
            keep = df[df["metric"].str.startswith("_")]
            if len(keep):
                frames.append(keep)
    if not frames:
        return derive_state(pd.DataFrame({c: pd.Series(dtype=object) for c in cols}), epoch)
    return derive_state(pd.concat(frames, ignore_index=True), epoch)


def save_state(state: pd.DataFrame, root: str, epoch: int) -> str:
    os.makedirs(root, exist_ok=True)
    final = state_path(root, epoch)
    tmp = final + ".tmp"
    pq.write_table(
        pa.Table.from_pandas(state, schema=STATE_SCHEMA, preserve_index=False), tmp
    )
    os.replace(tmp, final)
    return final


def load_state(root: str, epoch: int) -> dict | None:
    """All-or-nothing load -> {(conv_id, metric, tier): (mean, var,
    last_bucket_us, bias_mean, bias_cov, bias_var, obs_var, spin_seen,
    spin_n, spin_s1, spin_s2)} or None (cold start)."""
    path = state_path(root, epoch)
    if not os.path.exists(path):
        return None
    try:
        table = pq.read_table(path)
    except Exception:
        return None
    if table.schema.names != STATE_SCHEMA.names:
        return None
    df = table.to_pandas()
    last_us = df["last_bucket"].astype("datetime64[us]").astype(np.int64)
    return {
        (c, m, t): (mu, sd * sd, lb, bm, bc, bsd * bsd, ov,
                    float(seen), float(n), s1, s2)
        for c, m, t, mu, sd, bm, bsd, bc, ov, seen, n, s1, s2, lb in zip(
            df["conv_id"], df["metric"], df["tier"], df["mean"], df["sd"],
            df["bias_mean"], df["bias_sd"], df["bias_cov"], df["obs_var"],
            df["spin_seen"], df["spin_n"], df["spin_s1"], df["spin_s2"], last_us
        )
    }
