"""Smoother state checkpoint chain (the K4 prior/posterior analog).

The reference carries 8 prior rasters from run N to run N+1 with
all-or-nothing validation (``load_prior.py:14-250``; gate ``:170-229``):
a partial prior means *run stateless*, never half-stateful. Here the state
is a compact Parquet table per epoch keyed by (conv_id, metric, tier)
(STATE_SCHEMA, FIXTURES.md F3 + tier), written atomically, and loading
validates the same all-or-nothing way: a missing/partial epoch dir yields
``None`` and the pipeline cold-starts (reference ``jl:42-47`` defaults).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import COLD_START, STATE_SCHEMA


def state_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"state-e{epoch:05d}.parquet")


def derive_state(tiers: pd.DataFrame, epoch: int) -> pd.DataFrame:
    """Posterior state from tier output: last bucket's (value, sd) per
    (conv, metric, tier) series — the posterior-becomes-prior chain
    (``process_STARS_product.py:173-216``)."""
    tiers = tiers[tiers["metric"].astype(str) != "_late_turns"]
    last = (
        tiers.sort_values("bucket_start")
        .groupby(["conv_id", "metric", "tier"], sort=True, observed=True)
        .tail(1)
    )
    return pd.DataFrame(
        {
            "conv_id": last["conv_id"].to_numpy(),
            "metric": last["metric"].to_numpy(),
            "tier": last["tier"].to_numpy(),
            "mean": last["value"].to_numpy(dtype=np.float64),
            "sd": last["value_sd"].to_numpy(dtype=np.float64),
            "bias_mean": COLD_START["bias_mean"],
            "bias_sd": COLD_START["bias_sd"],
            "last_bucket": last["bucket_start"].astype("datetime64[us]").to_numpy(),
            "epoch": np.int32(epoch),
        }
    )


def derive_state_from_dirs(out_root: str, epoch: int) -> pd.DataFrame:
    """Streaming variant of :func:`derive_state`: reduce one (tier,
    partition) cell directory at a time (only the five state columns are
    read), so the driver never holds the full epoch output — the per-cell
    reduction is bounded by series-per-partition, not rows."""
    import glob as _glob

    import pyarrow.dataset as pads

    frames = []
    for tier_dir in sorted(_glob.glob(os.path.join(out_root, "tier=*"))):
        tier = tier_dir.rsplit("=", 1)[1]
        for part_dir in sorted(_glob.glob(os.path.join(tier_dir, "partition_id=*"))):
            t = pads.dataset(part_dir).to_table(
                columns=["conv_id", "metric", "bucket_start", "value", "value_sd"]
            )
            df = t.to_pandas()
            if not len(df):
                continue
            df["tier"] = tier
            for c in ("conv_id", "metric"):
                df[c] = df[c].astype(str)
            last = df.loc[
                df.groupby(["conv_id", "metric"], observed=True)["bucket_start"].idxmax()
            ]
            frames.append(last)
    if not frames:
        return derive_state(
            pd.DataFrame(
                columns=["conv_id", "metric", "tier", "bucket_start", "value", "value_sd"]
            ),
            epoch,
        )
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
    last_bucket_us)} or None (cold start)."""
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
        (c, m, t): (mu, sd * sd, lb)
        for c, m, t, mu, sd, lb in zip(
            df["conv_id"], df["metric"], df["tier"], df["mean"], df["sd"], last_us
        )
    }
