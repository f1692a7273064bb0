"""Retention policy: expire fine-tier data past its horizon.

The third leg of the north rule (rollup + downsample + RETENTION): each
tier keeps data for a bounded horizon behind the global watermark — raw
briefly, 1m longer, 1d forever — mirroring how the reference keeps only
the spin-up window of fine inputs and discards staged intermediates after
the product commits (``L2T_STARS.py:468-507`` cleanup flags,
``constants.py:27-28`` windows).

Enforcement is file-level and manifest-driven: a (partition, tier, epoch)
cell expires when its recorded watermark is older than
``watermark_now - horizon[tier]``; expired cell directories are deleted
and the deletion is recorded as a tombstone cell (epoch retained in the
manifest so lineage stays complete — data is gone, history is not).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd

from ..schema import US_PER_DAY, US_PER_HOUR

#: Default horizons (microseconds behind the current watermark); None =
#: keep forever. The raw->1m->1h->1d ladder retains coarser tiers longer.
DEFAULT_RETENTION: dict[str, int | None] = {
    "raw": 7 * US_PER_DAY,
    "1m": 30 * US_PER_DAY,
    "1h": 180 * US_PER_DAY,
    "1d": None,
}


def apply_retention(
    root: str,
    watermark_us: int,
    policy: dict[str, int | None] | None = None,
) -> pd.DataFrame:
    """Delete expired (epoch, tier) output dirs under ``root/tiers``.

    Returns a DataFrame of tombstones (epoch, tier, path, cell_watermark).
    An epoch's cells expire when the epoch watermark (from its meta JSON)
    is older than ``watermark_us - horizon[tier]``.
    """
    policy = {**DEFAULT_RETENTION, **(policy or {})}
    tombstones = []
    for meta_path in sorted(glob.glob(os.path.join(root, "manifest", "epoch-e*.json"))):
        with open(meta_path) as f:
            meta = json.load(f)
        epoch = meta["epoch"]
        cell_wm = meta.get("watermark_us", 0)
        for tier, horizon in policy.items():
            if horizon is None:
                continue
            if cell_wm >= watermark_us - horizon:
                continue
            tier_dir = os.path.join(
                root, "tiers", f"epoch={epoch:05d}", f"tier={tier}"
            )
            if os.path.isdir(tier_dir):
                shutil.rmtree(tier_dir)
                tombstones.append(
                    {"epoch": epoch, "tier": tier, "path": tier_dir,
                     "cell_watermark_us": cell_wm}
                )
    new = pd.DataFrame(
        tombstones, columns=["epoch", "tier", "path", "cell_watermark_us"]
    )
    if len(new):
        tomb_path = os.path.join(root, "manifest", "tombstones.parquet")
        full = new
        if os.path.exists(tomb_path):
            full = pd.concat([pd.read_parquet(tomb_path), new], ignore_index=True)
        tmp = tomb_path + ".tmp"
        full.to_parquet(tmp)
        os.replace(tmp, tomb_path)
    return new


def load_tombstones(root: str) -> pd.DataFrame:
    path = os.path.join(root, "manifest", "tombstones.parquet")
    if not os.path.exists(path):
        return pd.DataFrame(columns=["epoch", "tier", "path", "cell_watermark_us"])
    return pd.read_parquet(path)
