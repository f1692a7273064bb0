"""Per-turn text-equality invariant under stable (conv_id, turn_idx) order.

North-rule requirement: two transcript corpora (e.g. engine input vs
reference copy, or pre/post pipeline) must agree turn-by-turn on ``text``.
Ordering comes from (conv_id, turn_idx) — never ts, never pipeline order
(Ray Data does not preserve order by default; reference analog: sorted
filename globs define time order, ``jl:133,136``).

Distribution shape: one conv-hash-partitioned shuffle (the repo-wide
``hash_combine`` pattern), then ONE vectorized outer merge per partition —
never a per-conversation group or a per-turn Python loop (map_groups
granularity invariant; per-tiny-key overhead dominated twice before).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.shuffle import hash_combine


def verify_text_invariant(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Compare two transcript datasets turn-by-turn.

    Returns a DataFrame of mismatches: (conv_id, turn_idx, reason) where
    reason in {"text", "missing_left", "missing_right"}. Empty == invariant
    holds. One conv-keyed shuffle; text stays partition-local.
    """
    lt = left.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        lambda df: df.assign(side="L"), batch_format="pandas"
    )
    rt = right.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        lambda df: df.assign(side="R"), batch_format="pandas"
    )

    def check(g: pd.DataFrame) -> pd.DataFrame:
        key = ["conv_id", "turn_idx"]
        # stable first-occurrence per (conv, turn) per side, mirroring the
        # previous pivot aggfunc="first" under (turn_idx, side) sort
        g = g.sort_values(["conv_id", "turn_idx", "side"], kind="mergesort")
        l = g[g["side"] == "L"].drop_duplicates(key)[key + ["text"]]
        r = g[g["side"] == "R"].drop_duplicates(key)[key + ["text"]]
        m = l.merge(r, on=key, how="outer", suffixes=("_l", "_r"))
        ln = m["text_l"].isna().to_numpy()
        rn = m["text_r"].isna().to_numpy()
        neq = m["text_l"].to_numpy() != m["text_r"].to_numpy()
        reason = np.where(
            ln, "missing_left", np.where(rn, "missing_right", np.where(neq, "text", ""))
        )
        bad = reason != ""
        out = m.loc[bad, key].copy()
        out["reason"] = reason[bad]
        return out

    out = hash_combine(lt.union(rt), ["conv_id"], check,
                       num_partitions=num_partitions).to_pandas()
    if "conv_id" not in out.columns:
        return pd.DataFrame(columns=["conv_id", "turn_idx", "reason"])
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)
