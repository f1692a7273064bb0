"""Per-turn text-equality invariant under stable (conv_id, turn_idx) order.

North-rule requirement: ``groupby(conv_id).map_groups`` with an in-group
stable sort on ``turn_idx`` enforces that two corpora (e.g. engine input
vs reference copy, or pre/post pipeline) agree turn-by-turn on ``text``.
Ordering comes from (conv_id, turn_idx) — never ts, never pipeline order
(Ray Data does not preserve order by default; reference analog: sorted
filename globs define time order, ``jl:133,136``).
"""

from __future__ import annotations

import pandas as pd
import ray.data


def verify_text_invariant(
    left: ray.data.Dataset, right: ray.data.Dataset
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
        g = g.sort_values(["turn_idx", "side"], kind="mergesort")
        piv = g.pivot_table(
            index="turn_idx", columns="side", values="text", aggfunc="first"
        )
        conv = g["conv_id"].iloc[0]
        rows = []
        lcol = piv["L"] if "L" in piv else pd.Series(index=piv.index, dtype=object)
        rcol = piv["R"] if "R" in piv else pd.Series(index=piv.index, dtype=object)
        for idx in piv.index:
            a, b = lcol.get(idx), rcol.get(idx)
            if pd.isna(a):
                rows.append((conv, idx, "missing_left"))
            elif pd.isna(b):
                rows.append((conv, idx, "missing_right"))
            elif a != b:
                rows.append((conv, idx, "text"))
        return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "reason"])

    out = (
        lt.union(rt)
        .groupby("conv_id")
        .map_groups(check, batch_format="pandas")
        .to_pandas()
    )
    if "conv_id" not in out.columns:
        return pd.DataFrame(columns=["conv_id", "turn_idx", "reason"])
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)
