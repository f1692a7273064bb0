"""Per-conversation finalize: merge partials, cascade tiers, gap-fill.

Runs inside ``groupby("conv_id").map_groups`` — the engine's single
conv-keyed shuffle. The group payload is bucket-level partials (already
combined map-side by ``functions.rollup.partial_rollup``), NOT raw turns,
so group size is bounded by active buckets per conversation even for hot
conversations.

Reference analogs: the tile-local fusion step
(``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``), the
resolution ladder cascade (``constants.py:29-31`` — here 1m -> 1h -> 1d
re-aggregation, exact because sum/count/min/max compose), the 7-day
no-observation flag (``jl:263-288`` -> ``gap_filled``), and the prior
state chain (``load_prior.py:48-165`` -> ``prior_state`` lookup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.kalman import kalman_gap_fill
from ..functions.rollup import (
    KIND_NEED,
    KIND_PARTIAL,
    KIND_PROVIDE,
    METRIC_LATENCY,
    METRIC_NAMES,
    METRIC_TURN_RATE,
)
from ..schema import TIERS, US_PER_MIN

#: Which per-bucket aggregate each metric's smoother consumes:
#: latency smooths the bucket mean gap; turn_rate smooths the bucket turn
#: count (sum of 1.0-valued per-turn observations).
SMOOTH_ON = {"turn_rate": "sum", "latency": "mean"}

TIER_OUT_COLUMNS = [
    "conv_id", "metric", "tier", "bucket_start", "count",
    "min", "max", "sum", "mean", "value", "value_sd", "gap_filled",
]


def _merge_partials(part: pd.DataFrame) -> pd.DataFrame:
    """Combine per-batch partials into final per-(metric, 1m-bucket) rows."""
    g = part.groupby(["metric", "bucket_us"], sort=True).agg(
        count=("count", "sum"),
        vmin=("vmin", "min"),
        vmax=("vmax", "max"),
        vsum=("vsum", "sum"),
    )
    return g.reset_index()


def _cascade(rows: pd.DataFrame, width_us: int) -> pd.DataFrame:
    """Re-aggregate finer-tier rows to a coarser bucket width (exact)."""
    rows = rows.copy()
    rows["bucket_us"] = rows["bucket_us"] // width_us * width_us
    return _merge_partials(rows)


def finalize_conversation(
    group: pd.DataFrame,
    prior_state: dict | None = None,
    smooth: bool = True,
) -> pd.DataFrame:
    """map_groups body: one conversation's partials -> all tier rows.

    ``prior_state``: optional {(conv_id, metric, tier): (mean, var,
    last_bucket_us)} checkpoint map for incremental epochs (K4 analog);
    buckets <= last_bucket are assumed already committed and the smoother
    resumes from the stored state.
    """
    conv_id = group["conv_id"].iloc[0]

    # resolve cross-block latencies from boundary records
    part = group[group["kind"] == KIND_PARTIAL]
    needs = group[group["kind"] == KIND_NEED]
    provides = group[group["kind"] == KIND_PROVIDE]
    extra = None
    if len(needs):
        m = needs.merge(
            provides,
            left_on=needs["turn_idx"] - 1,
            right_on="turn_idx",
            suffixes=("", "_prev"),
        )
        if len(m):
            gap = (m["ts_us"] - m["ts_us_prev"]).to_numpy() / 1e6
            bucket = m["ts_us"].to_numpy() // US_PER_MIN * US_PER_MIN
            extra = pd.DataFrame(
                {
                    "metric": np.int8(METRIC_LATENCY),
                    "bucket_us": bucket,
                    "count": np.int64(1),
                    "vmin": gap,
                    "vmax": gap,
                    "vsum": gap,
                }
            )

    cols = ["metric", "bucket_us", "count", "vmin", "vmax", "vsum"]
    partials = part[cols]
    if extra is not None:
        partials = pd.concat([partials, extra[cols]], ignore_index=True)
    if not len(partials):
        return pd.DataFrame(columns=TIER_OUT_COLUMNS)

    tier_1m = _merge_partials(partials)

    out = []
    finer = tier_1m
    for tier, width in TIERS.items():
        rows = finer if width == US_PER_MIN else _cascade(finer, width)
        finer = rows
        for mcode, mname in METRIC_NAMES.items():
            mrows = rows[rows["metric"] == mcode]
            if not len(mrows):
                continue
            out.append(
                _densify_and_smooth(
                    conv_id, mname, tier, width, mrows, prior_state, smooth
                )
            )
    if not out:
        return pd.DataFrame(columns=TIER_OUT_COLUMNS)
    return pd.concat(out, ignore_index=True)[TIER_OUT_COLUMNS]


def _densify_and_smooth(
    conv_id: str,
    metric: str,
    tier: str,
    width_us: int,
    rows: pd.DataFrame,
    prior_state: dict | None,
    smooth: bool,
) -> pd.DataFrame:
    """Dense bucket axis + Kalman gap-fill for one (conv, metric, tier)."""
    rows = rows.sort_values("bucket_us")
    buckets = rows["bucket_us"].to_numpy()

    prior_mean = prior_var = None
    start = buckets[0]
    if prior_state is not None:
        st = prior_state.get((conv_id, metric, tier))
        if st is not None:
            prior_mean, prior_var, last_bucket = st
            start = max(start, last_bucket + width_us)
            keep = buckets >= start
            rows, buckets = rows[keep], buckets[keep]
            if not len(rows):
                return pd.DataFrame(columns=TIER_OUT_COLUMNS)

    axis = np.arange(start, buckets[-1] + width_us, width_us, dtype=np.int64)
    pos = np.searchsorted(axis, buckets)
    n = len(axis)

    count = np.zeros(n, dtype=np.int64)
    vmin = np.full(n, np.nan)
    vmax = np.full(n, np.nan)
    vsum = np.full(n, np.nan)
    count[pos] = rows["count"].to_numpy()
    vmin[pos] = rows["vmin"].to_numpy()
    vmax[pos] = rows["vmax"].to_numpy()
    vsum[pos] = rows["vsum"].to_numpy()
    mean = np.full(n, np.nan)
    observed = count > 0
    mean[observed] = vsum[observed] / count[observed]

    if smooth:
        y = vsum if SMOOTH_ON[metric] == "sum" else mean
        value, value_sd, _, _ = kalman_gap_fill(
            np.where(observed, y, 0.0), observed, prior_mean, prior_var
        )
    else:
        value = np.where(observed, vsum if SMOOTH_ON[metric] == "sum" else mean, np.nan)
        value_sd = np.full(n, np.nan)

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "metric": metric,
            "tier": tier,
            "bucket_start": axis.view("datetime64[us]"),
            "count": count,
            "min": vmin,
            "max": vmax,
            "sum": vsum,
            "mean": mean,
            "value": value,
            "value_sd": value_sd,
            "gap_filled": ~observed,
        }
    )
