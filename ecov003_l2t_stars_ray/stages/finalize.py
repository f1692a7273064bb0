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
    close_us: int | None = None,
) -> pd.DataFrame:
    """map_groups body: one conversation's partials -> all tier rows.

    ``prior_state``: optional {(conv_id, metric, tier): (mean, var,
    last_bucket_us)} checkpoint map for incremental epochs (K4 analog);
    buckets <= last_bucket are assumed already committed and the smoother
    resumes from the stored state.

    ``close_us``: watermark close rule — only buckets that END at or before
    ``close_us`` are emitted, *per tier* (a 1m bucket can close while its
    1h/1d parents stay open; the open parents are re-derived next epoch
    from re-read fragments). Give-up analog of ``constants.py:27``.
    """
    conv_id = group["conv_id"].iloc[0]

    # resolve cross-block latencies from boundary records
    part = group[group["kind"] == KIND_PARTIAL]
    needs = group[group["kind"] == KIND_NEED]
    provides = group[group["kind"] == KIND_PROVIDE]
    # cross-EPOCH latency: the previous epoch checkpoints the conversation's
    # last processed turn as a context record; inject it as a provide row so
    # a turn deferred across the epoch boundary still finds its predecessor.
    if prior_state is not None:
        ctx = prior_state.get((conv_id, "_context", "raw"))
        if ctx is not None:
            last_idx, _unused, last_ts_us = ctx
            provides = pd.concat(
                [
                    provides,
                    pd.DataFrame(
                        {"conv_id": [conv_id], "kind": [KIND_PROVIDE],
                         "metric": [-1], "bucket_us": [0], "count": [0],
                         "vmin": [np.nan], "vmax": [np.nan], "vsum": [np.nan],
                         "turn_idx": [np.int32(int(last_idx))],
                         "ts_us": [np.int64(last_ts_us)]}
                    ),
                ],
                ignore_index=True,
            )
    extra = None
    provides = provides.drop_duplicates(subset=["turn_idx"])
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
        # cascade from the UNfiltered finer tier; the close rule is applied
        # per tier inside _densify_and_smooth (bucket_end <= close)
        rows = finer if width == US_PER_MIN else _cascade(finer, width)
        finer = rows
        for mcode, mname in METRIC_NAMES.items():
            mrows = rows[rows["metric"] == mcode]
            if not len(mrows):
                continue
            out.append(
                _densify_and_smooth(
                    conv_id, mname, tier, width, mrows, prior_state, smooth,
                    close_us,
                )
            )
    # context record: the conversation's last turn seen this epoch, emitted
    # as a bookkeeping row (metric="_context", tier="raw") so the state
    # checkpoint can carry it forward for cross-epoch latency resolution.
    boundary = pd.concat([needs, provides], ignore_index=True)
    if len(boundary):
        last = boundary.loc[boundary["turn_idx"].idxmax()]
        out.append(
            pd.DataFrame(
                {"conv_id": [conv_id], "metric": ["_context"], "tier": ["raw"],
                 "bucket_start": pd.Series([np.int64(last["ts_us"])]).to_numpy().view("datetime64[us]"),
                 "count": [np.int64(last["turn_idx"])],
                 "min": [np.nan], "max": [np.nan], "sum": [np.nan],
                 "mean": [np.nan], "value": [float(last["turn_idx"])],
                 "value_sd": [np.nan], "gap_filled": [False]}
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
    close_us: int | None = None,
) -> pd.DataFrame:
    """Dense bucket axis + Kalman gap-fill for one (conv, metric, tier)."""
    rows = rows.sort_values("bucket_us")
    if close_us is not None:
        rows = rows[rows["bucket_us"] + width_us <= close_us]
        if not len(rows):
            return pd.DataFrame(columns=TIER_OUT_COLUMNS)
    buckets = rows["bucket_us"].to_numpy()

    prior_mean = prior_var = None
    start = buckets[0]
    if prior_state is not None:
        st = prior_state.get((conv_id, metric, tier))
        if st is not None:
            prior_mean, prior_var, last_bucket = st
            # continuous axis: resume exactly one bucket after the committed
            # checkpoint so inter-epoch gap buckets are predicted forward,
            # identical to an uninterrupted run; buckets <= last_bucket were
            # already committed (or are late beyond give-up) and are dropped.
            start = last_bucket + width_us
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
