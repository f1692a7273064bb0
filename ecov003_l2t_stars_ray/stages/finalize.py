"""Partition-level finalize: merge partials, cascade tiers, gap-fill.

Runs inside ``groupby(part_id).map_groups`` — the engine's single shuffle.
Each call receives ALL partial rows for one conv_id hash partition and
processes EVERY conversation in it vectorized (pandas/numpy across
conversations; the only per-row Python is the strictly-sequential Kalman
recurrence). This is deliberately NOT one call per conversation: at
10^12-turn scale per-group Python call overhead dominates, so the group
unit is the hash partition and conversations are columns-level vector work
inside it.

Reference analogs: the tile-local fusion step
(``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``), the
resolution ladder cascade (``constants.py:29-31`` — 1m -> 1h -> 1d exact
re-aggregation), the 7-day no-observation flag (``jl:263-288`` ->
``gap_filled``), and the prior state chain (``load_prior.py:48-165``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rollup import (
    KIND_NEED,
    KIND_PARTIAL,
    KIND_PROVIDE,
    KIND_RAW,
    METRIC_LATENCY,
    METRIC_NAMES,
)
from ..schema import COLD_START, OBS_NOISE_VAR, PROCESS_NOISE_VAR, TIERS, US_PER_MIN

#: Which per-bucket aggregate each metric's smoother consumes:
#: latency smooths the bucket mean gap; turn_rate smooths the bucket turn
#: count (sum of 1.0-valued per-turn observations).
SMOOTH_ON = {"turn_rate": "sum", "latency": "mean"}

TIER_OUT_COLUMNS = [
    "conv_id", "metric", "tier", "bucket_start", "count",
    "min", "max", "sum", "mean", "value", "value_sd", "gap_filled",
]

import pyarrow as pa  # noqa: E402

TIER_ARROW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.dictionary(pa.int32(), pa.string())),
        ("metric", pa.dictionary(pa.int32(), pa.string())),
        ("tier", pa.dictionary(pa.int8(), pa.string())),
        ("bucket_start", pa.timestamp("us")),
        ("count", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("sum", pa.float64()),
        ("mean", pa.float64()),
        ("value", pa.float64()),
        ("value_sd", pa.float64()),
        ("gap_filled", pa.bool_()),
    ]
)

_EMPTY = TIER_ARROW_SCHEMA.empty_table()


def _resolve_latency_boundaries(
    needs: pd.DataFrame, provides: pd.DataFrame
) -> tuple[pd.DataFrame | None, pd.DataFrame | None]:
    """Cross-block gap resolution, vectorized across conversations.

    Returns ``(extra_partials, matched)`` — ``matched`` carries, per
    resolved need, the predecessor's (conv_id, turn_idx_prev, ts_us_prev)
    so the caller can keep it in the next epoch's context when the need's
    bucket is still open (the predecessor's fragment may be closed and
    never re-read)."""
    if not len(needs):
        return None, None
    provides = provides.drop_duplicates(subset=["conv_id", "turn_idx"])
    m = needs.merge(
        provides,
        left_on=["conv_id", needs["turn_idx"] - 1],
        right_on=["conv_id", "turn_idx"],
        suffixes=("", "_prev"),
    )
    if not len(m):
        return None, None
    gap = (m["ts_us"] - m["ts_us_prev"]).to_numpy() / 1e6
    bucket = m["ts_us"].to_numpy() // US_PER_MIN * US_PER_MIN
    extra = pd.DataFrame(
        {
            "conv_id": m["conv_id"].to_numpy(),
            "metric": np.int8(METRIC_LATENCY),
            "bucket_us": bucket,
            "count": np.int64(1),
            "vmin": gap,
            "vmax": gap,
            "vsum": gap,
            "ts_us": m["ts_us"].to_numpy(),
        }
    )
    return extra, m


def _merge_partials(part: pd.DataFrame) -> pd.DataFrame:
    g = part.groupby(["conv_id", "metric", "bucket_us"], sort=True).agg(
        count=("count", "sum"),
        vmin=("vmin", "min"),
        vmax=("vmax", "max"),
        vsum=("vsum", "sum"),
    )
    return g.reset_index()


def _cascade(rows: pd.DataFrame, width_us: int) -> pd.DataFrame:
    rows = rows.copy()
    rows["bucket_us"] = rows["bucket_us"] // width_us * width_us
    return _merge_partials(rows)


def _kalman_batch(
    y: np.ndarray,
    observed: np.ndarray,
    series_start: np.ndarray,
    prior_mean: np.ndarray,
    prior_var: np.ndarray,
    prior_bias: np.ndarray | None = None,
    prior_bias_cov: np.ndarray | None = None,
    prior_bias_var: np.ndarray | None = None,
    prior_obs_var: np.ndarray | None = None,
    prior_spin: tuple | None = None,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Bias-aware Kalman over concatenated series — EVENT-BASED.

    Semantically identical (within float64 associativity) to the stepwise
    recurrence in ``functions.kalman.kalman_gap_fill``: between observed
    buckets the filter state is affine in the gap length (m, b, P01
    constant; P00 += d*Q; P11 += d*Qb), so the sequential Python loop
    touches ONLY observed buckets (plus one virtual prior event per
    series) and every gap bucket's (value, sd) is filled vectorized from
    the preceding event's state. On minute tiers ~85% of dense buckets are
    gaps — this is the hot-path optimization that keeps the smoother off
    the wall-clock critical path.

    ``prior_*`` are per-SERIES arrays (first-appearance order); None means
    cold start. ``prior_spin`` is a (seen, n, s1, s2) tuple of per-series
    arrays; None pins R to the default (spin pre-done). Returns
    ``(value, sd, finals)`` with finals = per-series end-state arrays
    (STATE_FIELDS), adjusted for trailing gap buckets.
    """
    import math

    from ..schema import BIAS_PROCESS_NOISE_VAR, MIN_SUPPORT, SPINUP_BUCKETS

    n = len(y)
    series_start = np.asarray(series_start, dtype=bool)
    observed = np.asarray(observed, dtype=bool)
    ns = int(series_start.sum())
    q = PROCESS_NOISE_VAR
    qb = BIAS_PROCESS_NOISE_VAR
    r_def = OBS_NOISE_VAR
    SP = SPINUP_BUCKETS
    zeros = np.zeros(ns)
    pm = np.asarray(prior_mean, dtype=np.float64)
    pv = np.asarray(prior_var, dtype=np.float64)
    pb = zeros if prior_bias is None else np.asarray(prior_bias, dtype=np.float64)
    pbc = zeros if prior_bias_cov is None else np.asarray(prior_bias_cov, dtype=np.float64)
    pbv = (
        np.full(ns, COLD_START["bias_sd"] ** 2)
        if prior_bias_var is None
        else np.asarray(prior_bias_var, dtype=np.float64)
    )
    pr = np.full(ns, r_def) if prior_obs_var is None else np.asarray(prior_obs_var, dtype=np.float64)
    if prior_spin is None:
        p_seen = np.full(ns, SP, dtype=np.float64)  # spin pre-done
        p_n, p_s1, p_s2 = zeros, zeros, zeros
    else:
        p_seen, p_n, p_s1, p_s2 = (np.asarray(a, dtype=np.float64) for a in prior_spin)

    row = np.arange(n, dtype=np.int64)
    sidx = np.cumsum(series_start) - 1           # row -> series index
    start_rows = row[series_start]               # per-series first row
    end_rows = np.empty(ns, dtype=np.int64)      # per-series last row
    end_rows[:-1] = start_rows[1:] - 1
    end_rows[-1] = n - 1
    obs_rows = row[observed]
    n_obs = len(obs_rows)
    n_ev = ns + n_obs

    # events sorted by row position; the virtual prior event of series s
    # sits at start_s - 1 and must sort AFTER an observed last row of
    # series s-1 at the same position: key = 2*pos (observed) / 2*pos+1
    # (virtual)
    ev_pos = np.concatenate([start_rows - 1, obs_rows])
    ev_key = np.concatenate([2 * (start_rows - 1) + 1, 2 * obs_rows])
    order = np.argsort(ev_key, kind="stable")
    ev_pos = ev_pos[order]
    ev_key = ev_key[order]
    is_virtual = order < ns
    ev_series = np.where(is_virtual, order, sidx[np.maximum(ev_pos, 0)])
    # (for observed events ev_pos >= 0 always; the maximum() only guards
    # the virtual rows already resolved by the where())

    # ---- sequential pass over events only
    evl = ev_pos.tolist()
    virt = is_virtual.tolist()
    ser = ev_series.tolist()
    yl = y.tolist()
    pml = pm.tolist(); pvl = pv.tolist(); pbl = pb.tolist()
    pbcl = pbc.tolist(); pbvl = pbv.tolist(); prl = pr.tolist()
    psel = p_seen.tolist(); pnl = p_n.tolist()
    ps1l = p_s1.tolist(); ps2l = p_s2.tolist()
    e_m = [0.0] * n_ev
    e_b = [0.0] * n_ev
    e_svar = [0.0] * n_ev
    f_m = [0.0] * ns; f_b = [0.0] * ns
    f_p00 = [0.0] * ns; f_p01 = [0.0] * ns; f_p11 = [0.0] * ns
    f_r = [0.0] * ns; f_seen = [0.0] * ns; f_n = [0.0] * ns
    f_s1 = [0.0] * ns; f_s2 = [0.0] * ns
    endl = end_rows.tolist()
    m = b = p00 = p01 = p11 = r = 0.0
    seen = cn = 0
    s1 = s2 = 0.0
    done = True
    si = -1
    pos_prev = -1

    def _close(idx):
        # fold trailing gap buckets into the checkpoint state
        nonlocal seen, r, done
        trail = endl[idx] - pos_prev
        if not done:
            seen += trail
            if seen >= SP:
                seen = SP
                if cn >= MIN_SUPPORT:
                    var = (s2 - s1 * s1 / cn) / (cn - 1.0)
                    r = var if var > r_def else r_def
                else:
                    r = r_def
                done = True
        f_m[idx] = m; f_b[idx] = b
        f_p00[idx] = p00 + trail * q
        f_p01[idx] = p01
        f_p11[idx] = p11 + trail * qb
        f_r[idx] = r; f_seen[idx] = seen; f_n[idx] = cn
        f_s1[idx] = s1; f_s2[idx] = s2

    for e in range(n_ev):
        if virt[e]:
            if si >= 0:
                _close(si)
            si = ser[e]
            m = pml[si]; b = pbl[si]
            p00 = pvl[si]; p01 = pbcl[si]; p11 = pbvl[si]
            r = prl[si]
            seen = int(psel[si]); cn = int(pnl[si])
            s1 = ps1l[si]; s2 = ps2l[si]
            done = seen >= SP
            pos_prev = evl[e]
            e_m[e] = m; e_b[e] = b
            e_svar[e] = (p00 + p01) + (p01 + p11)
            continue
        d = evl[e] - pos_prev
        pos_prev = evl[e]
        if not done:
            seen += d - 1
            if seen >= SP:
                seen = SP
                if cn >= MIN_SUPPORT:
                    var = (s2 - s1 * s1 / cn) / (cn - 1.0)
                    r = var if var > r_def else r_def
                else:
                    r = r_def
                done = True
        p00 = p00 + d * q
        p11 = p11 + d * qb
        yv = yl[evl[e]]
        if not done:
            cn += 1
            s1 += yv
            s2 += yv * yv
        k0num = p00 + p01
        k1num = p01 + p11
        sden = k0num + k1num + r
        k0 = k0num / sden
        k1 = k1num / sden
        nu = yv - (m + b)
        m = m + k0 * nu
        b = b + k1 * nu
        p00n = (1.0 - k0) * p00 - k0 * p01
        p01n = (1.0 - k0) * p01 - k0 * p11
        p11n = (1.0 - k1) * p11 - k1 * p01
        p00, p01, p11 = p00n, p01n, p11n
        if not done:
            seen += 1
            if seen >= SP:
                if cn >= MIN_SUPPORT:
                    var = (s2 - s1 * s1 / cn) / (cn - 1.0)
                    r = var if var > r_def else r_def
                else:
                    r = r_def
                done = True
        e_m[e] = m; e_b[e] = b
        e_svar[e] = (p00 + p01) + (p01 + p11)
    if si >= 0:
        _close(si)

    # ---- vectorized fill of every dense row from its governing event
    em = np.asarray(e_m)
    eb = np.asarray(e_b)
    esvar = np.asarray(e_svar)
    k = np.searchsorted(ev_key, 2 * row, side="right") - 1
    value = em[k] + eb[k]
    t = (row - ev_pos[k]).astype(np.float64)
    sd = np.sqrt(esvar[k] + t * (q + qb))

    finals = {
        "m": np.asarray(f_m), "b": np.asarray(f_b), "p00": np.asarray(f_p00),
        "p01": np.asarray(f_p01), "p11": np.asarray(f_p11),
        "r": np.asarray(f_r), "seen": np.asarray(f_seen),
        "n": np.asarray(f_n), "s1": np.asarray(f_s1), "s2": np.asarray(f_s2),
    }
    return value, sd, finals


def _raw_tier_table(rawall: pd.DataFrame) -> pa.Table:
    """Per-observation raw tier rows (count=1, value=observation)."""
    n = len(rawall)
    conv_codes, conv_uniques = pd.factorize(rawall["conv_id"].astype(str), sort=False)
    v = rawall["vsum"].to_numpy(dtype=np.float64)
    return pa.table(
        {
            "conv_id": pa.DictionaryArray.from_arrays(
                pa.array(conv_codes.astype(np.int32)), pa.array(conv_uniques, pa.string())
            ),
            "metric": pa.DictionaryArray.from_arrays(
                pa.array(rawall["metric"].to_numpy().astype(np.int32)),
                pa.array([METRIC_NAMES[0], METRIC_NAMES[1]], pa.string()),
            ),
            "tier": pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, dtype=np.int8)), pa.array(["raw"], pa.string())
            ),
            "bucket_start": pa.array(rawall["ts_us"].to_numpy(), pa.timestamp("us")),
            "count": pa.array(np.ones(n, dtype=np.int64)),
            "min": pa.array(v), "max": pa.array(v), "sum": pa.array(v),
            "mean": pa.array(v), "value": pa.array(v),
            "value_sd": pa.array(np.full(n, np.nan)),
            "gap_filled": pa.array(np.zeros(n, dtype=bool)),
        },
        schema=TIER_ARROW_SCHEMA,
    )


def finalize_batch(
    df: pd.DataFrame,
    state_df: pd.DataFrame | None = None,
    context_df: pd.DataFrame | None = None,
    smooth: bool = True,
    close_us: int | None = None,
    include_raw: bool = False,
    adaptive_noise: bool = True,
) -> pd.DataFrame:
    """One hash partition's partial rows -> all tier rows for all convs.

    ``state_df``: prior checkpoint (conv_id, metric, tier, mean, var,
    last_bucket_us) — K4 analog; committed buckets are dropped, the axis
    resumes at last_bucket + width with the stored state.
    ``context_df``: (conv_id, turn_idx, ts_us) last-turn records for
    cross-epoch latency resolution.
    ``close_us``: watermark close rule — only buckets ENDING at or before
    it are emitted, per tier (give-up analog of ``constants.py:27``).
    """
    part = df[df["kind"] == KIND_PARTIAL]
    needs = df[df["kind"] == KIND_NEED]
    provides = df[df["kind"] == KIND_PROVIDE]
    if context_df is not None and len(context_df):
        provides = pd.concat(
            [
                provides[["conv_id", "turn_idx", "ts_us"]],
                context_df[["conv_id", "turn_idx", "ts_us"]],
            ],
            ignore_index=True,
        )

    extra, matched = _resolve_latency_boundaries(needs, provides)
    cols = ["conv_id", "metric", "bucket_us", "count", "vmin", "vmax", "vsum"]
    # explode the merged per-(conv, bucket) partial rows back into
    # per-metric rows (partition-local, vectorized): turn_rate from
    # tr_count, latency where lat_count > 0
    frames = []
    if len(part):
        from ..functions.rollup import METRIC_TURN_RATE as _MT

        trc = part["tr_count"].to_numpy()
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": part["conv_id"].to_numpy(),
                    "metric": np.int8(_MT),
                    "bucket_us": part["bucket_us"].to_numpy(),
                    "count": trc,
                    "vmin": 1.0,
                    "vmax": 1.0,
                    "vsum": trc.astype(np.float64),
                }
            )
        )
        latm = part["lat_count"].to_numpy() > 0
        if latm.any():
            lp = part[latm]
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": lp["conv_id"].to_numpy(),
                        "metric": np.int8(METRIC_LATENCY),
                        "bucket_us": lp["bucket_us"].to_numpy(),
                        "count": lp["lat_count"].to_numpy(),
                        "vmin": lp["vmin"].to_numpy(),
                        "vmax": lp["vmax"].to_numpy(),
                        "vsum": lp["vsum"].to_numpy(),
                    }
                )
            )
    if extra is not None:
        frames.append(extra[cols])
    partials = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=cols)
    )

    out: list[pa.Table] = []
    if include_raw:
        raw = df[df["kind"] == KIND_RAW].rename(columns={"tr_count": "count"})
        frames = [raw[["conv_id", "metric", "bucket_us", "count", "vmin", "vmax", "vsum", "ts_us"]]]
        if extra is not None:  # boundary-resolved gaps are raw obs too
            e = extra.copy()
            e["bucket_us"] = e["ts_us"]
            frames.append(e[frames[0].columns])
        rawall = pd.concat(frames, ignore_index=True)
        if len(rawall):
            out.append(_raw_tier_table(rawall))

    if len(partials):
        finer = _merge_partials(partials)
        for tier, width in TIERS.items():
            rows = finer if width == US_PER_MIN else _cascade(finer, width)
            finer = rows
            out.append(
                _densify_and_smooth_tier(
                    rows, tier, width, state_df, smooth, close_us,
                    adaptive_noise=adaptive_noise,
                )
            )

    # (late-arrival metrics are computed provenance-aware in
    # pipelines.epochs.run_epoch over NEW fragments only — a state-based
    # check here cannot distinguish genuinely late rows from
    # pending-fragment re-reads)

    # context records for the next epoch's checkpoint: the last turn per
    # conv PLUS the predecessor of every still-deferred need (its gap must
    # stay resolvable next epoch even when the predecessor's own fragment
    # is closed and never re-read — the cross-fragment/day-boundary case).
    # Carried predecessors get per-turn state keys ("_context@{turn_idx}")
    # so derive_state's tail(1)-per-key keeps all of them.
    frames = [
        f[["conv_id", "turn_idx", "ts_us"]]
        for f in (needs, provides)
        if len(f)  # skip empties: all-NA concat is deprecated and noisy
    ]
    boundary = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=["conv_id", "turn_idx", "ts_us"])
    )
    ctx_frames = []
    if len(boundary):
        last = boundary.loc[boundary.groupby("conv_id")["turn_idx"].idxmax()].copy()
        last["_label"] = "_context"
        ctx_frames.append(last[["conv_id", "turn_idx", "ts_us", "_label"]])
    if matched is not None and close_us is not None:
        coarsest = max(TIERS.values())
        still_open = (
            matched["ts_us"].to_numpy() // coarsest * coarsest + coarsest
        ) > close_us
        if still_open.any():
            mm = matched.loc[
                still_open, ["conv_id", "turn_idx_prev", "ts_us_prev"]
            ].rename(columns={"turn_idx_prev": "turn_idx", "ts_us_prev": "ts_us"})
            mm = mm.drop_duplicates(["conv_id", "turn_idx"]).copy()
            mm["_label"] = "_context@" + mm["turn_idx"].astype(str)
            ctx_frames.append(mm[["conv_id", "turn_idx", "ts_us", "_label"]])
    if ctx_frames:
        ctx = pd.concat(ctx_frames, ignore_index=True).drop_duplicates(
            ["conv_id", "turn_idx"], keep="first"
        )
        n = len(ctx)
        nanv = np.full(n, np.nan)
        lab_codes, lab_uniques = pd.factorize(ctx["_label"], sort=False)
        out.append(
            pa.table(
                {
                    "conv_id": pa.array(ctx["conv_id"]).dictionary_encode().cast(
                        TIER_ARROW_SCHEMA.field("conv_id").type
                    ),
                    "metric": pa.DictionaryArray.from_arrays(
                        pa.array(lab_codes.astype(np.int32)),
                        pa.array(lab_uniques, pa.string()),
                    ),
                    "tier": pa.DictionaryArray.from_arrays(
                        pa.array(np.zeros(n, dtype=np.int8)),
                        pa.array(["raw"], pa.string()),
                    ),
                    "bucket_start": pa.array(
                        ctx["ts_us"].to_numpy(), pa.timestamp("us")
                    ),
                    "count": pa.array(ctx["turn_idx"].to_numpy().astype(np.int64)),
                    "min": pa.array(nanv), "max": pa.array(nanv),
                    "sum": pa.array(nanv), "mean": pa.array(nanv),
                    "value": pa.array(ctx["turn_idx"].to_numpy().astype(np.float64)),
                    "value_sd": pa.array(nanv),
                    "gap_filled": pa.array(np.zeros(n, dtype=bool)),
                },
                schema=TIER_ARROW_SCHEMA,
            )
        )

    out = [o for o in out if len(o)]
    if not out:
        return _EMPTY
    return pa.concat_tables(out)


def _densify_and_smooth_tier(
    rows: pd.DataFrame,
    tier: str,
    width_us: int,
    state_df: pd.DataFrame | None,
    smooth: bool,
    close_us: int | None,
    adaptive_noise: bool = True,
) -> pd.DataFrame:
    """Dense axes + gap-fill for ALL (conv, metric) series of one tier.

    Appends one "_s:{metric}:{tier}" checkpoint row per series (full
    filter state: level/bias means, P00/P01/P11, R) and, while a series is
    still inside its spin-up window, one "_p:{metric}:{tier}" row with the
    adaptive-noise accumulators — these are the state the next epoch
    resumes from (K4 analog), replacing last-value reconstruction."""
    from ..schema import SPINUP_BUCKETS

    if close_us is not None:
        rows = rows[rows["bucket_us"] + width_us <= close_us]
    if not len(rows):
        return _EMPTY

    # per-series bounds (rows arrive sorted by conv, metric, bucket)
    bounds = rows.groupby(["conv_id", "metric"], sort=True).agg(
        first=("bucket_us", "min"), last=("bucket_us", "max")
    ).reset_index()

    cold_spin_seen = 0.0 if adaptive_noise else float(SPINUP_BUCKETS)
    # prior state: resume at last committed bucket + width
    if state_df is not None and len(state_df):
        st = state_df[state_df["tier"] == tier]
        bounds = bounds.merge(
            st[["conv_id", "metric_code", "mean", "var", "bias_mean",
                "bias_cov", "bias_var", "obs_var", "spin_seen", "spin_n",
                "spin_s1", "spin_s2", "last_bucket_us"]],
            left_on=["conv_id", "metric"],
            right_on=["conv_id", "metric_code"],
            how="left",
        )
        has_prior = bounds["last_bucket_us"].notna()
        start = np.where(
            has_prior, bounds["last_bucket_us"].to_numpy() + width_us,
            bounds["first"].to_numpy(),
        ).astype(np.int64)
        bounds["start"] = start
        bounds["p_mean"] = np.where(has_prior, bounds["mean"], COLD_START["mean"])
        bounds["p_var"] = np.where(has_prior, bounds["var"], COLD_START["sd"] ** 2)
        bounds["p_bias"] = np.where(
            has_prior, bounds["bias_mean"], COLD_START["bias_mean"]
        )
        bounds["p_bcov"] = np.where(has_prior, bounds["bias_cov"], 0.0)
        bounds["p_bvar"] = np.where(
            has_prior, bounds["bias_var"], COLD_START["bias_sd"] ** 2
        )
        bounds["p_r"] = np.where(has_prior, bounds["obs_var"], OBS_NOISE_VAR)
        bounds["p_seen"] = np.where(has_prior, bounds["spin_seen"], cold_spin_seen)
        bounds["p_n"] = np.where(has_prior, bounds["spin_n"], 0.0)
        bounds["p_s1"] = np.where(has_prior, bounds["spin_s1"], 0.0)
        bounds["p_s2"] = np.where(has_prior, bounds["spin_s2"], 0.0)
        # drop already-committed buckets
        rows = rows.merge(
            bounds[["conv_id", "metric", "start"]], on=["conv_id", "metric"]
        )
        rows = rows[rows["bucket_us"] >= rows["start"]]
        if not len(rows):
            return _EMPTY
        bounds = bounds.drop(columns=["last"]).merge(
            rows.groupby(["conv_id", "metric"], sort=True)["bucket_us"].max()
            .rename("last").reset_index(),
            on=["conv_id", "metric"],
            how="inner",  # series with nothing new disappear
        )
    else:
        bounds["start"] = bounds["first"]
        bounds["p_mean"] = COLD_START["mean"]
        bounds["p_var"] = COLD_START["sd"] ** 2
        bounds["p_bias"] = COLD_START["bias_mean"]
        bounds["p_bcov"] = 0.0
        bounds["p_bvar"] = COLD_START["bias_sd"] ** 2
        bounds["p_r"] = OBS_NOISE_VAR
        bounds["p_seen"] = cold_spin_seen
        bounds["p_n"] = 0.0
        bounds["p_s1"] = 0.0
        bounds["p_s2"] = 0.0

    # ---- build all dense axes at once (repeat/arange trick)
    start = bounds["start"].to_numpy(dtype=np.int64)
    last = bounds["last"].to_numpy(dtype=np.int64)
    lens = ((last - start) // width_us + 1).astype(np.int64)
    total = int(lens.sum())
    cum = np.cumsum(lens) - lens  # series offset
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
    axis = np.repeat(start, lens) + intra * width_us

    # scatter observations into the dense axes
    rows = rows.sort_values(["conv_id", "metric", "bucket_us"], kind="mergesort")
    key = pd.MultiIndex.from_frame(bounds[["conv_id", "metric"]])
    sidx = pd.MultiIndex.from_frame(rows[["conv_id", "metric"]])
    series_of_row = key.get_indexer(sidx)
    pos = cum[series_of_row] + (
        rows["bucket_us"].to_numpy() - start[series_of_row]
    ) // width_us

    count = np.zeros(total, dtype=np.int64)
    vmin = np.full(total, np.nan)
    vmax = np.full(total, np.nan)
    vsum = np.full(total, np.nan)
    count[pos] = rows["count"].to_numpy()
    vmin[pos] = rows["vmin"].to_numpy()
    vmax[pos] = rows["vmax"].to_numpy()
    vsum[pos] = rows["vsum"].to_numpy()
    observed = count > 0
    mean = np.full(total, np.nan)
    mean[observed] = vsum[observed] / count[observed]

    metric_codes = bounds["metric"].to_numpy()
    metric_rep = np.repeat(metric_codes, lens).astype(np.int8)
    ends = cum + lens - 1  # last row of each series (state checkpoint rows)
    if smooth:
        # y per metric: latency -> mean, turn_rate -> sum
        y = np.where(np.repeat(metric_codes == METRIC_LATENCY, lens), mean, vsum)
        y = np.where(observed, y, 0.0)
        series_start = np.zeros(total, dtype=bool)
        series_start[cum] = True
        value, value_sd, finals = _kalman_batch(
            y, observed, series_start,
            bounds["p_mean"].to_numpy(),
            bounds["p_var"].to_numpy(),
            bounds["p_bias"].to_numpy(),
            bounds["p_bcov"].to_numpy(),
            bounds["p_bvar"].to_numpy(),
            bounds["p_r"].to_numpy(),
            prior_spin=(
                bounds["p_seen"].to_numpy(),
                bounds["p_n"].to_numpy(),
                bounds["p_s1"].to_numpy(),
                bounds["p_s2"].to_numpy(),
            ),
        )
        st_m = finals["m"]
        st_b = finals["b"]
        st_p00 = finals["p00"]
        st_p01 = finals["p01"]
        st_p11 = finals["p11"]
        st_r = finals["r"]
        st_seen = finals["seen"]
        st_n = finals["n"]
        st_s1 = finals["s1"]
        st_s2 = finals["s2"]
    else:
        value = np.where(
            observed,
            np.where(metric_rep == METRIC_LATENCY, mean, vsum),
            np.nan,
        )
        value_sd = np.full(total, np.nan)
        # last bucket is observed by construction -> value[ends] is finite;
        # seed any later smoothed epoch from the raw observable
        st_m = value[ends]
        st_b = np.zeros(len(bounds))
        st_p00 = np.full(len(bounds), COLD_START["sd"] ** 2)
        st_p01 = np.zeros(len(bounds))
        st_p11 = np.full(len(bounds), COLD_START["bias_sd"] ** 2)
        st_r = np.full(len(bounds), OBS_NOISE_VAR)
        from ..schema import SPINUP_BUCKETS as _SP
        st_seen = np.full(len(bounds), float(_SP))
        st_n = np.zeros(len(bounds))
        st_s1 = np.zeros(len(bounds))
        st_s2 = np.zeros(len(bounds))

    # dictionary-encoded Arrow output: numeric columns are zero-copy, the
    # three label columns are (indices, tiny dictionary) pairs — no
    # per-row Python string materialization at 10^7-row scale.
    conv_codes, conv_uniques = pd.factorize(bounds["conv_id"], sort=False)
    conv_col = pa.DictionaryArray.from_arrays(
        pa.array(np.repeat(conv_codes.astype(np.int32), lens)),
        pa.array(conv_uniques, pa.string()),
    )
    metric_col = pa.DictionaryArray.from_arrays(
        pa.array(metric_rep.astype(np.int32)), pa.array([METRIC_NAMES[0], METRIC_NAMES[1]], pa.string())
    )
    tier_col = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(total, dtype=np.int8)), pa.array([tier], pa.string())
    )
    main = pa.table(
        {
            "conv_id": conv_col,
            "metric": metric_col,
            "tier": tier_col,
            "bucket_start": pa.array(axis, pa.timestamp("us")),
            "count": pa.array(count),
            "min": pa.array(vmin),
            "max": pa.array(vmax),
            "sum": pa.array(vsum),
            "mean": pa.array(mean),
            "value": pa.array(value),
            "value_sd": pa.array(value_sd),
            "gap_filled": pa.array(~observed),
        },
        schema=TIER_ARROW_SCHEMA,
    )

    # ---- per-series checkpoint rows ("_s:" filter state; "_p:" spin-up
    # accumulators while the adaptive-noise window is still open)
    ns = len(bounds)
    met_name = np.where(
        metric_codes == METRIC_LATENCY, METRIC_NAMES[METRIC_LATENCY],
        METRIC_NAMES[1 - METRIC_LATENCY],
    )
    last_bucket = axis[ends]

    def _state_table(mask, label_prefix, cnt, vmin_, vmax_, vsum_, mean_,
                     value_, sd_):
        k = int(mask.sum())
        labels = label_prefix + pd.Series(met_name[mask]) + ":" + tier
        lab_codes, lab_uniques = pd.factorize(labels, sort=False)
        conv_c, conv_u = pd.factorize(bounds["conv_id"].to_numpy()[mask], sort=False)
        return pa.table(
            {
                "conv_id": pa.DictionaryArray.from_arrays(
                    pa.array(conv_c.astype(np.int32)), pa.array(conv_u, pa.string())
                ),
                "metric": pa.DictionaryArray.from_arrays(
                    pa.array(lab_codes.astype(np.int32)),
                    pa.array(lab_uniques, pa.string()),
                ),
                "tier": pa.DictionaryArray.from_arrays(
                    pa.array(np.zeros(k, dtype=np.int8)),
                    pa.array(["raw"], pa.string()),
                ),
                "bucket_start": pa.array(last_bucket[mask], pa.timestamp("us")),
                "count": pa.array(cnt[mask].astype(np.int64)),
                "min": pa.array(vmin_[mask]),
                "max": pa.array(vmax_[mask]),
                "sum": pa.array(vsum_[mask]),
                "mean": pa.array(mean_[mask]),
                "value": pa.array(value_[mask]),
                "value_sd": pa.array(sd_[mask]),
                "gap_filled": pa.array(np.zeros(k, dtype=bool)),
            },
            schema=TIER_ARROW_SCHEMA,
        )

    all_mask = np.ones(ns, dtype=bool)
    tables = [
        main,
        # _s row: value=m, mean=b, min=P00, max=P01, sum=P11, value_sd=R,
        # count=spin_seen
        _state_table(all_mask, "_s:", st_seen, st_p00, st_p01, st_p11, st_b,
                     st_m, st_r),
    ]
    from ..schema import SPINUP_BUCKETS as _SPB

    spin_open = st_seen < _SPB
    if spin_open.any():
        # _p row: count=spin_seen, min=spin_n, max=s1, sum=s2
        nanv = np.full(ns, np.nan)
        tables.append(
            _state_table(spin_open, "_p:", st_seen, st_n, st_s1, st_s2, nanv,
                         nanv, nanv)
        )
    return pa.concat_tables(tables)


def finalize_conversation(
    group: pd.DataFrame,
    prior_state: dict | None = None,
    smooth: bool = True,
    close_us: int | None = None,
) -> pd.DataFrame:
    """Single-conversation wrapper over :func:`finalize_batch` (tests /
    compatibility; the pipeline uses the batch path)."""
    state_df = context_df = None
    if prior_state is not None:
        state_df, context_df = state_frames(prior_state)
    return finalize_batch(group, state_df, context_df, smooth, close_us)


def state_frames(prior_state: dict) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split the {(conv, metric, tier): (mean, var, last_bucket)} checkpoint
    dict into vector-join-friendly frames (state rows use metric CODES)."""
    from ..functions.rollup import METRIC_LATENCY as ML
    from ..functions.rollup import METRIC_TURN_RATE as MT

    from ..schema import COLD_START as _CS
    from ..schema import OBS_NOISE_VAR as _R
    from ..schema import SPINUP_BUCKETS as _SP

    code = {"turn_rate": MT, "latency": ML}
    srows, crows = [], []
    for (conv, metric, tier), v in prior_state.items():
        if metric.startswith("_context"):  # incl. per-turn "_context@N" keys
            crows.append((conv, int(v[0]), int(v[2])))
        elif metric in code:
            mu, var, lb = v[0], v[1], v[2]
            if len(v) > 3:
                bm, bc, bv, ov, sp_seen, sp_n, sp_s1, sp_s2 = v[3:11]
            else:  # legacy 3-tuple: cold bias, spin done
                bm, bc, bv = _CS["bias_mean"], 0.0, _CS["bias_sd"] ** 2
                ov, sp_seen, sp_n, sp_s1, sp_s2 = _R, float(_SP), 0.0, 0.0, 0.0
            srows.append(
                (conv, code[metric], tier, mu, var, bm, bc, bv, ov,
                 sp_seen, sp_n, sp_s1, sp_s2, lb)
            )
    state_df = pd.DataFrame(
        srows,
        columns=["conv_id", "metric_code", "tier", "mean", "var", "bias_mean",
                 "bias_cov", "bias_var", "obs_var", "spin_seen", "spin_n",
                 "spin_s1", "spin_s2", "last_bucket_us"],
    )
    context_df = pd.DataFrame(crows, columns=["conv_id", "turn_idx", "ts_us"])
    return state_df, context_df
