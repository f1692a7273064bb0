"""1-D Kalman gap-fill smoother kernel.

The STARS fusion kernel reimagined for 1-D series (reference: per-pixel
Bayesian advance-and-update per day with gap-filling of missing days,
``README.md:33,140``; invocation + state plumbing at
``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``). Here the
"pixel series" is a (conv_id, metric) series over tumbling tier buckets;
missing buckets are predicted forward (gap_filled=True) exactly as the
reference fills days with no observation.

Local-level model, float64 throughout, strict forward order:

    predict: m = m ; P = P + Q
    update (observed y): K = P / (P + R); m += K*(y - m); P = (1-K)*P

Cold-start priors mirror the reference's defaults-when-no-prior
(``jl:42-47``): mean 0.12, sd 0.01 (see ``schema.COLD_START``).
The arithmetic order is the contract: the pandas oracle in
``ecov003_l2t_stars_ray.oracle`` re-implements the same recurrence
independently and tests require exact float64 equality.
"""

from __future__ import annotations

import math

import numpy as np

from ..schema import COLD_START, OBS_NOISE_VAR, PROCESS_NOISE_VAR


def kalman_gap_fill(
    y: np.ndarray,
    observed: np.ndarray,
    prior_mean: float | None = None,
    prior_var: float | None = None,
    process_var: float = PROCESS_NOISE_VAR,
    obs_var: float = OBS_NOISE_VAR,
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Run the forward filter over a dense bucket axis.

    Args:
        y: observation per bucket (ignored where ``observed`` is False).
        observed: boolean mask, True where the bucket has a raw observation.
        prior_mean / prior_var: checkpointed state from the previous epoch
            (K4 analog, ``load_prior.py:48-165``); cold-start defaults
            otherwise.

    Returns:
        (value, value_sd, final_mean, final_var) — posterior mean and SD per
        bucket plus the final state to checkpoint for the next epoch.
    """
    n = len(y)
    m = COLD_START["mean"] if prior_mean is None else float(prior_mean)
    p = (COLD_START["sd"] ** 2) if prior_var is None else float(prior_var)
    value = np.empty(n, dtype=np.float64)
    sd = np.empty(n, dtype=np.float64)
    yv = np.asarray(y, dtype=np.float64)
    obs = np.asarray(observed, dtype=bool)
    for i in range(n):
        p = p + process_var
        if obs[i]:
            k = p / (p + obs_var)
            m = m + k * (yv[i] - m)
            p = (1.0 - k) * p
        value[i] = m
        sd[i] = math.sqrt(p)
    return value, sd, m, p
