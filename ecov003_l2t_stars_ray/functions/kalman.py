"""1-D bias-aware Kalman gap-fill smoother kernel.

The STARS fusion kernel reimagined for 1-D series (reference: per-pixel
Bayesian advance-and-update per day with gap-filling of missing days,
``README.md:33,140``; invocation + state plumbing at
``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``). Here the
"pixel series" is a (conv_id, metric) series over tumbling tier buckets;
missing buckets are predicted forward (gap_filled=True) exactly as the
reference fills days with no observation.

State model (mirrors the reference's level + instrument-bias state,
``jl:333-334``; prior layers ``prior.py:28-56``):

    x = [level m, bias b];   observation y = m + b + noise(R)
    predict: P00 += Q ; P11 += Qb          (level and bias random walks)
    update (observed y):
        k0num = P00 + P01 ; k1num = P01 + P11 ; S = k0num + k1num + R
        K0 = k0num / S ; K1 = k1num / S ; nu = y - (m + b)
        m += K0*nu ; b += K1*nu
        P00' = (1-K0)*P00 - K0*P01
        P01' = (1-K0)*P01 - K0*P11
        P11' = (1-K1)*P11 - K1*P01
    emit: value = m + b ; value_sd = sqrt((P00+P01) + (P01+P11))

Adaptive observation noise (the K2 coupling, ``jl:151-183,339-348``):
during the first SPINUP_BUCKETS buckets of a series' life R is the default
OBS_NOISE_VAR and observed values are accumulated (n, s1, s2); at bucket
SPINUP_BUCKETS the estimate finalizes as

    var = (s2 - s1*s1/n) / (n - 1)   if n >= MIN_SUPPORT
    R   = max(var, OBS_NOISE_VAR)    else the default

and stays fixed. The accumulators travel in the state checkpoint so an
epoch chain reproduces a continuous run.

Cold-start priors mirror the reference's defaults-when-no-prior
(``jl:42-47``): mean 0.12, sd 0.01, bias 0, bias sd 0.001
(``schema.COLD_START``). The arithmetic order above IS the contract: the
pandas oracle in ``ecov003_l2t_stars_ray.oracle`` re-implements the same
recurrence independently and tests require float64 agreement.
"""

from __future__ import annotations

import math

import numpy as np

from ..schema import (
    BIAS_PROCESS_NOISE_VAR,
    COLD_START,
    MIN_SUPPORT,
    OBS_NOISE_VAR,
    PROCESS_NOISE_VAR,
    SPINUP_BUCKETS,
)

#: final state tuple order: (m, b, P00, P01, P11, R, seen, n, s1, s2)
STATE_FIELDS = ("m", "b", "p00", "p01", "p11", "r", "seen", "n", "s1", "s2")


def kalman_gap_fill(
    y: np.ndarray,
    observed: np.ndarray,
    prior: tuple | None = None,
    process_var: float = PROCESS_NOISE_VAR,
    bias_process_var: float = BIAS_PROCESS_NOISE_VAR,
    obs_var_default: float = OBS_NOISE_VAR,
    adaptive: bool = True,
) -> tuple[np.ndarray, np.ndarray, tuple]:
    """Run the forward bias-aware filter over one dense bucket axis.

    Args:
        y: observation per bucket (ignored where ``observed`` is False).
        observed: boolean mask, True where the bucket has a raw observation.
        prior: checkpointed STATE_FIELDS tuple from the previous epoch
            (K4 analog, ``load_prior.py:48-165``); cold-start otherwise.
        adaptive: estimate per-series obs noise from the spin-up window
            (False pins R to ``obs_var_default``).

    Returns:
        (value, value_sd, final_state) — posterior mean/SD of the
        observable per bucket plus the STATE_FIELDS tuple to checkpoint.
    """
    n = len(y)
    if prior is None:
        m = COLD_START["mean"]
        b = COLD_START["bias_mean"]
        p00 = COLD_START["sd"] ** 2
        p01 = 0.0
        p11 = COLD_START["bias_sd"] ** 2
        r = obs_var_default
        seen, cn, s1, s2 = (0, 0, 0.0, 0.0) if adaptive else (SPINUP_BUCKETS, 0, 0.0, 0.0)
    else:
        m, b, p00, p01, p11, r, seen, cn, s1, s2 = prior
    q = process_var
    qb = bias_process_var
    value = np.empty(n, dtype=np.float64)
    sd = np.empty(n, dtype=np.float64)
    yv = np.asarray(y, dtype=np.float64)
    obs = np.asarray(observed, dtype=bool)
    # Invariant: done <=> seen >= SPINUP_BUCKETS. R finalizes at the END of
    # bucket SPINUP_BUCKETS-1 (the moment seen reaches the window size), so
    # a resumed series either carries the finalized R (done) or the frozen
    # accumulators (not done) — a chain split at any bucket reproduces the
    # continuous run.
    done = seen >= SPINUP_BUCKETS
    for i in range(n):
        p00 = p00 + q
        p11 = p11 + qb
        if obs[i]:
            if not done:
                cn += 1
                s1 += yv[i]
                s2 += yv[i] * yv[i]
            k0num = p00 + p01
            k1num = p01 + p11
            s = k0num + k1num + r
            k0 = k0num / s
            k1 = k1num / s
            nu = yv[i] - (m + b)
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
                    r = var if var > obs_var_default else obs_var_default
                else:
                    r = obs_var_default
                done = True
        value[i] = m + b
        sd[i] = math.sqrt((p00 + p01) + (p01 + p11))
    return value, sd, (m, b, p00, p01, p11, r, seen, cn, s1, s2)
