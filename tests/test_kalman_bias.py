"""Bias-aware Kalman kernel + adaptive-noise spin-up: exactness and
checkpoint-chain invariance (verdict items: bias state must survive the
checkpoint; K2 variance must feed the smoother)."""

from __future__ import annotations

import numpy as np
import pytest

from ecov003_l2t_stars_ray import oracle
from ecov003_l2t_stars_ray.functions.kalman import kalman_gap_fill
from ecov003_l2t_stars_ray.schema import (
    MIN_SUPPORT,
    OBS_NOISE_VAR,
    SPINUP_BUCKETS,
)


def _series(n=60, seed=5, gap_every=4):
    rng = np.random.default_rng(seed)
    y = 10.0 + rng.normal(0, 2.0, n).round(3)
    observed = np.ones(n, dtype=bool)
    observed[::gap_every] = False
    y = np.where(observed, y, 0.0)
    return y, observed


def test_kernel_matches_oracle_bitwise():
    y, observed = _series()
    v1, s1, _ = kalman_gap_fill(y, observed)
    v2, s2 = oracle._kalman(y, observed)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(s1, s2)


def test_bias_state_is_updated():
    """The filter must actually move the bias state (round-1 gap: bias
    columns were write-only constants)."""
    y, observed = _series()
    _, _, final = kalman_gap_fill(y, observed)
    m, b, p00, p01, p11, r, seen, cn, s1, s2 = final
    assert b != 0.0  # bias moved off its cold start
    assert p01 != 0.0  # cross-covariance developed
    assert p11 > 0.0


def test_adaptive_noise_estimated_from_spinup():
    y, observed = _series()
    _, _, final = kalman_gap_fill(y, observed)
    r = final[5]
    assert r > OBS_NOISE_VAR  # noisy series -> estimated R above the floor
    # with adaptation off, R stays at the default
    _, _, final_fixed = kalman_gap_fill(y, observed, adaptive=False)
    assert final_fixed[5] == OBS_NOISE_VAR


def test_min_support_guard():
    """Fewer than MIN_SUPPORT observations in the spin-up window -> default
    R (the reference's <7-obs guard, VNP43NRT.jl:345-346)."""
    n = SPINUP_BUCKETS + 10
    y = np.full(n, 5.0)
    observed = np.zeros(n, dtype=bool)
    observed[: MIN_SUPPORT - 1] = True  # too few
    _, _, final = kalman_gap_fill(y, observed)
    assert final[5] == OBS_NOISE_VAR


@pytest.mark.parametrize(
    "cut",
    [1, MIN_SUPPORT, SPINUP_BUCKETS - 1, SPINUP_BUCKETS, SPINUP_BUCKETS + 1, 40],
)
def test_checkpoint_chain_bitwise(cut):
    """Splitting a series at ANY bucket and resuming from the checkpointed
    state reproduces the continuous run bit-for-bit — including splits
    exactly at the spin-up boundary (bias + R + accumulators all survive
    the chain)."""
    y, observed = _series()
    v_full, s_full, f_full = kalman_gap_fill(y, observed)
    v1, s1, st = kalman_gap_fill(y[:cut], observed[:cut])
    v2, s2, f2 = kalman_gap_fill(y[cut:], observed[cut:], prior=st)
    np.testing.assert_array_equal(np.concatenate([v1, v2]), v_full)
    np.testing.assert_array_equal(np.concatenate([s1, s2]), s_full)
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(f_full))


def test_batch_kernel_matches_scalar_kernel():
    """Event-based _kalman_batch == stepwise kalman_gap_fill per series
    (gap buckets closed-form; tolerance covers d*q vs repeated-add ulps),
    including finals, across mixed series lengths, leading gaps via prior
    resume, and heavy gap runs."""
    import numpy as np

    from ecov003_l2t_stars_ray.stages.finalize import _kalman_batch

    rng = np.random.default_rng(11)
    lens = [1, 3, 40, 200, 7, 77]
    ys, obs, starts = [], [], []
    priors = []
    for li, L in enumerate(lens):
        y = np.round(5.0 + rng.normal(0, 3.0, L), 3)
        o = rng.random(L) < (0.15 if L > 50 else 0.8)
        o[0] = True  # axes start observed
        ys.append(np.where(o, y, 0.0))
        obs.append(o)
        st = np.zeros(L, dtype=bool)
        st[0] = True
        starts.append(st)
        if li == 2:  # one series resumes from a mid-life prior
            priors.append((4.0, 0.3, 0.1, 0.002, 1e-5, 2.5, 10.0, 6.0, 30.0, 200.0))
        else:
            priors.append(None)
    y = np.concatenate(ys)
    o = np.concatenate(obs)
    st = np.concatenate(starts)
    ns = len(lens)
    from ecov003_l2t_stars_ray.schema import COLD_START, OBS_NOISE_VAR

    pm = np.array([COLD_START["mean"] if p is None else p[0] for p in priors])
    pv = np.array([COLD_START["sd"] ** 2 if p is None else p[2] for p in priors])
    pb = np.array([0.0 if p is None else p[1] for p in priors])
    pbc = np.array([0.0 if p is None else p[3] for p in priors])
    pbv = np.array([COLD_START["bias_sd"] ** 2 if p is None else p[4] for p in priors])
    pr = np.array([OBS_NOISE_VAR if p is None else p[5] for p in priors])
    pseen = np.array([0.0 if p is None else p[6] for p in priors])
    pn = np.array([0.0 if p is None else p[7] for p in priors])
    ps1 = np.array([0.0 if p is None else p[8] for p in priors])
    ps2 = np.array([0.0 if p is None else p[9] for p in priors])

    v, s, fin = _kalman_batch(
        y, o, st, pm, pv, pb, pbc, pbv, pr, prior_spin=(pseen, pn, ps1, ps2)
    )
    off = 0
    for li, L in enumerate(lens):
        if priors[li] is None:
            prior = None
        else:
            p = priors[li]
            prior = (p[0], p[1], p[2], p[3], p[4], p[5], p[6], p[7], p[8], p[9])
        vv, ss, fs = kalman_gap_fill(y[off:off+L], o[off:off+L], prior=prior)
        np.testing.assert_allclose(v[off:off+L], vv, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(s[off:off+L], ss, rtol=1e-9, atol=1e-12)
        got_final = [fin[fld][li] for fld in
                     ("m", "b", "p00", "p01", "p11", "r", "seen", "n", "s1", "s2")]
        np.testing.assert_allclose(got_final, np.asarray(fs), rtol=1e-9, atol=1e-12)
        off += L
