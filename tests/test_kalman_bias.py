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
