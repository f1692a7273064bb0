"""Schemas, tiers, and engine constants.

The transcript input schema is fixed by the driver (BASELINE.json
``input_hint``); tier/state/manifest schemas follow FIXTURES.md F2-F4.
Reference analogs cited per constant.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- transcripts
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = ("user", "assistant", "tool")

# ---------------------------------------------------------------------- tiers
US_PER_SEC = 1_000_000
US_PER_MIN = 60 * US_PER_SEC
US_PER_HOUR = 60 * US_PER_MIN
US_PER_DAY = 24 * US_PER_HOUR

#: Retention ladder: tier name -> tumbling bucket width in microseconds.
#: Analog of the reference's 70 m / 490 m / 980 m resolution ladder
#: (reference ``constants.py:29-31``); "raw" keeps per-turn resolution.
TIERS: dict[str, int] = {
    "1m": US_PER_MIN,
    "1h": US_PER_HOUR,
    "1d": US_PER_DAY,
}
TIER_ORDER = ("raw", "1m", "1h", "1d")

#: Metrics rolled up per conversation series. ``turn_rate`` is the per-bucket
#: observation count (analog of the per-day observation counts,
#: ``process_ECOSTRESS_data_fusion_distributed_bias.jl:262``); ``latency`` is
#: the inter-turn gap in seconds (analog of daily-cadence deltas).
METRICS = ("turn_rate", "latency")

#: Rollup tier schema (FIXTURES.md F2). Aggregates are exact, float64
#: accumulation; ``sum``+``count`` are kept so tiers cascade exactly
#: (mean = sum / count recomputed per tier).
TIER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("metric", pa.string()),
        ("bucket_start", pa.timestamp("us")),
        ("count", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("sum", pa.float64()),
        ("mean", pa.float64()),
    ]
)

#: Smoothed tier columns appended by the gap-fill smoother stage
#: (value = Kalman posterior mean, value_sd = posterior SD, gap_filled =
#: no raw observation in bucket; analog of the posterior mean/UQ/flag layers,
#: reference ``README.md:146-149`` and ``jl:288,408``).
SMOOTHED_COLUMNS = ("value", "value_sd", "gap_filled")

# ------------------------------------------------------------- smoother state
#: Per-(conv_id, metric) checkpoint row (FIXTURES.md F3) — the reference's
#: 8-layer prior (``prior.py:28-56``) flattened to columns.
STATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("metric", pa.string()),
        ("tier", pa.string()),
        ("mean", pa.float64()),        # level posterior mean m
        ("sd", pa.float64()),          # sqrt(P00)
        ("bias_mean", pa.float64()),   # bias posterior mean b
        ("bias_sd", pa.float64()),     # sqrt(P11)
        ("bias_cov", pa.float64()),    # P01 (level-bias cross covariance)
        ("obs_var", pa.float64()),     # per-series obs noise R (K2 coupling)
        ("spin_seen", pa.int32()),     # spin-up buckets seen (>= SPINUP => done)
        ("spin_n", pa.int32()),        # observed values accumulated in spin-up
        ("spin_s1", pa.float64()),     # sum of spin-up observations
        ("spin_s2", pa.float64()),     # sum of squares of spin-up observations
        ("last_bucket", pa.timestamp("us")),
        ("epoch", pa.int32()),
    ]
)

#: Cold-start defaults when no prior state exists, mirroring the reference's
#: defaults-when-no-prior (mean 0.12, SD 0.01, bias 0, bias SD 0.001 at
#: ``process_ECOSTRESS_data_fusion_distributed_bias.jl:42-47``).
COLD_START = {"mean": 0.12, "sd": 0.01, "bias_mean": 0.0, "bias_sd": 0.001}

#: Kalman process noise (variance added per bucket step) and default
#: observation noise variance. The reference passes obs uncertainty 1e-6
#: per instrument (``jl:333-334``); process noise is the engine's knob for
#: how fast the level can drift between buckets.
PROCESS_NOISE_VAR = 0.05
OBS_NOISE_VAR = 1e-6

#: Bias random-walk variance per bucket step. The reference carries a
#: per-pixel bias mean/SD pair updated every fusion step
#: (``process_ECOSTRESS_data_fusion_distributed_bias.jl:333-334``, prior
#: layers ``prior.py:28-56``); the bias prior SD default is 0.001
#: (``jl:42-47``) so its drift rate is set well below the level's.
BIAS_PROCESS_NOISE_VAR = 1e-7

#: Spin-up window (buckets) for the per-series observation-noise estimate —
#: the K2 coupling (``jl:151-183,339-348``: windowed variance over the
#: spin-up stack feeds the fusion config). During the first SPINUP_BUCKETS
#: buckets of a series' life the default OBS_NOISE_VAR is used and observed
#: values are accumulated; at bucket SPINUP_BUCKETS the sample variance
#: (floored at the default, MIN_SUPPORT guard) becomes the series' R for
#: the rest of its life. Accumulators are carried in the state checkpoint
#: so an epoch chain reproduces the continuous run.
SPINUP_BUCKETS = 16

#: Minimum finite observations for a per-series regression/trend estimate,
#: mirroring the BRDF kernel support guard (>=7 obs per 17-day window else
#: NaN, ``VNP43NRT_jl/src/VNP43NRT.jl:345-346``).
MIN_SUPPORT = 7

#: Recency-weight time constant for windowed trend estimation, mirroring
#: ``exp(-0.5 * age / 1.87)`` (``VNP43NRT_jl/src/VNP43NRT.jl:362``).
RECENCY_TAU = 1.87

# ------------------------------------------------------ watermark / late data
#: Give-up horizon: late rows older than (partition watermark - horizon) are
#: excluded deterministically. Analog of VIIRS_GIVEUP_DAYS = 4
#: (reference ``constants.py:27``): younger gaps => wait/retry, older =>
#: proceed without.
GIVEUP_BUCKETS = 4

# ------------------------------------------------------------------ manifest
#: Lineage manifest row (FIXTURES.md F4): one committed (partition, tier,
#: epoch) cell. Analog of the reference's idempotent file-exists skip made
#: transactional (``L2T_STARS.py:134-138``, ``LPDAACDataPool.py:381-433``
#: temp-file + verify + rename).
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("tier", pa.string()),
        ("epoch", pa.int32()),
        ("input_fragments", pa.list_(pa.string())),
        ("watermark", pa.timestamp("us")),
        ("row_count", pa.int64()),
        ("late_turns", pa.int64()),
        ("committed_at", pa.timestamp("us")),
        ("output_path", pa.string()),
    ]
)

#: Number of hash partitions for conv_id. At 100 TB this is the unit of
#: resume + skew detection; at test scale it just needs to be > 1.
DEFAULT_NUM_PARTITIONS = 64
