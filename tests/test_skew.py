"""Hot-conversation skew: the north rule's explicit skew-handling check.

The synthetic corpus puts ~half of all turns into ~1% of conversations
(FIXTURES.md). The engine's contract: (a) results stay exact under skew,
(b) the shuffle payload per partition is bucket-level (bounded by active
buckets, not raw turns), (c) one pathological conversation cannot exceed a
partition because partials contract it map-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ecov003_l2t_stars_ray import oracle
from ecov003_l2t_stars_ray.functions.rollup import partial_rollup, partition_of
from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import (
    rollup_tiers,
    tiers_to_pandas,
)
from ecov003_l2t_stars_ray.schema import TRANSCRIPT_SCHEMA


def _one_hot_conv(n_turns=120_000):
    """One conversation, many turns, 2s cadence (dense minute buckets)."""
    ts = np.int64(1735689600000000) + np.arange(n_turns, dtype=np.int64) * 2_000_000
    return pa.table(
        {
            "conv_id": pa.array(np.repeat("conv-hot", n_turns)),
            "turn_idx": pa.array(np.arange(n_turns, dtype=np.int32)),
            "role": pa.array(np.repeat("user", n_turns)),
            "text": pa.array(np.repeat("x", n_turns)),
            "tool": pa.array(np.repeat("", n_turns)),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def test_partial_contraction_bounds_shuffle():
    """The shuffled payload for a hot conv is ~buckets, not turns."""
    t = _one_hot_conv()
    parts = partial_rollup(t)
    # 120k turns over 2s cadence = 4000 minutes -> ~2 metrics x 4000 rows
    assert parts.num_rows < 2 * 4000 + 50
    assert parts.num_rows < t.num_rows / 10


def test_hot_conv_exact():
    t = _one_hot_conv(30_000)
    want = oracle.tier_rollup(t.to_pandas(), smooth=True)
    ds = ray.data.from_arrow(t).repartition(16)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=True))
    assert len(got) == len(want)
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_allclose(
        got["value"].to_numpy(), want["value"].to_numpy(), rtol=1e-9
    )


def test_partition_hash_spreads_conversations():
    conv = pd.Series([f"conv-{i:08d}" for i in range(4000)])
    pid = partition_of(conv, 64)
    counts = np.bincount(pid, minlength=64)
    assert counts.min() > 0
    assert counts.max() < 3 * counts.mean()


def test_hot_series_time_sliced_epochs(tmp_path):
    """A single very hot conversation (50k turns over ~9 days) processed as
    three time-sliced epochs + flush matches the full-batch oracle — the
    engine's answer to series longer than a partition's memory is the
    state-chained epoch split, and it must be exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecov003_l2t_stars_ray import oracle
    from ecov003_l2t_stars_ray.pipelines.epochs import read_tiers, run_epoch

    rng = np.random.default_rng(9)
    n = 50_000
    gaps = rng.integers(1, 30_000_000, size=n)  # up to 30 s between turns
    gaps[rng.random(n) < 0.001] *= 200          # occasional multi-hour silences
    ts = pd.Timestamp("2025-02-01").value // 1000 + np.cumsum(gaps)
    pdf = pd.DataFrame(
        {
            "conv_id": "conv-hot",
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": "user",
            "text": "t",
            "tool": "",
            "ts": ts.view("datetime64[us]"),
        }
    )
    cuts = [int(np.quantile(ts, q)) for q in (0.4, 0.75)]
    frags = []
    lo = np.int64(-1 << 62)
    for i, hi in enumerate([*cuts, np.int64(1 << 62)]):
        part = pdf[(ts > lo) & (ts <= hi)]
        f = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), f)
        frags.append(f)
        lo = hi
    root = str(tmp_path / "root")
    for e, f in enumerate(frags, start=1):
        run_epoch([f], root, epoch=e, num_partitions=2)
    run_epoch([], root, epoch=len(frags) + 1, num_partitions=2, giveup_buckets=0)

    got = read_tiers(root, list(range(1, len(frags) + 2)))
    got = got[~got["metric"].str.startswith("_")].copy()
    got["bucket_start"] = got["bucket_start"].astype("datetime64[us]")
    key = ["tier", "conv_id", "metric", "bucket_start"]
    got = got.sort_values(key, ignore_index=True)
    want = oracle.tier_rollup(pdf, smooth=True).sort_values(key, ignore_index=True)
    assert len(got) == len(want), (len(got), len(want))
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_allclose(
        got["value"].to_numpy(), want["value"].to_numpy(), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        got["sum"].to_numpy(), want["sum"].to_numpy(), rtol=1e-9, atol=1e-12
    )
