"""Tier rollup: Ray engine vs the single-process pandas oracle.

Counts and min/max are exact; sum/mean/smoothed values are compared at
float64 tolerance (distributed partial-sum order differs from the oracle's
single-pass order; see SURVEY.md §7.5 on exact-match semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from ecov003_l2t_stars_ray import oracle
from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import (
    read_transcripts,
    rollup_tiers,
    tiers_to_pandas,
)


def _compare(got: pd.DataFrame, want: pd.DataFrame):
    key = ["tier", "conv_id", "metric", "bucket_start"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for k in key:
        assert (got[k].to_numpy() == want[k].to_numpy()).all(), f"key mismatch in {k}"
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    assert (got["gap_filled"].to_numpy() == want["gap_filled"].to_numpy()).all()
    for col in ["min", "max"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())
    for col in ["sum", "mean", "value", "value_sd"]:
        np.testing.assert_allclose(
            got[col].to_numpy(), want[col].to_numpy(), rtol=1e-9, atol=1e-12,
            err_msg=col,
        )


@pytest.mark.parametrize("smooth", [False, True])
def test_rollup_matches_oracle(small_transcripts, smooth):
    pdf = small_transcripts.to_pandas()
    want = oracle.tier_rollup(pdf, smooth=smooth)

    ds = ray.data.from_arrow(small_transcripts).repartition(8)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=smooth))
    _compare(got, want)


def test_rollup_from_parquet_shards(small_corpus_dir, small_transcripts):
    """Reading the shard-partitioned corpus gives identical tiers."""
    want = oracle.tier_rollup(small_transcripts.to_pandas(), smooth=True)
    ds = read_transcripts(small_corpus_dir)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=True))
    _compare(got, want)


def test_scrambled_input_same_result(small_transcripts):
    """Latency resolution is layout-independent: a fully shuffled input
    (every predecessor in a different block) still matches the oracle."""
    pdf = small_transcripts.to_pandas().sample(frac=1.0, random_state=7)
    want = oracle.tier_rollup(pdf, smooth=True)
    ds = ray.data.from_pandas(pdf.reset_index(drop=True)).repartition(16)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=True))
    _compare(got, want)


def test_tier_cascade_exact(small_transcripts):
    """1h/1d rows equal direct aggregation of raw observations (cascade is
    exact because sum/count/min/max compose)."""
    want = oracle.tier_rollup(small_transcripts.to_pandas(), smooth=False)
    ds = ray.data.from_arrow(small_transcripts)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=False))
    for tier in ("1h", "1d"):
        g = got[got.tier == tier]
        w = want[want.tier == tier]
        assert len(g) == len(w) > 0
        assert (g["count"].to_numpy() == w["count"].to_numpy()).all()


def test_raw_tier_exact(small_transcripts):
    """Opt-in raw tier: per-observation rows match the oracle exactly,
    including ties (equal ts, distinct turn_idx) and cross-block gaps."""
    pdf = small_transcripts.to_pandas().sample(frac=1.0, random_state=11)
    want = oracle.tier_rollup(pdf, smooth=True, include_raw=True)
    want = want[want.tier == "raw"]
    ds = ray.data.from_pandas(pdf.reset_index(drop=True)).repartition(12)
    got = tiers_to_pandas(rollup_tiers(ds, smooth=True, include_raw=True))
    got = got[got.tier == "raw"]
    key = ["conv_id", "metric", "bucket_start", "value"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert len(g) == len(w)
    for k in ["conv_id", "metric"]:
        assert (g[k].to_numpy() == w[k].to_numpy()).all()
    np.testing.assert_array_equal(g["bucket_start"].to_numpy(), w["bucket_start"].to_numpy())
    np.testing.assert_allclose(g["value"].to_numpy(), w["value"].to_numpy(), rtol=1e-12)
    assert (g["count"] == 1).all()


def test_nanosecond_parquet_input(tmp_path, small_transcripts):
    """Inputs written with pandas-default ns timestamps roll up identically
    (unit normalization at ingest)."""
    import pyarrow.parquet as pq

    pdf = small_transcripts.to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[ns]")
    p = str(tmp_path / "ns.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
    want = oracle.tier_rollup(small_transcripts.to_pandas(), smooth=True)
    got = tiers_to_pandas(rollup_tiers(read_transcripts(p), smooth=True))
    _compare(got, want)


def test_cascade_from_stored_tier(tmp_path, small_transcripts):
    """Downsampling the COMMITTED 1m tier reproduces the direct 1h tier
    exactly (continuous-aggregate refresh without raw data)."""
    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import (
        cascade_stored_tier,
        write_tiers,
    )
    from ecov003_l2t_stars_ray.schema import US_PER_HOUR, US_PER_MIN

    ds = ray.data.from_arrow(small_transcripts)
    tiers = rollup_tiers(ds, smooth=True)
    out = str(tmp_path / "tiers")
    write_tiers(tiers, out)

    re1h = cascade_stored_tier(f"{out}/tier=1m", US_PER_MIN, US_PER_HOUR)
    got = tiers_to_pandas(re1h)
    want = tiers_to_pandas(rollup_tiers(ray.data.from_arrow(small_transcripts)))
    want = want[want.tier == "1h"].reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    np.testing.assert_array_equal(got["min"].to_numpy(), want["min"].to_numpy())
    np.testing.assert_allclose(
        got["value"].to_numpy(), want["value"].to_numpy(), rtol=1e-9
    )


def test_map_only_raw_tier_matches_shuffled(small_corpus_dir, small_transcripts, tmp_path):
    """write_raw_tier (map-only bulk + tiny boundary shuffle) produces the
    same raw rows as the shuffle path / oracle."""
    import pyarrow.dataset as pads

    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import write_raw_tier

    out = str(tmp_path / "raw")
    write_raw_tier(read_transcripts(small_corpus_dir), out)
    got = pads.dataset(out).to_table().to_pandas()
    for c in ("conv_id", "metric", "tier"):
        got[c] = got[c].astype(str)
    key = ["conv_id", "metric", "bucket_start", "value"]
    got = got.sort_values(key, ignore_index=True)
    want = oracle.tier_rollup(
        small_transcripts.to_pandas(), smooth=True, include_raw=True
    )
    want = want[want.tier == "raw"].sort_values(key, ignore_index=True)
    assert len(got) == len(want)
    for k in ["conv_id", "metric", "bucket_start", "count"]:
        assert (got[k].to_numpy() == want[k].to_numpy()).all(), k
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"].to_numpy())


def test_map_only_raw_tier_single_turn_blocks(small_corpus_dir, small_transcripts, tmp_path):
    """write_raw_tier parity when every block holds exactly ONE turn
    (batch_size=1): a block-edge row is then both a need (no in-block
    predecessor) and a provide (no in-block successor), and must serve
    both roles or successor blocks' latency gaps vanish."""
    import pyarrow.dataset as pads

    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import write_raw_tier

    out = str(tmp_path / "raw1")
    write_raw_tier(read_transcripts(small_corpus_dir), out, batch_size=1)
    got = pads.dataset(out).to_table().to_pandas()
    for c in ("conv_id", "metric", "tier"):
        got[c] = got[c].astype(str)
    key = ["conv_id", "metric", "bucket_start", "value"]
    got = got.sort_values(key, ignore_index=True)
    want = oracle.tier_rollup(
        small_transcripts.to_pandas(), smooth=True, include_raw=True
    )
    want = want[want.tier == "raw"].sort_values(key, ignore_index=True)
    assert len(got) == len(want)
    for k in ["conv_id", "metric", "bucket_start", "count"]:
        assert (got[k].to_numpy() == want[k].to_numpy()).all(), k
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"].to_numpy())
