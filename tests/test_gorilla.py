"""Gorilla codec: bit-exact roundtrip, compression ratio, chunk stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecov003_l2t_stars_ray.functions.gorilla import compress, decompress
from ecov003_l2t_stars_ray.stages.compress import compress_batch, decompress_chunks


def _roundtrip(ts, vals):
    blob = compress(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, vals2 = decompress(blob)
    np.testing.assert_array_equal(np.asarray(ts, np.int64), ts2)
    np.testing.assert_array_equal(
        np.asarray(vals, np.float64).view(np.uint64), vals2.view(np.uint64)
    )
    return blob


def test_empty_and_single():
    _roundtrip([], [])
    _roundtrip([1735689600000000], [3.14])
    _roundtrip([0, 60_000_000], [np.nan, -0.0])


def test_regular_series_compresses_well():
    n = 10_000
    ts = 1735689600000000 + 60_000_000 * np.arange(n, dtype=np.int64)
    vals = np.full(n, 42.0)
    blob = _roundtrip(ts, vals)
    # constant-delta constant-value: ~2 bits/point after the header
    assert len(blob) < n / 2

    vals = 20.0 + np.round(np.sin(np.arange(n) / 10.0), 3)
    blob = _roundtrip(ts, vals)
    assert len(blob) < 16 * n * 0.8  # beats raw (ts, value) pairs


def test_nan_gaps_roundtrip():
    ts = 1735689600000000 + 60_000_000 * np.arange(100, dtype=np.int64)
    vals = np.where(np.arange(100) % 3 == 0, np.nan, 7.25)
    _roundtrip(ts, vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_property_roundtrip(pairs):
    deltas = [p[0] for p in pairs]
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) if pairs else []
    vals = [p[1] for p in pairs]
    _roundtrip(ts, vals)


def test_chunk_stage_roundtrip(small_transcripts):
    from ecov003_l2t_stars_ray import oracle

    tiers = oracle.tier_rollup(small_transcripts.to_pandas(), smooth=True)
    chunks = compress_batch(tiers)
    assert (chunks["n_points"] > 0).all()
    points = decompress_chunks(chunks)
    key = ["conv_id", "metric", "tier", "bucket_start"]
    want = tiers.sort_values(key, ignore_index=True)
    got = points.sort_values(key, ignore_index=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["value"].to_numpy().view(np.uint64),
        want["value"].to_numpy().view(np.uint64),
    )
    # compression wins vs raw 16-byte points
    assert chunks["payload"].map(len).sum() < 16 * len(want)


def test_chunk_stage_via_dataset(small_transcripts):
    """compress_tiers over the Ray tier Dataset (dictionary-encoded
    columns) roundtrips bit-exactly."""
    import ray.data

    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import (
        rollup_tiers,
        tiers_to_pandas,
    )
    from ecov003_l2t_stars_ray.stages.compress import compress_tiers

    tiers = rollup_tiers(ray.data.from_arrow(small_transcripts), smooth=True)
    chunks = compress_tiers(tiers).to_pandas()
    assert (chunks["n_points"] > 0).all()
    points = decompress_chunks(chunks)
    want = tiers_to_pandas(rollup_tiers(ray.data.from_arrow(small_transcripts), smooth=True))
    assert len(points) == len(want)
    key = ["conv_id", "metric", "tier", "bucket_start"]
    got = points.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    np.testing.assert_array_equal(
        got["value"].to_numpy().view(np.uint64), w["value"].to_numpy().view(np.uint64)
    )


def test_compressed_tier_storage_roundtrip(tmp_path, small_transcripts):
    """write_compressed_tiers / read_compressed_tiers: the at-rest Gorilla
    format roundtrips bit-exactly through Parquet + Ray."""
    import ray.data

    from ecov003_l2t_stars_ray.pipelines.rollup_pipeline import (
        rollup_tiers,
        tiers_to_pandas,
    )
    from ecov003_l2t_stars_ray.stages.compress import (
        read_compressed_tiers,
        write_compressed_tiers,
    )

    out = str(tmp_path / "cold")
    tiers = rollup_tiers(ray.data.from_arrow(small_transcripts), smooth=True)
    write_compressed_tiers(tiers, out)
    decoded = read_compressed_tiers(out).to_pandas()
    want = tiers_to_pandas(
        rollup_tiers(ray.data.from_arrow(small_transcripts), smooth=True)
    )
    assert len(decoded) == len(want)
    key = ["conv_id", "metric", "tier", "bucket_start"]
    g = decoded.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    np.testing.assert_array_equal(
        g["value"].to_numpy().view(np.uint64), w["value"].to_numpy().view(np.uint64)
    )
    # (at this tiny scale per-chunk headers dominate; the compression-ratio
    # property is asserted on long series in test_regular_series above)
