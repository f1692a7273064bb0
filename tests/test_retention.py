"""Retention policy: fine tiers expire behind the watermark; 1d survives."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ecov003_l2t_stars_ray.pipelines.epochs import read_tiers, run_epoch
from ecov003_l2t_stars_ray.schema import US_PER_DAY
from ecov003_l2t_stars_ray.state.retention import (
    apply_retention,
    load_tombstones,
)


def test_retention_expires_fine_tiers(tmp_path, small_transcripts):
    root = str(tmp_path / "root")
    pdf = small_transcripts.to_pandas()
    f1 = str(tmp_path / "f1.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f1)
    summary = run_epoch([f1], root, epoch=1, num_partitions=2, giveup_buckets=0)
    wm = summary["watermark_us"]

    # nothing expires inside the horizons
    t0 = apply_retention(root, wm)
    assert len(t0) == 0

    # jump the watermark 40 days ahead: raw + 1m expire, 1h + 1d survive
    t1 = apply_retention(root, wm + 40 * US_PER_DAY)
    assert set(t1["tier"]) == {"raw", "1m"}
    remaining = read_tiers(root, [1])
    tiers_left = set(remaining["tier"].unique())
    assert "1m" not in tiers_left and "1h" in tiers_left and "1d" in tiers_left

    # tombstones are durable + idempotent re-apply
    again = apply_retention(root, wm + 40 * US_PER_DAY)
    assert len(again) == 0
    assert len(load_tombstones(root)) == len(t1)

    # 200 days: 1h expires too; 1d kept forever
    t2 = apply_retention(root, wm + 200 * US_PER_DAY)
    assert set(t2["tier"]) == {"1h"}
    remaining = read_tiers(root, [1])
    assert set(remaining["tier"].unique()) <= {"1d", "raw"}
    assert "1d" in set(remaining["tier"].unique())
