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


def _convs_hashing_to(prefix: str, n: int, base: int, pid: int) -> list[str]:
    """First n conv ids with the given prefix whose base-hash pid matches."""
    cand = pd.Series([f"{prefix}-{i:06d}" for i in range(80 * n * base)])
    hit = cand[partition_of(cand, base) == pid]
    assert len(hit) >= n, "candidate pool too small"
    return hit.head(n).tolist()


def test_partition_plan_trivial_matches_partition_of():
    from ecov003_l2t_stars_ray.state.skew import PartitionPlan

    conv = pd.Series([f"c{i}" for i in range(500)])
    plan = PartitionPlan(8)
    np.testing.assert_array_equal(plan.assign(conv), partition_of(conv, 8))
    assert plan.total == 8 and plan.fanout == {}


def test_partition_plan_fanout_splits_only_hot():
    from ecov003_l2t_stars_ray.state.skew import PartitionPlan

    base = 8
    plan = PartitionPlan(base, {3: 4})
    assert plan.total == base + 3
    conv = pd.Series([f"c{i}" for i in range(4000)])
    trivial = partition_of(conv, base)
    got = plan.assign(conv)
    # cold partitions keep their ids
    cold = trivial != 3
    np.testing.assert_array_equal(got[cold], trivial[cold])
    # hot partition spreads over {3, 8, 9, 10}, using more than one slot
    hot_ids = set(got[~cold].tolist())
    assert hot_ids <= {3, 8, 9, 10} and len(hot_ids) > 1
    # reverse map round-trips every extended id
    for e in range(plan.total):
        assert 0 <= plan.base_of(e) < base
    for e in (8, 9, 10):
        assert plan.base_of(e) == 3
    # a conversation is never split across partitions (deterministic hash)
    np.testing.assert_array_equal(got, plan.assign(conv))
    # json round trip
    rt = PartitionPlan.from_json(plan.to_json())
    assert rt.base == plan.base and rt.fanout == plan.fanout


def test_plan_from_counts_detects_hot():
    from ecov003_l2t_stars_ray.state.skew import plan_from_counts

    uniform = {p: 100 for p in range(8)}
    assert plan_from_counts(uniform, 8).fanout == {}
    skewed = {**uniform, 2: 1000}
    plan = plan_from_counts(skewed, 8, skew_factor=4.0)
    assert set(plan.fanout) == {2} and plan.fanout[2] == 10
    # cap respected
    plan = plan_from_counts({**uniform, 2: 100_000}, 8, max_fanout=16)
    assert plan.fanout[2] == 16


def test_plan_from_manifest_reverse_maps_extended_ids():
    from ecov003_l2t_stars_ray.state.skew import PartitionPlan, plan_from_manifest

    prev = PartitionPlan(4, {0: 3})  # extended ids 4,5 belong to base pid 0
    rows = []
    for pid, n in [(0, 500), (4, 450), (5, 480), (1, 140), (2, 150), (3, 160)]:
        rows.append({"partition_id": pid, "tier": "1m", "epoch": 7, "row_count": n})
    rows.append({"partition_id": 0, "tier": "all", "epoch": 7, "row_count": 0})
    rows.append({"partition_id": 1, "tier": "1m", "epoch": 6, "row_count": 9_999})
    mdf = pd.DataFrame(rows)
    plan = plan_from_manifest(mdf, 7, 4, prev_plan=prev, skew_factor=4.0)
    # 500+450+480 lands on base pid 0 -> ~9.5x the median -> hot
    assert set(plan.fanout) == {0} and plan.fanout[0] >= 2
    # no history -> trivial
    assert plan_from_manifest(mdf, 3, 4).fanout == {}


def test_auto_skew_epochs_exact_and_bounded(tmp_path):
    """10x hot base-partition corpus: auto_skew must (a) reproduce the
    no-skew run exactly and (b) cap the max per-partition committed rows
    by sub-splitting the hot partition detected from epoch-1 manifest."""
    import json

    import pyarrow.parquet as pq

    from ecov003_l2t_stars_ray.pipelines.epochs import read_tiers, run_epoch
    from ecov003_l2t_stars_ray.state.manifest import Manifest

    base = 4
    hot = _convs_hashing_to("hot", 40, base, pid=0)
    cold = [c for p in (1, 2, 3) for c in _convs_hashing_to(f"cold{p}", 4, base, p)]
    rows = []
    t0 = pd.Timestamp("2025-03-01").value // 1000
    for j, conv in enumerate(hot + cold):
        n = 300
        ts = t0 + np.int64(j) * 7_000_000 + np.arange(n, dtype=np.int64) * 61_000_000
        rows.append(pd.DataFrame({
            "conv_id": conv, "turn_idx": np.arange(n, dtype=np.int32),
            "role": "user", "text": "t", "tool": "",
            "ts": ts.view("datetime64[us]"),
        }))
    pdf = pd.concat(rows, ignore_index=True)
    ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    mid = int(np.quantile(ts_us, 0.5))
    frags = []
    for i, part in enumerate([pdf[ts_us <= mid], pdf[ts_us > mid]]):
        f = str(tmp_path / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), f)
        frags.append(f)

    roots = {"auto": str(tmp_path / "auto"), "ctl": str(tmp_path / "ctl")}
    for name, root in roots.items():
        auto = name == "auto"
        run_epoch([frags[0]], root, epoch=1, num_partitions=base, auto_skew=auto)
        run_epoch([frags[1]], root, epoch=2, num_partitions=base, auto_skew=auto)
        run_epoch([], root, epoch=3, num_partitions=base, giveup_buckets=0,
                  auto_skew=auto)

    # epoch 2 derived a fanout on the hot base pid from epoch-1 manifest rows
    with open(tmp_path / "auto" / "manifest" / "epoch-e00002.json") as f:
        plan2 = json.load(f)["partition_plan"]
    assert "0" in plan2["fanout"] and plan2["fanout"]["0"] >= 2

    # bounded per-partition rows: auto's largest committed epoch-2 cell is
    # materially smaller than the control's (the unsplit hot partition)
    def max_cell(root):
        m = Manifest(os.path.join(root, "manifest")).load()
        m = m[(m["epoch"] == 2) & (m["tier"] != "all")]
        return int(m.groupby("partition_id")["row_count"].sum().max())

    import os
    assert max_cell(roots["auto"]) < 0.6 * max_cell(roots["ctl"])

    # exactness: both roots produce identical tier rows
    key = ["tier", "conv_id", "metric", "bucket_start"]
    frames = {}
    for name, root in roots.items():
        df = read_tiers(root, [1, 2, 3])
        df = df[~df["metric"].str.startswith("_")].copy()
        df["bucket_start"] = df["bucket_start"].astype("datetime64[us]")
        frames[name] = df.sort_values(key, ignore_index=True)
    a, c = frames["auto"], frames["ctl"]
    assert len(a) == len(c)
    pd.testing.assert_frame_equal(
        a[key + ["count", "sum", "value"]], c[key + ["count", "sum", "value"]]
    )


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
