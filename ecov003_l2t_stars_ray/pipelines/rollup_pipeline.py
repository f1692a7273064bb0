"""The flagship pipeline: transcripts -> raw-metric partials -> tier rollups.

Shape (one shuffle total):

    read_parquet(conv_id, turn_idx, ts)          # text pruned at the read
      -> map_batches(partial_rollup, pyarrow)    # map-side combiner
      -> groupby(conv_id).map_groups(finalize)   # THE shuffle; bucket-level
      -> write_parquet(partition by tier)        # resumable layout

Reference lifecycle analog: SURVEY.md §3.1 steps 6-8 (staging -> fusion ->
assembly), with the file handoffs replaced by object-store Arrow blocks and
the Julia `Distributed` pool by Ray's streaming executor.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.rollup import partial_rollup
from ..stages.finalize import TIER_OUT_COLUMNS, finalize_batch, state_frames

# Per-process cache for broadcast prior-state lookups: ray.get() of the same
# ObjectRef deserializes per call, so memoize per worker (K6 one-time-init
# analog, reference ``login.py:15-21``). Stored as the pre-split join frames.
_STATE_CACHE: dict[str, tuple] = {}


def _resolve_state(ref) -> tuple | None:
    if ref is None:
        return None
    key = ref.hex()
    if key not in _STATE_CACHE:
        _STATE_CACHE.clear()
        _STATE_CACHE[key] = state_frames(ray.get(ref))
    return _STATE_CACHE[key]


class FinalizeSmoother:
    """Actor-pool finalize stage: the stateful Kalman gap-fill smoother.

    The prior state checkpoint (K4 analog) is fetched from the object
    store and split into join frames ONCE per actor in ``__init__`` —
    the reference's one-time-setup pattern (``login.py:15-61``) — then
    every partition group is finalized in ``__call__``.
    """

    def __init__(self, prior_state_ref=None, smooth: bool = True,
                 close_us: int | None = None, include_raw: bool = False):
        state = _resolve_state(prior_state_ref)
        self.state_df, self.context_df = state if state is not None else (None, None)
        self.smooth = smooth
        self.close_us = close_us
        self.include_raw = include_raw

    def __call__(self, group: pd.DataFrame):
        return finalize_batch(
            group.drop(columns=["part_id"]),
            self.state_df,
            self.context_df,
            self.smooth,
            self.close_us,
            include_raw=self.include_raw,
        )


def read_transcripts(path: str, with_text: bool = False) -> ray.data.Dataset:
    """Read the transcript Parquet corpus, pruning columns at the read.

    ``text`` makes blocks heavy (SURVEY.md §7.5) — it is only loaded for the
    invariant-check path.
    """
    cols = ["conv_id", "turn_idx", "ts"] + (["role", "text", "tool"] if with_text else [])
    return ray.data.read_parquet(path, columns=cols)


def rollup_tiers(
    ds: ray.data.Dataset,
    prior_state_ref=None,
    smooth: bool = True,
    close_us: int | None = None,
    num_partitions: int = 64,
    shuffle_blocks: int | None = None,
    include_raw: bool = False,
    adaptive_noise: bool = True,
    plan=None,
) -> ray.data.Dataset:
    """transcripts Dataset -> tier rows (1m/1h/1d, FIXTURES.md F2 schema).

    Shuffle unit = conv_id hash partition (``num_partitions`` of them), not
    conversation: finalize_batch processes every conversation of a
    partition vectorized, so per-group Python overhead is O(partitions)
    while skew stays bounded by the hash (SURVEY.md §7.4). Size
    num_partitions so one partition's bucket-level partials fit a worker's
    heap (they are output-sized, not input-sized).

    The partial stream is coalesced to ``shuffle_blocks`` blocks before the
    sort-based exchange: the exchange ships O(B_in x B_out) objects, so
    keeping B small on the (already contracted) partial stream removes the
    dominant shuffle constant.
    """
    import functools

    parts = ds.map_batches(
        functools.partial(
            partial_rollup, num_partitions=num_partitions, emit_raw=include_raw,
            plan=plan,
        ),
        batch_format="pyarrow",
    )
    n_parts = plan.total if plan is not None else num_partitions
    parts = parts.repartition(shuffle_blocks or min(n_parts, 32))

    # Stateful-stage note: the smoother state IS loaded once per worker —
    # `_resolve_state` memoizes the broadcast checkpoint per process, the
    # same amortization an actor `__init__` gives. A plain function is used
    # (not the `FinalizeSmoother` actor class) because the streaming
    # executor fuses task-based map_groups with the downstream Write into
    # one operator; an actor pool breaks that fusion and re-materializes
    # the full tier output through the object store (~2x wall measured).
    def _finalize(group: pd.DataFrame):
        state = _resolve_state(prior_state_ref)
        sdf, cdf = state if state is not None else (None, None)
        return finalize_batch(
            group.drop(columns=["part_id"]), sdf, cdf, smooth, close_us,
            include_raw=include_raw, adaptive_noise=adaptive_noise,
        )

    return parts.groupby("part_id").map_groups(_finalize, batch_format="pandas")


def write_raw_tier(
    ds: ray.data.Dataset, out_dir: str, num_partitions: int = 64,
    batch_size: int | None = None,
) -> None:
    """MAP-ONLY exact raw tier writer (the 10^12-turn path).

    ``rollup_tiers(include_raw=True)`` pushes per-observation rows through
    the conv-keyed shuffle — correct, but the shuffled stream becomes
    input-sized. This writer instead:

    1. streams the bulk raw rows (turn_rate per turn, latency for gaps
       resolvable inside the block) straight from ``map_batches`` to
       Parquet — no shuffle, no materialization;
    2. shuffles ONLY the tiny need/provide boundary stream (O(convs x
       blocks)) to resolve cross-block latency gaps, writing those few
       rows alongside.

    Output = the same rows as the shuffled raw tier, in a resumable
    directory layout."""
    import numpy as np

    from ..functions.rollup import METRIC_LATENCY, METRIC_TURN_RATE
    from ..functions.shuffle import hash_combine
    from ..stages.finalize import _raw_tier_table

    def bulk(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_pandas(),
                "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            }
        ).sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)
        conv = df["conv_id"].to_numpy()
        idx = df["turn_idx"].to_numpy()
        ts = df["ts_us"].to_numpy()
        n = len(df)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
        frames = [
            pd.DataFrame(
                {"conv_id": conv, "metric": np.int8(METRIC_TURN_RATE),
                 "vsum": 1.0, "ts_us": ts}
            )
        ]
        if same_prev.any():
            gap = (ts[same_prev] - np.roll(ts, 1)[same_prev]) / 1e6
            frames.append(
                pd.DataFrame(
                    {"conv_id": conv[same_prev], "metric": np.int8(METRIC_LATENCY),
                     "vsum": gap, "ts_us": ts[same_prev]}
                )
            )
        return _raw_tier_table(pd.concat(frames, ignore_index=True))

    os.makedirs(out_dir, exist_ok=True)
    bs = {} if batch_size is None else {"batch_size": batch_size}
    ds.map_batches(bulk, batch_format="pyarrow", **bs).write_parquet(out_dir)

    # tiny boundary stream: block-edge turns only
    def boundary(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_pandas(),
                "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            }
        ).sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)
        conv = df["conv_id"].to_numpy()
        idx = df["turn_idx"].to_numpy()
        n = len(df)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
        has_next = np.zeros(n, dtype=bool)
        has_next[:-1] = same_prev[1:]
        need = (idx > 0) & ~same_prev
        provide = ~has_next
        # A row can be BOTH: a conversation contributing exactly one turn to
        # this block has no in-block predecessor (need) and no in-block
        # successor (provide). Carry independent flags so resolve() can use
        # it in both roles — folding them into one flag silently dropped the
        # successor block's latency gap.
        keep = need | provide
        out = df[keep].copy()
        out["is_need"] = need[keep]
        out["is_provide"] = provide[keep]
        return out

    def resolve(g: pd.DataFrame) -> pa.Table:
        needs = g[g["is_need"]]
        provides = g[g["is_provide"]].drop_duplicates(["conv_id", "turn_idx"])
        m = needs.merge(
            provides,
            left_on=["conv_id", needs["turn_idx"] - 1],
            right_on=["conv_id", "turn_idx"],
            suffixes=("", "_prev"),
        )
        if not len(m):
            return _raw_tier_table(
                pd.DataFrame({"conv_id": pd.Series(dtype=str),
                              "metric": pd.Series(dtype=np.int8),
                              "vsum": pd.Series(dtype=float),
                              "ts_us": pd.Series(dtype=np.int64)})
            )
        gap = (m["ts_us"] - m["ts_us_prev"]).to_numpy() / 1e6
        return _raw_tier_table(
            pd.DataFrame(
                {"conv_id": m["conv_id"].to_numpy(),
                 "metric": np.int8(METRIC_LATENCY), "vsum": gap,
                 "ts_us": m["ts_us"].to_numpy()}
            )
        )

    hash_combine(
        ds.map_batches(boundary, batch_format="pyarrow", **bs), ["conv_id"],
        resolve, num_partitions=num_partitions,
    ).write_parquet(out_dir)


def write_tiers(tiers: ray.data.Dataset, out_dir: str) -> None:
    """Write tier-partitioned Parquet (resumable layout: one dir per tier)."""
    os.makedirs(out_dir, exist_ok=True)
    tiers.write_parquet(out_dir, partition_cols=["tier"])


def tiers_to_pandas(tiers: ray.data.Dataset) -> pd.DataFrame:
    """Materialize tier rows for tests/small results (sorted, stable)."""
    df = tiers.to_pandas()
    if len(df) == 0:  # empty source (q11 class): keep the tier schema
        kinds = dict(conv_id=object, metric=object, tier=object,
                     bucket_start="datetime64[us]", count=np.int64,
                     gap_filled=bool)
        return pd.DataFrame(
            {c: pd.Series(dtype=kinds.get(c, np.float64))
             for c in TIER_OUT_COLUMNS}
        )
    for c in ("conv_id", "metric", "tier"):  # dictionary -> plain strings
        df[c] = df[c].astype(str)
    df = df[~df["metric"].str.startswith("_")]  # bookkeeping rows
    if "bucket_start" in df and not pd.api.types.is_datetime64_any_dtype(df["bucket_start"]):
        df["bucket_start"] = pd.to_datetime(df["bucket_start"])
    return df.sort_values(
        ["tier", "conv_id", "metric", "bucket_start"], ignore_index=True
    )[TIER_OUT_COLUMNS]


def cascade_stored_tier(
    tier_dir: str,
    from_width_us: int,
    to_width_us: int,
    smooth: bool = True,
) -> ray.data.Dataset:
    """Re-derive a coarser tier from a COMMITTED finer tier's Parquet —
    continuous-aggregate refresh without touching raw data (the retention
    engine's downsample path; exact because count/min/max/sum compose).

    Reads only observed buckets (count > 0), re-buckets them at
    ``to_width_us``, and re-runs the densify+smooth stage per conversation
    partition. Output schema == the tier schema.
    """
    if to_width_us % from_width_us:
        raise ValueError("coarser width must be a multiple of the finer width")
    from ..functions.rollup import (
        METRIC_LATENCY,
        METRIC_TURN_RATE,
        partition_of,
    )
    from ..stages.finalize import _densify_and_smooth_tier

    ds = ray.data.read_parquet(tier_dir)

    def to_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["count"] > 0]
        code = {"turn_rate": METRIC_TURN_RATE, "latency": METRIC_LATENCY}
        b = df["bucket_start"].astype("datetime64[us]").astype("int64") // to_width_us * to_width_us
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"].astype(str),
                "metric": df["metric"].astype(str).map(code).astype("int8"),
                "bucket_us": b,
                "count": df["count"],
                "vmin": df["min"],
                "vmax": df["max"],
                "vsum": df["sum"],
            }
        ).dropna(subset=["metric"])
        g = out.groupby(["conv_id", "metric", "bucket_us"], as_index=False).agg(
            count=("count", "sum"), vmin=("vmin", "min"),
            vmax=("vmax", "max"), vsum=("vsum", "sum"),
        )
        g["part_id"] = partition_of(g["conv_id"], 64)
        return g

    partials = ds.map_batches(to_partials, batch_format="pandas")

    tier_name = {3600_000_000: "1h", 86_400_000_000: "1d"}.get(to_width_us, "custom")

    def finalize(g: pd.DataFrame):
        g = g.drop(columns=["part_id"])
        merged = g.groupby(["conv_id", "metric", "bucket_us"], as_index=False).agg(
            count=("count", "sum"), vmin=("vmin", "min"),
            vmax=("vmax", "max"), vsum=("vsum", "sum"),
        )
        return _densify_and_smooth_tier(merged, tier_name, to_width_us, None, smooth, None)

    return partials.groupby("part_id").map_groups(finalize, batch_format="pandas")
