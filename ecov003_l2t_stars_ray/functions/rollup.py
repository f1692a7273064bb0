"""Per-batch partial rollup (the map-side combiner).

Scale design: the raw transcript stream is contracted to per-(conv_id,
1m-bucket) partial aggregates *inside* ``map_batches`` before the single
conv_id-keyed shuffle — so the wide step moves bucket-level partials, not
raw turns. This is the partial/combiner pattern the reference never needed
(its tiles are pre-partitioned files) but a 10^12-turn corpus requires.

Cross-block latency resolution: ``latency = ts - ts(turn_idx - 1)`` needs
the predecessor turn, which may live in another block. Rows whose
predecessor is present in the same batch (contiguous ``turn_idx``) are
resolved locally and folded into the partials; the others are emitted as
tiny ``need``/``provide`` boundary records and resolved inside the
conv-keyed group stage. With conv-clustered input layout the boundary
stream is O(#convs x #blocks); with fully scrambled input it degrades
gracefully toward the plain groupby path.

Reference analog: the daily cube construction + per-day observation counts
(``process_ECOSTRESS_data_fusion_distributed_bias.jl:157-209,262``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import US_PER_MIN

KIND_PARTIAL = 0
KIND_NEED = 1
KIND_PROVIDE = 2
KIND_RAW = 3  # opt-in per-observation rows for the exact raw tier

#: Intermediate (pre-shuffle) schema. KIND_PARTIAL rows carry BOTH metrics
#: of a (conv, 1m-bucket) in one row (tr_count = turn_rate count;
#: lat_count + vmin/vmax/vsum = latency aggregate) — half the shuffled
#: rows of a per-metric layout. ``metric`` (0=turn_rate, 1=latency) is
#: used only by KIND_RAW per-observation rows.
PARTIAL_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("conv_id", pa.string()),
        ("kind", pa.int8()),
        ("metric", pa.int8()),
        ("bucket_us", pa.int64()),
        ("tr_count", pa.int64()),
        ("lat_count", pa.int64()),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
        ("vsum", pa.float64()),
        ("turn_idx", pa.int32()),
        ("ts_us", pa.int64()),
    ]
)

METRIC_TURN_RATE = 0
METRIC_LATENCY = 1
METRIC_NAMES = {METRIC_TURN_RATE: "turn_rate", METRIC_LATENCY: "latency"}


def partition_of(conv: pd.Series, num_partitions: int) -> np.ndarray:
    """Deterministic conv_id -> hash partition (stable across processes;
    pandas siphash with its fixed default key, PYTHONHASHSEED-independent)."""
    h = pd.util.hash_pandas_object(conv.astype("object"), index=False).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int32)


def partial_rollup(
    batch: pa.Table, num_partitions: int = 64, emit_raw: bool = False, plan=None
) -> pa.Table:
    """map_batches(fn, batch_format="pyarrow") combiner.

    Input columns: conv_id, turn_idx, ts. Output: PARTIAL_SCHEMA rows —
    per-(conv, 1m-bucket) partial aggregates for both metrics plus
    need/provide boundary records for cross-block latencies, each tagged
    with its conv_id hash partition (the shuffle key).

    ``emit_raw``: additionally emit one KIND_RAW row per observation
    (turn_rate per turn, latency per resolved gap) so finalize can write
    the exact per-turn raw tier. OPT-IN: this makes the shuffled stream
    input-sized — at 10^12-turn scale write the raw tier via a map-only
    pass instead and keep this for test/parity runs.
    """
    if batch.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    df = pd.DataFrame(
        {
            "conv_id": batch["conv_id"].to_pandas(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            # normalize units first: input files may carry ns or s
            # timestamps (pandas writes ns by default)
            "ts_us": batch["ts"]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False),
        }
    )
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)

    conv = df["conv_id"].to_numpy()
    idx = df["turn_idx"].to_numpy()
    ts = df["ts_us"].to_numpy()
    n = len(df)

    same_prev = np.zeros(n, dtype=bool)
    same_prev[1:] = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
    has_next = np.zeros(n, dtype=bool)
    has_next[:-1] = same_prev[1:]

    bucket = ts // US_PER_MIN * US_PER_MIN

    out: list[pd.DataFrame] = []

    # merged per-(conv, bucket) partials: turn_rate count + latency
    # aggregate in ONE row / ONE groupby (latency NaN where the gap is not
    # resolvable in-batch — pandas count/min/max/sum skip NaN)
    gap = np.full(n, np.nan)
    if same_prev.any():
        gap[same_prev] = (ts[same_prev] - np.roll(ts, 1)[same_prev]) / 1e6
    g = (
        pd.DataFrame({"conv_id": conv, "bucket_us": bucket, "lat": gap})
        .groupby(["conv_id", "bucket_us"], sort=False)["lat"]
        .agg(tr="size", ln="count", vmin="min", vmax="max", vsum="sum")
        .reset_index()
    )
    out.append(
        pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "kind": KIND_PARTIAL,
                "metric": np.int8(-1),
                "bucket_us": g["bucket_us"],
                "tr_count": g["tr"].astype(np.int64),
                "lat_count": g["ln"].astype(np.int64),
                "vmin": g["vmin"],
                "vmax": g["vmax"],
                "vsum": g["vsum"],
                "turn_idx": np.int32(-1),
                "ts_us": np.int64(0),
            }
        )
    )

    if emit_raw:
        raw_frames = [
            pd.DataFrame(
                {"conv_id": conv, "kind": np.int8(KIND_RAW),
                 "metric": np.int8(METRIC_TURN_RATE), "bucket_us": ts,
                 "tr_count": np.int64(1), "lat_count": np.int64(0),
                 "vmin": 1.0, "vmax": 1.0, "vsum": 1.0,
                 "turn_idx": idx.astype(np.int32), "ts_us": ts}
            )
        ]
        if same_prev.any():
            gap_r = (ts[same_prev] - np.roll(ts, 1)[same_prev]) / 1e6
            raw_frames.append(
                pd.DataFrame(
                    {"conv_id": conv[same_prev], "kind": np.int8(KIND_RAW),
                     "metric": np.int8(METRIC_LATENCY), "bucket_us": ts[same_prev],
                     "tr_count": np.int64(1), "lat_count": np.int64(0),
                     "vmin": gap_r, "vmax": gap_r,
                     "vsum": gap_r, "turn_idx": idx[same_prev].astype(np.int32),
                     "ts_us": ts[same_prev]}
                )
            )
        out.extend(raw_frames)

    # boundary records for cross-block resolution
    need = (idx > 0) & ~same_prev
    for mask, kind in ((need, KIND_NEED), (~has_next, KIND_PROVIDE)):
        if mask.any():
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[mask],
                        "kind": np.int8(kind),
                        "metric": np.int8(-1),
                        "bucket_us": np.int64(0),
                        "tr_count": np.int64(0),
                        "lat_count": np.int64(0),
                        "vmin": np.nan,
                        "vmax": np.nan,
                        "vsum": np.nan,
                        "turn_idx": idx[mask].astype(np.int32),
                        "ts_us": ts[mask],
                    }
                )
            )

    result = pd.concat(out, ignore_index=True)
    # ``plan`` (state.skew.PartitionPlan) sub-splits manifest-detected hot
    # partitions; a None/trivial plan is bit-identical to partition_of.
    pid = (
        plan.assign(result["conv_id"])
        if plan is not None
        else partition_of(result["conv_id"], num_partitions)
    )
    result.insert(0, "part_id", pid)
    return pa.Table.from_pandas(result, schema=PARTIAL_SCHEMA, preserve_index=False)
