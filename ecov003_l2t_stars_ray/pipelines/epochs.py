"""Incremental epoch runner: watermark close rule + state chain + resume.

Epoch model (the reference's incremental-ingest semantics made explicit):

- Epoch N consumes its NEW input fragments plus any fragment flagged
  "pending" by epoch N-1 (re-read whole; bucket-level dedup below).
- Close rule: watermark_N = max ts across the epoch's input; buckets
  ending after ``watermark_N - GIVEUP_BUCKETS x 1m`` stay OPEN — their
  turns are deferred (their fragments flagged pending) and re-processed
  next epoch. Analog of VIIRS_GIVEUP_DAYS: data younger than the horizon
  => wait; older => proceed (``constants.py:27``,
  ``generate_STARS_inputs.py:220-231``).
- Prior state (epoch N-1 checkpoint) makes re-reads idempotent: finalize
  drops buckets <= the per-series ``last_bucket``, so re-processing a
  pending fragment never double-counts committed buckets — and the re-read
  rows still serve as latency predecessors for deferred turns (reference
  analog: HLS window start = prior_date + 1 day, ``L2T_STARS.py:327-335``).
- Late data older than the committed horizon is dropped deterministically
  by the same bucket filter.
- Resume: every (partition, tier) cell commits to the lineage manifest
  after its Parquet lands; a restarted epoch skips committed partitions.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..schema import DEFAULT_NUM_PARTITIONS, GIVEUP_BUCKETS, TIERS, US_PER_MIN
from ..state.checkpoint import (
    derive_state,
    derive_state_from_dirs,
    load_state,
    save_state,
    state_path,
)
from ..state.manifest import Manifest
from ..state.skew import PartitionPlan, plan_from_manifest
from .rollup_pipeline import read_transcripts, rollup_tiers


from ..functions.rollup import partition_of  # noqa: E402  (re-export)


def _epoch_meta_path(root: str, epoch: int) -> str:
    return os.path.join(root, "manifest", f"epoch-e{epoch:05d}.json")


class FragmentIntegrityError(RuntimeError):
    """A carried (pending) input fragment's CRC no longer matches the value
    recorded when the previous epoch deferred it — the input changed under
    us, so resuming would silently mix old committed buckets with new data.
    Reference analog: checksum-verified staging with delete-and-refetch on
    mismatch (``LPDAACDataPool.py:368-430``)."""


@ray.remote
def _crc_task(path: str) -> int:
    from ..functions.checksum import crc32_file

    return crc32_file(path)


def _fragment_crcs(
    fragments: list[str], prev_crcs: dict[str, int], carried: set[str]
) -> dict[str, int]:
    """CRC-32 every input fragment via parallel Ray tasks (never a serial
    full-file read loop on the driver), then verify carried fragments
    against the CRCs the previous epoch recorded for them."""
    crcs = dict(zip(fragments, ray.get([_crc_task.remote(p) for p in fragments])))
    for p in carried:
        want = prev_crcs.get(p)
        if want is not None and crcs.get(p) != want:
            raise FragmentIntegrityError(
                f"pending fragment changed between epochs: {p} "
                f"(crc32 {crcs.get(p):#010x} != recorded {want:#010x})"
            )
    return crcs


def run_epoch(
    input_fragments: list[str],
    root: str,
    epoch: int,
    num_partitions: int = 8,
    giveup_buckets: int = GIVEUP_BUCKETS,
    smooth: bool = True,
    auto_skew: bool = False,
    skew_factor: float = 4.0,
) -> dict:
    """Process one epoch; returns a summary dict (watermark, rows, cells).

    ``auto_skew``: derive this epoch's partition plan from the PREVIOUS
    epoch's committed manifest row counts (``state.skew``): a base
    partition whose rows exceed ``skew_factor`` x the median is sub-split
    across extra partitions for this epoch, so per-group memory and
    straggler wall stay bounded under hot-tenant skew. The plan is
    recorded in the epoch meta so the next detection can reverse-map
    extended partition ids."""
    manifest = Manifest(os.path.join(root, "manifest"))
    state_root = os.path.join(root, "state")
    out_root = os.path.join(root, "tiers", f"epoch={epoch:05d}")

    # fragments = new + pending carried over from the previous epoch
    prev_meta = _epoch_meta_path(root, epoch - 1)
    carried: list[str] = []
    prev_close_us = prev_wm_us = None
    if os.path.exists(prev_meta):
        with open(prev_meta) as f:
            _pm = json.load(f)
        carried = _pm.get("pending_fragments", [])
        prev_close_us = _pm.get("close_us")
        prev_wm_us = _pm.get("watermark_us")
        prev_crcs = _pm.get("fragment_crc32", {})
        prev_plan = PartitionPlan.from_json(_pm.get("partition_plan"))
    else:
        prev_crcs = {}
        prev_plan = None

    if auto_skew:
        plan = plan_from_manifest(
            manifest.load(), epoch - 1, num_partitions, prev_plan,
            skew_factor=skew_factor,
        )
    else:
        plan = PartitionPlan(num_partitions)
    n_parts = plan.total

    fragments = sorted(set(input_fragments) | set(carried))
    if not fragments:  # nothing new and nothing pending: trivially complete
        return {"epoch": epoch, "skipped": True, "watermark_us": None,
                "close_us": None, "cells": 0, "rows": 0, "late_turns": 0,
                "pending_fragments": []}
    # integrity gate first (reference: verify checksum BEFORE using a staged
    # file): CRC every fragment in parallel; a carried fragment whose CRC
    # drifted from the recorded value aborts the epoch before any compute.
    fragment_crcs = _fragment_crcs(fragments, prev_crcs, set(carried))

    prior_ref = None
    prior = load_state(state_root, epoch - 1)
    if prior is not None:
        prior_ref = ray.put(prior)

    ds = read_transcripts(fragments)

    # watermark: cheap single-column scan (ts only)
    watermark_us = int(
        pd.Timestamp(ray.data.read_parquet(fragments, columns=["ts"]).max("ts")).value
        // 1000
    )
    # close rule: buckets ending after this stay open (per tier, enforced in
    # finalize); giveup_buckets == 0 means flush — everything closes.
    from ..schema import US_PER_DAY

    close_us = (
        None if giveup_buckets == 0 else watermark_us - giveup_buckets * US_PER_MIN
    )

    # fragments holding rows in a still-open DAY bucket (the coarsest tier)
    # must be re-read next epoch; parquet footer stats only, no data read.
    open_day_start = (
        (watermark_us if close_us is None else close_us) // US_PER_DAY * US_PER_DAY
    )
    if close_us is None:
        pending_fragments = []
    elif len(fragments) <= 64:
        pending_fragments = [
            p for p in fragments if _fragment_max_ts_us(p) >= open_day_start
        ]
    else:
        # many fragments: footer scans fan out as Ray tasks instead of a
        # serial driver loop
        @ray.remote
        def _max_ts(path: str) -> int:
            return _fragment_max_ts_us(path)

        maxes = ray.get([_max_ts.remote(p) for p in fragments])
        pending_fragments = [
            p for p, m in zip(fragments, maxes) if m >= open_day_start
        ]

    # late-arrival metric (provenance-aware): rows in NEW fragments older
    # than the previous epoch's committed horizon minus a one-day grace —
    # these land in already-committed buckets and are dropped by the
    # bucket filter (north-star "per-partition lineage + metrics";
    # reference analog: latency-vs-failure distinction,
    # ``generate_STARS_inputs.py:220-231``). Row-group stats prune the scan.
    late_turns = 0
    late_by_partition: dict[int, int] = {}
    prev_horizon = prev_close_us if prev_close_us is not None else prev_wm_us
    new_frags = sorted(set(input_fragments) - set(carried))
    if prev_horizon is not None and new_frags:
        cutoff = pd.Timestamp(int(prev_horizon) - US_PER_DAY, unit="us")

        def _late_partial(t: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            t = t.filter(pc.less(t["ts"], pa.scalar(cutoff)))
            if t.num_rows == 0:
                return pd.DataFrame({"pid": pd.Series(dtype="int32"),
                                     "n": pd.Series(dtype="int64")})
            pid = plan.assign(t["conv_id"].to_pandas())
            vc = pd.Series(pid).value_counts()
            return pd.DataFrame({"pid": vc.index.to_numpy(dtype=np.int32),
                                 "n": vc.to_numpy(dtype=np.int64)})

        late_df = (
            ray.data.read_parquet(new_frags, columns=["conv_id", "ts"])
            .map_batches(_late_partial, batch_format="pyarrow")
            .to_pandas()
        )
        if len(late_df):
            agg = late_df.groupby("pid")["n"].sum()
            late_by_partition = {int(k): int(v) for k, v in agg.items()}
        late_turns = int(sum(late_by_partition.values()))

    committed = manifest.committed(epoch)
    done_parts = {p for (p, tier, _e) in committed if tier == "all"}

    if len(done_parts) == n_parts and os.path.exists(
        state_path(state_root, epoch)
    ):
        return {"epoch": epoch, "skipped": True, "watermark_us": watermark_us,
                "close_us": close_us, "cells": 0, "rows": 0,
                "pending_fragments": pending_fragments}

    # crash hygiene: clear output dirs of partitions whose cells never
    # committed (half-written Parquet from an interrupted attempt), then
    # recompute only those partitions (reference analog: delete-and-refetch
    # of corrupted downloads, ``VNP09GA.py:158-165``)
    import shutil

    for d in glob.glob(os.path.join(out_root, "tier=*", "partition_id=*")):
        if int(d.rsplit("=", 1)[1]) not in done_parts:
            shutil.rmtree(d, ignore_errors=True)

    if done_parts:
        skip = np.array(sorted(done_parts))

        def _skip_done(t: pa.Table) -> pa.Table:
            part = plan.assign(t["conv_id"].to_pandas())
            return t.filter(pa.array(~np.isin(part, skip)))

        ds = ds.map_batches(_skip_done, batch_format="pyarrow")

    tiers = rollup_tiers(
        ds, prior_state_ref=prior_ref, smooth=smooth, close_us=close_us,
        num_partitions=num_partitions, plan=plan,
    )

    # stay in Arrow: Ray's partitioned write re-infers schema from pandas
    # blocks and turns all-NaN float columns into null-typed parquet
    def _add_partition(t: pa.Table) -> pa.Table:
        pid = plan.assign(t["conv_id"].to_pandas())
        return t.append_column("partition_id", pa.array(pid))

    tiers = tiers.map_batches(_add_partition, batch_format="pyarrow")
    os.makedirs(out_root, exist_ok=True)
    tiers.write_parquet(out_root, partition_cols=["tier", "partition_id"])

    # commit cells from written parquet footers (no second pipeline pass)
    n_cells = 0
    total_rows = 0
    for tier in TIERS:
        for part_dir in sorted(glob.glob(os.path.join(out_root, f"tier={tier}", "partition_id=*"))):
            pid = int(part_dir.rsplit("=", 1)[1])
            rows = pads.dataset(part_dir).count_rows()
            manifest.commit(pid, tier, epoch, fragments, watermark_us, rows, part_dir)
            n_cells += 1
            total_rows += rows
        # also mark partition-complete cells for resume bookkeeping
    for pid in range(n_parts):
        # the per-partition late-drop metric rides the partition-complete
        # cell: it commits even when every late row of the partition was
        # dropped and no tier output dir exists
        manifest.commit(pid, "all", epoch, fragments, watermark_us, 0, out_root,
                        late_turns=late_by_partition.get(pid, 0))

    # state checkpoint: per-cell streaming reduction over this epoch's tier
    # output (never materializes the whole epoch on the driver)
    new_state = derive_state_from_dirs(out_root, epoch)
    if prior is not None:
        prior_df = pd.DataFrame(
            [
                {
                    "conv_id": c, "metric": m, "tier": t,
                    "mean": v[0], "sd": float(np.sqrt(v[1])),
                    "bias_mean": v[3], "bias_sd": float(np.sqrt(v[5])),
                    "bias_cov": v[4], "obs_var": v[6],
                    "spin_seen": np.int32(v[7]), "spin_n": np.int32(v[8]),
                    "spin_s1": v[9], "spin_s2": v[10],
                    "last_bucket": pd.Timestamp(v[2], unit="us"),
                    "epoch": np.int32(epoch),
                }
                for (c, m, t), v in prior.items()
            ]
        )
        # prune stale context rows: a conv processed this epoch re-derives
        # its full context (last turn + still-needed predecessors), so its
        # prior "_context*" keys must not survive the merge — otherwise
        # per-turn carry keys accumulate forever
        processed = set(new_state["conv_id"].astype(str))
        stale_ctx = prior_df["metric"].str.startswith("_context") & prior_df[
            "conv_id"
        ].isin(processed)
        new_state = (
            pd.concat([prior_df[~stale_ctx], new_state], ignore_index=True)
            .sort_values("last_bucket")
            .groupby(["conv_id", "metric", "tier"], sort=True)
            .tail(1)
            .reset_index(drop=True)
        )
    save_state(new_state, state_root, epoch)

    os.makedirs(os.path.dirname(_epoch_meta_path(root, epoch)), exist_ok=True)
    with open(_epoch_meta_path(root, epoch), "w") as f:
        json.dump(
            {"epoch": epoch, "watermark_us": watermark_us, "close_us": close_us,
             "pending_fragments": pending_fragments, "rows": total_rows,
             "late_turns": late_turns, "fragment_crc32": fragment_crcs,
             "partition_plan": plan.to_json()},
            f,
        )
    return {
        "epoch": epoch,
        "watermark_us": watermark_us,
        "close_us": close_us,
        "cells": n_cells,
        "rows": total_rows,
        "late_turns": late_turns,
        "pending_fragments": pending_fragments,
    }


def _fragment_max_ts_us(path: str) -> int:
    """Max ts from parquet row-group statistics (no data read).

    When footer stats are unavailable for ANY row group (or the ts column
    is missing), fall back to scanning the fragment's ts column — never
    return a sentinel that would silently exclude the fragment from the
    pending set (rows in still-open buckets would be lost)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    best = -(1 << 62)
    complete = "ts" in names
    if complete:
        col = names["ts"]
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col).statistics
            if stats is None or not stats.has_min_max:
                complete = False
                break
            ts = int(pd.Timestamp(stats.max).value // 1000)
            best = max(best, ts)
    if not complete:
        t = pq.read_table(path, columns=["ts"])  # single-column scan fallback
        if t.num_rows == 0:
            return -(1 << 62)  # empty fragment: never pending
        mx = pc.max(t["ts"].cast(pa.timestamp("us"))).as_py()
        best = int(pd.Timestamp(mx).value // 1000)
    return best


def read_tiers(root: str, epochs: list[int]) -> pd.DataFrame:
    """Concatenate committed tier output across epochs (small results)."""
    frames = []
    for e in epochs:
        d = os.path.join(root, "tiers", f"epoch={e:05d}")
        if os.path.isdir(d):
            frames.append(pads.dataset(d, partitioning="hive").to_table().to_pandas())
    if not frames:
        return pd.DataFrame()
    df = pd.concat(frames, ignore_index=True)
    for c in ("conv_id", "metric", "tier"):
        if c in df:
            df[c] = df[c].astype(str)
    return df
