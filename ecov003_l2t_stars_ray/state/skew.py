"""Manifest-driven skew detection feeding the epoch partition plan.

The rollup shuffle keys on ``hash(conv_id) % num_partitions``; a skewed
corpus (one tenant's conversations dominating) can make one partition's
group arbitrarily larger than the rest, so its finalize task becomes the
straggler and its bucket-level partials the memory high-water mark. The
north rule's lineage manifest already commits per-(partition, tier, epoch)
``row_count`` — this module turns those committed counts into next epoch's
partitioning:

- ``plan_from_counts``: per-base-partition row counts -> ``PartitionPlan``
  with a *fanout* for each hot partition (count > skew_factor x median).
- ``PartitionPlan.assign``: two-level hash. Every conv_id first hashes into
  the ``base`` space exactly as ``partition_of`` does; a conv landing in a
  hot partition is then sub-split by an independent slice of the same hash
  (``h // base % k``), so one conversation's rows always stay together
  (the sequential smoother requires it) while the hot partition's
  conversations spread over ``k`` sub-partitions.

Cold partitions keep their original ids and sub 0 of a hot partition keeps
the hot id, so the trivial plan (no fanout) is bit-identical to plain
``partition_of`` — existing manifests, resume sets, and tests are
unaffected. A single conversation hotter than everything else cannot be
split further (correctness), but its group memory is bounded by its
*bucket count*, not its turn count — the map-side combiner contracts to
bucket level before the shuffle (``functions/rollup.py:69``).

Reference analog: the reference statically shards by tile
(``L2T_STARS.py:239-266``, one Julia worker per tile) and has no answer to
a hot tile; this is the dynamic-rebalance step a 100 TB corpus needs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class PartitionPlan:
    """Two-level conv_id -> partition assignment.

    ``base``: size of the first-level hash space (== the epoch's
    ``num_partitions`` knob). ``fanout``: {hot base pid -> k >= 2}. The
    extended id space is contiguous ``0 .. total-1``: cold pids keep their
    base id, hot pid ``p`` owns ``p`` (sub 0) plus ``k-1`` ids appended
    after ``base`` in sorted-pid order.
    """

    def __init__(self, base: int, fanout: dict[int, int] | None = None):
        if base <= 0:
            raise ValueError("base must be positive")
        self.base = int(base)
        self.fanout = {
            int(p): int(k) for p, k in sorted((fanout or {}).items()) if int(k) >= 2
        }
        for p in self.fanout:
            if not (0 <= p < self.base):
                raise ValueError(f"hot pid {p} outside base space {self.base}")
        # extra-id layout: hot pid p's subs 1..k-1 -> base+off_p .. base+off_p+k-2
        self._extra_start: dict[int, int] = {}
        off = 0
        for p, k in self.fanout.items():
            self._extra_start[p] = self.base + off
            off += k - 1
        self.total = self.base + off

    def assign(self, conv: pd.Series) -> np.ndarray:
        """Vectorized conv_id -> extended partition id (int32).

        Identical hash as ``functions.rollup.partition_of`` so the trivial
        plan reproduces it exactly.
        """
        h = pd.util.hash_pandas_object(conv.astype("object"), index=False).to_numpy()
        pid = (h % np.uint64(self.base)).astype(np.int32)
        for p, k in self.fanout.items():  # few hot pids; vectorized per pid
            mask = pid == p
            if mask.any():
                sub = ((h[mask] // np.uint64(self.base)) % np.uint64(k)).astype(
                    np.int32
                )
                ext = np.where(sub == 0, p, self._extra_start[p] + sub - 1)
                pid[mask] = ext
        return pid

    def base_of(self, extended: int) -> int:
        """Reverse map: extended partition id -> base pid."""
        if extended < self.base:
            return extended
        for p, k in self.fanout.items():
            start = self._extra_start[p]
            if start <= extended < start + k - 1:
                return p
        raise ValueError(f"extended id {extended} outside plan (total={self.total})")

    def to_json(self) -> dict:
        return {"base": self.base, "fanout": {str(p): k for p, k in self.fanout.items()}}

    @classmethod
    def from_json(cls, obj: dict | None) -> "PartitionPlan | None":
        if not obj:
            return None
        return cls(obj["base"], {int(p): k for p, k in obj.get("fanout", {}).items()})

    def __repr__(self) -> str:  # pragma: no cover
        return f"PartitionPlan(base={self.base}, fanout={self.fanout})"


def plan_from_counts(
    counts: dict[int, int],
    base: int,
    skew_factor: float = 4.0,
    max_fanout: int = 16,
) -> PartitionPlan:
    """Per-base-pid row counts -> next epoch's plan.

    A pid is hot when its count exceeds ``skew_factor`` x the median of the
    nonzero counts; its fanout targets median-sized sub-partitions
    (``ceil(count / median)``), capped at ``max_fanout``.
    """
    nonzero = [c for c in counts.values() if c > 0]
    if not nonzero:
        return PartitionPlan(base)
    med = float(np.median(nonzero))
    if med <= 0:
        return PartitionPlan(base)
    fanout = {}
    for p, c in counts.items():
        if 0 <= p < base and c > skew_factor * med:
            fanout[p] = min(max_fanout, max(2, math.ceil(c / med)))
    return PartitionPlan(base, fanout)


def plan_from_manifest(
    manifest_df: pd.DataFrame,
    epoch: int,
    base: int,
    prev_plan: PartitionPlan | None = None,
    skew_factor: float = 4.0,
    max_fanout: int = 16,
) -> PartitionPlan:
    """Committed manifest rows -> next epoch's plan.

    Sums ``row_count`` across the epoch's tier cells per partition (the
    bookkeeping ``tier == "all"`` cells carry no rows), reverse-maps
    extended ids through the epoch's own plan so counts land on *base*
    pids, then applies the hot-pid rule. No manifest history (cold start)
    -> trivial plan.
    """
    if manifest_df is None or not len(manifest_df):
        return PartitionPlan(base)
    df = manifest_df[(manifest_df["epoch"] == epoch) & (manifest_df["tier"] != "all")]
    if not len(df):
        return PartitionPlan(base)
    prev = prev_plan or PartitionPlan(base)
    counts: dict[int, int] = {}
    for pid, rows in df.groupby("partition_id")["row_count"].sum().items():
        try:
            bp = prev.base_of(int(pid)) % base  # tolerate a changed base knob
        except ValueError:
            bp = int(pid) % base
        counts[bp] = counts.get(bp, 0) + int(rows)
    return plan_from_counts(counts, base, skew_factor, max_fanout)
