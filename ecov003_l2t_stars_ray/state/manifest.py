"""Lineage manifest: atomic per-(partition, tier, epoch) commit records.

The reference's idempotency is file-exists skip at every granularity
(``L2T_STARS.py:134-138``, ``VNP43NRT.py:390-397``) and its download
integrity is temp-file + verify + rename (``LPDAACDataPool.py:381-433``).
This module makes that transactional: each committed cell is ONE small
Parquet file written via tmp + ``os.replace`` (atomic on POSIX), so a
restarted job reads the manifest and skips exactly the committed cells —
never a half-written one.

Cell record = MANIFEST_SCHEMA (FIXTURES.md F4): partition_id, tier, epoch,
input_fragments, watermark, row_count, committed_at, output_path.
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import MANIFEST_SCHEMA


class Manifest:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _cell_path(self, partition_id: int, tier: str, epoch: int) -> str:
        return os.path.join(self.root, f"cell-p{partition_id:05d}-{tier}-e{epoch:05d}.parquet")

    def commit(
        self,
        partition_id: int,
        tier: str,
        epoch: int,
        input_fragments: list[str],
        watermark_us: int,
        row_count: int,
        output_path: str,
        late_turns: int = 0,
    ) -> None:
        """Atomically record one committed (partition, tier, epoch) cell.

        ``late_turns``: rows of this epoch's NEW fragments that landed in
        this partition but were older than the committed horizon (dropped
        deterministically by the bucket filter) — the per-partition
        late-data metric of the north rule's lineage records."""
        table = pa.table(
            {
                "partition_id": pa.array([partition_id], pa.int32()),
                "tier": pa.array([tier], pa.string()),
                "epoch": pa.array([epoch], pa.int32()),
                "input_fragments": pa.array([input_fragments], pa.list_(pa.string())),
                "watermark": pa.array([watermark_us], pa.timestamp("us")),
                "row_count": pa.array([row_count], pa.int64()),
                "late_turns": pa.array([late_turns], pa.int64()),
                "committed_at": pa.array(
                    [int(datetime.now(timezone.utc).timestamp() * 1e6)],
                    pa.timestamp("us"),
                ),
                "output_path": pa.array([output_path], pa.string()),
            },
            schema=MANIFEST_SCHEMA,
        )
        final = self._cell_path(partition_id, tier, epoch)
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)

    def committed(self, epoch: int | None = None) -> set[tuple[int, str, int]]:
        """Set of committed (partition_id, tier, epoch) cells."""
        cells = set()
        for path in glob.glob(os.path.join(self.root, "cell-*.parquet")):
            name = os.path.basename(path)[len("cell-"):-len(".parquet")]
            p, tier, e = name.split("-")
            cell = (int(p[1:]), tier, int(e[1:]))
            if epoch is None or cell[2] == epoch:
                cells.add(cell)
        return cells

    def load(self) -> pd.DataFrame:
        paths = sorted(glob.glob(os.path.join(self.root, "cell-*.parquet")))
        if not paths:
            return MANIFEST_SCHEMA.empty_table().to_pandas()
        return pa.concat_tables(pq.read_table(p) for p in paths).to_pandas()
