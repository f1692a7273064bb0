"""Product assembly: consolidate committed epochs into one tier product.

The S7 analog (``process_STARS_product.py:383-408``): gather the committed
per-epoch tier cells, validate them (the ``BlankOutput`` gate,
``process_STARS_product.py:369-380`` — an empty tier aborts assembly),
compact them into one tier-partitioned product directory, and emit a
summary manifest (the metadata/browse analog). Also serves as compaction:
many small per-epoch cell files become one consolidated file set per tier.
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import ray.data

from ..schema import TIERS


class BlankProductError(RuntimeError):
    """A required tier produced zero rows (BlankOutput analog)."""


def assemble_product(
    root: str,
    epochs: list[int],
    out_dir: str,
    require_tiers: tuple[str, ...] = tuple(TIERS),
) -> dict:
    """Committed epochs -> consolidated product at ``out_dir``.

    Returns the summary dict (also written to ``out_dir/summary.json``).
    Raises :class:`BlankProductError` if a required tier is empty.
    """
    dirs = []
    for e in epochs:
        d = os.path.join(root, "tiers", f"epoch={e:05d}")
        if os.path.isdir(d):
            dirs.append(d)
    if not dirs:
        raise BlankProductError(f"no committed epochs under {root}")

    paths = sorted(
        p for d in dirs for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )
    ds = ray.data.read_parquet(paths)

    def clean(t):
        # Arrow-native filter (a pandas hop would let the partitioned
        # writer re-infer all-NaN float columns as null-typed)
        import pyarrow as _pa
        import pyarrow.compute as pc

        m = pc.cast(t["metric"], _pa.string())
        return t.filter(pc.invert(pc.starts_with(m, "_")))

    ds = ds.map_batches(clean, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=["tier"])

    # summary + blank-output validation from the written product
    import pyarrow.dataset as pads

    counts: dict[str, int] = {}
    for tier_dir in sorted(glob.glob(os.path.join(out_dir, "tier=*"))):
        tier = tier_dir.rsplit("=", 1)[1]
        counts[tier] = pads.dataset(tier_dir).count_rows()
    missing = [t for t in require_tiers if counts.get(t, 0) == 0]
    if missing:
        raise BlankProductError(f"blank tiers in product: {missing}")

    summary = {"epochs": epochs, "tier_rows": counts, "output": out_dir}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary
