"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

Fully vectorized numpy generation — no per-row Python loops — seeded so the
same (seed, n_convs) always yields byte-identical tables in any process.
Distribution requirements from FIXTURES.md:

- hot-conversation skew (~1% of convs carry ~half the turns) so the
  repartition/salting path is exercised;
- silent gaps > 1h (some > 1d) in ~20% of conversations so 1m/1h tiers have
  empty buckets for the gap-fill smoother;
- occasional equal ``ts`` with distinct ``turn_idx`` so ordering provably
  comes from (conv_id, turn_idx), not ts (reference analog: sorted filename
  globs define time order, ``jl:133,136``).

The reference ships no fixtures (tests are import smoke tests only,
``tests/test_import_ECOv003_L2T_STARS.py:1-2``); this module is the fixture
factory its test strategy lacks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_SCHEMA

EPOCH_US = np.int64(1735689600000000)  # 2025-01-01T00:00:00Z in microseconds
START_WINDOW_US = np.int64(7 * 24 * 3600) * 1_000_000  # conv starts in a 7-day window

_WORDS = np.array(
    [
        "plan", "query", "tool", "batch", "arrow", "ray", "rollup", "tier",
        "kalman", "state", "shuffle", "stream", "turn", "agent", "trace",
        "merge", "sort", "index", "cache", "actor", "block", "spill", "join",
        "filter", "bucket", "window", "epoch", "commit", "resume", "skew",
    ]
)
_TOOLS = np.array(["search", "python", "browser", "editor", "shell", "calc"])


def _mix(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64-style) of two int arrays."""
    with np.errstate(over="ignore"):
        x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b.astype(np.uint64) + np.uint64(k) * np.uint64(0xBF58476D1CE4E5B9)
        )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def generate_transcripts(n_convs: int = 200, seed: int = 42,
                         mean_turns: int = 50) -> pa.Table:
    """Build the transcript table sorted by (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)

    # --- conversation sizes: lognormal body + Zipf-ish hot head -------------
    sizes = np.maximum(
        2, rng.lognormal(mean=np.log(mean_turns * 0.6), sigma=0.9, size=n_convs)
    ).astype(np.int64)
    n_hot = max(1, n_convs // 100)
    hot_idx = rng.choice(n_convs, size=n_hot, replace=False)
    # scale the hot conversations so they carry roughly half of all turns
    sizes[hot_idx] = np.maximum(
        sizes[hot_idx], (sizes.sum() // n_hot) * rng.integers(1, 3, size=n_hot)
    )
    total = int(sizes.sum())

    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    turn_idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(sizes) - sizes, sizes)
    )

    # --- timestamps: conv start + cumulative lognormal gaps -----------------
    starts = EPOCH_US + rng.integers(0, START_WINDOW_US, size=n_convs)
    gaps_s = rng.lognormal(mean=np.log(20.0), sigma=1.0, size=total)
    # ties: ~1% of gaps are exactly zero (distinct turn_idx, equal ts)
    gaps_s[rng.random(total) < 0.01] = 0.0
    # silences: in ~20% of convs stretch one random gap past 1h (25% of those
    # past 1d) so coarser tiers see empty buckets
    gap_conv = rng.random(n_convs) < 0.20
    silence_at = rng.integers(1, np.maximum(2, sizes))
    silence_len = np.where(rng.random(n_convs) < 0.25, 90000.0, 4000.0)
    first_row = np.cumsum(sizes) - sizes
    sil_rows = (first_row + np.minimum(silence_at, sizes - 1))[gap_conv]
    gaps_s[sil_rows] += silence_len[gap_conv]
    gaps_us = (gaps_s * 1e6).astype(np.int64)
    gaps_us[turn_idx == 0] = 0
    ts = np.repeat(starts, sizes) + _segment_cumsum(gaps_us, sizes)

    # --- roles: user/assistant alternation with p(tool)=0.15 after assistant
    role_code = (turn_idx % 2).astype(np.int8)  # 0=user, 1=assistant
    tool_draw = _mix(conv_num, turn_idx, 7) % np.uint64(100)
    is_tool = (role_code == 1) & (tool_draw < 15)
    roles = np.array(["user", "assistant", "tool"])
    role_idx = np.where(is_tool, 2, role_code).astype(np.int64)

    # --- deterministic text: 8 vocab words keyed by (conv, turn) ------------
    word_cols = [
        _WORDS[(_mix(conv_num, turn_idx, 100 + k) % np.uint64(len(_WORDS))).astype(np.int64)]
        for k in range(8)
    ]
    # join via Arrow's compiled kernel: np.char.add is ~66 us/row on this
    # host (numpy _vec_string), which turns the 17 M-row bench corpus into
    # an hours-long generation; binary_join_element_wise emits the
    # IDENTICAL strings at memory bandwidth
    text = pc.binary_join_element_wise(
        *[pa.array(col, pa.string()) for col in word_cols], " "
    )

    tool_name = np.where(
        is_tool,
        _TOOLS[(_mix(conv_num, turn_idx, 3) % np.uint64(len(_TOOLS))).astype(np.int64)],
        "",
    )

    # "conv-%08d" via Arrow kernels (np.char.zfill/add are _vec_string too)
    conv_id = pc.binary_join_element_wise(
        "conv-",
        pc.utf8_lpad(pc.cast(pa.array(conv_num), pa.string()), width=8,
                     padding="0"),
        "",
    )

    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx.astype(np.int32), pa.int32()),
            "role": pa.array(roles[role_idx], pa.string()),
            "text": text,
            "tool": pa.array(tool_name, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def _segment_cumsum(values: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment boundary (vectorized)."""
    cs = np.cumsum(values)
    first = np.cumsum(sizes) - sizes
    offsets = np.repeat(cs[first] - values[first], sizes)
    return cs - offsets


def write_corpus(out_dir: str, n_convs: int = 200, seed: int = 42,
                 mean_turns: int = 50, n_shards: int = 8) -> list[str]:
    """Write the corpus as shard-partitioned Parquet (resumable layout).

    One file per conv_id-hash shard, rows sorted by (conv_id, turn_idx)
    inside each shard — the layout a 100 TB corpus would use so that a rerun
    can skip finished shards (reference analog: per-tile staging dirs,
    ``generate_input_staging_directory.py:5-24``).
    """
    table = generate_transcripts(n_convs=n_convs, seed=seed, mean_turns=mean_turns)
    conv_num = pc.cast(
        pc.utf8_slice_codeunits(table["conv_id"], 5), pa.int64()
    ).to_numpy()
    shard = conv_num % n_shards
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(n_shards):
        sub = table.filter(pa.array(shard == s))
        path = os.path.join(out_dir, f"shard={s:04d}.parquet")
        pq.write_table(sub, path)
        paths.append(path)
    return paths
