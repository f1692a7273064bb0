"""Property test: partial+finalize == oracle under ANY block layout.

Simulates the distributed pipeline purely locally: the transcript table is
split into arbitrary (hypothesis-chosen) batches, ``partial_rollup`` runs
per batch, the concatenated partial stream is grouped by hash partition,
and ``finalize_batch`` runs per partition — exactly the Dataset pipeline's
dataflow without Ray. Must equal the single-pass oracle for any split,
including turn_idx holes, ts ties, single-turn conversations, and
out-of-order rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ecov003_l2t_stars_ray import oracle
from ecov003_l2t_stars_ray.functions.rollup import partial_rollup, partition_of
from ecov003_l2t_stars_ray.schema import TRANSCRIPT_SCHEMA
from ecov003_l2t_stars_ray.stages.finalize import finalize_batch

BASE_US = 1_735_689_600_000_000


@st.composite
def corpus(draw):
    n_convs = draw(st.integers(1, 4))
    rows = []
    for c in range(n_convs):
        n = draw(st.integers(1, 12))
        # turn_idx with possible holes
        idx = sorted(draw(st.sets(st.integers(0, 20), min_size=n, max_size=n)))
        t = BASE_US + draw(st.integers(0, 10**9))
        for i in idx:
            t += draw(st.sampled_from([0, 1, 999_999, 60_000_000, 3_700_000_000]))
            rows.append((f"conv-{c:08d}", i, "user", f"t{c}-{i}", "", t))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = df["ts"].astype("datetime64[us]")
    # arbitrary row order
    perm = draw(st.permutations(range(len(df))))
    return df.iloc[list(perm)].reset_index(drop=True)


def _run_local_pipeline(df: pd.DataFrame, cuts: list[int], num_partitions=4):
    """partial per arbitrary batch -> group by hash partition -> finalize."""
    bounds = sorted({0, len(df), *[c % (len(df) + 1) for c in cuts]})
    parts = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a == b:
            continue
        batch = pa.Table.from_pandas(df.iloc[a:b], schema=TRANSCRIPT_SCHEMA,
                                     preserve_index=False)
        parts.append(partial_rollup(batch, num_partitions=num_partitions).to_pandas())
    allp = pd.concat(parts, ignore_index=True)
    outs = []
    for _pid, g in allp.groupby("part_id"):
        t = finalize_batch(g.drop(columns=["part_id"]), None, None, True, None)
        outs.append(t.to_pandas())
    out = pd.concat(outs, ignore_index=True)
    for c in ("conv_id", "metric", "tier"):
        out[c] = out[c].astype(str)
    out = out[~out["metric"].str.startswith("_")]  # context + checkpoint rows
    out["bucket_start"] = out["bucket_start"].astype("datetime64[us]")
    return out.sort_values(
        ["tier", "conv_id", "metric", "bucket_start"], ignore_index=True
    )


@settings(max_examples=60, deadline=None)
@given(corpus(), st.lists(st.integers(0, 10**6), max_size=6))
def test_any_split_matches_oracle(df, cuts):
    got = _run_local_pipeline(df, cuts)
    want = oracle.tier_rollup(df, smooth=True)
    assert len(got) == len(want), (len(got), len(want))
    key = ["tier", "conv_id", "metric", "bucket_start"]
    for k in key:
        assert (got[k].to_numpy() == want[k].to_numpy()).all(), k
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    assert (got["gap_filled"].to_numpy() == want["gap_filled"].to_numpy()).all()
    np.testing.assert_allclose(
        got["value"].to_numpy(), want["value"].to_numpy(), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        got["sum"].to_numpy(), want["sum"].to_numpy(), rtol=1e-9, atol=1e-12
    )
