"""Partitioned hash-combine: the engine's generic distributed aggregation.

``groupby(key).aggregate(...)`` in this Ray version pays a large per-block
constant in its sort-based Aggregate operator; the engine instead uses the
same shape as its flagship pipeline everywhere:

    map_batches(partial combine)            # map-side, vectorized
    -> add __pid = hash(keys) % P           # one int key
    -> groupby(__pid).map_groups(combine)   # P vectorized combines

The shuffle moves pre-combined partials keyed by a single int; each of the
P group calls combines ALL keys of its partition with one pandas groupby.
Skew is bounded by the hash; P is the parallelism/memory knob (a
partition's partials must fit one worker's heap).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data


def hash_keys(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic per-row uint64 hash of the key columns."""
    return pd.util.hash_pandas_object(df[keys], index=False).to_numpy()


def hash_combine(
    partials: ray.data.Dataset,
    keys: list[str],
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distribute ``combine_fn`` (a vectorized pandas reducer over ``keys``)
    across ``num_partitions`` hash partitions of the partial stream."""

    def _add_pid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__pid"] = (hash_keys(df, keys) % np.uint64(num_partitions)).astype(np.int32)
        return df

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(g.drop(columns="__pid"))

    return (
        partials.map_batches(_add_pid, batch_format="pandas")
        .groupby("__pid")
        .map_groups(_combine, batch_format="pandas")
    )
