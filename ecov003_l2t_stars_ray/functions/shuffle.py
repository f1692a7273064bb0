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

    out = (
        partials.map_batches(_add_pid, batch_format="pandas")
        .groupby("__pid")
        .map_groups(_combine, batch_format="pandas")
    )

    def _typed_empty_recover() -> pd.DataFrame | None:
        """Rebuild the TYPED empty output frame on the all-rows-filtered
        path (the q11 sf0.1 crash class): derive the partial schema from
        the (already empty, so cheap to execute) upstream dataset, run
        ``combine_fn`` on a typed empty frame, and hand the result to the
        package ``to_pandas`` shim. Never called on the non-empty path —
        zero hot-path cost."""
        try:
            sch = partials.schema(fetch_if_missing=True)
            if sch is None or not sch.names:
                return None
            import pyarrow as pa

            types = list(getattr(sch, "types", None) or [])
            cols = {}
            for i, n in enumerate(sch.names):
                t = types[i] if i < len(types) else None
                if isinstance(t, pa.DataType):
                    cols[n] = pa.array([], type=t).to_pandas()
                else:
                    try:
                        cols[n] = pd.Series(dtype=t)
                    except Exception:
                        cols[n] = pd.Series(dtype="object")
            return combine_fn(pd.DataFrame(cols))
        except Exception:
            return None

    out._typed_empty_recover = _typed_empty_recover
    return out


def typed_pandas(ds: ray.data.Dataset, dtypes: dict[str, str]) -> pd.DataFrame:
    """Materialize a REDUCED (bounded) dataset as pandas with a TYPED
    empty fallback.

    Ray 2.49 loses the schema entirely when a pipeline stage produces
    zero blocks (its map/combine fns never ran, so not even
    ``schema(fetch_if_missing=True)`` can answer — the package-level
    ``to_pandas`` shim in ``__init__`` only covers the schema-known
    case). Any driver-side column access on the resulting column-less
    frame raises KeyError (the q11 sf0.1 crash class, VERDICT r4).
    ``dtypes`` declares the stage's output columns; they are
    guaranteed present (and typed) even on the fully-empty path."""
    pdf = ds.to_pandas()
    if pdf.shape[1] == 0 and len(pdf) == 0:
        pdf = pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in dtypes.items()}
        )
    return pdf


def typed_empty(**dtypes) -> pd.DataFrame:
    """Typed 0-row frame — the standard early-return for a driver-side
    reducer whose distributed input lost every row to a filter (the q11
    sf0.1 crash class): keeps the query's output schema intact instead
    of raising on a column-less frame."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in dtypes.items()})


def _restore_dtypes(df: pd.DataFrame, dtypes: dict[str, str]) -> pd.DataFrame:
    """Cast columns back to their pre-union dtypes (the None-padding the
    union adds upcasts other-side columns to object within each block)."""
    for c, dt in dtypes.items():
        if str(df[c].dtype) != dt:
            df[c] = df[c].astype(dt)
    return df


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    how: str = "inner",
    num_partitions: int = 32,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> ray.data.Dataset:
    """Big-big shuffle hash join: BOTH sides are tagged with a side marker,
    aligned to one common schema (other-side columns None-padded so every
    block shares a shape), and moved in ONE hash exchange keyed by
    ``hash(on) % num_partitions``; each of the P partition groups then runs
    one vectorized ``pandas.merge`` over all of its keys.

    Chosen over Ray 2.49's native ``Dataset.join`` after measurement (see
    pipelines/joins.py docstring); same skew/memory contract as
    :func:`hash_combine` — a partition's rows from both sides must fit one
    worker's heap, ``num_partitions`` is the knob.

    ``how``: "inner" or "left". Shared non-key column names take
    ``suffixes``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    ls = left.schema(fetch_if_missing=True)
    rs = right.schema(fetch_if_missing=True)
    if ls is None or rs is None:
        # a side produced ZERO blocks (its upstream maps never ran), so
        # even its column names are unknowable. An INNER join with an
        # empty side is empty — degrade to an empty dataset; driver-side
        # consumers type their reduced outputs via typed_pandas. A LEFT
        # join with a schema-less RIGHT side would need fabricated null
        # right columns we cannot name — refuse loudly rather than drop
        # rows.
        if how == "left" and rs is None and ls is not None:
            raise ValueError(
                "hash_join(how='left'): right side has no schema "
                "(zero blocks); cannot fabricate its null columns"
            )
        return ray.data.from_items([])
    for k in on:
        if k not in ls.names or k not in rs.names:
            raise KeyError(f"join key {k!r} missing from a side")
    shared = [c for c in ls.names if c in rs.names and c not in on]
    lren = {c: c + suffixes[0] for c in shared}
    rren = {c: c + suffixes[1] for c in shared}

    def _pd_dtype(t) -> str:
        import pyarrow as pa

        try:  # pandas-block schema: numpy dtypes / python type objects
            return np.dtype(t).name
        except TypeError:
            pass
        if pa.types.is_timestamp(t):
            return f"datetime64[{t.unit}]"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "object"
        return np.dtype(t.to_pandas_dtype()).name

    ltypes = {lren.get(n, n): _pd_dtype(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {rren.get(n, n): _pd_dtype(t) for n, t in zip(rs.names, rs.types)}
    lcols = [lren.get(n, n) for n in ls.names]
    rcols = [rren.get(n, n) for n in rs.names if rren.get(n, n) not in on]
    ordered = lcols + rcols  # identical column order on both sides

    def _tag(side: int, ren: dict[str, str]):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.rename(columns=ren).copy()
            for c in ordered:
                if c not in df.columns:
                    df[c] = None
            df["__side"] = np.int8(side)
            df["__pid"] = (
                hash_keys(df, on) % np.uint64(num_partitions)
            ).astype(np.int32)
            return df[ordered + ["__side", "__pid"]]

        return f

    unioned = left.map_batches(_tag(0, lren), batch_format="pandas").union(
        right.map_batches(_tag(1, rren), batch_format="pandas")
    )

    def _join(g: pd.DataFrame) -> pd.DataFrame:
        side = g.pop("__side").to_numpy()
        g = g.drop(columns="__pid")
        lg = _restore_dtypes(g.loc[side == 0, lcols].copy(), ltypes)
        rg = _restore_dtypes(g.loc[side == 1, on + rcols].copy(), rtypes)
        return lg.merge(rg, on=on, how=how)

    return unioned.groupby("__pid").map_groups(_join, batch_format="pandas")
