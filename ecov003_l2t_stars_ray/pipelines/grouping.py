"""Grouped-shape operators: per-group mode, fixed-vocabulary pivot, NTILE
bucketing, deterministic weighted mixture sampling, and rolling range-window
median.

Same engine shape as ``analytics``: vectorized map-side partials, ONE
int-keyed hash exchange (``functions.shuffle.hash_combine``), vectorized
per-partition combine. Every SQL-checked float is produced by a single
division over order-independent integer accumulations, so the driver's
value hash cannot drift with block arrival order (see CLAUDE.md
invariants).

Reference parity: these re-express the reference's per-tile summary /
priority-composite steps (e.g. mode = the dominant-class summary its QA
rollups keep, the pivot = its per-class pixel-count table) over generic
tables; citations per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.shuffle import hash_combine

US = 1_000_000
HOUR_US = 3600 * US


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ----------------------------------------------------------------- mode
def mode_per_user(sf_dir: str) -> pd.DataFrame:
    """Per-user modal event_type (ties -> lexicographically smallest type).

    The dominant-class summary (reference keeps a per-tile dominant QA
    class in its rollups). Counts ride as int64 partials per
    (user, event_type); the argmax runs once per combine partition over
    ALL its users in one vectorized sort + group-head — never a per-user
    Python call (CLAUDE.md map_groups-granularity invariant)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["event_type"] = g["event_type"].astype(str)
        c = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        c = c.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = c.drop_duplicates("user_id", keep="first")
        return top.rename(columns={"event_type": "mode_event", "n": "n_mode"})

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    return out.sort_values("user_id", ignore_index=True)[
        ["user_id", "mode_event", "n_mode"]
    ]


# ---------------------------------------------------------------- pivot
#: fixed pivot vocabulary — the generator's closed event-type set; anything
#: outside lands in n_other so the operator stays total.
_EVENT_VOCAB = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(sf_dir: str) -> pd.DataFrame:
    """Long->wide pivot: per-user event counts as one fixed-vocabulary
    column per type (+ n_other, n_total). The reference's per-class
    pixel-count table shape. Partials are already pivoted (integer
    conditional counts per batch), so the exchange moves one narrow row
    per (user, batch) and the combine is a plain integer sum."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    cols = [f"n_{t}" for t in _EVENT_VOCAB] + ["n_other"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str).to_numpy()
        out = {"user_id": df["user_id"].to_numpy()}
        other = np.ones(len(df), dtype=bool)
        for t in _EVENT_VOCAB:
            m = et == t
            out[f"n_{t}"] = m.astype(np.int64)
            other &= ~m
        out["n_other"] = other.astype(np.int64)
        return (
            pd.DataFrame(out).groupby("user_id", sort=False, as_index=False).sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)[cols].sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["n_total"] = out[cols].sum(axis=1)
    return out.sort_values("user_id", ignore_index=True)


# ---------------------------------------------------------------- ntile
def ntile_event_buckets(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """NTILE(k) decile table over per-user event counts: the heavy
    per-user aggregation is distributed; the NTILE itself runs on the
    user-level aggregate (one small frame — user cardinality is the
    series axis, corpus-size-independent per the engine's data model).
    Bucket sizes follow SQL NTILE exactly: first ``n % k`` buckets take
    ``n // k + 1`` rows over (n, user_id) order. All stats are integer
    until ONE final division (mirrored in the oracle)."""
    ds = _events(sf_dir, ["user_id", "event_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", sort=False).size().rename("n").reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["n"].sum()

    users = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
        )
        .to_pandas()
        .sort_values(["n", "user_id"], ignore_index=True)
    )
    n = len(users)
    base, rem = divmod(n, k)
    sizes = np.full(k, base, dtype=np.int64)
    sizes[:rem] += 1
    users["bucket"] = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)
    out = users.groupby("bucket", as_index=False).agg(
        n_users=("user_id", "count"), min_n=("n", "min"),
        max_n=("n", "max"), sum_n=("n", "sum"),
    )
    out["avg_n"] = np.round(
        out["sum_n"].to_numpy(np.float64) / out["n_users"].to_numpy(np.float64), 6
    )
    return out


# -------------------------------------------------------------- mixture
#: Knuth multiplicative hash + prime modulus: deterministic, SQL-mirrorable
#: rank key. Exact in int64 for doc_id < 2**33 (documented bound; the gate
#: corpus is far below it).
_MIX_MULT = 2654435761
_MIX_MOD = 1_000_000_007


def source_mixture_sample(sf_dir: str, per_unit: int = 4) -> pd.DataFrame:
    """Deterministic weighted mixture sample over the documents table: each
    source s gets quota ``per_unit * (1 + idx(s) % 3)`` docs (a stand-in
    for the per-domain mixture weights a training-data pipeline assigns),
    chosen by a Knuth-hash ranking of doc_id so the sample is reproducible
    across runs/cluster sizes and SQL-mirrorable (no RNG state).

    Distributed top-k per group: map-side each batch keeps its per-source
    best ``max_quota`` rows, ONE hash exchange on source, combine re-ranks
    and cuts to quota — candidate volume is O(sources x quota x blocks),
    never corpus-sized."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    max_quota = per_unit * 3

    def rank_key(doc_id: np.ndarray) -> np.ndarray:
        return (doc_id.astype(np.int64) * _MIX_MULT) % _MIX_MOD

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"source": df["source"].astype(str),
             "doc_id": df["doc_id"].to_numpy(np.int64)}
        )
        d["rk"] = rank_key(d["doc_id"].to_numpy())
        d = d.sort_values(["source", "rk", "doc_id"], kind="mergesort")
        return d.groupby("source", sort=False).head(max_quota)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["source"] = g["source"].astype(str)
        g = g.sort_values(["source", "rk", "doc_id"], kind="mergesort")
        g["pos"] = g.groupby("source", sort=False).cumcount()
        idx = g["source"].str.slice(3).astype(np.int64)
        quota = per_unit * (1 + idx % 3)
        return g[g["pos"] < quota].drop(columns="pos")

    out = hash_combine(
        docs.map_batches(partial, batch_format="pandas"), ["source"], combine
    ).to_pandas()
    return out.sort_values(["source", "rk", "doc_id"], ignore_index=True)[
        ["source", "doc_id", "rk"]
    ]


# -------------------------------------------------------- rolling median
def rolling_median_24h(sf_dir: str) -> pd.DataFrame:
    """Per-user rolling RANGE-window median of HOURLY event counts over the
    trailing 24 h (window = buckets in (t-23h, t], matching SQL RANGE
    BETWEEN 23h PRECEDING AND CURRENT ROW over a sparse bucket axis —
    missing hours are absent, not zero).

    Median-of-integers is selection (plus one exact midpoint average), so
    it is order-independent — hash-safe without the int-sum trick. The
    window scan is vectorized: searchsorted window starts per row, then
    ``<=24`` gather passes build an (n, 24) NaN-padded matrix and one
    ``np.nanmedian(axis=1)`` finishes — no per-row Python."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (
            df["ts"].astype("datetime64[us]").astype(np.int64)
            // HOUR_US * HOUR_US
        )
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b})
            .groupby(["user_id", "bucket_us"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "bucket_us"], as_index=False)["n"].sum()
        c = c.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = c["user_id"].to_numpy()
        t = c["bucket_us"].to_numpy()
        n = c["n"].to_numpy(np.float64)
        nrow = len(c)
        # first row index of each user's run (window never crosses users)
        first = np.zeros(nrow, dtype=np.int64)
        if nrow > 1:
            brk = np.flatnonzero(u[1:] != u[:-1]) + 1
            first[brk] = brk
            np.maximum.accumulate(first, out=first)
        # hourly buckets: rows j back within a user are >= j hours earlier,
        # so the trailing-24h window spans at most 24 rows — 24 vectorized
        # gather passes, each masked to (same user run) AND (in window).
        # t is sorted only WITHIN user runs, so no global binary search.
        idx = np.arange(nrow)
        mat = np.full((nrow, 24), np.nan)
        for j in range(24):
            src = idx - j
            valid = src >= first
            ts_src = np.where(valid, t[np.maximum(src, 0)], 0)
            valid &= ts_src >= t - 23 * HOUR_US
            mat[valid, j] = n[src[valid]]
        med = np.nanmedian(mat, axis=1)
        out = c[["user_id", "bucket_us"]].copy()
        out["n"] = c["n"]
        out["med_24h"] = np.round(med, 6)
        return out

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out.sort_values(["user_id", "bucket_start"], ignore_index=True)[
        ["user_id", "bucket_start", "n", "med_24h"]
    ]
