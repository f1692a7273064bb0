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

from ..functions.shuffle import hash_combine, typed_empty, typed_pandas

US = 1_000_000
HOUR_US = 3600 * US
WEEK_US = 7 * 24 * HOUR_US


def _r6away(x: np.ndarray) -> np.ndarray:
    """ROUND half-AWAY-from-zero at 6 decimals — mirrors DuckDB ROUND
    (np.round is half-even and flips exact ties; CLAUDE.md invariant)."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


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
        out["med_24h"] = _r6away(med)
        return out

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out.sort_values(["user_id", "bucket_start"], ignore_index=True)[
        ["user_id", "bucket_start", "n", "med_24h"]
    ]


# --------------------------------------------------- transition matrix
def transition_matrix(sf_dir: str) -> pd.DataFrame:
    """Global event-type Markov transition matrix: for each ordered pair
    (from_event, to_event) the count of adjacent occurrences in per-user
    event streams and the row-conditional probability.  Sequence order is
    (ts, event_id) — event_id is the generator's unique ingest sequence,
    so ties at equal ts are broken deterministically on both sides.

    Shape: successor pairs need each user's FULL stream in one place, so
    the projected 4-column table rides ONE user-hash exchange; the combine
    sorts a whole partition once (mergesort) and builds every user's
    adjacent pairs with two shifted array views — no per-user Python.
    Per-partition (from, to) counts are vocabulary-sized; the driver sums
    P tiny frames and performs the single probability division (integer
    n / integer row-total, mirrored op-for-op in the oracle).  The
    reference's per-scene QA-state succession summary over time-ordered
    granules (`VNP43NRT/VNP43NRT.py` composite sequencing) re-expressed as
    a grouped operator."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": df["event_type"].astype(str),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].astype(str).to_numpy()
        if len(g) < 2:
            return pd.DataFrame(
                {"from_event": pd.Series(dtype=str),
                 "to_event": pd.Series(dtype=str),
                 "n": pd.Series(dtype=np.int64)}
            )
        same = u[1:] == u[:-1]
        return (
            pd.DataFrame({"from_event": et[:-1][same], "to_event": et[1:][same]})
            .groupby(["from_event", "to_event"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    parts = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = parts.groupby(["from_event", "to_event"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    tot = out.groupby("from_event")["n"].transform("sum").to_numpy(np.float64)
    out["p"] = _r6away(out["n"].to_numpy(np.float64) / tot)
    return out.sort_values(["from_event", "to_event"], ignore_index=True)


# ---------------------------------------------------- cohort retention
def cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort-retention triangle: users are cohorted by the epoch
    week of their first event; for each (cohort_week, age_weeks) the
    number of cohort members active that week and the retention fraction
    vs the cohort's size (its age-0 count — every member is active in its
    own cohort week by construction).

    Map-side partials deduplicate (user, week) per batch, so the exchange
    moves at most one row per user-week per block; the combine dedups
    again, derives each user's cohort as a vectorized per-user min, and
    emits vocabulary-sized (cohort, age) counts — users are hash-
    partitioned, so partition counts are additive and the driver sums P
    tiny frames.  Weeks are `epoch_us // WEEK_US` (pure integer axis,
    mirrored in SQL), retention is ONE int/int division."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
        return (
            pd.DataFrame({"user_id": df["user_id"], "week": w})
            .drop_duplicates()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        cw = g.groupby("user_id")["week"].transform("min")
        return (
            pd.DataFrame({"cohort_week": cw, "age_weeks": g["week"] - cw})
            .groupby(["cohort_week", "age_weeks"], sort=False)
            .size()
            .rename("n_active")
            .reset_index()
        )

    parts = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = parts.groupby(["cohort_week", "age_weeks"], as_index=False)[
        "n_active"
    ].sum()
    out["n_active"] = out["n_active"].astype(np.int64)
    size0 = out[out["age_weeks"] == 0].set_index("cohort_week")["n_active"]
    csize = out["cohort_week"].map(size0).to_numpy(np.float64)
    out["retention"] = _r6away(out["n_active"].to_numpy(np.float64) / csize)
    return out.sort_values(["cohort_week", "age_weeks"], ignore_index=True)


# ------------------------------------------------------ M4 downsampling
M4_W_US = 15 * 60 * US


def m4_downsample_15m(sf_dir: str) -> pd.DataFrame:
    """M4 chart downsampling (Jugel et al., VLDB 2014): per (user, 15-min
    pixel bucket) the min, max, first and last of ``value`` plus the point
    count — the lossless-at-pixel-resolution reduction a tier store serves
    to dashboards.  First/last are taken in ``event_id`` order (the unique
    ingest sequence), so the pick is deterministic under any block
    arrival order and exact in the value hash (pure selection, no float
    arithmetic — no rounding needed).

    Classic two-level M4: map-side per-batch M4 partials (7 narrow columns
    per touched bucket), ONE user-hash exchange, then an order-free merge
    (min of mins, max of maxes, first by smallest first_eid, last by
    largest last_eid).  Output is pixel-axis-sized, never event-sized."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // M4_W_US * M4_W_US
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "bucket_us": b,
                "event_id": df["event_id"].to_numpy(np.int64),
                "value": df["value"].to_numpy(np.float64),
            }
        ).sort_values(["user_id", "bucket_us", "event_id"], kind="mergesort")
        return d.groupby(["user_id", "bucket_us"], sort=False).agg(
            n=("value", "size"),
            v_min=("value", "min"),
            v_max=("value", "max"),
            first_eid=("event_id", "first"),
            v_first=("value", "first"),
            last_eid=("event_id", "last"),
            v_last=("value", "last"),
        ).reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "bucket_us", "first_eid"], kind="mergesort")
        keys = ["user_id", "bucket_us"]
        firsts = g.groupby(keys, sort=False)[["first_eid", "v_first"]].first()
        g2 = g.sort_values(keys + ["last_eid"], kind="mergesort")
        lasts = g2.groupby(keys, sort=False)[["last_eid", "v_last"]].last()
        agg = g.groupby(keys, sort=False).agg(
            n=("n", "sum"), v_min=("v_min", "min"), v_max=("v_max", "max")
        )
        out = pd.concat([agg, firsts, lasts], axis=1).reset_index()
        return out.drop(columns=["first_eid", "last_eid"])

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out.sort_values(["user_id", "bucket_start"], ignore_index=True)[
        ["user_id", "bucket_start", "n", "v_min", "v_max", "v_first", "v_last"]
    ]


# ---------------------------------------------- seasonal-naive backtest
def forecast_mae_24h(sf_dir: str) -> pd.DataFrame:
    """Seasonal-naive forecast backtest: predict each user's hourly event
    count with the count 24 h earlier (the standard naive-seasonal
    baseline a tier store's anomaly alerts are judged against) and score
    per-user MAE and bias over the matched buckets (sparse axis — a
    bucket scores only if its t-24h counterpart exists).

    Integer partial counts ride ONE user-hash exchange; the combine
    self-aligns each partition's (user, bucket) table against itself
    shifted by 24 h with one vectorized merge, then reduces to THREE
    int64 sums per user (matched count, sum |err|, sum err).  The two
    divisions happen once, mirrored op-for-op in the oracle (CLAUDE.md
    float-compare invariant)."""
    ds = _events(sf_dir, ["user_id", "ts"])
    DAY_US = 24 * HOUR_US

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US * HOUR_US
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b})
            .groupby(["user_id", "bucket_us"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "bucket_us"], as_index=False)["n"].sum()
        f = c.rename(columns={"bucket_us": "t_src", "n": "f"})
        f["bucket_us"] = f["t_src"] + DAY_US
        m = c.merge(f[["user_id", "bucket_us", "f"]], on=["user_id", "bucket_us"])
        if not len(m):
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64)
                 for c in ("user_id", "n_matched", "s_abs", "s_diff")}
            )
        err = m["n"].to_numpy(np.int64) - m["f"].to_numpy(np.int64)
        m["s_abs"] = np.abs(err)
        m["s_diff"] = err
        out = m.groupby("user_id", as_index=False).agg(
            n_matched=("s_abs", "size"), s_abs=("s_abs", "sum"),
            s_diff=("s_diff", "sum"),
        )
        return out

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out[out["n_matched"] > 0].copy()
    nm = out["n_matched"].to_numpy(np.float64)
    out["mae"] = _r6away(out["s_abs"].to_numpy(np.float64) / nm)
    out["bias"] = _r6away(out["s_diff"].to_numpy(np.float64) / nm)
    out["n_matched"] = out["n_matched"].astype(np.int64)
    return out.sort_values("user_id", ignore_index=True)[
        ["user_id", "n_matched", "mae", "bias"]
    ]


# --------------------------------------------------- inter-arrival stats
def interarrival_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-arrival-time statistics: count, median, max and mean
    of the microsecond gaps between consecutive events in (ts, event_id)
    order — the cadence profile that sizes a tier store's ingest windows.

    The 3-column projection rides ONE user-hash exchange (full streams
    must co-locate, same contract as :func:`transition_matrix`); the
    combine sorts the partition once and derives every user's gaps from
    two shifted views.  Median/max of int64 gaps are selections (order-
    independent, exact — a half-integer median has no 7th decimal so no
    rounding is needed); the mean is ONE int-sum / int-count division."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "n_gaps": pd.Series(dtype=np.int64),
                 "s_gap": pd.Series(dtype=np.int64),
                 "med_gap": pd.Series(dtype=np.float64),
                 "max_gap": pd.Series(dtype=np.int64)}
            )
        same = u[1:] == u[:-1]
        d = pd.DataFrame({"user_id": u[1:][same], "gap": (t[1:] - t[:-1])[same]})
        out = d.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"), s_gap=("gap", "sum"),
            med_gap=("gap", "median"), max_gap=("gap", "max"),
        )
        return out

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["mean_gap_us"] = _r6away(
        out["s_gap"].to_numpy(np.float64) / out["n_gaps"].to_numpy(np.float64)
    )
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    out["max_gap_us"] = out["max_gap"].astype(np.int64)
    out["median_gap_us"] = out["med_gap"].astype(np.float64)
    return out.sort_values("user_id", ignore_index=True)[
        ["user_id", "n_gaps", "median_gap_us", "max_gap_us", "mean_gap_us"]
    ]


# ----------------------------------------------------------------- funnel
def funnel_stages(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence funnel view -> click -> purchase: per user the
    first view, the first click strictly after it, and the first purchase
    strictly after that; emitted as one row per stage with the surviving
    user count and the mean microsecond gap from the previous stage.

    The stream is filtered to the three stage types MAP-SIDE (the exchange
    ships only funnel-relevant rows), rides ONE user-hash exchange, and the
    per-partition combine resolves every user's three thresholded minima
    with two vectorized merge+filter+groupby passes — no per-user Python.
    Each partition emits ONE row of additive int counters (counts + gap
    sums), so the driver reduction is P-row; the two means are single
    int-sum / int-count divisions mirrored op-for-op in the oracle.
    Re-expresses the reference's staged acquisition chain (granule listed
    -> downloaded -> composited, `VNP43NRT.py` retrieval sequencing) as a
    grouped funnel over a generic event stream."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])
    _STAGES = ("view", "click", "purchase")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str)
        m = et.isin(_STAGES).to_numpy()
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64)[m],
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()[m],
                "event_type": et.to_numpy()[m],
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].astype(str).to_numpy()
        v = (
            g[et == "view"]
            .groupby("user_id", as_index=False)["ts_us"]
            .min()
            .rename(columns={"ts_us": "t1"})
        )
        c = g[et == "click"][["user_id", "ts_us"]].merge(v, on="user_id")
        c = (
            c[c["ts_us"] > c["t1"]]
            .groupby("user_id", as_index=False)
            .agg(t2=("ts_us", "min"), t1=("t1", "first"))
        )
        p = g[et == "purchase"][["user_id", "ts_us"]].merge(
            c[["user_id", "t2"]], on="user_id"
        )
        p = (
            p[p["ts_us"] > p["t2"]]
            .groupby("user_id", as_index=False)
            .agg(t3=("ts_us", "min"), t2=("t2", "first"))
        )
        return pd.DataFrame(
            {
                "n_view": [np.int64(len(v))],
                "n_click": [np.int64(len(c))],
                "s_gap1": [np.int64((c["t2"] - c["t1"]).sum())],
                "n_purchase": [np.int64(len(p))],
                "s_gap2": [np.int64((p["t3"] - p["t2"]).sum())],
            }
        )

    parts = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    t = parts.sum()
    def _mean(s: int, n: int) -> float:
        return float(_r6away(np.float64(s) / np.float64(n))) if n else 0.0
    return pd.DataFrame(
        {
            "stage_idx": np.array([1, 2, 3], dtype=np.int64),
            "stage": ["view", "click", "purchase"],
            "n_users": np.array(
                [t["n_view"], t["n_click"], t["n_purchase"]], dtype=np.int64
            ),
            "mean_gap_us": [
                0.0,
                _mean(int(t["s_gap1"]), int(t["n_click"])),
                _mean(int(t["s_gap2"]), int(t["n_purchase"])),
            ],
        }
    )


# ---------------------------------------------------------- grouping sets
def rollup_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus) in ONE pass: every
    map batch emits integer partials for ALL THREE grouping levels —
    (priority, status), (priority) and () — with rolled-up columns filled
    as 'ALL' and a SQL GROUPING()-compatible gid, so the multi-level cube
    costs one read and one vocabulary-sized reduction instead of three
    scans.  Money rides as ROUND(x*100)-cents int64 partials; the emitted
    total is ONE integer-sum / 100.0 division (exact halves, mirrored).
    The reduction input is <= 21 rows per batch (5 priorities x 3 statuses
    + 5 + 1), so the driver combine is vocabulary-sized at any corpus
    scale.  Re-expresses the reference's multi-resolution summary ladder
    (per-class, per-band, global counts across the 70m/490m/980m tiers,
    `ECOv003_L2T_STARS/constants.py:29-31`) in one product pass."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        base = pd.DataFrame(
            {
                "priority": df["o_orderpriority"].astype(str).to_numpy(),
                "status": df["o_orderstatus"].astype(str).to_numpy(),
                "cents": cents,
            }
        )
        lv0 = base.groupby(["priority", "status"], as_index=False).agg(
            n=("cents", "size"), s=("cents", "sum")
        )
        lv0["gid"] = np.int64(0)
        lv1 = base.groupby("priority", as_index=False).agg(
            n=("cents", "size"), s=("cents", "sum")
        )
        lv1["status"] = "ALL"
        lv1["gid"] = np.int64(1)
        lv2 = pd.DataFrame(
            {
                "priority": ["ALL"],
                "status": ["ALL"],
                "n": [np.int64(len(base))],
                "s": [np.int64(base["cents"].sum())],
                "gid": [np.int64(3)],
            }
        )
        cols = ["priority", "status", "gid", "n", "s"]
        return pd.concat([lv0[cols], lv1[cols], lv2[cols]], ignore_index=True)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["priority", "status", "gid"], as_index=False)[["n", "s"]]
        .sum()
    )
    out = pd.DataFrame(
        {
            "priority": agg["priority"].astype(str),
            "status": agg["status"].astype(str),
            "gid": agg["gid"].astype(np.int64),
            "n_orders": agg["n"].astype(np.int64),
            "total_price": agg["s"].to_numpy(np.int64) / 100.0,
        }
    )
    return out.sort_values(["gid", "priority", "status"], ignore_index=True)


# ------------------------------------------------------- exact moments
def corr_value_props(sf_dir: str) -> pd.DataFrame:
    """Per-event-type exact distributed second moments: n, mean(value) and
    corr(value, LENGTH(props)) with NO order-dependent float accumulation.

    Values are snapped ONCE to 2^10 fixed point (q = floor(x*1024+0.5),
    one deterministic float op per row); every moment lane — q, q*q, y,
    y*y, q*y — is then an EXACT int64 product, so partials combine exactly
    in any order and the final mean / Pearson expression is ONE float
    chain over identical integer sums mirrored op-for-op in the SQL —
    bit-stable under block arrival order (CLAUDE.md float-compare
    invariant).  Headroom: q*q <= 2.5e11 for values < 512, so int64 lanes
    hold to ~3.7e7 rows per group-partial; past that the qq lane splits
    hi/lo uint64 (the span_dedup dual-lane pattern) — documented scale
    path, not needed at any tested sf.  Reference analog: the
    fine->coarse calibration regression, which reduces two aligned rasters
    to the same five moment sums before ONE slope/intercept solve
    (`ECOv003_L2T_STARS/calibrate_fine_to_coarse.py:10-60`)."""
    ds = _events(sf_dir, ["event_type", "value", "props"])
    _S = np.float64(1024.0)  # 2**10 fixed-point snap

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        q = np.floor(v * _S + 0.5).astype(np.int64)
        qq = q * q
        y = df["props"].astype(str).str.len().to_numpy(np.int64)
        b = pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str).to_numpy(),
                "n": np.int64(1),
                "sq": q,
                "sqq": qq,
                "sy": y,
                "syy": y * y,
                "sqy": q * y,
            }
        )
        return b.groupby("event_type", as_index=False).sum()

    s = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    n = s["n"].to_numpy(np.float64)
    sq = s["sq"].to_numpy(np.float64)
    sqq = s["sqq"].to_numpy(np.float64)
    sy = s["sy"].to_numpy(np.float64)
    syy = s["syy"].to_numpy(np.float64)
    sqy = s["sqy"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "event_type": s["event_type"].astype(str),
            "n": s["n"].astype(np.int64),
            "mean_value": _r6away(sq / n / _S),
            "corr_len": _r6away(
                (n * sqy - sq * sy)
                / np.sqrt((n * sqq - sq * sq) * (n * syy - sy * sy))
            ),
        }
    ).sort_values("event_type", ignore_index=True)


# ------------------------------------------------------- path signature
def path_signature(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Per-user behavioral path signature: the first-letter codes of the
    user's first ``k`` events in (ts, event_id) order concatenated into
    one string, histogrammed across users — the session-shape inventory a
    curation pipeline uses to stratify interaction data.

    The exchange ships the 4-column projection once (user-hash, full
    streams co-locate); the combine sorts its partition, ranks rows per
    user with ONE arange-minus-segment-start subtraction, scatters the
    <=k head codes of every user into an (n_users, k) uint8 matrix and
    reinterprets the rows as 'S{k}' — numpy strips NUL padding, so the
    variable-length strings appear without any per-user Python (the
    np.char lesson from CLAUDE.md).  Each partition emits a path
    histogram; the driver sums vocabulary-sized frames."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "code": et.str.slice(0, 1),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"path": pd.Series(dtype=str), "n_users": pd.Series(dtype=np.int64)}
            )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        codes = g["code"].astype(str).to_numpy().astype("S1").view(np.uint8)
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        uidx = np.cumsum(new) - 1          # dense user index
        starts = np.flatnonzero(new)
        rn = np.arange(len(u)) - starts[uidx]
        mat = np.zeros((int(uidx[-1]) + 1, k), dtype=np.uint8)
        m = rn < k
        mat[uidx[m], rn[m]] = codes[m]
        paths = pd.Series(mat.view(f"S{k}").ravel()).str.decode("ascii")
        out = paths.value_counts().rename_axis("path").rename("n_users")
        return out.reset_index()

    parts = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = parts.groupby("path", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("path", ignore_index=True)


# ----------------------------------------------------------- event PMI
def event_pmi(sf_dir: str) -> pd.DataFrame:
    """Pointwise mutual information between event types co-present in a
    user's history (the co-occurrence signal behind feature vocabularies).

    Presence compresses to ONE uint8 bitmask per user: the map side ORs a
    per-batch mask per user (5-bit vocabulary), the exchange ships (user,
    mask) partials, the combine ORs masks per user and histograms the
    <=32 distinct masks — so the driver reduction is mask-vocabulary-
    sized regardless of corpus size.  All counts are exact int64; pmi =
    ln(n_ab * N / (n_a * n_b)) is one float chain over identical integer
    counts on both sides."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    vocab = list(_EVENT_VOCAB)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # each event row sets exactly ONE bit, so per-user OR ==
        # sum over DISTINCT (user, bit) rows — no per-group Python
        et = df["event_type"].astype(str).to_numpy()
        bit = np.zeros(len(et), dtype=np.int64)
        for i, t in enumerate(vocab):
            bit |= np.int64(1 << i) * (et == t)
        b = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "mask": bit}
        ).drop_duplicates()
        return b.groupby("user_id", as_index=False)["mask"].sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # OR of multi-bit masks: unpack to 0/1 bit columns, groupby max
        # (== OR), re-pack — all vectorized
        bits = pd.DataFrame(
            {f"b{i}": (g["mask"].to_numpy(np.int64) >> i) & 1
             for i in range(len(vocab))}
        )
        bits["user_id"] = g["user_id"].to_numpy(np.int64)
        per_user = bits.groupby("user_id").max()
        mask = np.zeros(len(per_user), dtype=np.int64)
        for i in range(len(vocab)):
            mask |= per_user[f"b{i}"].to_numpy(np.int64) << i
        h = pd.Series(mask).value_counts()
        return pd.DataFrame(
            {"mask": h.index.to_numpy(np.int64),
             "n_users": h.to_numpy(np.int64)}
        )

    parts = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    h = parts.groupby("mask")["n_users"].sum()
    masks = h.index.to_numpy(np.int64)
    cnt = h.to_numpy(np.int64)
    N = np.float64(cnt.sum())
    n_t = {t: int(cnt[(masks >> i) & 1 == 1].sum()) for i, t in enumerate(vocab)}
    rows = []
    for i, a in enumerate(vocab):
        for j in range(i + 1, len(vocab)):
            b = vocab[j]
            both = int(cnt[((masks >> i) & 1 == 1) & ((masks >> j) & 1 == 1)].sum())
            if both:
                pmi = np.log(np.float64(both) * N / (np.float64(n_t[a]) * np.float64(n_t[b])))
                rows.append((a, b, both, float(_r6away(np.float64(pmi)))))
    out = pd.DataFrame(rows, columns=["event_a", "event_b", "n_both", "pmi"])
    out["n_both"] = out["n_both"].astype(np.int64)
    return out.sort_values(["event_a", "event_b"], ignore_index=True)


DAY_US = 24 * HOUR_US


# ------------------------------------------------------ rolling distinct
def active_users_7d(sf_dir: str) -> pd.DataFrame:
    """Exact DAU / trailing-7-day WAU / stickiness per day — the rolling
    DISTINCT-count family, which is NOT windowed-sum decomposable (a user
    active twice in one window still counts once).

    Users are partition-exclusive after the ONE user-hash exchange, so
    per-user interval logic never crosses partitions: each user's distinct
    active days sort once per partition; runs with gaps < 7 days merge
    into maximal covered intervals via one shifted-view comparison, and
    every interval scatters (+1 at start, -1 at end) into a day-keyed
    diff table.  Partials are day-axis-sized (additive int deltas +
    per-day distinct-pair DAU counts); the driver cumsums ONE tiny diff
    array — corpus-size-independent.  Stickiness is a single int/int
    division mirrored in the oracle.  Reference analog: the trailing
    date-window coverage accounting that decides which granules feed a
    composite (`ECOv003_L2T_STARS/generate_STARS_inputs.py:26-60`,
    VIIRS/HLS start-date windows)."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": df["ts"].astype("datetime64[us]").astype(np.int64)
                // DAY_US,
            }
        ).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        if not len(g):
            return pd.DataFrame(
                {"day": pd.Series(dtype=np.int64),
                 "delta": pd.Series(dtype=np.int64),
                 "dau": pd.Series(dtype=np.int64)}
            )
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] >= 7)
        run_start = d[new_run]
        last = np.empty(len(g), dtype=bool)
        last[:-1] = new_run[1:]
        last[-1] = True
        run_end = d[last] + 7  # exclusive
        diff = pd.concat(
            [
                pd.DataFrame({"day": run_start, "delta": np.int64(1)}),
                pd.DataFrame({"day": run_end, "delta": np.int64(-1)}),
            ]
        ).groupby("day", as_index=False)["delta"].sum()
        dau = (
            pd.Series(d).value_counts().rename_axis("day").rename("dau")
            .reset_index()
        )
        out = diff.merge(dau, on="day", how="outer")
        return out.fillna(0).astype(np.int64)

    parts = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    agg = parts.groupby("day", as_index=False)[["delta", "dau"]].sum()
    agg = agg.sort_values("day", ignore_index=True)
    agg["wau"] = agg["delta"].cumsum()
    out = agg[agg["dau"] > 0].reset_index(drop=True)
    return pd.DataFrame(
        {
            "day": out["day"].astype(np.int64),
            "dau": out["dau"].astype(np.int64),
            "wau": out["wau"].astype(np.int64),
            "stickiness": _r6away(
                out["dau"].to_numpy(np.float64) / out["wau"].to_numpy(np.float64)
            ),
        }
    )


# ------------------------------------------------------------- A/B lift
def ab_conversion(sf_dir: str) -> pd.DataFrame:
    """Deterministic A/B experiment readout: users split by user_id parity
    (reproducible across runs and cluster sizes — no RNG state), per-arm
    user count, converted-user count (>=1 purchase), events per user and
    conversion rate.  Per-user flags reduce by max (== OR) inside the one
    user-hash exchange; per-arm counts are additive int partials and the
    two emitted rates are single int/int division chains."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "conv": (
                    df["event_type"].astype(str) == "purchase"
                ).to_numpy(np.int64),
                "n_ev": np.int64(1),
            }
        )
        return b.groupby("user_id", as_index=False).agg(
            conv=("conv", "max"), n_ev=("n_ev", "sum")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        pu = g.groupby("user_id", as_index=False).agg(
            conv=("conv", "max"), n_ev=("n_ev", "sum")
        )
        pu["arm"] = (pu["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
        return pu.groupby("arm", as_index=False).agg(
            n_users=("user_id", "size"), n_conv=("conv", "sum"),
            s_ev=("n_ev", "sum"),
        )

    parts = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    a = parts.groupby("arm", as_index=False)[["n_users", "n_conv", "s_ev"]].sum()
    return pd.DataFrame(
        {
            "arm": a["arm"].astype(np.int64),
            "n_users": a["n_users"].astype(np.int64),
            "n_conv": a["n_conv"].astype(np.int64),
            "conv_rate": _r6away(
                a["n_conv"].to_numpy(np.float64)
                / a["n_users"].to_numpy(np.float64)
            ),
            "events_per_user": _r6away(
                a["s_ev"].to_numpy(np.float64)
                / a["n_users"].to_numpy(np.float64)
            ),
        }
    ).sort_values("arm", ignore_index=True)


# -------------------------------------------------- first-seen cohorts
def user_first_seen_daily(sf_dir: str) -> pd.DataFrame:
    """New-user arrivals per epoch day plus the cumulative user count —
    the acquisition-curve readout, and the distributed FIRST-OCCURRENCE
    shape (the vocab_growth machinery keyed on users).

    Shape: per-batch min(ts) per user partials -> one user hash exchange
    taking the global min -> per-partition day histograms; only the
    |days|-bounded histogram reaches the driver, where the running total
    is a cumsum over the sorted day axis.  All times are int64
    microseconds; the day is epoch_us // DAY_US."""
    day_us = 24 * 3600 * US
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame({"u": df["user_id"].to_numpy(np.int64), "t": t})
            .groupby("u", as_index=False)["t"]
            .min()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("u", as_index=False)["t"].min()
        day = first["t"].to_numpy(np.int64) // day_us
        h = pd.Series(day).value_counts()
        return pd.DataFrame(
            {
                "day": h.index.to_numpy(np.int64),
                "new_users": h.to_numpy(np.int64),
            }
        )

    hist = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["u"], combine,
            num_partitions=8,
        )
        .to_pandas()
        .groupby("day", as_index=False)["new_users"]
        .sum()
        .sort_values("day", ignore_index=True)
    )
    hist["day"] = hist["day"].astype(np.int64)
    hist["new_users"] = hist["new_users"].astype(np.int64)
    hist["cum_users"] = np.cumsum(hist["new_users"].to_numpy(np.int64))
    return hist


# -------------------------------------------------------------- entropy
def user_event_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-user Shannon entropy (bits) of the event-type mix — the
    behavioral-diversity readout; at corpus scale the identical shape
    over (doc, term) counts is the token-distribution entropy quality
    signal training-data filters use.

    Shape: (user, type) count partials -> ONE user-hash exchange ->
    per-partition vectorized entropy over ALL the partition's users at
    once (pivot to a users x vocabulary count matrix; the vocabulary is
    tiny and fixed) — never a per-user Python call (CLAUDE.md
    map_groups-granularity invariant).

    Determinism: counts are exact int64; H = log2(n) - sum(c*log2(c))/n
    is a per-user chain over <= |vocab| transcendental terms at O(1)
    magnitude, so a last-ulp log2 difference between numpy and DuckDB is
    absorbed by ROUND(x, 6) — the ``time_features`` trig precedent, not
    the banned 1e9-magnitude float accumulation.
    Reference parity: the reference's QA summaries keep per-tile class
    mix statistics the same way (ECOv003-L2T-STARS QA rollup)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["user_id"] = out["user_id"].astype(np.int64)
        out["event_type"] = out["event_type"].astype(str)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False)["cnt"].sum()
        piv = c.pivot_table(
            index="user_id", columns="event_type", values="cnt",
            aggfunc="sum", fill_value=0,
        )
        m = piv.to_numpy(np.float64)
        n = m.sum(axis=1)
        terms = np.where(m > 0, m * np.log2(np.maximum(m, 1.0)), 0.0)
        h = np.log2(n) - terms.sum(axis=1) / n
        return pd.DataFrame(
            {
                "user_id": piv.index.to_numpy(np.int64),
                "n_events": n.astype(np.int64),
                "entropy": _r6away(h),
            }
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    return out.sort_values("user_id", ignore_index=True)


# ---------------------------------------------------- latest-wins state
def latest_event_state(sf_dir: str) -> pd.DataFrame:
    """CDC latest-wins compaction: the most recent event per
    (user, event_type) key — ties on ts broken by the highest event_id
    (arrival order), i.e. the upsert/compaction read a change-stream
    table needs before serving point lookups.

    Shape: per-batch vectorized argmax partials (ONE sort + group-head
    over all the batch's keys) -> ONE user-hash exchange of the
    key-cardinality-sized partials -> the identical reduce per
    partition.  The payload (value, event_id) rides the partial rows, so
    compaction never re-reads the fact stream.

    Determinism: the (ts DESC, event_id DESC) tiebreak is a total order;
    the carried value is compared, never combined — no float math."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts", "value", "event_id"])

    def reduce_(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(
                ["user_id", "event_type", "ts_us", "event_id"],
                ascending=[True, True, False, False],
                kind="mergesort",
            )
            .groupby(["user_id", "event_type"], as_index=False, sort=False)
            .first()
        )
        return out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_type": df["event_type"].astype(str),
                "ts_us": df["ts"]
                .astype("datetime64[us]")
                .astype(np.int64)
                .to_numpy(),
                "value": df["value"].to_numpy(np.float64),
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )
        return reduce_(d)

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        reduce_,
    ).to_pandas()
    out = out.sort_values(["user_id", "event_type"], ignore_index=True)
    return pd.DataFrame(
        {
            "user_id": out["user_id"].to_numpy(np.int64),
            "event_type": out["event_type"].astype(str),
            "last_ts": out["ts_us"].to_numpy(np.int64).astype("datetime64[us]"),
            "last_value": out["value"].to_numpy(np.float64),
            "last_event_id": out["event_id"].to_numpy(np.int64),
        }
    )


# ------------------------------------------------- presence-mask segments
def daily_mix_segments(
    sf_dir: str,
    types: tuple = ("click", "error", "purchase", "signup", "view"),
) -> pd.DataFrame:
    """Exact presence-mask Venn segmentation: for every (user, day)
    activity cell, the BITMASK of event types present (bit i = sorted
    type order), and the cell count per mask region — the behavioral
    segmentation readout ("how many user-days are view-only vs
    view+click vs full-funnel"), i.e. an exact Venn diagram over a
    fixed tiny set family.

    Shape: per-batch DISTINCT (user, day, type-bit) partials -> ONE
    (user, day)-hash exchange -> per-partition combine: distinct pairs
    again, OR = SUM of distinct power-of-two bits per cell (fully
    vectorized), then the mask histogram — each cell lives wholly in one
    partition, so histograms are additive and only <= 2^|types| rows
    reach the driver.

    Determinism: pure integer set algebra, no floats anywhere."""
    bit_of = {t: np.int64(1 << i) for i, t in enumerate(types)}
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
            // (24 * HOUR_US)
        )
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": day,
                "bit": df["event_type"]
                .astype(str)
                .map(bit_of)
                .fillna(0)
                .astype(np.int64)
                .to_numpy(),
            }
        ).drop_duplicates()
        return out[out["bit"] > 0]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "day", "bit"])
        mask = d.groupby(["user_id", "day"], sort=False)["bit"].sum()
        h = mask.value_counts()
        return pd.DataFrame(
            {
                "mask": h.index.to_numpy(np.int64),
                "n_cells": h.to_numpy(np.int64),
            }
        )

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["user_id", "day"],
            combine,
        )
        .to_pandas()
        .groupby("mask", as_index=False)["n_cells"]
        .sum()
    )
    out["mask"] = out["mask"].astype(np.int64)
    out["n_cells"] = out["n_cells"].astype(np.int64)
    return out.sort_values("mask", ignore_index=True)


# ------------------------------------------------- time-weighted average
def time_weighted_avg_value(sf_dir: str) -> pd.DataFrame:
    """Per-user TIME-weighted average value: each event's value holds
    until the user's next event (step-function semantics, last event
    holds nothing) — the irregular-sampling average a tier store needs
    when samples arrive unevenly (arithmetic means over-weight bursts).

    Shape: the :func:`interarrival_stats` contract — a 4-column
    projection rides ONE user-hash exchange, the combine sorts each
    partition once and derives all segments from two shifted views.

    Exactness: values snap to the 2^10 lattice and gaps floor to whole
    seconds, so weight x value products and both sums are order-free
    int64 (q <= ~6e5, user span <= 2.6e6 s -> per-user sums <= ~1.5e12);
    the TWA is ONE mirrored division chain."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "q": np.floor(
                    df["value"].to_numpy(np.float64) * 1024.0 + 0.5
                ).astype(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "dwell_s": pd.Series(dtype=np.int64),
                "swq": pd.Series(dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gap_s = (t[1:] - t[:-1])[same] // 1_000_000
        d = pd.DataFrame(
            {
                "user_id": u[:-1][same],
                "dwell_s": gap_s,
                "swq": q[:-1][same] * gap_s,
            }
        )
        return d.groupby("user_id", as_index=False)[["dwell_s", "swq"]].sum()

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"),
            ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby("user_id", as_index=False)[["dwell_s", "swq"]]
        .sum()
    )
    out = out[out["dwell_s"] > 0].sort_values("user_id", ignore_index=True)
    return pd.DataFrame(
        {
            "user_id": out["user_id"].to_numpy(np.int64),
            "dwell_s": out["dwell_s"].to_numpy(np.int64),
            "twa": _r6away(
                out["swq"].to_numpy(np.int64).astype(np.float64)
                / out["dwell_s"].to_numpy(np.int64)
                / 1024.0
            ),
        }
    )


# --------------------------------------------------- conversion latency
def signup_to_purchase_lag(sf_dir: str) -> pd.DataFrame:
    """Conversion LATENCY per user: the first signup timestamp and the
    first purchase AT-OR-AFTER it, with the lag in whole hours — the
    time-to-convert readout that complements :func:`funnel_conversion`'s
    reach counts.

    Shape: map-side prune to the two event types (column+row pruning
    before the exchange), ONE user-hash exchange; the combine computes
    per-user min signup with one groupby, filters purchases against it
    via a broadcast-aligned lookup, and min-reduces — all vectorized.

    Determinism: pure int64 timestamp selections and floor division —
    no floats anywhere."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin(["signup", "purchase"])
        d = df[m]
        return pd.DataFrame(
            {
                "user_id": d["user_id"].to_numpy(np.int64),
                "ts_us": d["ts"].astype("datetime64[us]").astype(np.int64),
                "is_signup": (d["event_type"] == "signup")
                .to_numpy()
                .astype(np.int8),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g[g["is_signup"] == 1]
            .groupby("user_id")["ts_us"]
            .min()
            .rename("signup_us")
        )
        p = g[g["is_signup"] == 0].copy()
        p["signup_us"] = p["user_id"].map(s)
        p = p[p["signup_us"].notna() & (p["ts_us"] >= p["signup_us"])]
        if len(p) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "signup_us": pd.Series(dtype=np.int64),
                    "purchase_us": pd.Series(dtype=np.int64),
                }
            )
        out = p.groupby("user_id", as_index=False).agg(
            signup_us=("signup_us", "first"), purchase_us=("ts_us", "min")
        )
        out["signup_us"] = out["signup_us"].astype(np.int64)
        return out

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    lag_h = (
        out["purchase_us"].to_numpy(np.int64)
        - out["signup_us"].to_numpy(np.int64)
    ) // (3600 * US)
    return pd.DataFrame(
        {
            "user_id": out["user_id"].to_numpy(np.int64),
            "signup_ts": out["signup_us"]
            .to_numpy(np.int64)
            .astype("datetime64[us]"),
            "first_purchase_ts": out["purchase_us"]
            .to_numpy(np.int64)
            .astype("datetime64[us]"),
            "lag_hours": lag_h,
        }
    )


# ------------------------------------------------------------ Theil-Sen
def theil_sen_slope_per_user(sf_dir: str) -> pd.DataFrame:
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise
    slopes (value change per hour) over the user's event series — the
    outlier-immune alternative to OLS (``trend_ols_1h``), and a second
    within-group pair-explosion shape (time-ordered pairs rather than
    ``copurchase_pairs``' unordered sets).

    Shape: 4-column projection rides ONE user-hash exchange; the combine
    sorts each partition once, builds every (earlier, later) pair with
    the segment repeat/arange arithmetic (no per-user Python), computes
    slopes vectorized, then takes per-user medians via one more sort +
    grouped middle-index gather.  Pair count is quadratic in events/user
    (bounded ~66 here — document sampling past ~1k events/user).

    Determinism: each slope is the same IEEE division on both sides;
    the median interpolation mirrors DuckDB quantile_cont's
    lo + (hi - lo) * 0.5 formula; pairs with equal timestamps are
    excluded (slope undefined) on both sides."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "value": df["value"].to_numpy(np.float64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_pairs": pd.Series(dtype=np.int64),
                "slope_per_hour": pd.Series(dtype=np.float64),
            }
        )
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["us"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        n = len(g)
        if n < 2:
            return empty
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        seg_sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = seg_sizes[seg_id] - loc - 1
        a = np.repeat(np.arange(n), reps)
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        keep = t[b] > t[a]  # equal-timestamp pairs have no slope
        a, b = a[keep], b[keep]
        if len(a) == 0:
            return empty
        slope = (v[b] - v[a]) * 3600000000.0 / (t[b] - t[a])
        d = pd.DataFrame({"user_id": u[a], "slope": slope}).sort_values(
            ["user_id", "slope"], kind="mergesort", ignore_index=True
        )
        uu = d["user_id"].to_numpy(np.int64)
        ss = d["slope"].to_numpy(np.float64)
        first = np.concatenate([[True], uu[1:] != uu[:-1]])
        st = np.flatnonzero(first)
        cnt = np.diff(np.concatenate([st, [len(uu)]]))
        lo = ss[st + (cnt - 1) // 2]
        hi = ss[st + cnt // 2]
        med = lo + (hi - lo) * 0.5  # quantile_cont's formula at p = 0.5
        return pd.DataFrame(
            {
                "user_id": uu[st],
                "n_pairs": cnt.astype(np.int64),
                "slope_per_hour": med,
            }
        )

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    out["slope_per_hour"] = _r6away(
        out["slope_per_hour"].to_numpy(np.float64)
    )
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


# -------------------------------------------------------- run lengths
def event_run_lengths(sf_dir: str) -> pd.DataFrame:
    """Per-user RUN-LENGTH profile of the event-type sequence: the
    number of maximal same-type runs and the longest run — the
    burstiness readout, and the gaps-and-islands shape over VALUES
    (``interval_coverage`` islands over time; this islands over the
    sequence).

    Shape: 4-column projection rides ONE user-hash exchange; the
    combine sorts each partition once ((user, ts, event_id)), finds run
    boundaries with one shifted view, and derives every run length from
    boundary-index diffs — no per-user Python.

    Determinism: pure integer counts; the (ts, event_id) sequence order
    is total."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_type": df["event_type"].astype(str),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "n_runs": pd.Series(dtype=np.int64),
                 "max_run": pd.Series(dtype=np.int64)}
            )
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [n]]))
        d = pd.DataFrame({"user_id": u[starts], "len": lens})
        out = d.groupby("user_id", as_index=False).agg(
            n_runs=("len", "size"), max_run=("len", "max")
        )
        return out

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_runs"] = out["n_runs"].astype(np.int64)
    out["max_run"] = out["max_run"].astype(np.int64)
    return out


# ---------------------------------------------------- weekly regularity
def weekly_regularity(sf_dir: str) -> pd.DataFrame:
    """Per-user weekly-activity regularity: number of DISTINCT active
    weeks, mean events per active week, and the sample variance of the
    per-week counts — the cadence-stability readout retention models
    feature on.

    Shape: (user, week) count partials -> ONE user-hash exchange ->
    per-partition vectorized moments over each user's weekly counts
    (int64 lanes n, s1, s2).

    Determinism: counts are exact int64; mean and variance are ONE
    mirrored float chain each (the ``value_zscore_by_type`` contract) —
    bit-identical, not just ROUND-close.  Single-week users report
    variance NULL (n-1 = 0) on both sides."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        wk = (
            df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
            // WEEK_US
        )
        return (
            pd.DataFrame(
                {"user_id": df["user_id"].to_numpy(np.int64), "wk": wk}
            )
            .groupby(["user_id", "wk"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby(["user_id", "wk"], as_index=False)["c"].sum()
        w["c2"] = w["c"].to_numpy(np.int64) ** 2
        out = w.groupby("user_id", as_index=False).agg(
            n_weeks=("c", "size"), s1=("c", "sum"), s2=("c2", "sum")
        )
        return out

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["user_id"],
            combine,
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    n = out["n_weeks"].to_numpy(np.int64).astype(np.float64)
    s1 = out["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = out["s2"].to_numpy(np.int64).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        var = np.where(
            n > 1, (s2 - s1 * s1 / n) / (n - 1.0), np.nan
        )
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "n_weeks": out["n_weeks"].astype(np.int64),
            "mean_weekly": _r6away(s1 / n),
            "var_weekly": np.where(np.isnan(var), np.nan, _r6away(var)),
        }
    )


# ----------------------------------------------------- active-day streaks
def active_day_streaks(sf_dir: str) -> pd.DataFrame:
    """Per-user ACTIVE-DAY STREAKS: distinct active days, number of
    maximal consecutive-day islands, and the longest streak — the
    engagement-habit readout (``event_run_lengths`` islands over the
    VALUE sequence; this islands over the calendar-day axis, the classic
    ``day - ROW_NUMBER`` gaps-and-islands).

    Shape: per-batch DISTINCT (user, day) partials shrink the exchange
    to the active-day lattice; ONE user-hash exchange; the combine
    dedups, sorts once, and derives every island from boundary-index
    diffs (new island <=> user change OR day jump != 1) — no per-user
    Python.

    Determinism: pure integer day indices (epoch_us // DAY_US) and
    counts."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": df["ts"].astype("datetime64[us]").astype(np.int64)
                // DAY_US,
            }
        ).drop_duplicates(ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "n_days": pd.Series(dtype=np.int64),
                 "n_streaks": pd.Series(dtype=np.int64),
                 "max_streak": pd.Series(dtype=np.int64)}
            )
        new_isl = np.ones(n, dtype=bool)
        new_isl[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        starts = np.flatnonzero(new_isl)
        lens = np.diff(np.concatenate([starts, [n]]))
        isl = pd.DataFrame({"user_id": u[starts], "len": lens})
        return isl.groupby("user_id", as_index=False).agg(
            n_days=("len", "sum"),
            n_streaks=("len", "size"),
            max_streak=("len", "max"),
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    for c in ("user_id", "n_days", "n_streaks", "max_streak"):
        out[c] = out[c].astype(np.int64)
    return out


# --------------------------------------------------------------- RFM
def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """Per-customer RFM profile over ``orders``: recency (days from the
    customer's latest order to the corpus-wide latest order), frequency
    (order count), monetary (lifetime spend) — the classic
    customer-value featurization.

    Shape: per-batch (custkey -> n, cents, maxday) partials; ONE
    custkey-hash exchange; the global anchor day is the max of the
    per-customer maxima (no second pass over the fact table).

    Determinism: monetary sums SCALED-DECIMAL CENTS in int64
    (o_totalprice is exactly 2-decimal) and divides by 100 ONCE — the
    CLAUDE.md order-independent float contract; recency/frequency are
    pure ints."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {
                "custkey": df["o_custkey"].to_numpy(np.int64),
                "cents": np.round(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64),
                "day": df["o_orderdate"]
                .astype("datetime64[us]")
                .astype(np.int64)
                // DAY_US,
            }
        )
        return t.groupby("custkey", as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"), maxday=("day", "max")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("custkey", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"), maxday=("maxday", "max")
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["custkey"], combine
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(custkey=np.int64, recency_days=np.int64,
                           frequency=np.int64, monetary=np.float64)
    out = out.sort_values("custkey", ignore_index=True)
    anchor = int(out["maxday"].max())
    return pd.DataFrame(
        {
            "custkey": out["custkey"].astype(np.int64),
            "recency_days": (anchor - out["maxday"].to_numpy(np.int64)),
            "frequency": out["n"].astype(np.int64),
            "monetary": _r6away(
                out["cents"].to_numpy(np.int64).astype(np.float64) / 100.0
            ),
        }
    )


# ---------------------------------------------------- type-set segments
def user_type_set_segments(sf_dir: str) -> pd.DataFrame:
    """Frequent-itemset-style EXACT set segmentation: how many users
    exhibit each exact SET of event types — the behavioral-segment
    census (``daily_mix_segments`` Venns (user, day) presence; this
    fingerprints the whole type COMBINATION per user).

    Shape: the type vocabulary is tiny and broadcast (one bounded
    unique-pass, no shuffle); sets ride as BITMASKS — a user's mask is
    the SUM of its DISTINCT per-type bits (OR == sum because bits are
    deduped before summing), so both the map partial and the
    post-exchange combine stay fully vectorized (dedup + groupby-sum;
    no per-user Python, CLAUDE.md map_groups invariant).  The combine
    emits per-mask partial counts, so the driver reduce is bounded by
    2^|vocab| regardless of user count.

    Determinism: masks and counts are pure int64; the bit order is the
    globally SORTED type vocabulary, mirrored by the oracle's
    ROW_NUMBER() OVER (ORDER BY event_type)."""
    # pass 1: bounded vocabulary (unique types per batch -> driver union)
    vocab = (
        _events(sf_dir, ["event_type"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"event_type": df["event_type"].astype(str).unique()}
            ),
            batch_format="pandas",
        )
        .to_pandas()["event_type"]
        .unique()
    )
    vocab = np.sort(vocab)
    nbits = len(vocab)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        codes = pd.Categorical(
            df["event_type"].astype(str), categories=vocab
        ).codes.astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "b": np.int64(1) << codes,
            }
        ).drop_duplicates(ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per_user = (
            g.drop_duplicates(["user_id", "b"])
            .groupby("user_id", as_index=False)["b"]
            .sum()
            .rename(columns={"b": "mask"})
        )
        return per_user.groupby("mask", as_index=False).size().rename(
            columns={"size": "n_users"}
        )

    parts = hash_combine(
        _events(sf_dir, ["user_id", "event_type"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["user_id"],
        combine,
    ).to_pandas()
    out = parts.groupby("mask", as_index=False)["n_users"].sum()
    m = out["mask"].to_numpy(np.int64)
    pop = np.zeros(len(out), dtype=np.int64)
    for i in range(nbits):
        pop += (m >> i) & 1
    return pd.DataFrame(
        {
            "mask": m,
            "n_types": pop,
            "n_users": out["n_users"].to_numpy(np.int64),
        }
    ).sort_values("mask", ignore_index=True)


# --------------------------------------------------------- max drawdown
def max_drawdown_per_user(sf_dir: str) -> pd.DataFrame:
    """Per-user MAXIMUM DRAWDOWN of the cumulative value series (peak
    minus trough of the running total, in event order) plus the peak and
    final levels — the sequential risk statistic (running-sum family
    sibling of ``cusum_changepoint``, which tracks shifted partial
    minima; this tracks the peak-relative drop).

    Shape: 4-column projection rides ONE user-hash exchange; the combine
    sorts once ((user, ts, event_id)), rebuilds per-user running sums
    from ONE global cumsum via segment-base subtraction (searchsorted
    precedent), and takes running peaks with the cythonized
    groupby.cummax — no per-user Python.

    Determinism: values snap once to the 2^10 lattice so every running
    sum, peak, and drawdown is an EXACT int64; the final /1024.0 is
    power-of-two exact — bitwise-equal to the SQL's integer window
    chain."""
    ds = _events(sf_dir, ["user_id", "value", "ts", "event_id"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "q": np.floor(
                    df["value"].to_numpy(np.float64) * 1024.0 + 0.5
                ).astype(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "dd_u": pd.Series(dtype=np.int64),
                 "pk_u": pd.Series(dtype=np.int64),
                 "fin_u": pd.Series(dtype=np.int64)}
            )
        cs = np.cumsum(q)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        base = (cs[starts] - q[starts])[seg]
        run = cs - base
        f = pd.DataFrame({"user_id": u, "run": run})
        cmx = f.groupby("user_id", sort=False)["run"].cummax().to_numpy(
            np.int64
        )
        f["dd"] = cmx - run
        out = f.groupby("user_id", as_index=False).agg(
            dd_u=("dd", "max"), pk_u=("run", "max"), fin_u=("run", "last")
        )
        return out

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "max_drawdown": out["dd_u"].to_numpy(np.int64) / 1024.0,
            "peak_cum": out["pk_u"].to_numpy(np.int64) / 1024.0,
            "final_cum": out["fin_u"].to_numpy(np.int64) / 1024.0,
        }
    )


# --------------------------------------------------- ordered string agg
def user_top_types_concat(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-user ORDERED STRING_AGG: the top-k event types by count
    (ties -> lexicographic), comma-joined in rank order, plus the
    events those types cover — the deterministic group-concat surface
    (``mode_per_user`` keeps rank 1; this assembles the ranked list as
    a STRING, the ARRAY_AGG/STRING_AGG parity point).

    Shape: (user, type) count partials ride ONE user-hash exchange; the
    combine ranks ALL its users in one vectorized sort + cython
    cumcount, pivots the <=k survivors to rank columns, and joins them
    with ONE Arrow binary_join_element_wise(null_handling='skip') call
    — no per-user Python string building (CLAUDE.md np.char /
    map_groups hazards).

    Determinism: counts are ints; the (n DESC, event_type) order is
    total; string assembly is order-identical to the oracle's
    STRING_AGG(... ORDER BY rn)."""
    import pyarrow as pa
    import pyarrow.compute as pc

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
        c["rn"] = c.groupby("user_id", sort=False).cumcount()
        c = c[c["rn"] < k]
        wide = c.pivot(index="user_id", columns="rn", values="event_type")
        cols = [
            pa.array(
                wide[r].to_numpy(object) if r in wide.columns
                else np.full(len(wide), None, object),
                type=pa.string(),  # all-None infers null type otherwise
            )
            for r in range(k)
        ]
        joined = pc.binary_join_element_wise(
            *cols, pa.scalar(","), null_handling="skip"
        )
        tot = c.groupby("user_id", sort=False)["n"].sum()
        return pd.DataFrame(
            {
                "user_id": wide.index.to_numpy(np.int64),
                "top_types": joined.to_pandas().to_numpy(object),
                "n_top": tot.reindex(wide.index).to_numpy(np.int64),
            }
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_top"] = out["n_top"].astype(np.int64)
    return out[["user_id", "top_types", "n_top"]]


# ---------------------------------------------------------------- SCD2
def scd2_intervals(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension (type-2) history of each user's
    event_type stream: consecutive same-type events collapse into one
    versioned validity interval [valid_from, valid_to) — the warehouse
    dimension-history build (``latest_event_state`` keeps only the
    current row; this keeps the full lineage; ``cdc_latest`` compacts
    the other direction).

    Shape: a 4-column projection rides ONE user-hash exchange; the
    combine sorts each partition once ((user, ts, event_id) — a total
    order), finds change boundaries with one shifted compare, and
    derives valid_to / version from boundary indices — no per-user
    Python, interval count bounded by the change mass, not events.

    Determinism: pure integer timestamps; the (ts, event_id) tie-break
    is mirrored in the oracle's window ORDER BY."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str),
             "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
             "event_id": df["event_id"].to_numpy(np.int64)}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "version": pd.Series(dtype=np.int64),
             "event_type": pd.Series(dtype=str),
             "valid_from_us": pd.Series(dtype=np.int64),
             "valid_to_us": pd.Series(dtype=np.float64)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        n = len(g)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        change = new_user.copy()
        change[1:] |= et[1:] != et[:-1]
        idx = np.flatnonzero(change)
        cu = u[idx]
        # valid_to = next change's ts within the same user, else NULL
        nxt = np.empty(len(idx), np.float64)
        nxt[:-1] = ts[idx[1:]].astype(np.float64)
        nxt[-1] = np.nan
        same_user = np.empty(len(idx), dtype=bool)
        same_user[:-1] = cu[1:] == cu[:-1]
        same_user[-1] = False
        nxt[~same_user] = np.nan
        first = np.concatenate([[True], ~same_user[:-1]])
        run_start = np.flatnonzero(first)
        version = (
            np.arange(len(idx))
            - np.repeat(run_start, np.diff(
                np.concatenate([run_start, [len(idx)]])))
            + 1
        )
        return pd.DataFrame(
            {"user_id": cu,
             "version": version.astype(np.int64),
             "event_type": et[idx],
             "valid_from_us": ts[idx],
             "valid_to_us": nxt}
        )

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["user_id"],
        combine,
    ).to_pandas()
    out = out.sort_values(["user_id", "version"], ignore_index=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["version"] = out["version"].astype(np.int64)
    out["event_type"] = out["event_type"].astype(str)
    out["valid_from"] = (
        out.pop("valid_from_us").to_numpy(np.int64).astype("datetime64[us]")
    )
    # open intervals close at the SCD2 end-of-time sentinel (not NULL:
    # NULL timestamps are a hash-compare liability, and the sentinel is
    # the standard warehouse convention for the current row)
    eot = np.datetime64("9999-12-31T23:59:59", "us").astype(np.int64)
    vt = out.pop("valid_to_us").to_numpy(np.float64)
    vt_int = np.full(len(vt), eot, np.int64)
    obs = ~np.isnan(vt)
    vt_int[obs] = vt[obs].astype(np.int64)
    out["valid_to"] = vt_int.astype("datetime64[us]")
    out["is_current"] = ~obs
    return out[["user_id", "version", "event_type", "valid_from",
                "valid_to", "is_current"]]


# ------------------------------------------------------- multi-touch
def multitouch_attribution(
    sf_dir: str, window_s: int = 1800, target: str = "purchase"
) -> pd.DataFrame:
    """Linear multi-touch attribution: every non-target event within the
    ``window_s`` seconds BEFORE a same-user target event is a "touch";
    each of the target's k touches earns credit 1/k.  Emitted per
    (touch_type, k) cell so every float is ONE division — the standard
    marketing-attribution readout (``attribution_window_30m`` pairs
    events; this assigns normalized credit).

    Engine shape: one user-hash exchange; each partition sorts once and
    resolves every target's backward window with TWO searchsorted calls
    over the segment-rebased time axis, pair-explodes only in-window
    touches, sizes k per target with one bincount, and reduces to the
    (touch_type, k) vocabulary.

    Determinism: counts are integers; credit = n / k is a single
    mirrored division per cell."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
             "event_id": df["event_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str)}
        )

    win_us = window_s * 1_000_000

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"touch_type": pd.Series(dtype=str),
             "k": pd.Series(dtype=np.int64),
             "n_touches": pd.Series(dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        n = len(g)
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        t_rel = t - t[starts[seg_id]]
        big = int(t_rel.max()) + win_us + 1
        t_adj = t_rel + seg_id * big
        tgt = np.flatnonzero(et == target)
        if len(tgt) == 0:
            return empty
        # backward window [ts - win, ts): strictly-before touches
        lo = np.searchsorted(t_adj, t_adj[tgt] - win_us, side="left")
        hi = np.searchsorted(t_adj, t_adj[tgt], side="left")
        reps = hi - lo
        if int(reps.sum()) == 0:
            return empty
        ti = np.repeat(np.arange(len(tgt)), reps)
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        j = np.repeat(lo, reps) + (np.arange(int(reps.sum()))
                                   - np.repeat(cum, reps))
        keep = et[j] != target
        ti, j = ti[keep], j[keep]
        if len(j) == 0:
            return empty
        k_per_t = np.bincount(ti, minlength=len(tgt))
        return (
            pd.DataFrame({"touch_type": et[j], "k": k_per_t[ti]})
            .groupby(["touch_type", "k"], as_index=False)
            .size()
            .rename(columns={"size": "n_touches"})
        )

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby(["touch_type", "k"], as_index=False)["n_touches"]
        .sum()
        .sort_values(["touch_type", "k"], ignore_index=True)
    )
    out["k"] = out["k"].astype(np.int64)
    out["n_touches"] = out["n_touches"].astype(np.int64)
    out["credit"] = _r6away(
        out["n_touches"].to_numpy(np.float64)
        / out["k"].to_numpy(np.float64)
    )
    return out


# --------------------------------------------------------- nearest join
def nearest_event_join(
    sf_dir: str, target: str = "purchase", probe: str = "click",
    band_s: int = 600,
) -> pd.DataFrame:
    """Nearest-neighbour TEMPORAL join: for every target event, the
    nearest same-user probe event within ±``band_s`` seconds — backward
    and forward candidates resolved per target, absolute-gap winner,
    ties to the earlier side ("which click does this purchase belong
    to"; ``asof_purchase_view`` is backward-only, ``band_join_cooccur``
    counts the whole band; this picks ONE neighbour).

    Engine shape: one user-hash exchange; each partition sorts once,
    takes prev/next probe INDEX per row with two maximum/minimum
    prefix scans over the probe-index lattice (the IGNORE-NULLS window
    shape, fully vectorized), then band-filters and arbitrates.

    Determinism: gaps are integer microseconds; tie -> 'prev' on both
    sides."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].astype(str)
        m = et.isin([target, probe])
        df = df[m]
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
             "event_id": df["event_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str)}
        )

    band_us = band_s * 1_000_000

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series(dtype=np.int64),
             "nearest_id": pd.Series(dtype=np.float64),
             "gap_us": pd.Series(dtype=np.float64),
             "side": pd.Series(dtype=str)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        n = len(g)
        new = np.concatenate([[True], u[1:] != u[:-1]])
        is_p = et == probe
        idx = np.arange(n)
        seg_id = np.cumsum(new) - 1
        # prev probe index (strictly before, same user): prefix max of
        # segment-offset probe indices; a carried value from an earlier
        # segment decodes to the wrong segment id and is rejected —
        # the vectorized IGNORE-NULLS LAST_VALUE shape
        adj = np.where(is_p, idx + seg_id * n, -1)
        run = np.maximum.accumulate(adj)
        prev_adj = np.concatenate([[-1], run[:-1]])
        prev_ok = (prev_adj >= 0) & (prev_adj // n == seg_id)
        prev_idx = np.where(prev_ok, prev_adj % n, 0)
        # next probe index: the same scan over the reversed sequence
        segmax = int(seg_id[-1])
        adj_r = np.where(
            is_p[::-1], idx + (segmax - seg_id[::-1]) * n, -1
        )
        run_r = np.maximum.accumulate(adj_r)
        nxt_adj_r = np.concatenate([[-1], run_r[:-1]])
        nxt_ok_r = (nxt_adj_r >= 0) & (
            nxt_adj_r // n == (segmax - seg_id[::-1])
        )
        nxt_idx_r = np.where(nxt_ok_r, nxt_adj_r % n, 0)
        nxt_ok = nxt_ok_r[::-1]
        nxt_idx = np.where(nxt_ok, n - 1 - nxt_idx_r[::-1], 0)
        tgt = np.flatnonzero(et == target)
        if len(tgt) == 0:
            return empty
        pi = prev_idx[tgt]
        pok = prev_ok[tgt]
        pg = np.where(pok, t[tgt] - t[pi], band_us + 1)
        ni = nxt_idx[tgt]
        nok = nxt_ok[tgt]
        ng = np.where(nok, t[ni] - t[tgt], band_us + 1)
        pg = np.where(pg <= band_us, pg, band_us + 1)
        ng = np.where(ng <= band_us, ng, band_us + 1)
        take_prev = (pg <= ng) & (pg <= band_us)
        take_next = (~take_prev) & (ng <= band_us)
        nearest = np.where(
            take_prev, eid[pi], np.where(take_next, eid[ni], -1)
        ).astype(np.float64)
        gap = np.where(take_prev, pg, np.where(take_next, ng, -1)).astype(
            np.float64
        )
        side = np.where(take_prev, "prev",
                        np.where(take_next, "next", "none"))
        none = side == "none"
        nearest[none] = np.nan
        gap[none] = np.nan
        return pd.DataFrame(
            {"event_id": eid[tgt], "nearest_id": nearest, "gap_us": gap,
             "side": side}
        )

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    out["event_id"] = out["event_id"].astype(np.int64)
    out["side"] = out["side"].astype(str)
    return out


# ----------------------------------------------------- growth accounting
def growth_accounting(sf_dir: str) -> pd.DataFrame:
    """Weekly growth accounting: every active (user, week) classifies as
    NEW (first week ever), RETAINED (active the week before) or
    RESURRECTED (a gap before this week), and each activity gap charges
    one CHURNED to the first silent week — the standard DAU/MAU
    decomposition identity actives(w) = new + retained + resurrected
    and churned(w) = actives(w-1) - retained(w)
    (``cohort_retention`` follows one cohort; this balances the whole
    ledger every week).

    Shape: distinct (user, week) cells ride ONE user-hash exchange;
    each partition classifies its users' sorted week lists with shifted
    compares (no per-user Python) and emits week-vocabulary-bounded
    (week, status) counts; churn rows past the corpus' last week are
    right-censored on the driver.

    Determinism: pure integer set logic on the week lattice."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "w": w}
        ).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["user_id", "w"],
                                            kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"week": pd.Series(dtype=np.int64),
                 "status": pd.Series(dtype=str),
                 "n": pd.Series(dtype=np.int64)}
            )
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap_prev = np.concatenate([[0], w[1:] - w[:-1]])
        status = np.where(
            new_user, "new",
            np.where(gap_prev == 1, "retained", "resurrected"),
        )
        # churn charges: the week AFTER any active week whose successor
        # is not the adjacent week (incl. each user's last week)
        last = np.concatenate([new_user[1:], [True]])
        gap_next = np.concatenate([w[1:] - w[:-1], [0]])
        churn = last | (gap_next > 1)
        cells = pd.concat(
            [pd.DataFrame({"week": w, "status": status}),
             pd.DataFrame({"week": w[churn] + 1,
                           "status": "churned"})],
            ignore_index=True,
        )
        return (
            cells.groupby(["week", "status"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(week=np.int64, status=object, n=np.int64)
    out = out.groupby(["week", "status"], as_index=False)["n"].sum()
    max_w = int(out.loc[out["status"] != "churned", "week"].max())
    out = out[out["week"] <= max_w].sort_values(
        ["week", "status"], ignore_index=True
    )
    out["week"] = out["week"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


# ----------------------------------------------------- value envelope
def daily_value_envelope(sf_dir: str) -> pd.DataFrame:
    """Exact p10/p90 envelope of each type's values per day (crossing
    rule on the 2^10 value lattice) — the corridor an anomaly monitor
    draws around a daily series (``zscore_anomaly_24h`` flags points;
    this emits the band itself).

    Shape: (type, day, lattice) count cells ride one exchange (bounded
    by observed distinct values, not rows); the crossing scan is one
    global cumsum + per-cell searchsorted over the reduced table.

    Determinism: integer crossings; the emitted floats are single
    lattice divisions."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        lat = np.floor(
            df["value"].to_numpy(np.float64) * 1024.0 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "day": day, "lat": lat})
            .groupby(["event_type", "day", "lat"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "day"],
            lambda g: g.groupby(["event_type", "day", "lat"],
                                as_index=False)["cnt"].sum(),
        )
        .to_pandas()
        .groupby(["event_type", "day", "lat"], as_index=False)["cnt"]
        .sum()
        .sort_values(["event_type", "day", "lat"], kind="mergesort",
                     ignore_index=True)
    )
    t = cells["event_type"].to_numpy()
    d = cells["day"].to_numpy(np.int64)
    cnt = cells["cnt"].to_numpy(np.int64)
    lat = cells["lat"].to_numpy(np.int64)
    n = len(cells)
    new = np.ones(n, dtype=bool)
    new[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [n]])
    rows = []
    for s, e in zip(starts, ends):
        c = cnt[s:e].cumsum()
        tot = int(c[-1])
        k10 = (tot + 9) // 10          # ceil(n/10)
        k90 = (9 * tot + 9) // 10      # ceil(9n/10)
        p10 = int(lat[s + np.searchsorted(c, k10)])
        p90 = int(lat[s + np.searchsorted(c, k90)])
        rows.append((t[s], int(d[s]), tot, p10, p90))
    out = pd.DataFrame(
        rows, columns=["event_type", "day", "n", "p10_lat", "p90_lat"]
    )
    out["day"] = out["day"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    out["p10_lat"] = out["p10_lat"].astype(np.int64)
    out["p90_lat"] = out["p90_lat"].astype(np.int64)
    out["p10"] = out["p10_lat"].to_numpy(np.float64) / 1024.0
    out["p90"] = out["p90_lat"].to_numpy(np.float64) / 1024.0
    return out.sort_values(["event_type", "day"], ignore_index=True)


# ------------------------------------------------------ typeset Jaccard
def typeset_jaccard_matrix(sf_dir: str) -> pd.DataFrame:
    """Pairwise Jaccard similarity between the OBSERVED daily
    behavioral segments (each segment = an exact event-type SET one
    (user, day) cell exhibited; ``user_type_set_segments`` is the
    lifetime variant, whose census collapses to one mask here),
    weighted by how many cells exhibit each segment — the
    segment-overlap map a targeting system reads, i.e. the
    set-similarity join collapsed onto its 2^|vocab| mask lattice.

    Shape: per-(user, day) bit partials ride ONE user-hash exchange;
    the combine ORs bits per cell and reduces to the mask census, so
    the pair explosion runs on <= 2^|vocab| rows regardless of users.

    Determinism: integer popcounts; jaccard is one mirrored division."""
    vocab = np.sort(
        _events(sf_dir, ["event_type"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"event_type": df["event_type"].astype(str).unique()}
            ),
            batch_format="pandas",
        )
        .to_pandas()["event_type"]
        .unique()
    )
    DAY_US = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        codes = pd.Categorical(
            df["event_type"].astype(str), categories=vocab
        ).codes.astype(np.int64)
        day = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day,
             "b": np.int64(1) << codes}
        ).drop_duplicates(ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per_cell = (
            g.drop_duplicates(["user_id", "day", "b"])
            .groupby(["user_id", "day"], as_index=False)["b"]
            .sum()
            .rename(columns={"b": "mask"})
        )
        return (
            per_cell.groupby("mask", as_index=False)
            .size()
            .rename(columns={"size": "n_cells"})
        )

    census = (
        hash_combine(
            _events(sf_dir, ["user_id", "ts", "event_type"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby("mask", as_index=False)["n_cells"]
        .sum()
        .sort_values("mask", ignore_index=True)
    )
    m = census["mask"].to_numpy(np.int64)
    nu = census["n_cells"].to_numpy(np.int64)
    k = len(m)
    if k < 2:
        return pd.DataFrame(
            {"mask_a": pd.Series(dtype=np.int64),
             "mask_b": pd.Series(dtype=np.int64),
             "n_cells_a": pd.Series(dtype=np.int64),
             "n_cells_b": pd.Series(dtype=np.int64),
             "jaccard": pd.Series(dtype=np.float64)}
        )
    ia, ib = np.triu_indices(k, 1)
    a, b = m[ia], m[ib]
    inter = a & b
    union = a | b
    pop_i = np.zeros(len(a), np.int64)
    pop_u = np.zeros(len(a), np.int64)
    for i in range(64):
        pop_i += (inter >> i) & 1
        pop_u += (union >> i) & 1
    jac = _r6away(pop_i.astype(np.float64) / pop_u.astype(np.float64))
    out = pd.DataFrame(
        {"mask_a": a, "mask_b": b, "n_cells_a": nu[ia],
         "n_cells_b": nu[ib], "jaccard": jac}
    ).sort_values(["mask_a", "mask_b"], ignore_index=True)
    return out


# ----------------------------------------------------------- Holt trend
def holt_linear_1h(sf_dir: str) -> pd.DataFrame:
    """Holt linear (level + trend) exponential smoothing over each
    user's observed hourly buckets with alpha = beta = 0.5:
    s_i = 0.5*x_i + 0.5*(s + b);  b_i = 0.5*(s_i - s) + 0.5*b — the
    trend-aware sibling of ``ewma_1h`` (level only) and the
    two-state member of the sequential-kernel family (the Kalman
    smoother is the uncertainty-aware limit).

    Shape: exact-cents partials, one user-hash exchange, per-partition
    sequential scan (the recurrence is order-2; halving weights keep
    every multiply EXACT so the engine loop and the oracle's recursive
    CTE agree bitwise, the ewma_1h contract).

    Scale note: the loop is per OBSERVED bucket inside one partition —
    users parallelize across partitions; see CLAUDE.md sequential
    kernels."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (
            df["ts"].astype("datetime64[us]").astype(np.int64)
            // HOUR_US * HOUR_US
        )
        c = np.floor(
            df["value"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "bucket_us": b, "v": c})
            .groupby(["user_id", "bucket_us"], as_index=False)["v"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["v"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        x = g["v"].to_numpy(np.float64) / 100.0
        n = len(g)
        s_out = np.empty(n)
        b_out = np.empty(n)
        s = b = 0.0
        prev_u = None
        for i in range(n):
            if u[i] != prev_u:
                s, b = x[i], 0.0
                prev_u = u[i]
            else:
                s_new = 0.5 * x[i] + 0.5 * (s + b)
                b = 0.5 * (s_new - s) + 0.5 * b
                s = s_new
            s_out[i] = s
            b_out[i] = b
        out = pd.DataFrame(
            {"user_id": u, "bucket_us": g["bucket_us"].to_numpy(np.int64),
             "level": s_out, "trend": b_out}
        )
        return out

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .sort_values(["user_id", "bucket_us"], ignore_index=True)
    )
    res = pd.DataFrame(
        {"user_id": out["user_id"].astype(np.int64),
         "bucket_start": out["bucket_us"].to_numpy(np.int64)
         .astype("datetime64[us]"),
         "level": _r6away(out["level"].to_numpy(np.float64)),
         "trend": _r6away(out["trend"].to_numpy(np.float64))}
    )
    return res


# ----------------------------------------------------------- state panel
def state_panel_1h(sf_dir: str, ttl_h: int = 6) -> pd.DataFrame:
    """Point-in-time state panel: at every hourly tick between a user's
    first and last event, the event_type of the LATEST event at or
    before the tick — 'expired' once the state is older than ``ttl_h``
    hours — the feature-store snapshot builder (``scd2_intervals``
    stores the history; this SAMPLES it on the training grid;
    ``asof_purchase_view`` is the event-driven sibling).

    Engine shape: one user-hash exchange; each partition generates its
    users' tick axes with segment arange arithmetic and resolves every
    tick with ONE searchsorted over the segment-rebased event axis —
    the distributed ASOF join, ties broken at max event_id by the
    (ts, event_id) sort order (plain ASOF JOIN leaves equal-timestamp
    ties unspecified; this contract is total).

    Determinism: integer microsecond comparisons throughout."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
             "event_id": df["event_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str)}
        )

    ttl_us = ttl_h * HOUR_US

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "tick": pd.Series(dtype="datetime64[us]"),
             "state": pd.Series(dtype=str)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        n = len(g)
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        ends = starts + sizes
        first_t = t[starts]
        last_t = t[ends - 1]
        h0 = first_t // HOUR_US
        h1 = last_t // HOUR_US
        reps = (h1 - h0 + 1).astype(np.int64)
        seg_of_tick = np.repeat(np.arange(len(starts)), reps)
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        ticks = (
            np.repeat(h0, reps)
            + (np.arange(int(reps.sum())) - np.repeat(cum, reps))
        ) * HOUR_US
        # one searchsorted over the segment-rebased event axis
        base = t[starts]
        big = int((t - base[seg_id]).max()) + ttl_us + HOUR_US + 2
        t_adj = (t - base[seg_id]) + seg_id * big
        q_adj = (ticks - base[seg_of_tick]) + seg_of_tick * big
        pos = np.searchsorted(t_adj, q_adj, side="right") - 1
        valid = pos >= starts[seg_of_tick]
        pos_c = np.maximum(pos, 0)
        age = ticks - t[pos_c]
        state = np.where(
            ~valid, "none",
            np.where(age > ttl_us, "expired", et[pos_c]),
        )
        return pd.DataFrame(
            {"user_id": u[starts][seg_of_tick],
             "tick": ticks.astype("datetime64[us]"),
             "state": state}
        )

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .sort_values(["user_id", "tick"], ignore_index=True)
    )
    out["user_id"] = out["user_id"].astype(np.int64)
    out["state"] = out["state"].astype(str)
    return out


# -------------------------------------------------------- repeat cohorts
def customer_repeat_cohorts(sf_dir: str) -> pd.DataFrame:
    """Repeat-purchase rate by acquisition cohort: customers grouped by
    their FIRST order month; per cohort — size, how many ordered again
    ever, the total order count, and the repeat rate — the lifetime
    loyalty readout on the ORDERS axis (``cohort_retention`` tracks
    event-stream comebacks; this tracks transactions).

    Shape: per-customer (first-month, n_orders) partials ride ONE
    custkey-hash exchange; the reduce is month-vocabulary bounded.

    Determinism: all-integer counts; repeat_rate is one mirrored
    division."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame({"cust": df["o_custkey"].to_numpy(np.int64),
                          "us": us})
            .groupby("cust", as_index=False)
            .agg(first_us=("us", "min"), n_orders=("us", "size"))
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("cust", as_index=False).agg(
            first_us=("first_us", "min"), n_orders=("n_orders", "sum")
        )
        cohort = (
            agg["first_us"].to_numpy(np.int64).astype("datetime64[us]")
            .astype("datetime64[M]").astype(str)
        )
        d = pd.DataFrame(
            {"cohort_month": cohort,
             "n_customers": 1,
             "n_repeat": (agg["n_orders"].to_numpy(np.int64) >= 2)
             .astype(np.int64),
             "n_orders": agg["n_orders"].to_numpy(np.int64)}
        )
        return d.groupby("cohort_month", as_index=False).sum()

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["cust"],
            combine,
        )
        .to_pandas()
        .groupby("cohort_month", as_index=False)[
            ["n_customers", "n_repeat", "n_orders"]
        ]
        .sum()
        .sort_values("cohort_month", ignore_index=True)
    )
    for c in ("n_customers", "n_repeat", "n_orders"):
        out[c] = out[c].astype(np.int64)
    out["repeat_rate"] = _r6away(
        out["n_repeat"].to_numpy(np.float64)
        / out["n_customers"].to_numpy(np.float64)
    )
    out["cohort_month"] = out["cohort_month"].astype(str)
    return out
