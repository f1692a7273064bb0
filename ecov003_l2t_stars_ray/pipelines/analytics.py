"""Operator-level pipelines over the driver's testdata tables.

Each function takes ``sf_dir`` and returns a small result (pandas) for the
driver's DuckDB-oracle comparison. Float aggregates are ROUNDed (6 dp) on
BOTH sides so distributed partial-sum ordering cannot flip the value hash.

All aggregations follow the engine's canonical shape (see
``functions.shuffle.hash_combine``): vectorized map-side partials, one
int-keyed hash shuffle, vectorized per-partition combine — never the
per-block-expensive builtin Aggregate operator, never a per-tiny-group
Python call.

SURVEY.md §2 operators re-expressed over generic tables: bucketed rollups
(M13/A1), lag-latency (cadence deltas), dense-axis gap fill (S4/J1),
priority coalesce (J4), as-of join (J1), dedup (A7), top-k (O2/O4),
watermark/late split (§2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.shuffle import hash_combine

US = 1_000_000
WIDTHS = {"1m": 60 * US, "1h": 3600 * US, "1d": 86400 * US}


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _round6(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(6)
    return df


# ------------------------------------------------------------ bucket rollups
def events_rollup(sf_dir: str, tier: str) -> pd.DataFrame:
    """Per-(user, bucket) count/min/max/sum/avg of value — map-side combine
    then hash-partitioned final combine (A1/M13 analog)."""
    width = WIDTHS[tier]
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b, "v": df["value"]})
            .groupby(["user_id", "bucket_us"], sort=False)["v"]
            .agg(n="count", vmin="min", vmax="max", vsum="sum")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["user_id", "bucket_us"], as_index=False)
            .agg(n=("n", "sum"), min_value=("vmin", "min"),
                 max_value=("vmax", "max"), sum_value=("vsum", "sum"))
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id", "bucket_us"], combine,
    ).to_pandas()
    out["avg_value"] = out["sum_value"] / out["n"]
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    out = _round6(out, ["min_value", "max_value", "sum_value", "avg_value"])
    return out[
        ["user_id", "bucket_start", "n", "min_value", "max_value", "sum_value", "avg_value"]
    ].sort_values(["user_id", "bucket_start"], ignore_index=True)


_GAP_FILL_CACHE: dict[str, pd.DataFrame] = {}


def gap_fill_1m(sf_dir: str) -> pd.DataFrame:
    """Dense per-user minute axis with gap flags (S4/J1 dense-stack analog).
    Densification is vectorized across ALL users of a hash partition.
    Memoized per sf_dir: the Kalman and trailing-flag queries reuse it."""
    if sf_dir in _GAP_FILL_CACHE:
        return _GAP_FILL_CACHE[sf_dir].copy()
    ds = _events(sf_dir, ["user_id", "ts"])
    width = WIDTHS["1m"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b})
            .groupby(["user_id", "bucket_us"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["n"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        bounds = g.groupby("user_id", sort=True).agg(
            first=("bucket_us", "min"), last=("bucket_us", "max")
        ).reset_index()
        start = bounds["first"].to_numpy()
        lens = ((bounds["last"].to_numpy() - start) // width + 1).astype(np.int64)
        total = int(lens.sum())
        cum = np.cumsum(lens) - lens
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
        axis = np.repeat(start, lens) + intra * width
        series_of = np.searchsorted(
            bounds["user_id"].to_numpy(), g["user_id"].to_numpy()
        )
        pos = cum[series_of] + (g["bucket_us"].to_numpy() - start[series_of]) // width
        n = np.zeros(total, dtype=np.int64)
        n[pos] = g["n"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": np.repeat(bounds["user_id"].to_numpy(), lens),
                "bucket_start": axis.view("datetime64[us]"),
                "n": n,
                "gap_filled": n == 0,
            }
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out[["user_id", "bucket_start", "n", "gap_filled"]].sort_values(
        ["user_id", "bucket_start"], ignore_index=True
    )
    _GAP_FILL_CACHE.clear()
    _GAP_FILL_CACHE[sf_dir] = out
    return out.copy()


def kalman_smooth_events(sf_dir: str) -> pd.DataFrame:
    """Kalman gap-fill over per-user 1m counts (non-SQL; rows-only check).
    One concatenated-series pass (reset at user boundaries), same kernel
    as the flagship finalize."""
    from ..schema import COLD_START
    from ..stages.finalize import _kalman_batch

    dense = gap_fill_1m(sf_dir)  # already sorted by (user_id, bucket_start)
    u = dense["user_id"].to_numpy()
    starts = np.ones(len(dense), dtype=bool)
    starts[1:] = u[1:] != u[:-1]
    obs = ~dense["gap_filled"].to_numpy()
    y = np.where(obs, dense["n"].to_numpy().astype(np.float64), 0.0)
    value, sd = _kalman_batch(
        y, obs, starts,
        np.full(len(dense), COLD_START["mean"]),
        np.full(len(dense), COLD_START["sd"] ** 2),
    )
    out = dense.copy()
    out["value"] = np.round(value, 6)
    out["value_sd"] = np.round(sd, 6)
    return out


# ----------------------------------------------------------------- lag gaps
def user_latency_stats(sf_dir: str) -> pd.DataFrame:
    """Inter-event gap stats per user; order = (ts, event_id) for tie
    stability. Gap derivation is vectorized across a partition's users."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = np.full(len(g), np.nan)
        gaps[same] = (t[same] - np.roll(t, 1)[same]) / 1e6
        d = pd.DataFrame({"user_id": u, "gap_s": gaps}).dropna()
        out = d.groupby("user_id", as_index=False)["gap_s"].agg(
            n_gaps="count", avg_gap_s="mean", min_gap_s="min", max_gap_s="max"
        )
        return _round6(out, ["avg_gap_s", "min_gap_s", "max_gap_s"])

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


# -------------------------------------------------------------------- TPC-H
def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary with map-side combine."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        df = t.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["charge"] = df["disc_price"] * (1 + df["l_tax"])
        return (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_charge=("charge", "sum"),
                sum_disc=("l_discount", "sum"),
                count_order=("l_quantity", "count"),
            )
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], combine, num_partitions=4,
    ).to_pandas()
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_price"] = out["sum_base_price"] / out["count_order"]
    out["avg_disc"] = out.pop("sum_disc") / out["count_order"]
    out = _round6(
        out,
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
         "avg_qty", "avg_price", "avg_disc"],
    )
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
         "count_order"]
    ].sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)


def revenue_per_nation(sf_dir: str) -> pd.DataFrame:
    """orders x customer x nation revenue — broadcast small-side join
    (dimension tables via ray.put, no shuffle; J2-style lookup)."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    lookup = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    ).set_index("c_custkey")["n_name"]
    ref = ray.put(lookup)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(ref)
        names = df["o_custkey"].map(lk)
        return (
            pd.DataFrame({"n_name": names, "rev": df["o_totalprice"]})
            .groupby("n_name", sort=False)["rev"]
            .agg(revenue="sum", n_orders="count")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("n_name", as_index=False).sum()

    out = hash_combine(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).map_batches(partial, batch_format="pandas"),
        ["n_name"], combine, num_partitions=4,
    ).to_pandas()
    out = _round6(out, ["revenue"])
    return out[["n_name", "revenue", "n_orders"]].sort_values("n_name", ignore_index=True)


# --------------------------------------------------------- sorts/limits/topk
def top_users(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k users by event count (deterministic tie-break by user_id);
    local top-k per partition would bound the collect at scale."""
    ds = _events(sf_dir, ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", sort=False).size().reset_index(name="n")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["n"].sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine,
        num_partitions=4,
    ).to_pandas()
    return (
        out.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)[["user_id", "n"]]
    )


# ------------------------------------------------------------------- joins
def purchase_after_view_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join: latest view at ts <= purchase ts per user — one
    vectorized ``merge_asof(by=user_id)`` per hash partition (J1 analog)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    ds = ds.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["event_type"], value_set=pa.array(["purchase", "view"]))
        ),
        batch_format="pyarrow",
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        buys = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        views = g[g["event_type"] == "view"][["user_id", "ts"]].rename(
            columns={"ts": "view_ts"}
        )
        if not len(buys):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "user_id": pd.Series(dtype="int64"),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "view_ts": pd.Series(dtype="datetime64[us]")}
            )
        if not len(views):
            out = buys.copy()
            out["view_ts"] = pd.NaT
            return out
        return pd.merge_asof(
            buys, views.sort_values("view_ts"),
            left_on="ts", right_on="view_ts", by="user_id", direction="backward",
        )

    out = (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    out["ts"] = out["ts"].astype("datetime64[us]")
    out["view_ts"] = out["view_ts"].astype("datetime64[us]")
    return out[["event_id", "user_id", "ts", "view_ts"]]


def coalesce_by_priority(sf_dir: str) -> pd.DataFrame:
    """Mosaic-coalesce analog (J4): per lang keep the doc from the
    highest-priority source (min numeric source suffix, then min doc_id)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["priority"] = df["source"].str.slice(3).astype(np.int64)
        df = df.sort_values(["lang", "priority", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(1)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "priority", "doc_id"], kind="mergesort")
        return g.groupby("lang", sort=False).head(1)

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["lang"], combine,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    return out[["lang", "doc_id", "source"]].rename(columns={"doc_id": "keep_id"})


# ------------------------------------------------------- watermark/late data
def late_events(sf_dir: str) -> pd.DataFrame:
    """Events older than (global watermark - 1 day) per user — the give-up
    horizon split (VIIRS_GIVEUP_DAYS analog, ``constants.py:27``)."""
    wm = pd.Timestamp(_events(sf_dir, ["ts"]).max("ts"))
    cutoff = wm - pd.Timedelta(days=1)
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        t = t.filter(pc.less(t["ts"], pa.scalar(cutoff)))
        df = t.to_pandas()
        return df.groupby("user_id", sort=False).size().reset_index(name="n_late")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["n_late"].sum()

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pyarrow"), ["user_id"], combine,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)[["user_id", "n_late"]]
    )


# --------------------------------------------------- calibration / variance
def calibrate_purchase_to_click(sf_dir: str) -> pd.DataFrame:
    """K5 analog (``calibrate_fine_to_coarse.py:10-60``): aggregate two
    'instruments' onto a common (user, day) grid, global OLS between them
    (driver-side on the small agg — A6, ``calibrate_fine_to_coarse.py:51``),
    with the reference's minimum-support guard (<30 pairs -> no calibration,
    ``:39-44``). Returns one row: slope, intercept, n_pairs."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts", "value"])
    width = WIDTHS["1d"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "click"])]
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        return (
            pd.DataFrame(
                {"user_id": df["user_id"], "d": b,
                 "event_type": df["event_type"], "v": df["value"]}
            )
            .groupby(["user_id", "d", "event_type"], sort=False)["v"]
            .agg(s="sum", n="count")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "d", "event_type"], as_index=False).sum()

    agg = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id", "d"], combine
    ).to_pandas()
    agg["avg"] = agg["s"] / agg["n"]
    piv = agg.pivot_table(
        index=["user_id", "d"], columns="event_type", values="avg", aggfunc="first"
    ).dropna()
    x = piv["purchase"].to_numpy(dtype=np.float64)
    y = piv["click"].to_numpy(dtype=np.float64)
    n = len(x)
    if n < 30:  # reference min-support guard
        return pd.DataFrame({"slope": [np.nan], "intercept": [np.nan], "n_pairs": [n]})
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = sy / n - slope * sx / n
    return pd.DataFrame(
        {"slope": [round(slope, 6)], "intercept": [round(intercept, 6)], "n_pairs": [n]}
    )


def spinup_variance(sf_dir: str) -> pd.DataFrame:
    """K2 analog (windowed variance over the spin-up stack, ``jl:151-183``):
    sample variance of value per user over the user's first 7 days."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"user_id": df["user_id"], "ts_us": t, "v": df["value"],
             "v2": df["value"] * df["value"]}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["ts_us"].transform("min")
        keep = g[g["ts_us"] < first + 7 * WIDTHS["1d"]]
        agg = keep.groupby("user_id", as_index=False).agg(
            n=("v", "count"), s=("v", "sum"), s2=("v2", "sum")
        )
        n = agg["n"].to_numpy(dtype=np.float64)
        var = (agg["s2"] - agg["s"] * agg["s"] / n) / (n - 1)
        agg["var_value"] = np.round(var, 6)
        return agg[["user_id", "n", "var_value"]]

    return (
        hash_combine(ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


def gap_flag_1m(sf_dir: str) -> pd.DataFrame:
    """A2 analog (trailing 7-day observation flag, ``jl:263-288``): dense
    per-user minute axis with `observed_recently` = any event in the
    trailing 7 buckets (rolling max over the dense axis)."""
    dense = gap_fill_1m(sf_dir)

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_start", kind="mergesort").copy()
        roll = g["n"].rolling(window=7, min_periods=1).max()
        g["observed_recently"] = roll.to_numpy() > 0
        return g

    out = dense.groupby("user_id", group_keys=False).apply(flag)
    return out[["user_id", "bucket_start", "n", "observed_recently"]].sort_values(
        ["user_id", "bucket_start"], ignore_index=True
    )


# ------------------------------------------------------ windows / sessions
def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows per user (30-min inactivity gap rule): count of
    sessions, total events, longest session span. The session-window
    streaming operator (SURVEY §2.9) over the generic events table;
    vectorized across a partition's users."""
    gap_us = gap_minutes * 60 * US
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gap_break = np.ones(len(g), dtype=bool)
        gap_break[1:] = (t[1:] - t[:-1]) > gap_us
        session_start = new_user | gap_break
        sid = np.cumsum(session_start) - 1
        d = pd.DataFrame({"user_id": u, "sid": sid, "ts_us": t})
        per_session = d.groupby(["user_id", "sid"], as_index=False).agg(
            n=("ts_us", "count"), lo=("ts_us", "min"), hi=("ts_us", "max")
        )
        per_session["span_s"] = (per_session["hi"] - per_session["lo"]) / 1e6
        out = per_session.groupby("user_id", as_index=False).agg(
            n_sessions=("sid", "count"),
            n_events=("n", "sum"),
            max_session_s=("span_s", "max"),
        )
        out["max_session_s"] = out["max_session_s"].round(6)
        return out

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


def moving_avg_1h(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Trailing moving average over hourly per-user sums (window aggregate,
    M13/A5 analog): AVG of the current + 2 preceding OBSERVED hourly
    buckets (row-frame semantics, matching SQL ROWS BETWEEN)."""
    hourly = events_rollup(sf_dir, "1h")[["user_id", "bucket_start", "sum_value"]]

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_start", kind="mergesort").copy()
        g["ma3"] = (
            g["sum_value"].rolling(window=window, min_periods=1).mean().round(6)
        )
        return g

    out = hourly.groupby("user_id", group_keys=False).apply(roll)
    return out[["user_id", "bucket_start", "ma3"]].sort_values(
        ["user_id", "bucket_start"], ignore_index=True
    )


def distinct_event_types(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT) per user via distinct-pair partials (the
    scale-safe exact-distinct shape: dedup map-side, count reduce-side)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["user_id", "event_type"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        return g.groupby("user_id", as_index=False).agg(n_types=("event_type", "count"))

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


# ------------------------------------------- derived columns / LUT / blends
def time_features(sf_dir: str) -> pd.DataFrame:
    """M9 analog (solar-zenith trig from DOY+hour, ``BRDF/SZA.py:47-64``):
    trig derived columns from event time — sin/cos of time-of-day angle."""
    ds = _events(sf_dir, ["event_id", "ts"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]")
        sec = (
            t.dt.hour.to_numpy() * 3600
            + t.dt.minute.to_numpy() * 60
            + t.dt.second.to_numpy()
        ).astype(np.float64)
        ang = 2.0 * np.pi * sec / 86400.0
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "tod_sin": np.round(np.sin(ang), 6),
                "tod_cos": np.round(np.cos(ang), 6),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def global_mean_fallback(sf_dir: str) -> pd.DataFrame:
    """M6 + A4 + M10 analog: zero-as-missing normalizer
    (``generate_NDVI_coarse_image.py:29``) with the global nan-mean
    fallback broadcast back into the per-row map
    (``BRDF/BRDF.py:28-29``, ``jl:370-374``): two-stage global scalar agg
    then vectorized fill."""
    ds = _events(sf_dir, ["event_id", "value"])
    # stage 1: global mean over non-missing (zero = missing), tiny agg
    parts = ds.map_batches(
        lambda df: pd.DataFrame(
            {"s": [df.loc[df["value"] != 0, "value"].sum()],
             "n": [int((df["value"] != 0).sum())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    gmean = float(parts["s"].sum() / parts["n"].sum())
    ref = ray.put(gmean)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        gm = ray.get(ref)
        v = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {"event_id": df["event_id"],
             "value_filled": np.round(np.where(v == 0, gm, v), 6)}
        )

    return (
        ds.map_batches(fill, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


#: deterministic 10x8 LUT (value decile x 3-hour band), formula-defined so
#: the SQL oracle can reproduce it; the Ray side does a REAL broadcast
#: array lookup (M11 analog, ``BRDF/BRDF.py:7-17``).
_LUT = (np.arange(10)[:, None] * 8 + np.arange(8)[None, :]).astype(np.float64) / 10.0


def lut_lookup(sf_dir: str) -> pd.DataFrame:
    """M11 analog: 2-D lookup table digitized on (value, hour) with the
    table broadcast once via ray.put and indexed vectorized per batch."""
    ds = _events(sf_dir, ["event_id", "ts", "value"])
    ref = ray.put(_LUT)

    def look(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(ref)
        v = df["value"].to_numpy(dtype=np.float64)
        h = df["ts"].astype("datetime64[us]").dt.hour.to_numpy()
        vbin = np.minimum(9, (v // 40).astype(np.int64))
        hbin = h // 3
        return pd.DataFrame(
            {"event_id": df["event_id"], "lut_value": lut[vbin, hbin]}
        )

    return (
        ds.map_batches(look, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
