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

from ..functions.scalars import round6_away as _r6away
from ..functions.shuffle import hash_combine, typed_empty, typed_pandas

US = 1_000_000
WIDTHS = {"1m": 60 * US, "1h": 3600 * US, "1d": 86400 * US}


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _round6(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = _r6away(df[c])
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


_DENSE_1M_CACHE: dict[str, "ray.data.Dataset"] = {}


def _dense_1m(sf_dir: str, columns: list[str]) -> pd.DataFrame:
    """Dense per-user minute axis: n, gap_filled, trailing-7 observation
    flag, and Kalman gap-fill — ALL computed inside the distributed
    partition combine (each user's rows are co-located there), never on the
    driver. The S4/J1 dense-stack + A2 trailing flag + K1 smoother analogs
    over the generic events table; memoized per sf_dir because three
    queries project different columns of the same result.

    The cache holds a MATERIALIZED DATASET (blocks stay in the object
    store, which spills under pressure), not a driver frame — the bucket
    axis grows linearly with the time span, so driver RSS must only pay
    for the columns a single query projects out."""
    def _proj(dense: ray.data.Dataset) -> pd.DataFrame:
        if dense.schema() is None:  # all rows filtered (q11 class);
            # materialized => no execution cost, schema statically known
            kinds = {"user_id": np.int64, "bucket_start": "datetime64[us]",
                     "n": np.int64, "gap_filled": bool,
                     "observed_recently": bool, "value": np.float64,
                     "value_sd": np.float64}
            return typed_empty(**{c: kinds[c] for c in columns})
        return (
            dense.select_columns(columns)
            .to_pandas()
            .sort_values(["user_id", "bucket_start"], ignore_index=True)
        )

    if sf_dir in _DENSE_1M_CACHE:
        return _proj(_DENSE_1M_CACHE[sf_dir])
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
        from ..schema import COLD_START
        from ..stages.finalize import _kalman_batch

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
        obs = n > 0
        # trailing window-7 max (A2): 6 shifted copies, masked at series
        # starts — vectorized across every user of the partition
        roll = n.copy()
        for j in range(1, 7):
            shifted = np.zeros(total, dtype=np.int64)
            shifted[j:] = n[:-j]
            np.maximum(roll, np.where(intra >= j, shifted, 0), out=roll)
        # Kalman gap-fill (K1), same kernel as the flagship finalize
        starts = np.zeros(total, dtype=bool)
        starts[cum] = True
        value, sd, _ = _kalman_batch(
            np.where(obs, n.astype(np.float64), 0.0), obs, starts,
            np.full(len(bounds), COLD_START["mean"]),
            np.full(len(bounds), COLD_START["sd"] ** 2),
        )
        return pd.DataFrame(
            {
                "user_id": np.repeat(bounds["user_id"].to_numpy(), lens),
                "bucket_start": axis.view("datetime64[us]"),
                "n": n,
                "gap_filled": ~obs,
                "observed_recently": roll > 0,
                "value": _r6away(value),
                "value_sd": _r6away(sd),
            }
        )

    dense = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).materialize()
    _DENSE_1M_CACHE.clear()
    _DENSE_1M_CACHE[sf_dir] = dense
    return _proj(dense)


def gap_fill_1m(sf_dir: str) -> pd.DataFrame:
    """Dense per-user minute axis with gap flags (S4/J1 dense-stack analog)."""
    return _dense_1m(sf_dir, ["user_id", "bucket_start", "n", "gap_filled"])


def kalman_smooth_events(sf_dir: str) -> pd.DataFrame:
    """Kalman gap-fill over per-user 1m counts (non-SQL; rows-only check).
    Runs inside the partition combine — not on the driver."""
    return _dense_1m(
        sf_dir, ["user_id", "bucket_start", "n", "gap_filled", "value", "value_sd"]
    )


# ----------------------------------------------------------------- lag gaps
def user_latency_stats(sf_dir: str) -> pd.DataFrame:
    """Inter-event gap stats per user; order = (ts, event_id) for tie
    stability. Gap derivation is vectorized across a partition's users.

    Determinism contract: gaps are INTEGER microseconds, summed exactly in
    int64 (order-independent), converted to seconds only at the end with
    the same float64 op order as the SQL oracle — so block order cannot
    flip the driver's value hash (the round-1 avg_gap_s failure mode)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        d = pd.DataFrame(
            {"user_id": u[same], "gap_us": t[same] - np.roll(t, 1)[same]}
        )
        a = d.groupby("user_id", as_index=False)["gap_us"].agg(
            n_gaps="count", sum_us="sum", min_us="min", max_us="max"
        )
        n = a["n_gaps"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": a["user_id"],
                "n_gaps": a["n_gaps"],
                # exact int sums -> one double division chain, mirroring
                # ROUND(CAST(SUM(gap_us) AS DOUBLE)/COUNT(*)/1000000.0, 6)
                "avg_gap_s": np.round(
                    a["sum_us"].to_numpy(dtype=np.float64) / n / 1e6, 6
                ),
                "min_gap_s": np.round(
                    a["min_us"].to_numpy(dtype=np.float64) / 1e6, 6
                ),
                "max_gap_s": np.round(
                    a["max_us"].to_numpy(dtype=np.float64) / 1e6, 6
                ),
            }
        )

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


# -------------------------------------------------------------------- TPC-H
def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary with map-side combine.

    Determinism contract: TPC-H decimals are exact in scaled integers
    (cents; 1e-4 for disc_price, 1e-6 for charge), so partials accumulate
    in int64 — bit-identical regardless of block order — and convert to
    float64 once at the end with the same op order as the SQL oracle.
    (Round-1 failure mode: double partial sums at ~1e9 magnitude have ulp
    ~1.2e-7, which ROUND(x, 6) does not absorb.)"""
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
        qi = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        price_c = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        tax_c = np.round(df["l_tax"].to_numpy() * 100).astype(np.int64)
        dp = price_c * (100 - disc_c)       # disc_price * 1e4
        ch = dp * (100 + tax_c)             # charge * 1e6
        return (
            pd.DataFrame(
                {"l_returnflag": df["l_returnflag"], "l_linestatus": df["l_linestatus"],
                 "qty_i": qi, "price_c": price_c, "dp_i": dp, "ch_i": ch,
                 "disc_c": disc_c, "n": np.int64(1)}
            )
            .groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], combine, num_partitions=4,
    ).to_pandas()
    n = out["n"].to_numpy()
    qty = out["qty_i"].to_numpy(dtype=np.float64)
    price = out["price_c"].to_numpy(dtype=np.float64)
    disc = out["disc_c"].to_numpy(dtype=np.float64)
    res = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": _r6away(qty),
            "sum_base_price": _r6away(price / 100.0),
            "sum_disc_price": _r6away(out["dp_i"].to_numpy(dtype=np.float64) / 10000.0),
            "sum_charge": _r6away(out["ch_i"].to_numpy(dtype=np.float64) / 1000000.0),
            "avg_qty": _r6away(qty / n),
            "avg_price": _r6away(price / n / 100.0),
            "avg_disc": _r6away(disc / n / 100.0),
            "count_order": out["n"],
        }
    )
    return res.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)


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

    out = typed_pandas(
        hash_combine(
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_totalprice"],
            ).map_batches(partial, batch_format="pandas"),
            ["n_name"], combine, num_partitions=4,
        ),
        {"n_name": "object", "revenue": "float64", "n_orders": "int64"},
    )
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
        typed_pandas(
            hash_combine(
                ds.map_batches(partial, batch_format="pyarrow"),
                ["user_id"], combine, num_partitions=4,
            ),
            {"user_id": "int64", "n_late": "int64"},
        )
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

    agg = typed_pandas(
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["user_id", "d"], combine,
        ),
        {"user_id": "int64", "d": "int64", "event_type": "object",
         "s": "float64", "n": "int64"},
    )
    agg["avg"] = agg["s"] / agg["n"]
    piv = agg.pivot_table(
        index=["user_id", "d"], columns="event_type", values="avg", aggfunc="first"
    ).reindex(columns=["purchase", "click"]).dropna()
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
    sample variance of value per user over the user's first 7 days.

    Exactness: DuckDB ``VAR_SAMP`` is a Welford recurrence whose float
    chain differs from a moments chain by 1 ulp at 6-dp ties (surfaced at
    sf0.1). Both sides therefore accumulate exact integer cents and take
    ONE mirrored division chain:
    ``(n*S2 - S^2) / (n*(n-1)) / 1e4`` with S, S2 exact integers."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype(np.int64)
        c = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({"user_id": df["user_id"], "ts_us": t, "c": c})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["ts_us"].transform("min")
        keep = g[g["ts_us"] < first + 7 * WIDTHS["1d"]].copy()
        keep["c2"] = keep["c"] * keep["c"]  # c<=~1e5 cents, c2<=1e10; x1e5 rows fits int64
        agg = keep.groupby("user_id", as_index=False).agg(
            n=("c", "count"), s=("c", "sum"), s2=("c2", "sum")
        )
        # exact numerator in Python ints (per-user rows only, ~1.5k at sf0.1)
        n_i = agg["n"].to_numpy()
        num = np.array(
            [int(n) * int(s2) - int(s) * int(s)
             for n, s, s2 in zip(n_i, agg["s"].to_numpy(), agg["s2"].to_numpy())],
            dtype=object,
        )
        nn1 = (n_i.astype(np.int64) * (n_i.astype(np.int64) - 1)).astype(np.float64)
        num_f = np.array([float(v) for v in num], dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = num_f / nn1 / 1e4
        var = np.where(n_i > 1, _r6away(var), np.nan)
        agg["var_value"] = var
        return agg[["user_id", "n", "var_value"]]

    return (
        hash_combine(ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


def gap_flag_1m(sf_dir: str) -> pd.DataFrame:
    """A2 analog (trailing 7-bucket observation flag, ``jl:263-288``) —
    rolling max computed inside the distributed partition combine."""
    return _dense_1m(sf_dir, ["user_id", "bucket_start", "n", "observed_recently"])


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
        # exact integer spans; ROUND(CAST(MAX(span_us) AS DOUBLE)/1e6, 6)
        # op order mirrors the SQL oracle (round-1 hash-failure fix)
        per_session["span_us"] = per_session["hi"] - per_session["lo"]
        out = per_session.groupby("user_id", as_index=False).agg(
            n_sessions=("sid", "count"),
            n_events=("n", "sum"),
            max_session_us=("span_us", "max"),
        )
        out["max_session_s"] = np.round(
            out.pop("max_session_us").to_numpy(dtype=np.float64) / 1e6, 6
        )
        return out

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


def moving_avg_1h(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Trailing moving average over hourly per-user sums (window aggregate,
    M13/A5 analog): AVG of the current + 2 preceding OBSERVED hourly
    buckets (row-frame semantics, matching SQL ROWS BETWEEN). The rolling
    window runs inside the distributed partition combine — each user's
    hourly buckets are co-located by the hash shuffle."""
    width = WIDTHS["1h"]
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b, "v": df["value"]})
            .groupby(["user_id", "bucket_us"], sort=False, as_index=False)["v"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["v"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        s = _r6away(g["v"].to_numpy())  # the oracle's rounded hourly sums
        m = len(g)
        # explicit left-to-right adds (p2 + p1 + s) — the SQL window frame's
        # oldest-first accumulation order
        p1 = np.zeros(m)
        p1[1:] = np.where(u[1:] == u[:-1], s[:-1], 0.0)
        ok1 = np.zeros(m, dtype=bool)
        ok1[1:] = u[1:] == u[:-1]
        p2 = np.zeros(m)
        ok2 = np.zeros(m, dtype=bool)
        ok2[2:] = u[2:] == u[:-2]
        p2[2:] = np.where(ok2[2:], s[:-2], 0.0)
        tot = p2 + p1 + s
        nn = 1 + ok1.astype(np.int64) + ok2.astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": u,
                "bucket_start": g["bucket_us"].to_numpy().view("datetime64[us]"),
                "ma3": _r6away(tot / nn),
            }
        )

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
        )
        .to_pandas()
        .sort_values(["user_id", "bucket_start"], ignore_index=True)
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
                "tod_sin": _r6away(np.sin(ang)),
                "tod_cos": _r6away(np.cos(ang)),
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
             "value_filled": _r6away(np.where(v == 0, gm, v))}
        )

    return (
        ds.map_batches(fill, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


#: Per-metric clamp ranges — the M7 analog (NDVI [-1,1] vs albedo [0,1]
#: chosen by output name, reference ``jl:398-402``; validity filter
#: ``VNP43NRT.py:137-140``). Keyed by event_type; None bound = open side.
CLAMP_RANGES: dict[str, tuple[float, float]] = {
    "purchase": (1.0, 400.0),
    "click": (0.5, 100.0),
    "view": (0.0, 250.0),
}
CLAMP_DEFAULT = (0.0, 500.0)


def range_clamp(sf_dir: str) -> pd.DataFrame:
    """Named clamp/validity operator (M7) + relative-angle column (M12).

    Per-metric config drives a vectorized clamp (``pc.min/max`` analog) and
    a validity flag (in-range before clamping); ``rel_angle`` is the
    relative-azimuth analog (``VNP43NRT.py:434-436``): absolute circular
    difference between the value-derived angle and the hour angle, wrapped
    to [0, 180]."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    lo = {k: v[0] for k, v in CLAMP_RANGES.items()}
    hi = {k: v[1] for k, v in CLAMP_RANGES.items()}

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        lo_v = df["event_type"].map(lo).fillna(CLAMP_DEFAULT[0]).to_numpy(dtype=np.float64)
        hi_v = df["event_type"].map(hi).fillna(CLAMP_DEFAULT[1]).to_numpy(dtype=np.float64)
        clamped = np.minimum(np.maximum(v, lo_v), hi_v)
        a1 = np.mod(v, 360.0)
        a2 = df["ts"].astype("datetime64[us]").dt.hour.to_numpy(dtype=np.float64) * 15.0
        d = np.abs(a1 - a2)
        rel = np.minimum(d, 360.0 - d)
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "value_clamped": _r6away(clamped),
                "valid": (v >= lo_v) & (v <= hi_v),
                "rel_angle": _r6away(rel),
            }
        )

    return (
        ds.map_batches(clamp, batch_format="pandas")
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


def qa_bitfield(sf_dir: str) -> pd.DataFrame:
    """M4 analog: packed bit-field QA decode (reference
    ``VIIRS/VNP09GA.py:56-80`` — ``(QF1 >> 2) & 3`` mask extraction, then
    mask-to-null on the science value).

    ``event_id`` plays the packed QA word: a 2-bit cloud-state field at
    bits 2-3, a 3-bit land/water field at bits 4-6, and a 2-bit quality
    field at bits 0-1.  Fully Arrow-native — ``pc.shift_right`` /
    ``pc.bit_wise_and`` over zero-copy pyarrow batches, with
    ``pc.if_else`` masking ``value`` to NULL wherever cloud-state != 0."""
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["event_id", "value"])

    def decode(t: pa.Table) -> pa.Table:
        qf = t["event_id"]
        cloud = pc.bit_wise_and(pc.shift_right(qf, 2), 3)
        land = pc.bit_wise_and(pc.shift_right(qf, 4), 7)
        good = pc.equal(pc.bit_wise_and(qf, 3), 0)
        masked = pc.if_else(
            pc.equal(cloud, 0),
            pc.round(t["value"], ndigits=6),
            pa.scalar(None, pa.float64()),
        )
        return pa.table(
            {
                "event_id": qf,
                "cloud_state": cloud,
                "land_water": land,
                "good_quality": good,
                "value_masked": masked,
            }
        )

    return (
        ds.map_batches(decode, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


#: M10 blend config — per-input valid range + fallback constant (the
#: constrained-fallback semantics of the reference's albedo blend).
BLEND_A = (0.0, 60.0, 30.0)  # lo, hi, fallback for input A (price/1000)
BLEND_B = (1.0, 50.0, 25.0)  # lo, hi, fallback for input B (quantity)


def blend_two_source(sf_dir: str) -> pd.DataFrame:
    """M10 analog: two-source weighted blend (reference ``BRDF/BRDF.py:20-57``
    — ``albedo = WSA*SRT + BSA*(1-SRT)`` with constrained fallbacks).

    Input A is ``l_extendedprice/1000`` (WSA analog), input B is
    ``l_quantity`` (BSA), and the per-row weight is ``l_discount*10``
    clipped to [0,1] (the diffuse-fraction SRT).  Each input is
    range-validated and replaced by its fallback constant when out of
    range; the blend chain ``w*a + (1-w)*b`` is mirrored op-for-op in the
    SQL oracle (per-row, no accumulation — ROUND(6) both sides)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_discount"],
    )

    def blend(df: pd.DataFrame) -> pd.DataFrame:
        a = df["l_extendedprice"].to_numpy(dtype=np.float64) / 1000.0
        b = df["l_quantity"].to_numpy(dtype=np.float64)
        w = np.minimum(
            np.maximum(df["l_discount"].to_numpy(dtype=np.float64) * 10.0, 0.0), 1.0
        )
        a = np.where((a >= BLEND_A[0]) & (a <= BLEND_A[1]), a, BLEND_A[2])
        b = np.where((b >= BLEND_B[0]) & (b <= BLEND_B[1]), b, BLEND_B[2])
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_linenumber": df["l_linenumber"],
                "blend_value": _r6away(w * a + (1.0 - w) * b),
            }
        )

    return (
        ds.map_batches(blend, batch_format="pandas")
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"], ignore_index=True)
    )


def latency_quantiles(sf_dir: str) -> pd.DataFrame:
    """Discrete per-user latency quantiles (p50/p95 of inter-event gaps).

    Exact, not sketched (SURVEY §2.5: the engine's aggregates are exact):
    each user's gaps are co-located by the hash shuffle, sorted once per
    partition, and the quantile element picked by DuckDB's
    ``quantile_disc`` rank rule — the smallest k with (k+1)/n >= q under
    double comparison. Integer microseconds end-to-end; one float
    division at the very end."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        d = pd.DataFrame({"user_id": u[same], "gap_us": t[same] - np.roll(t, 1)[same]})
        d = d.sort_values(["user_id", "gap_us"], kind="mergesort")
        uu = d["user_id"].to_numpy()
        gv = d["gap_us"].to_numpy()
        bounds = np.ones(len(d), dtype=bool)
        bounds[1:] = uu[1:] != uu[:-1]
        starts = np.flatnonzero(bounds)
        n = np.diff(np.append(starts, len(d)))

        def qidx(q: float) -> np.ndarray:
            # smallest k with (k+1)/n >= q, matching quantile_disc's
            # double-precision comparisons (incl. exact-boundary ulps)
            k = np.ceil(q * n).astype(np.int64) - 1
            k = np.where((k > 0) & (k.astype(np.float64) / n >= q), k - 1, k)
            k = np.where((k + 1).astype(np.float64) / n < q, k + 1, k)
            return np.maximum(k, 0)

        i50 = starts + qidx(0.5)
        i95 = starts + qidx(0.95)
        return pd.DataFrame(
            {
                "user_id": uu[starts],
                "n_gaps": n,
                "p50_s": _r6away(gv[i50].astype(np.float64) / 1e6),
                "p95_s": _r6away(gv[i95].astype(np.float64) / 1e6),
            }
        )

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


def hopping_count_1h_15m(sf_dir: str) -> pd.DataFrame:
    """Hopping-window counts (1 h windows, 15 min hop): each event lands in
    4 overlapping windows — exploded map-side (integer window arithmetic),
    then one hash-partitioned count combine. The overlapping-window
    streaming operator next to the tumbling tiers (§2.9)."""
    hop = 15 * 60 * US
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        base = t // hop * hop
        k = np.arange(4, dtype=np.int64)
        ws = (base[:, None] - k[None, :] * hop).reshape(-1)
        uid = np.repeat(df["user_id"].to_numpy(), 4)
        return (
            pd.DataFrame({"user_id": uid, "window_us": ws})
            .groupby(["user_id", "window_us"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "window_us"], as_index=False)["n"].sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["window_start"] = out.pop("window_us").to_numpy().view("datetime64[us]")
    return out[["user_id", "window_start", "n"]].sort_values(
        ["user_id", "window_start"], ignore_index=True
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_mix_1h(sf_dir: str) -> pd.DataFrame:
    """Per-(user, hour) event-type mix — the engine's pivoted categorical
    count (conditional-count columns, one per type)."""
    width = WIDTHS["1h"]
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        return (
            pd.DataFrame(
                {"user_id": df["user_id"], "bucket_us": b,
                 "event_type": df["event_type"].astype(str)}
            )
            .groupby(["user_id", "bucket_us", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us", "event_type"], as_index=False)["n"].sum()
        piv = g.pivot_table(
            index=["user_id", "bucket_us"], columns="event_type", values="n",
            aggfunc="sum", fill_value=0,
        )
        out = pd.DataFrame({
            "user_id": piv.index.get_level_values(0).to_numpy(),
            "bucket_us": piv.index.get_level_values(1).to_numpy(),
        })
        total = np.zeros(len(piv), dtype=np.int64)
        for et in EVENT_TYPES:
            col = (piv[et].to_numpy(dtype=np.int64) if et in piv.columns
                   else np.zeros(len(piv), dtype=np.int64))
            out[f"n_{et}"] = col
            total += col
        out["n_total"] = total
        return out

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id", "bucket_us"],
        combine,
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    cols = ["user_id", "bucket_start"] + [f"n_{t}" for t in EVENT_TYPES] + ["n_total"]
    return out[cols].sort_values(["user_id", "bucket_start"], ignore_index=True)


def ewma_1h(sf_dir: str, alpha: float = 0.3) -> pd.DataFrame:
    """Exponentially-weighted moving average over hourly per-user sums —
    the decayed-aggregate streaming operator (§2.9 family). The recursive
    scan runs inside the distributed partition combine over the (small)
    hourly bucket stream; SQL-oracled via a DuckDB recursive CTE that
    mirrors the recurrence op-for-op (hourly sums accumulate as integer
    cents so the bucket inputs are order-independent, ONE double division
    per bucket, then ``e = a*x + (1-a)*e_prev`` unrounded until the final
    ROUND(6))."""
    width = WIDTHS["1h"]
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        c = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b, "v": c})
            .groupby(["user_id", "bucket_us"], sort=False, as_index=False)["v"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["v"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        x = g["v"].to_numpy(dtype=np.float64) / 100.0
        n = len(g)
        out = np.empty(n)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if n else np.array([], dtype=np.int64)
        lens = np.diff(np.append(starts, n))
        out[starts] = x[starts]
        # segmented scan vectorized ACROSS series: step i advances every
        # series with > i buckets by one recurrence — identical op order to
        # the scalar loop (bit-exact), max(len) numpy ops instead of a
        # per-row Python loop (VERDICT r2 "what's wrong" #5)
        for i in range(1, int(lens.max()) if n else 0):
            idx = starts[lens > i] + i
            out[idx] = alpha * x[idx] + (1.0 - alpha) * out[idx - 1]
        return pd.DataFrame(
            {
                "user_id": u,
                "bucket_start": g["bucket_us"].to_numpy().view("datetime64[us]"),
                "ewma": _r6away(out),
            }
        )

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
        )
        .to_pandas()
        .sort_values(["user_id", "bucket_start"], ignore_index=True)
    )


def decayed_sum_1h(sf_dir: str) -> pd.DataFrame:
    """Time-decayed sum over IRREGULAR hourly buckets: per user,
    ``s_i = x_i + 0.5**gap_i * s_{i-1}`` where ``gap_i`` is the integer
    number of hours since the user's previous observed bucket (>= 1; gap
    buckets decay without contributing). The half-life-per-bucket weight
    ``0.5**gap`` is an exact power of two in float64 (``np.ldexp``), so
    the engine recurrence and the DuckDB recursive CTE (``power(0.5,
    gap)``) are bit-comparable — same exactness contract as ``ewma_1h``
    but over a sparse, gappy axis (reference decay behavior:
    ``ECOv003-L2T-STARS/VNP43NRT_jl`` temporal weighting of stale
    observations).

    Scale shape: identical to ``ewma_1h`` — exact-cents map partials,
    one user-keyed hash shuffle, segmented scan vectorized ACROSS series
    in the partition combine (max(series_len) numpy steps, zero per-row
    Python)."""
    width = WIDTHS["1h"]
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        c = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b, "v": c})
            .groupby(["user_id", "bucket_us"], sort=False, as_index=False)["v"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["v"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        b = g["bucket_us"].to_numpy()
        x = g["v"].to_numpy(dtype=np.float64) / 100.0
        n = len(g)
        out = np.empty(n)
        starts = (
            np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            if n else np.array([], dtype=np.int64)
        )
        lens = np.diff(np.append(starts, n))
        out[starts] = x[starts]
        # per-row decay weight: exact 2**-gap (ldexp), gap in whole hours
        # since the previous bucket of the SAME user (first rows unused)
        gap = np.empty(n, dtype=np.int64)
        if n:
            gap[0] = 0
            gap[1:] = (b[1:] - b[:-1]) // width
        # clamp BOTH sides: at cross-user segment starts the raw diff is
        # large-negative and 2**(+huge) overflows to inf with a warning
        # on every combine call (the lanes are unused, but warn-flooded
        # worker logs and warnings-as-errors are not)
        w = np.ldexp(1.0, -np.clip(gap, 0, 1100).astype(np.int32))
        for i in range(1, int(lens.max()) if n else 0):
            idx = starts[lens > i] + i
            out[idx] = x[idx] + w[idx] * out[idx - 1]
        return pd.DataFrame(
            {
                "user_id": u,
                "bucket_start": b.view("datetime64[us]"),
                # DuckDB ROUND is half-AWAY-from-zero (floor(x*1e6+.5)),
                # numpy round is half-even; decayed sums land exactly on
                # x.xxxxxx5 ties (cents x 2**-gap), so mirror DuckDB's op
                # chain bit-for-bit
                "decayed_sum": np.copysign(
                    np.floor(np.abs(out) * 1e6 + 0.5), out
                ) / 1e6,
            }
        )

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
        )
        .to_pandas()
        .sort_values(["user_id", "bucket_start"], ignore_index=True)
    )


# ------------------------------------------------- round-3 stream operators
def counter_rate_1h(sf_dir: str) -> pd.DataFrame:
    """PromQL-style counter rate with reset detection: per user in
    (ts, event_id) order, delta = v - prev when the counter advanced, v
    when it reset (prev > v), summed per hour bucket of the *current*
    event.

    Determinism contract: values are exact cents (scaled BIGINT), deltas
    and bucket sums accumulate in int64 (order-independent), one final
    double division mirrored in the oracle.

    Scale note: the deltas need per-user event ORDER, so the map side
    cannot pre-combine — raw (user, ts, cents) rows ride one hash
    shuffle keyed by user (same partitioning key as every other per-user
    op), then the whole derivation is vectorized per partition."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    width = WIDTHS["1h"]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        vc = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        prev = np.roll(vc, 1)
        delta = np.where(vc >= prev, vc - prev, vc)[same]
        d = pd.DataFrame(
            {"user_id": u[same], "bucket_us": t[same] // width * width,
             "delta_c": delta}
        ).groupby(["user_id", "bucket_us"], as_index=False)["delta_c"].agg(
            n_deltas="count", sum_c="sum"
        )
        return pd.DataFrame(
            {"user_id": d["user_id"], "bucket_us": d["bucket_us"],
             "n_deltas": d["n_deltas"],
             "rate_sum": _r6away(
                 d["sum_c"].to_numpy(dtype=np.float64) / 100.0)}
        )

    out = hash_combine(ds, ["user_id"], combine).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out[["user_id", "bucket_start", "n_deltas", "rate_sum"]].sort_values(
        ["user_id", "bucket_start"], ignore_index=True
    )


def band_count_5m(sf_dir: str) -> pd.DataFrame:
    """Trailing range-window count: for every event, how many same-user
    events fall in [ts - 5min, ts] (peers at the exact same ts included,
    matching SQL RANGE ... CURRENT ROW semantics). The engine's banded
    self-join / interval-join primitive (J1 family, range variant).

    Per partition (all of a user's rows co-located): one mergesort by
    (user, ts), then two vectorized searchsorteds on a composite
    (user-index << shift | ts-offset) key — no per-user loop."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    band_us = 5 * 60 * US

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        # composite monotone key: dense user index in the high bits,
        # ts offset in the low bits
        uidx = np.cumsum(np.r_[0, u[1:] != u[:-1]]).astype(np.int64)
        toff = t - t.min() if len(t) else t
        shift = int(toff.max() + band_us + 2).bit_length() if len(t) else 1
        assert (int(uidx.max()) if len(t) else 0) < (1 << (62 - shift)), \
            "composite key overflow: too many distinct users per partition"
        key = (uidx << shift) | toff
        lo = np.searchsorted(key, (uidx << shift) | np.maximum(toff - band_us, 0), "left")
        hi = np.searchsorted(key, key, "right")
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": u,
             "ts": g["ts"].to_numpy(),
             "n_trailing_5m": (hi - lo).astype(np.int64)}
        )

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def value_histogram_1h(sf_dir: str) -> pd.DataFrame:
    """Fixed-bin value histogram per (event_type, hour bucket): bin =
    min(floor(value / 50), 9) — the heatmap/distribution aggregate a
    rollup engine serves dashboards from. Pure int counts; map-side
    partial then one hash combine."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    width = WIDTHS["1h"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        bin_ = np.minimum(
            np.floor(df["value"].to_numpy() / 50.0), 9.0
        ).astype(np.int32)
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "bucket_us": b, "bin": bin_})
            .groupby(["event_type", "bucket_us", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "bucket_us", "bin"], as_index=False)["n"].sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "bucket_us"], combine,
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out[["event_type", "bucket_start", "bin", "n"]].sort_values(
        ["event_type", "bucket_start", "bin"], ignore_index=True
    )


def zscore_anomaly_24h(sf_dir: str) -> pd.DataFrame:
    """Rolling z-score anomaly flags: per (user, hour bucket), the
    bucket's mean value vs the trailing 24 *observed* buckets' population
    mean/sd (ROWS window, current bucket included). |z| > 2 flags the
    bucket.

    Determinism contract: per-bucket n / sum(cents) / sum(cents^2)
    accumulate exactly in int64; rolling sums are int64 cumsum
    differences; ONE double conversion chain at the end, op-for-op
    mirrored in the oracle SQL."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    width = WIDTHS["1h"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        vc = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b,
                          "vc": vc, "vc2": vc * vc})
            .groupby(["user_id", "bucket_us"], sort=False)
            .agg(n=("vc", "count"), s=("vc", "sum"), ss=("vc2", "sum"))
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")
        )
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = g["n"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        ss = g["ss"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if len(g) else np.array([], int)
        seg = np.cumsum(np.r_[0, u[1:] != u[:-1]]).astype(np.int64) if len(g) else np.array([], int)
        # trailing-24 ROWS window via exact int64 cumsum differences,
        # clamped at each series start
        idx = np.arange(len(g), dtype=np.int64)
        lo = np.maximum(idx - 23, starts[seg] if len(g) else idx)

        def win(x):
            cs = np.cumsum(x)
            return cs[idx] - np.where(lo > 0, cs[lo - 1], 0)

        wn, ws, wss = win(n), win(s), win(ss)
        m = ws.astype(np.float64) / wn / 100.0
        var = wss.astype(np.float64) / wn / 10000.0 - m * m
        sd = np.sqrt(np.maximum(var, 0.0))
        bavg = s.astype(np.float64) / n / 100.0
        z = np.where(sd > 0, (bavg - m) / np.where(sd > 0, sd, 1.0), 0.0)
        return pd.DataFrame(
            {"user_id": u, "bucket_us": g["bucket_us"].to_numpy(),
             "n": n, "win_n": wn,
             "win_mean": _r6away(m), "win_sd": _r6away(sd),
             "zscore": _r6away(z), "is_anomaly": np.abs(z) > 2.0}
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out[
        ["user_id", "bucket_start", "n", "win_n", "win_mean", "win_sd",
         "zscore", "is_anomaly"]
    ].sort_values(["user_id", "bucket_start"], ignore_index=True)


def argmax_per_user(sf_dir: str) -> pd.DataFrame:
    """Per-user argmax row (highest value, ties broken by smallest
    event_id) — the take-first / O4 primitive as a distributed
    partial-argmax: each batch keeps one candidate row per user, the
    combine reduces candidates. Raw row values, no float accumulation."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.drop_duplicates("user_id", keep="first")

    return (
        hash_combine(ds.map_batches(best, batch_format="pandas"),
                     ["user_id"], best)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
        [["user_id", "event_id", "ts", "value"]]
    )


def props_json_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column with ONE vectorized regex across the batch (no
    per-row json.loads), aggregate per event_type. Int-exact sums."""
    ds = _events(sf_dir, ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        d = pd.DataFrame(
            {"event_type": df["event_type"].astype(str),
             "k": k.fillna(0).astype(np.int64),
             "has_k": k.notna().astype(np.int64)}
        )
        return d.groupby("event_type", sort=False, as_index=False).agg(
            n=("k", "count"), n_with_k=("has_k", "sum"), sum_k=("k", "sum"),
            max_k=("k", "max"),
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_with_k=("n_with_k", "sum"),
            sum_k=("sum_k", "sum"), max_k=("max_k", "max"),
        )
        g["avg_k"] = np.round(
            g["sum_k"].to_numpy(dtype=np.float64)
            / g["n_with_k"].to_numpy(), 6
        )
        return g

    return (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["event_type"],
            combine,
        )
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )


def window_rank(sf_dir: str) -> pd.DataFrame:
    """The SQL window-function family as one distributed operator: per
    user (in (ts, event_id) order) row_number, RANK() by value desc (ties
    share the min rank), lag/lead of value, and a running sum.

    All five functions are computed vectorized ACROSS users inside each
    hash partition: one mergesort, segmented boundaries, a cumsum
    difference for the running sum, and the run-id gather trick for tied
    ranks — no per-user Python.

    Determinism contract: running sum accumulates int64 cents in sorted
    (user, ts, event_id) order — a PREFIX sum is order-DEPENDENT by
    definition, so exactness (not just order-independence) requires the
    integer domain; one double division at the end, mirrored in SQL."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy()
        vc = np.round(v * 100.0).astype(np.int64)
        n = len(g)
        new_u = np.r_[True, u[1:] != u[:-1]]
        seg_start = np.flatnonzero(new_u)
        seg = np.cumsum(new_u) - 1
        idx = np.arange(n, dtype=np.int64)
        rn = idx - seg_start[seg] + 1
        # running sum: segmented int64 cumsum
        cs = np.cumsum(vc)
        base = np.where(seg_start[seg] > 0, cs[seg_start[seg] - 1], 0)
        running = cs - base
        # lag / lead within segment
        prev_v = np.r_[np.nan, v[:-1]]
        prev_v[seg_start] = np.nan
        next_v = np.r_[v[1:], np.nan]
        next_v[seg_start[1:] - 1 if len(seg_start) > 1 else []] = np.nan
        if n:
            next_v[-1] = np.nan
        # RANK() by value desc with min-rank ties: sort (user, -value),
        # rank = within-segment index of the RUN start, gathered by run id
        order = np.lexsort((-v, u))
        uo, vo = u[order], v[order]
        new_uo = np.r_[True, uo[1:] != uo[:-1]]
        so = np.flatnonzero(new_uo)
        sego = np.cumsum(new_uo) - 1
        idxo = idx - so[sego]
        first = new_uo.copy()
        first[1:] |= vo[1:] != vo[:-1]
        run_id = np.cumsum(first) - 1
        run_start_rank = (idxo + 1)[first]
        rank_sorted = run_start_rank[run_id]
        value_rank = np.empty(n, dtype=np.int64)
        value_rank[order] = rank_sorted
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": u,
             "rn": rn, "value_rank": value_rank,
             "prev_value": _r6away(prev_v),
             "next_value": _r6away(next_v),
             "running_sum": _r6away(running.astype(np.float64) / 100.0)}
        )

    out = hash_combine(ds, ["user_id"], combine).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_id=np.int64, user_id=np.int64,
                           rn=np.int64, value_rank=np.int64,
                           prev_value=np.float64, next_value=np.float64,
                           running_sum=np.float64)
    return out.sort_values("event_id", ignore_index=True)


def trend_ols_1h(sf_dir: str, window: int = 24) -> pd.DataFrame:
    """SQL-oracled unweighted variant of the K3 trend stage: per (user,
    hour bucket), the OLS slope of bucket cents-sums over the trailing
    ``window`` OBSERVED buckets (x = absolute hour index, one point per
    bucket). Complements ``stages.trend`` (recency-weighted WLS, pytest
    oracle) with a driver-gateable exactness contract.

    Determinism: n / sum(x) / sum(y) / sum(xy) / sum(xx) are EXACT int64
    window sums (cumsum differences); the slope is one double expression
    ``(n*sxy - sx*sy) / (n*sxx - sx*sx) / 100`` computed from identical
    integers on both sides -> bit-identical, NULL when n < 2."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    width = WIDTHS["1h"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // width * width
        vc = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        return (
            pd.DataFrame({"user_id": df["user_id"], "bucket_us": b, "vc": vc})
            .groupby(["user_id", "bucket_us"], sort=False, as_index=False)["vc"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "bucket_us"], as_index=False)["vc"].sum()
        g = g.sort_values(["user_id", "bucket_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        x = g["bucket_us"].to_numpy() // (3600 * US)  # absolute hour index
        y = g["vc"].to_numpy()
        m = len(g)
        new_u = np.r_[True, u[1:] != u[:-1]] if m else np.array([], bool)
        starts = np.flatnonzero(new_u)
        seg = np.cumsum(new_u) - 1 if m else np.array([], int)
        idx = np.arange(m, dtype=np.int64)
        lo = np.maximum(idx - (window - 1), starts[seg] if m else idx)

        def win(arr):
            cs = np.cumsum(arr)
            return cs[idx] - np.where(lo > 0, cs[lo - 1], 0)

        ones = np.ones(m, dtype=np.int64)
        n = win(ones)
        sx, sy = win(x), win(y)
        sxy, sxx = win(x * y), win(x * x)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = np.where(
            n > 1,
            num.astype(np.float64) / np.where(den != 0, den, 1).astype(np.float64) / 100.0,
            np.nan,
        )
        # NO round(6): both sides compute the slope from identical int64
        # sums through an identical double op chain, so the raw doubles
        # are bit-identical — rounding would ADD risk (numpy half-even vs
        # DuckDB half-away differs on the exact-.5 boundaries these
        # small-denominator rationals hit)
        return pd.DataFrame(
            {"user_id": u, "bucket_us": g["bucket_us"].to_numpy(),
             "win_n": n, "slope_per_hour": slope}
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out["bucket_start"] = out.pop("bucket_us").to_numpy().view("datetime64[us]")
    return out[["user_id", "bucket_start", "win_n", "slope_per_hour"]].sort_values(
        ["user_id", "bucket_start"], ignore_index=True
    )


# --------------------------------------------------- OLAP cube / range join
def grouping_sets_day(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS / cube aggregate over (event_type, day): every input
    row contributes to 4 grouping sets — (type, day), (type), (day), () —
    in ONE pass: the map side combines the FINEST level per batch and
    derives the three coarser partials from it (partial-of-partial), then
    one int-keyed hash exchange combines all sets at once. No per-set
    rescan, no extra shuffle — the single-pass cube shape.

    'ALL' / 1900-01-01 are the rollup markers (neither occurs naturally);
    exact-cents accumulation with one mirrored double division."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    day_w = WIDTHS["1d"]
    sent_us = np.int64(pd.Timestamp("1900-01-01").value // 1000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype(np.int64) // day_w * day_w
        vc = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        fine = (
            pd.DataFrame({"event_type": df["event_type"], "day_us": d, "s": vc})
            .groupby(["event_type", "day_us"], sort=False)["s"]
            .agg(n="count", s="sum")
            .reset_index()
        )
        by_type = fine.groupby("event_type", as_index=False)[["n", "s"]].sum()
        by_type["day_us"] = sent_us
        by_day = fine.groupby("day_us", as_index=False)[["n", "s"]].sum()
        by_day["event_type"] = "ALL"
        total = pd.DataFrame(
            {"event_type": ["ALL"], "day_us": [sent_us],
             "n": [fine["n"].sum()], "s": [fine["s"].sum()]}
        )
        return pd.concat([fine, by_type, by_day, total], ignore_index=True)[
            ["event_type", "day_us", "n", "s"]
        ]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "day_us"], as_index=False)[["n", "s"]].sum()

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day_us"], combine, num_partitions=8,
    ).to_pandas()
    out["bucket_day"] = out.pop("day_us").to_numpy().view("datetime64[us]")
    out["sum_value"] = _r6away(out.pop("s").to_numpy(dtype=np.float64) / 100.0)
    return out[["event_type", "bucket_day", "n", "sum_value"]].sort_values(
        ["event_type", "bucket_day"], ignore_index=True
    )


def attribution_window_30m(sf_dir: str) -> pd.DataFrame:
    """RANGE (interval) JOIN: for every purchase, the count of the same
    user's view events inside the trailing 30-minute window
    (``view.ts in (purchase.ts - 30m, purchase.ts]``) — the ad-attribution
    shape of an as-of join with a bounded window.

    Distributed sort-merge, no pairwise expansion: views and TWO probe
    rows per purchase (the window's hi and lo edges) ride one user-keyed
    hash exchange; inside each partition ONE lexsort + a segmented
    cumulative view count evaluates every probe, and the per-purchase
    answer is hi - lo. Work is O((V+P) log(V+P)) per partition regardless
    of window fan-in — a pairwise join would be O(matches)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    win_us = 30 * 60 * US

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype(np.int64)
        v = df["event_type"].to_numpy() == "view"
        p = df["event_type"].to_numpy() == "purchase"
        uid = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        return pd.DataFrame(
            {
                # views (tag 0, counted), hi probes (tag 1, at p.ts),
                # lo probes (tag 1, at p.ts - 30m); probes sort AFTER
                # views at equal ts so <= / exclusive-lo fall out of the
                # tag order
                "user_id": np.concatenate([uid[v], uid[p], uid[p]]),
                "ts_us": np.concatenate([ts[v], ts[p], ts[p] - win_us]),
                "tag": np.concatenate(
                    [np.zeros(int(v.sum()), dtype=np.int8),
                     np.ones(int(p.sum()) * 2, dtype=np.int8)]
                ),
                "edge": np.concatenate(
                    [np.zeros(int(v.sum()), dtype=np.int8),
                     np.ones(int(p.sum()), dtype=np.int8),
                     np.full(int(p.sum()), 2, dtype=np.int8)]
                ),
                "event_id": np.concatenate([np.full(int(v.sum()), -1), eid[p], eid[p]]),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        tag = g["tag"].to_numpy()
        order = np.lexsort((tag, t, u))
        u, t, tag = u[order], t[order], tag[order]
        edge = g["edge"].to_numpy()[order]
        eid = g["event_id"].to_numpy()[order]
        isview = (tag == 0).astype(np.int64)
        cum = np.cumsum(isview)
        # per-user running view count: subtract the cumsum at each user
        # segment's entry (vectorized segment reset)
        seg_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        base = np.repeat(
            cum[seg_start] - isview[seg_start],
            np.diff(np.append(seg_start, len(u))),
        )
        cnt = cum - base
        hi = pd.DataFrame(
            {"event_id": eid[edge == 1], "user_id": u[edge == 1],
             "ts_us": t[edge == 1], "hi": cnt[edge == 1]}
        )
        lo = pd.DataFrame({"event_id": eid[edge == 2], "lo": cnt[edge == 2]})
        m = hi.merge(lo, on="event_id")
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"),
             "user_id": m["user_id"].astype("int64"),
             "ts_us": m["ts_us"].astype("int64"),
             "n_views_30m": (m["hi"] - m["lo"]).astype("int64")}
        )

    out = hash_combine(
        ds.map_batches(rows, batch_format="pandas"), ["user_id"], combine,
        num_partitions=16,
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_id=np.int64, user_id=np.int64,
                           ts="datetime64[us]", n_views_30m=np.int64)
    out["ts"] = out.pop("ts_us").to_numpy().view("datetime64[us]")
    return out[["event_id", "user_id", "ts", "n_views_30m"]].sort_values(
        "event_id", ignore_index=True
    )


def funnel_conversion(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence FUNNEL over per-user event streams: did the user
    view, then click strictly after the first view, then purchase strictly
    after that first qualifying click. The per-user recurrence needs every
    stage's candidate timestamps together, so stage rows ride ONE
    user-keyed hash exchange and each partition resolves all its users
    with three vectorized merge+min passes (no per-user Python)."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])
    kinds = {"view": 0, "click": 1, "purchase": 2}

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype(np.int64)
        k = df["event_type"].map(kinds)
        out = pd.DataFrame({"user_id": df["user_id"], "kind": k, "ts_us": ts})
        stage = out[out["kind"].notna()].copy()
        stage["kind"] = stage["kind"].astype(np.int8)
        # presence markers keep users with NO funnel events in the output
        users = pd.DataFrame(
            {"user_id": df["user_id"].unique(), "kind": np.int8(-1),
             "ts_us": np.int64(0)}
        )
        # map-side reduction: only each (user, kind)'s candidate minima
        # can ever win, but later stages need ts > a cross-batch
        # threshold, so keep per-(user, kind) DISTINCT ts (cheap dedup)
        stage = stage.drop_duplicates(["user_id", "kind", "ts_us"])
        return pd.concat([stage, users], ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        users = np.unique(g["user_id"].to_numpy())
        fv = (
            g[g["kind"] == 0].groupby("user_id")["ts_us"].min().rename("fv")
        )
        clicks = g[g["kind"] == 1].merge(fv, on="user_id")
        fc = (
            clicks[clicks["ts_us"] > clicks["fv"]]
            .groupby("user_id")["ts_us"].min().rename("fc")
        )
        purch = g[g["kind"] == 2].merge(fc, on="user_id")
        fp = (
            purch[purch["ts_us"] > purch["fc"]]
            .groupby("user_id")["ts_us"].min().rename("fp")
        )
        out = pd.DataFrame({"user_id": users})
        out["reached_view"] = out["user_id"].isin(fv.index)
        out["reached_click"] = out["user_id"].isin(fc.index)
        out["reached_purchase"] = out["user_id"].isin(fp.index)
        return out

    out = hash_combine(
        ds.map_batches(rows, batch_format="pandas"), ["user_id"], combine,
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("user_id", ignore_index=True)


def state_duration(sf_dir: str) -> pd.DataFrame:
    """Time-in-state accounting over each user's event stream: every event
    opens a "state" (its event_type) held until the user's NEXT event of
    any type; the last event of a user holds for 0. Output per
    (user, event_type): event count + total held seconds. The step-function
    duration operator the tier timeseries engine uses for uptime/mode
    accounting (reference keeps per-state dwell in its tier summaries).

    Exactness: durations are int64 microsecond gaps summed as integers and
    divided by 1e6 ONCE, mirrored op-for-op in the SQL oracle (lead() over
    the same (ts, event_id) order), so the float hash cannot drift. Scale:
    the lead() needs each user's full stream co-located — same one-key
    hash shuffle every sequential operator here rides (user_id), partials
    stay raw-width only for (ts, event_id, event_type)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        dur = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            same = u[1:] == u[:-1]
            dur[:-1] = np.where(same, t[1:] - t[:-1], 0)
        d = pd.DataFrame(
            {"user_id": u, "event_type": g["event_type"].astype(str).to_numpy(),
             "dur_us": dur}
        )
        out = d.groupby(["user_id", "event_type"], as_index=False).agg(
            n_events=("dur_us", "size"), dur_us=("dur_us", "sum")
        )
        out["state_s"] = np.round(
            out.pop("dur_us").to_numpy(dtype=np.float64) / 1e6, 6
        )
        return out

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )


def interval_coverage(sf_dir: str, hold_s: int = 300) -> pd.DataFrame:
    """Interval union (gaps-and-islands): each event opens a
    [ts, ts+hold_s) activity interval; overlapping intervals per user merge
    into islands. Output per user: merged-interval count + total covered
    seconds — the classic coverage/uptime operator (and the SQL-window
    workout: MAX OVER preceding rows, running SUM of breaks).

    Vectorized per partition: one sort, grouped cummax of interval ends,
    break mask, cumsum island ids, one groupby over (user, island). All
    arithmetic int64 microseconds; one /1e6 division mirrored in the
    oracle. Ties on ts are break-invariant (equal starts never open a new
    island), so block arrival order cannot flip the hash."""
    hold_us = hold_s * US
    ds = _events(sf_dir, ["user_id", "ts"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        s = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        e = s + hold_us
        cm = (
            pd.Series(e).groupby(pd.Series(u), sort=False).cummax().to_numpy()
        )
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        brk = new_user.copy()
        if len(g) > 1:
            brk[1:] |= s[1:] > cm[:-1]
        island = np.cumsum(brk) - 1
        d = pd.DataFrame({"user_id": u, "island": island, "s": s, "cm": cm})
        per = d.groupby(["user_id", "island"], as_index=False).agg(
            st=("s", "min"), en=("cm", "max")
        )
        per["cov_us"] = per["en"] - per["st"]
        out = per.groupby("user_id", as_index=False).agg(
            n_intervals=("island", "count"), cov_us=("cov_us", "sum")
        )
        out["covered_s"] = np.round(
            out.pop("cov_us").to_numpy(dtype=np.float64) / 1e6, 6
        )
        return out

    return (
        hash_combine(ds, ["user_id"], combine)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )


# ----------------------------------------------------- peak concurrency
def peak_concurrency(sf_dir: str, hold_s: int = 300) -> pd.DataFrame:
    """Sweep-line peak concurrency: the maximum number of simultaneously
    open [ts, ts+hold_s) activity intervals per event type — the
    capacity-planning readout over the same synthetic-interval convention
    as ``interval_coverage``.

    Semantics: intervals are close-OPEN, so an interval ending exactly
    when another starts never overlaps it (ends apply before starts at
    equal timestamps).  Because ends only lower the running count, the
    per-timestamp NET delta (+starts - ends) preserves every prefix
    maximum, so the sweep needs one row per distinct boundary time.

    Shape: per-batch (type, t, net) delta partials -> one hash exchange
    to merge duplicate boundary times -> ``Dataset.sort`` on (type, t)
    (one range exchange) -> per-BLOCK prefix partials {contiguous-run
    sums, local max-prefix, key range}; the driver orders the O(blocks)
    partials (valid: range partitioning means per-type block key ranges
    never interleave) and re-bases each block's local max with its
    running offset — the gini block-offset pattern on a signed series."""
    hold_us = hold_s * US
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        et = df["event_type"].astype(str).to_numpy()
        d = pd.DataFrame(
            {
                "event_type": np.concatenate([et, et]),
                "t": np.concatenate([t, t + hold_us]),
                "net": np.concatenate(
                    [np.ones(len(t), np.int64), -np.ones(len(t), np.int64)]
                ),
            }
        )
        return d.groupby(["event_type", "t"], as_index=False)["net"].sum()

    merged = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "t"],
        lambda g: g.groupby(["event_type", "t"], as_index=False)["net"].sum(),
    ).sort(["event_type", "t"])

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=str),
                    "bsum": pd.Series([], dtype=np.int64),
                    "bmax": pd.Series([], dtype=np.int64),
                    "t_lo": pd.Series([], dtype=np.int64),
                }
            )
        rows = []
        # sorted blocks keep each type contiguous; <=|types| groups/block
        for et, g in df.groupby("event_type", sort=True):
            c = np.cumsum(g["net"].to_numpy(np.int64))
            rows.append((et, int(c[-1]), int(c.max()), int(g["t"].iloc[0])))
        return pd.DataFrame(
            rows, columns=["event_type", "bsum", "bmax", "t_lo"]
        )

    parts = merged.map_batches(block_stats, batch_format="pandas").to_pandas()
    if len(parts) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_type=object, peak_concurrent=np.int64)
    parts = parts.sort_values(["event_type", "t_lo"], kind="mergesort",
                              ignore_index=True)
    out = []
    for et, g in parts.groupby("event_type", sort=True):
        off = np.concatenate(
            [[0], np.cumsum(g["bsum"].to_numpy(np.int64))[:-1]]
        )
        out.append((et, int((off + g["bmax"].to_numpy(np.int64)).max())))
    res = pd.DataFrame(out, columns=["event_type", "peak_concurrent"])
    res["peak_concurrent"] = res["peak_concurrent"].astype(np.int64)
    return res.sort_values("event_type", ignore_index=True)


# ------------------------------------------------------ data-quality audit
def dq_audit(sf_dir: str, value_hi: float = 480.0) -> pd.DataFrame:
    """Data-quality assertion audit: per-rule violation counts over the
    fact tables — null/blank checks, configured range bounds (the M7
    range-clamp config reused as an assertion), duplicate-key detection
    and referential-integrity orphans.  The pre-ingest gate a 100 TB
    pipeline runs before committing an epoch; a clean corpus reports
    zeros, which is the assertion passing, not a degenerate readout.

    Shape: everything map-side except the duplicate-key check —
    per-batch violation counts reduce to one row per rule; FK orphan
    checks run against BROADCAST sorted key arrays (`ray.put` once, read
    per task — at 100 TB swap in the Bloom side of `bloom_semijoin`,
    same contract); the duplicate check ships per-batch (event_id,
    count) partials through ONE id-hash exchange where per-partition
    `sum - nunique` lanes are additive.

    Determinism: pure integer counts."""
    orders_k = np.sort(
        pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])[
            "o_orderkey"
        ].to_numpy(np.int64)
    )
    cust_k = np.sort(
        pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy(np.int64)
    )
    ok_ref = ray.put(orders_k)
    ck_ref = ray.put(cust_k)

    def _orphans(sorted_keys: np.ndarray, vals: np.ndarray) -> int:
        if len(sorted_keys) == 0:
            return int(len(vals))
        idx = np.clip(
            np.searchsorted(sorted_keys, vals), 0, len(sorted_keys) - 1
        )
        return int((sorted_keys[idx] != vals).sum())

    def li_count(df: pd.DataFrame) -> pd.DataFrame:
        n = _orphans(ray.get(ok_ref), df["l_orderkey"].to_numpy(np.int64))
        return pd.DataFrame({"n": [np.int64(n)]})

    def o_count(df: pd.DataFrame) -> pd.DataFrame:
        n = _orphans(ray.get(ck_ref), df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({"n": [np.int64(n)]})

    def ev_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        p = df["props"]
        return pd.DataFrame(
            {
                "oob": [np.int64(((v < 0) | (v > value_hi)).sum())],
                "nullp": [np.int64((p.isna() | (p == "")).sum())],
            }
        )

    li_orphans = int(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        )
        .map_batches(li_count, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    o_orphans = int(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .map_batches(o_count, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )
    ev = (
        _events(sf_dir, ["value", "props"])
        .map_batches(ev_counts, batch_format="pandas")
        .to_pandas()
        .sum()
    )

    def id_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("event_id", sort=False).size()
        return pd.DataFrame(
            {"event_id": c.index.to_numpy(np.int64),
             "cnt": c.to_numpy(np.int64)}
        )

    def id_combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("event_id")["cnt"].sum()
        return pd.DataFrame(
            {"dups": [np.int64(int(a.sum()) - len(a))]}
        )

    dup = int(
        hash_combine(
            _events(sf_dir, ["event_id"]).map_batches(
                id_partial, batch_format="pandas"
            ),
            ["event_id"],
            id_combine,
        )
        .to_pandas()["dups"]
        .sum()
    )
    out = pd.DataFrame(
        {
            "rule": [
                "events_dup_event_id",
                "events_null_props",
                "events_value_out_of_range",
                "lineitem_orphan_orderkey",
                "orders_orphan_custkey",
            ],
            "n_violations": np.array(
                [dup, int(ev["nullp"]), int(ev["oob"]), li_orphans,
                 o_orphans],
                dtype=np.int64,
            ),
        }
    )
    return out.sort_values("rule", ignore_index=True)


# ----------------------------------------------------- event debouncing
def debounce_events(sf_dir: str, window_s: int = 300) -> pd.DataFrame:
    """Streaming debounce accounting: an event is DROPPED when the same
    (user, event_type) fired within the preceding ``window_s`` seconds
    (raw-predecessor rule, i.e. SQL LAG — not previous-kept) — the
    duplicate-suppression hygiene stage ingest pipelines run in front of
    counters; output is the kept/dropped split per event type.

    Shape: 4-column projection rides ONE user-hash exchange; the combine
    sorts each partition once ((user, type, ts, event_id)) and derives
    every predecessor gap from one shifted view — vocabulary-sized
    count partials leave the partition.

    Determinism: pure int64 timestamp comparisons."""
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

    win_us = np.int64(window_s) * US

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        t = g["ts_us"].to_numpy(np.int64)
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap_ok = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            gap_ok[1:] = (t[1:] - t[:-1]) <= win_us
        dropped = same & gap_ok
        d = pd.DataFrame(
            {
                "event_type": et,
                "n_dropped": dropped.astype(np.int64),
                "n_kept": (~dropped).astype(np.int64),
            }
        )
        return d.groupby("event_type", as_index=False)[
            ["n_kept", "n_dropped"]
        ].sum()

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"),
            ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby("event_type", as_index=False)[["n_kept", "n_dropped"]]
        .sum()
        .sort_values("event_type", ignore_index=True)
    )
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["n_dropped"] = out["n_dropped"].astype(np.int64)
    return out


# ------------------------------------------------------- table profiling
def table_profile(sf_dir: str) -> pd.DataFrame:
    """Column-profile of the events table — per column: row count, null
    count, EXACT distinct count, numeric min/max (NULL for strings) and
    string min/max (NULL for numerics).  The self-service "describe"
    every engine ships; complements ``dq_audit``'s assertion checks with
    an unconditional census.

    Shape: two column-pruned passes.  Pass 1 (stats) emits 6 partial
    rows per batch (n / nulls / min / max per column) — driver reduce is
    O(columns).  Pass 2 (distinct) multiplexes EVERY column into ONE
    (col, key) exchange — keys are canonical strings (str(int) for
    int64/us-timestamps, repr(float) shortest-round-trip for doubles;
    both injective, so string-distinct == typed-distinct) — then counts
    survivors per column per partition; the driver sums O(columns x
    partitions) partials.  One exchange for all columns instead of one
    per column.

    Determinism: counts are exact ints; numeric min/max are exact values
    (ROUND6 on the double column on both sides); us-timestamps compare
    as exact integers < 2^53."""
    cols_num = ["event_id", "ts", "user_id", "value"]
    cols_str = ["event_type", "props"]
    all_cols = cols_num + cols_str
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=all_cols)

    def _num(df: pd.DataFrame, c: str) -> np.ndarray:
        if c == "ts":
            return df[c].astype("datetime64[us]").astype(np.int64).to_numpy(
                np.float64
            )
        return df[c].to_numpy(np.float64)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in all_cols:
            s = df[c]
            nulls = int(s.isna().sum())
            if c in cols_num:
                v = _num(df, c)
                v = v[~np.isnan(v)]
                mn = float(v.min()) if len(v) else np.nan
                mx = float(v.max()) if len(v) else np.nan
                rows.append((c, len(s), nulls, mn, mx, None, None))
            else:
                v = s.dropna().astype(str)
                mn = v.min() if len(v) else None
                mx = v.max() if len(v) else None
                rows.append((c, len(s), nulls, np.nan, np.nan, mn, mx))
        return pd.DataFrame(
            rows,
            columns=["column", "n", "nulls", "min_num", "max_num",
                     "min_str", "max_str"],
        )

    st = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in all_cols:
            if c == "ts":
                k = (
                    df[c].astype("datetime64[us]").astype(np.int64)
                    .astype(str)
                )
            elif c in ("event_id", "user_id"):
                k = df[c].astype(np.int64).astype(str)
            elif c == "value":
                # +0.0 collapses -0.0 to +0.0, then the bit pattern is an
                # injective int64 key (vectorized; no per-row repr loop)
                v = df[c].to_numpy(np.float64) + 0.0
                k = pd.Series(v.view(np.int64)).astype(str)
            else:
                k = df[c].astype(str)
            k = k[df[c].notna().to_numpy()]
            frames.append(pd.DataFrame({"col": c, "key": k.unique()}))
        return pd.concat(frames, ignore_index=True)

    def distinct_combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop_duplicates(["col", "key"])
            .groupby("col", as_index=False)
            .size()
            .rename(columns={"size": "nd"})
        )

    nd = (
        hash_combine(
            ds.map_batches(distinct_partial, batch_format="pandas"),
            ["col", "key"],
            distinct_combine,
        )
        .to_pandas()
        .groupby("col", as_index=False)["nd"]
        .sum()
        .set_index("col")["nd"]
    )

    out_rows = []
    for c in all_cols:
        p = st[st["column"] == c]
        is_num = c in cols_num
        mn = p["min_num"].min() if is_num else None
        mx = p["max_num"].max() if is_num else None
        if is_num and c != "value" and mn == mn:
            mn, mx = float(mn), float(mx)
        if c == "value" and mn == mn:
            mn = float(np.sign(mn) * np.floor(abs(mn) * 1e6 + 0.5) / 1e6)
            mx = float(np.sign(mx) * np.floor(abs(mx) * 1e6 + 0.5) / 1e6)
        out_rows.append(
            (
                c,
                int(p["n"].sum()),
                int(p["nulls"].sum()),
                int(nd.get(c, 0)),
                mn if is_num else np.nan,
                mx if is_num else np.nan,
                None if is_num else p["min_str"].dropna().min(),
                None if is_num else p["max_str"].dropna().max(),
            )
        )
    out = pd.DataFrame(
        out_rows,
        columns=["column", "n", "nulls", "n_distinct", "min_num",
                 "max_num", "min_str", "max_str"],
    ).sort_values("column", ignore_index=True)
    for c in ("n", "nulls", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out
