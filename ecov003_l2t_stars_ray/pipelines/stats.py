"""Distribution / order-statistics operators: Gini concentration via a
distributed sort, Pareto coverage via an early-stopping sorted stream,
chi-square independence cells, exact median/MAD on a bounded value
lattice, day-over-day deltas, PERCENT_RANK, and hapax vocabulary stats.

Engine shape matches ``analytics``/``grouping``: vectorized map-side
partials, ONE int-keyed hash exchange (``functions.shuffle.hash_combine``)
or ONE range exchange (``Dataset.sort``), vocabulary-sized driver reduces.
Every SQL-checked float is a single division chain over order-independent
integer accumulations (CLAUDE.md float-compare invariant); medians are
computed on a 2^10 fixed-point lattice so interpolated midpoints are exact
binary halves on BOTH sides.

Reference parity: the reference computes scene-level distribution summaries
(per-class means/medians and QA-count concentration) inside its composite
step (`ECOv003_L2T_STARS/L2T_STARS.py` composite statistics); these
re-express that family over generic tables plus the order-statistics the
reference's raster engine never needed at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.shuffle import hash_combine, typed_empty, typed_pandas

US = 1_000_000
HOUR_US = 3600 * US
DAY_US = 24 * HOUR_US


def _r6away(x):
    """ROUND half-away-from-zero at 6 dp — mirrors DuckDB ROUND (CLAUDE.md
    invariant; np.round is half-even)."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _per_customer_cents(sf_dir: str) -> ray.data.Dataset:
    """Per-customer order revenue as exact int64 cents: map-side per-batch
    custkey partial sums, one custkey-hash exchange, per-partition combine.
    The result is customer-dimension sized (bounded, not event-sized)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"cust": df["o_custkey"].to_numpy(np.int64), "cents": cents}
            )
            .groupby("cust", as_index=False)["cents"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cust", as_index=False)["cents"].sum()

    return hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["cust"], combine
    )


# ----------------------------------------------------------------- Gini
def gini_revenue(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-customer revenue via the sorted-rank
    identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n (i = 1-based ascending
    rank) — the canonical concentration measure over a distributed sort.

    Shape: per-customer cents (one hash exchange) -> ``Dataset.sort`` (one
    range exchange) -> per-BLOCK integer partials {n, sum, sum(local_i*x),
    min, max}; the driver orders the O(blocks) partials by (min, max) —
    valid because Ray's sort range-partitions, so block value-ranges never
    interleave and ties contribute identically under any tie order — and
    re-bases each block's rank sum with its prefix offset: ONE tiny driver
    reduce, no row-level driver materialization.  All accumulations are
    int64 (swx <= n*sx; document two-lane int128 split past ~sf10); the
    Gini itself is ONE mirrored float chain over three exact ints."""
    totals = _per_customer_cents(sf_dir).sort("cents")

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        x = df["cents"].to_numpy(np.int64)
        if len(x) == 0:
            return pd.DataFrame(
                {"n": [], "sx": [], "swx": [], "minc": [], "maxc": []}
            ).astype(np.int64)
        i = np.arange(1, len(x) + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [x.sum()],
                "swx": [(i * x).sum()],
                "minc": [x[0]],
                "maxc": [x[-1]],
            }
        )

    parts = totals.map_batches(block_stats, batch_format="pandas").to_pandas()
    if len(parts) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(n_customers=np.int64, total_revenue=np.float64,
                           gini=np.float64)
    parts = parts.sort_values(["minc", "maxc"], kind="mergesort",
                              ignore_index=True)
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    nb = parts["n"].to_numpy(np.int64)
    off = np.concatenate([[0], np.cumsum(nb)[:-1]])
    swx = int(
        (parts["swx"].to_numpy(np.int64) + off * parts["sx"].to_numpy(np.int64)).sum()
    )
    gini = float(_r6away(2.0 * swx / n / sx - (n + 1.0) / n))
    return pd.DataFrame(
        {
            "n_customers": [np.int64(n)],
            "total_revenue": [sx / 100.0],
            "gini": [gini],
        }
    )


# --------------------------------------------------------------- Pareto
def pareto_revenue_share(sf_dir: str, pcts=(50, 80, 90)) -> pd.DataFrame:
    """Pareto coverage: the smallest number of top customers whose summed
    revenue reaches p% of the total, plus the revenue they cover.

    Shape: per-customer cents -> ``materialize()`` (customer-dimension
    sized by contract) -> ONE total-sum pass -> descending sort -> the
    driver consumes the sorted stream via ``iter_batches`` with a
    vectorized exclusive-prefix test per block and EARLY-STOPS at the
    largest threshold — O(1) driver memory, and only the head of the
    sorted stream is ever pulled.  Counting rows with excl_prefix*100 <
    pct*total is tie-order invariant (equal values contribute identical
    prefix multisets), so no tiebreak column is needed on either side."""
    totals = _per_customer_cents(sf_dir).materialize()
    stp = totals.map_batches(
        lambda df: pd.DataFrame({"s": [df["cents"].sum()]}),
        batch_format="pandas",
    ).to_pandas()
    if len(stp) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(pct=np.int64, n_customers=np.int64,
                           revenue_covered=np.float64)
    sx = int(stp["s"].sum())
    pcts = sorted(int(p) for p in pcts)
    hi = max(pcts)
    n_cov = {p: 0 for p in pcts}
    rev_cov = {p: 0 for p in pcts}
    cum = 0
    for b in totals.sort("cents", descending=True).iter_batches(
        batch_format="pandas"
    ):
        x = b["cents"].to_numpy(np.int64)
        if len(x) == 0:
            continue
        excl = cum + np.concatenate([[0], np.cumsum(x)[:-1]])
        for p in pcts:
            m = excl * 100 < p * sx
            n_cov[p] += int(m.sum())
            rev_cov[p] += int(x[m].sum())
        cum += int(x.sum())
        if cum * 100 >= hi * sx:
            break
    return pd.DataFrame(
        {
            "pct": np.array(pcts, dtype=np.int64),
            "n_customers": np.array([n_cov[p] for p in pcts], dtype=np.int64),
            "revenue_covered": np.array(
                [rev_cov[p] for p in pcts], dtype=np.int64
            )
            / 100.0,
        }
    )


# ----------------------------------------------------- chi-square cells
def chi2_event_hour(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence cells for event_type x hour-of-day: per-cell
    observed count, expected count under independence, and the cell's
    chi-square contribution.  Per-cell output (no float summation across
    cells) keeps every emitted float a SINGLE mirrored chain over exact
    integer marginals — the stat's total is a trivial driver sum the
    caller can do, but summing ~hundreds of float terms inside the oracle
    would re-open the partial-sum ulp hazard (CLAUDE.md).

    Shape: vectorized (type, hour) count partials, driver reduce of a
    vocabulary-sized table (|types| x 24), marginals by numpy."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        hour = (us // HOUR_US) % 24
        return (
            pd.DataFrame(
                {"event_type": df["event_type"].astype(str), "hour": hour}
            )
            .groupby(["event_type", "hour"], sort=False)
            .size()
            .rename("observed")
            .reset_index()
        )

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "hour"], as_index=False)["observed"]
        .sum()
    )
    c["observed"] = c["observed"].astype(np.int64)
    c["hour"] = c["hour"].astype(np.int64)
    rt = c.groupby("event_type")["observed"].transform("sum").to_numpy(np.int64)
    ct = c.groupby("hour")["observed"].transform("sum").to_numpy(np.int64)
    n = int(c["observed"].sum())
    e = (rt * ct).astype(np.float64) / n
    o = c["observed"].to_numpy(np.float64)
    d = o - e
    c["expected"] = _r6away(e)
    c["chi2_term"] = _r6away(d * d / e)
    return c.sort_values(["event_type", "hour"], ignore_index=True)


# -------------------------------------------------- exact median / MAD
def median_mad_by_type(sf_dir: str) -> pd.DataFrame:
    """EXACT per-type median and median-absolute-deviation via a bounded
    fixed-point histogram: values snap once to the 2^10 lattice (the
    ``corr_value_props`` precedent), per-(type, q) counts ride one hash
    exchange, and the driver reduces a lattice-bounded histogram — fully
    distributed and scale-safe (the histogram is value-range bounded, not
    corpus sized), unlike a per-group full sort.  t-digest
    (`sketches.py`) remains the unbounded-domain alternative.

    Exactness: medians are taken in the DOUBLED lattice (lo+hi stays an
    integer), so the interpolated midpoint is an exact binary half and
    deviations |q - med| are exact halves; the final /1024.0 and /2 are
    power-of-two exact, making the engine bitwise-equal to DuckDB's
    ``median`` (= quantile_cont(0.5) = lo + (hi-lo)*0.5, identical on this
    lattice)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str), "q": q})
            .groupby(["event_type", "q"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "q"], as_index=False)["cnt"].sum()

    hist = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "q"],
        combine,
    ).to_pandas()
    hist = hist.groupby(["event_type", "q"], as_index=False)["cnt"].sum()

    def _hist_median2(v: np.ndarray, c: np.ndarray) -> int:
        """lo+hi (doubled median) of a value histogram, values sorted."""
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(v[np.searchsorted(cum, n // 2 + 1)])
        return lo + hi

    rows = []
    for t, g in hist.groupby("event_type"):
        g = g.sort_values("q")
        v = g["q"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        med2 = _hist_median2(v, c)  # 2 * median on the q lattice
        # deviation histogram in the doubled lattice: |2q - med2| ints
        dev = np.abs(2 * v - med2)
        dg = pd.DataFrame({"d": dev, "c": c}).groupby("d", as_index=False).sum()
        mad4 = _hist_median2(
            dg["d"].to_numpy(np.int64), dg["c"].to_numpy(np.int64)
        )  # 4 * MAD on the q lattice
        rows.append(
            (
                t,
                np.int64(n),
                float(_r6away(med2 / 2.0 / 1024.0)),
                float(_r6away(mad4 / 4.0 / 1024.0)),
            )
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n", "median_value", "mad_value"]
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


# ------------------------------------------------------- day-over-day
def dod_revenue(sf_dir: str) -> pd.DataFrame:
    """Day-over-day revenue deltas (period-over-period family): per epoch
    day the exact cents total, and the relative change vs the previous
    PRESENT day (SQL LAG semantics — gaps are not filled).  One vectorized
    partial pass, vocabulary-sized (day-axis) driver reduce, pct change is
    ONE mirrored division over two exact ints; the first day is NULL on
    both sides."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
            // DAY_US
        )
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"day": day, "cents": cents})
            .groupby("day", as_index=False)["cents"]
            .sum()
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)["cents"]
        .sum()
        .sort_values("day", ignore_index=True)
    )
    if len(agg) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(day=np.int64, revenue=np.float64,
                           pct_change=np.float64)
    cents = agg["cents"].to_numpy(np.int64)
    prev = np.roll(cents.astype(np.float64), 1)
    pct = _r6away(cents.astype(np.float64) / prev - 1.0)
    pct[0] = np.nan
    return pd.DataFrame(
        {
            "day": agg["day"].astype(np.int64),
            "revenue": cents / 100.0,
            "pct_change": pct,
        }
    )


# ----------------------------------------------------- PERCENT_RANK
def percentile_rank_users(sf_dir: str) -> pd.DataFrame:
    """Per-user PERCENT_RANK by exact total event value: values snap once
    to the 2^10 lattice, per-user int sums ride one hash exchange, and the
    driver ranks the user-dimension-sized result (by-contract pull, like
    the other per-user queries; the distributed-sort + block-offset path
    of ``gini_revenue`` is the 100 TB rank assignment).  rank = 1 +
    #(strictly smaller) via searchsorted — SQL RANK over ties — and
    percent_rank = (rank-1)/(n-1) is ONE division over exact ints."""
    ds = _events(sf_dir, ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64), "sq": q})
            .groupby("user_id", as_index=False)["sq"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)["sq"].sum()

    t = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    sq = t["sq"].to_numpy(np.int64)
    n = len(t)
    ssq = np.sort(sq)
    rank = np.searchsorted(ssq, sq, side="left") + 1
    prank = (rank - 1) / (n - 1.0) if n > 1 else np.zeros(n)
    return pd.DataFrame(
        {
            "user_id": t["user_id"].astype(np.int64),
            "total_value": _r6away(sq.astype(np.float64) / 1024.0),
            "prank": _r6away(prank),
        }
    ).sort_values("user_id", ignore_index=True)


# -------------------------------------------------------- hapax stats
def hapax_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source vocabulary statistics: token count, vocabulary size,
    hapax-legomenon count (corpus-frequency-1 words) and hapax ratio —
    the classic corpus-quality signal (a high hapax share flags noisy or
    OCR-damaged sources).  Tokenization is the corpus-wide space split
    shared with ``top_bigrams`` (mirrored by string_split in the oracle).

    Shape: vectorized per-batch (source, word) counts -> ONE
    (source, word)-hash exchange -> per-partition combine reduces each
    partition to per-source scalars (each word lives in exactly ONE
    partition, so vocab/hapax/token counts are additive) -> tiny driver
    sum.  No word list ever reaches the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("source")["text"].str.split(" ").explode()
        c = ex.groupby([ex.index, ex.values]).size()
        out = c.rename("cnt").reset_index()
        out.columns = ["source", "word", "cnt"]
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby(["source", "word"], as_index=False)["cnt"].sum()
        return (
            w.assign(hapax=(w["cnt"] == 1).astype(np.int64))
            .groupby("source", as_index=False)
            .agg(
                n_tokens=("cnt", "sum"),
                n_vocab=("cnt", "size"),
                n_hapax=("hapax", "sum"),
            )
        )

    parts = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "word"],
        combine,
    ).to_pandas()
    out = parts.groupby("source", as_index=False)[
        ["n_tokens", "n_vocab", "n_hapax"]
    ].sum()
    for c in ["n_tokens", "n_vocab", "n_hapax"]:
        out[c] = out[c].astype(np.int64)
    out["hapax_ratio"] = _r6away(
        out["n_hapax"].to_numpy(np.float64) / out["n_vocab"].to_numpy(np.int64)
    )
    return out.sort_values("source", ignore_index=True)


# ------------------------------------------------ Mann-Whitney U / AUC
def mann_whitney_auc(
    sf_dir: str, type_a: str = "view", type_b: str = "purchase"
) -> pd.DataFrame:
    """EXACT Mann-Whitney U statistic (with tie-corrected average ranks)
    and the equivalent AUC between two event types' value distributions —
    the standard nonparametric two-sample test, and the ranking-quality
    readout an eval pipeline wants.

    Exactness: values snap once to the 2^10 lattice; average tie ranks
    ride DOUBLED (2R1 = sum n1*(2*below + n1 + n2 + 1)) so every
    accumulation is int64; U and AUC are single mirrored float chains.
    Shape: per-batch (q, n1, n2) histogram partials -> ONE q-hash
    exchange -> the driver cumsums a lattice-bounded histogram (value-
    range bounded, not corpus sized)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["event_type"].astype(str)
        m = t.isin([type_a, type_b])
        d = df[m]
        q = np.floor(d["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        isa = (t[m] == type_a).to_numpy()
        return (
            pd.DataFrame(
                {
                    "q": q,
                    "n1": isa.astype(np.int64),
                    "n2": (~isa).astype(np.int64),
                }
            )
            .groupby("q", as_index=False)[["n1", "n2"]]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("q", as_index=False)[["n1", "n2"]].sum()

    h = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["q"], combine
        )
        .to_pandas()
        .groupby("q", as_index=False)[["n1", "n2"]]
        .sum()
        .sort_values("q", ignore_index=True)
    )
    n1 = h["n1"].to_numpy(np.int64)
    n2 = h["n2"].to_numpy(np.int64)
    tot = n1 + n2
    below = np.concatenate([[0], np.cumsum(tot)[:-1]])
    two_r1 = int((n1 * (2 * below + tot + 1)).sum())
    N1, N2 = int(n1.sum()), int(n2.sum())
    num = two_r1 - N1 * (N1 + 1)
    # degenerate guard: AUC is undefined when either sample is empty
    auc = float(_r6away(num / (2 * N1 * N2))) if N1 and N2 else float("nan")
    return pd.DataFrame(
        {
            "n_a": [np.int64(N1)],
            "n_b": [np.int64(N2)],
            "u_stat": [num / 2.0],
            "auc": [auc],
        }
    )


# ------------------------------------------- exact lattice quantiles
def lattice_quantiles(sf_dir: str, ps=(0.25, 0.5, 0.75)) -> pd.DataFrame:
    """EXACT per-type quantiles at binary-fraction probabilities via the
    same bounded 2^10-lattice histogram as ``median_mad_by_type`` —
    generalizes the median to arbitrary quantile_cont interpolation.

    ps are restricted to BINARY fractions (k/2^m) by contract: then
    (n-1)*p, the fractional part, and lo + (hi-lo)*frac are all exact on
    the integer lattice, so any algebraically-equivalent interpolation
    formula (DuckDB's included) produces the identical double; a
    non-binary p (0.95) would make the result depend on the engine's
    op order (CLAUDE.md float invariant)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str), "q": q})
            .groupby(["event_type", "q"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "q"], as_index=False)["cnt"].sum()

    hist = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "q"],
            combine,
        )
        .to_pandas()
        .groupby(["event_type", "q"], as_index=False)["cnt"]
        .sum()
    )
    rows = []
    for t, g in hist.groupby("event_type"):
        g = g.sort_values("q")
        v = g["q"].to_numpy(np.int64)
        cum = np.cumsum(g["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        for p in ps:
            idx = (n - 1) * float(p)
            lo = int(np.floor(idx))
            frac = idx - lo
            v_lo = int(v[np.searchsorted(cum, lo + 1)])
            v_hi = int(v[np.searchsorted(cum, min(lo + 1, n - 1) + 1)])
            qv = v_lo + (v_hi - v_lo) * frac
            rows.append((t, float(p), float(_r6away(qv / 1024.0))))
    return pd.DataFrame(
        rows, columns=["event_type", "p", "q_value"]
    ).sort_values(["event_type", "p"], ignore_index=True)


# --------------------------------------------- lag-1 autocorrelation
def autocorr_lag1_hourly(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of each event type's HOURLY count series on
    the dense global hour axis (absent hours count 0) — the basic
    seasonality/persistence readout, and the dense-axis lag-join shape.

    Exactness: counts are ints, so every moment (n, sx, sy, sxx, syy,
    sxy over the H-1 consecutive-hour pairs) accumulates in int64; the
    correlation is ONE mirrored float chain — num = n*sxy - sx*sy stays
    int64, the denominator multiplies the two int variance terms AS
    DOUBLES (their int64 product can overflow past ~sf1) before one
    IEEE sqrt, identical op-for-op in the oracle.
    Shape: per-batch (type, hour) count partials -> one hash exchange;
    the reduced table is |types| x |hours| (time-range bounded, NOT data
    bounded), so the dense scatter + moment chain runs on the driver."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = (
            df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "hr": hr})
            .groupby(["event_type", "hr"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    h = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "hr"],
            lambda g: g.groupby(["event_type", "hr"], as_index=False)[
                "c"
            ].sum(),
            num_partitions=8,
        )
        .to_pandas()
        .groupby(["event_type", "hr"], as_index=False)["c"]
        .sum()
    )
    if len(h) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_type=object, n_pairs=np.int64,
                           autocorr=np.float64)
    lo = int(h["hr"].min())
    hi = int(h["hr"].max())
    H = hi - lo + 1
    rows = []
    for t, g in h.groupby("event_type"):
        dense = np.zeros(H, np.int64)
        dense[g["hr"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        x, y = dense[:-1], dense[1:]
        n = H - 1
        # moment lanes in PYTHON ints end-to-end (ADVICE r4: (x*x).sum()
        # inside int64 overflows near per-hour counts ~3e9 where the
        # HUGEINT oracle would not; the H-length loop is negligible)
        sx, sy = sum(int(v) for v in x), sum(int(v) for v in y)
        sxx = sum(int(v) * int(v) for v in x)
        syy = sum(int(v) * int(v) for v in y)
        sxy = sum(int(a) * int(b) for a, b in zip(x, y))
        num = float(n * sxy - sx * sy)
        den = np.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
        rows.append((t, np.int64(n), float(_r6away(num / den))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_pairs", "autocorr"]
    ).sort_values("event_type", ignore_index=True)


# ------------------------------------------ Kolmogorov-Smirnov distance
def ks_test_values(
    sf_dir: str, type_a: str = "view", type_b: str = "purchase"
) -> pd.DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two event
    types' value distributions: D = max |F_a - F_b| over the shared
    2^10 value lattice — the max-ECDF-deviation companion to
    ``mann_whitney_auc``'s rank-sum.

    Exactness: D rides as the INTEGER max of |cum_a*N_b - cum_b*N_a|
    (cross-multiplied ECDFs, no division inside the max); the statistic
    itself is ONE division at the end. Same bounded-histogram exchange
    shape as mann_whitney_auc."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["event_type"].astype(str)
        m = t.isin([type_a, type_b])
        d = df[m]
        q = np.floor(d["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        isa = (t[m] == type_a).to_numpy()
        return (
            pd.DataFrame(
                {
                    "q": q,
                    "n1": isa.astype(np.int64),
                    "n2": (~isa).astype(np.int64),
                }
            )
            .groupby("q", as_index=False)[["n1", "n2"]]
            .sum()
        )

    h = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["q"],
            lambda g: g.groupby("q", as_index=False)[["n1", "n2"]].sum(),
            num_partitions=8,
        )
        .to_pandas()
        .groupby("q", as_index=False)[["n1", "n2"]]
        .sum()
        .sort_values("q", ignore_index=True)
    )
    c1 = np.cumsum(h["n1"].to_numpy(np.int64))
    c2 = np.cumsum(h["n2"].to_numpy(np.int64))
    N1 = int(c1[-1]) if len(c1) else 0
    N2 = int(c2[-1]) if len(c2) else 0
    dn = int(np.abs(c1 * N2 - c2 * N1).max()) if len(c1) else 0
    # degenerate guard: the statistic is undefined on an empty sample
    ks = float(_r6away(dn / (N1 * N2))) if N1 and N2 else float("nan")
    return pd.DataFrame(
        {
            "n_a": [np.int64(N1)],
            "n_b": [np.int64(N2)],
            "ks_num": [np.int64(dn)],
            "ks_stat": [ks],
        }
    )


# ------------------------------------------------------- Pareto frontier
def pareto_frontier_events(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier) of the DISTINCT (value, ts) event
    set: the points maximizing value while minimizing ts — no other pair
    has value >= AND ts <= with at least one strict ("earliest
    high-value events", the classic block-nested-loop skyline query).

    Shape: bit-pattern dedup partials -> ONE (vbits, ts)-hash exchange ->
    ``Dataset.sort`` on (value DESC, ts ASC) (one range exchange) -> a
    per-BLOCK strict prefix-min sweep emitting {local candidates,
    first-row key, block min ts}; the driver orders the O(blocks)
    partials by the sort key (valid: ranges never interleave, and
    first-row keys are unique after dedup) and re-tests each block's
    candidates against the prefix min of preceding block minima.  Only
    frontier CANDIDATES reach the driver — O(log n) expected points on
    independent axes — never the row stream.

    Determinism: value/ts are compared, never combined — no float
    arithmetic anywhere; the strict ``<`` sweep over the sorted distinct
    stream is exactly the NOT EXISTS dominance test.
    Reference parity: the reference's best-pixel composite keeps the
    (quality DESC, acquisition-age ASC) frontier per tile the same way
    (ECOv003-L2T-STARS L2T_STARS.py composite source selection)."""
    ds = _events(sf_dir, ["ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        return pd.DataFrame(
            {"vbits": v.view(np.int64), "ts_us": t}
        ).drop_duplicates()

    distinct = hash_combine(
        ds.map_batches(prep, batch_format="pandas"),
        ["vbits", "ts_us"],
        lambda g: g.drop_duplicates(),
    )

    def to_sortable(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "value": df["vbits"].to_numpy(np.int64).view(np.float64),
                "ts_us": df["ts_us"].to_numpy(np.int64),
            }
        )

    s = distinct.map_batches(to_sortable, batch_format="pandas").sort(
        ["value", "ts_us"], descending=[True, False]
    )

    EMPTY = pd.DataFrame(
        {
            "value": pd.Series([], dtype=np.float64),
            "ts_us": pd.Series([], dtype=np.int64),
            "v0": pd.Series([], dtype=np.float64),
            "t0": pd.Series([], dtype=np.int64),
            "tmin": pd.Series([], dtype=np.int64),
        }
    )

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return EMPTY.copy()
        v = df["value"].to_numpy(np.float64)
        t = df["ts_us"].to_numpy(np.int64)
        prev_min = np.concatenate(
            [[np.iinfo(np.int64).max], np.minimum.accumulate(t)[:-1]]
        )
        cand = t < prev_min
        k = int(cand.sum())
        return pd.DataFrame(
            {
                "value": v[cand],
                "ts_us": t[cand],
                "v0": np.full(k, v[0]),
                "t0": np.full(k, t[0]),
                "tmin": np.full(k, t.min()),
            }
        )

    parts = s.map_batches(sweep, batch_format="pandas").to_pandas()
    empty_out = pd.DataFrame(
        {
            "value": pd.Series([], dtype=np.float64),
            "ts": pd.Series([], dtype="datetime64[us]"),
        }
    )
    if len(parts) == 0:
        return empty_out
    parts = parts.sort_values(
        ["v0", "t0"], ascending=[False, True], kind="mergesort",
        ignore_index=True,
    )
    blk = parts[["v0", "t0", "tmin"]].drop_duplicates(["v0", "t0"])
    pm = np.concatenate(
        [[np.iinfo(np.int64).max],
         np.minimum.accumulate(blk["tmin"].to_numpy(np.int64))[:-1]]
    )
    idx = pd.MultiIndex.from_frame(blk[["v0", "t0"]])
    thresh = (
        pd.Series(pm, index=idx)
        .reindex(pd.MultiIndex.from_frame(parts[["v0", "t0"]]))
        .to_numpy(np.int64)
    )
    out = parts[parts["ts_us"].to_numpy(np.int64) < thresh]
    if len(out) == 0:
        return empty_out
    out = out.sort_values(
        ["value", "ts_us"], ascending=[False, True], ignore_index=True
    )
    return pd.DataFrame(
        {
            "value": out["value"].to_numpy(np.float64),
            "ts": out["ts_us"].to_numpy(np.int64).astype("datetime64[us]"),
        }
    )


# ------------------------------------------------------ winsorized mean
def winsorized_mean_by_type(sf_dir: str) -> pd.DataFrame:
    """IQR-winsorized robust mean per event type: values are clipped to
    the exact [q25, q75] lattice quantiles before averaging — the
    outlier-robust center training-data quality filters use.

    Shape: the same bounded 2^10-lattice histogram as
    ``median_mad_by_type`` (ONE (type, q)-hash exchange); BOTH the
    quantile bounds and the clipped sum then come from the histogram
    itself (sum of cnt * clip(q)), so no second data pass exists at all
    — the whole reduce runs on the |types| x |lattice| table.

    Exactness: q25/q75 at binary fractions interpolate to exact QUARTER
    lattice points, so the clip runs on the 4x lattice where bounds and
    values are all int64; the mean is ONE mirrored division chain
    (sum4 / n / 4096).  DuckDB's SUM over exact-integer doubles (< 2^53)
    is order-independent, matching the int64 engine sum."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str), "q": q})
            .groupby(["event_type", "q"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )

    hist = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "q"],
            lambda g: g.groupby(["event_type", "q"], as_index=False)[
                "cnt"
            ].sum(),
        )
        .to_pandas()
        .groupby(["event_type", "q"], as_index=False)["cnt"]
        .sum()
    )
    rows = []
    for t, g in hist.groupby("event_type"):
        g = g.sort_values("q")
        v = g["q"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        bounds4 = []
        for p_num in (1, 3):  # p = 1/4, 3/4 — binary fractions
            idx4 = (n - 1) * p_num  # 4*(n-1)*p, an exact int
            lo = idx4 // 4
            frac4 = idx4 - 4 * lo  # 4*frac in {0,1,2,3}
            v_lo = int(v[np.searchsorted(cum, lo + 1)])
            v_hi = int(v[np.searchsorted(cum, min(lo + 1, n - 1) + 1)])
            bounds4.append(4 * v_lo + (v_hi - v_lo) * frac4)
        lo4, hi4 = bounds4
        s4 = int((c * np.clip(4 * v, lo4, hi4)).sum())
        rows.append((t, n, float(_r6away(s4 / n / 4096.0))))
    out = pd.DataFrame(rows, columns=["event_type", "n", "wmean"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


# ------------------------------------------------- feature normalization
def value_zscore_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-event z-score standardization within its event type — the
    map-only feature-scaling transform (two-pass: tiny moment table
    broadcast, then a streaming normalize that never shuffles the fact
    stream).

    Exactness: values snap to the 2^10 lattice so the per-type moments
    (n, s1 = sum q, s2 = sum q^2) accumulate order-free in int64 (s2
    overflows past ~sf100 on this value range — document two-lane split
    there); mean/std/z is ONE float chain of IEEE exact-rounded ops
    mirrored op-for-op in the oracle, so the result is bit-identical, not
    just ROUND-close."""
    ds = _events(sf_dir, ["event_id", "event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        g = pd.DataFrame({"event_type": df["event_type"].astype(str), "q": q})
        out = g.groupby("event_type", sort=False)["q"].agg(
            n="size", s1="sum", s2=lambda x: int((x.to_numpy() ** 2).sum())
        )
        return out.reset_index()

    m = (
        ds.map_batches(moments, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)[["n", "s1", "s2"]]
        .sum()
    )
    # mirrored chain: mean = s1/n; var = (s2 - s1*s1/n)/(n-1)
    nd = m["n"].to_numpy(np.int64).astype(np.float64)
    s1 = m["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = m["s2"].to_numpy(np.int64).astype(np.float64)
    m["mean_"] = s1 / nd
    m["std_"] = np.sqrt((s2 - s1 * s1 / nd) / (nd - 1.0))
    mom_ref = ray.put(m.set_index("event_type")[["mean_", "std_"]])

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mom_ref)
        et = df["event_type"].astype(str)
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        mean = mm["mean_"].reindex(et).to_numpy(np.float64)
        std = mm["std_"].reindex(et).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": et.to_numpy(),
                "z": _r6away((q.astype(np.float64) - mean) / std),
            }
        )

    out = ds.map_batches(transform, batch_format="pandas").to_pandas()
    return out.sort_values("event_id", ignore_index=True)


def value_percentile_transform(sf_dir: str) -> pd.DataFrame:
    """Per-event PERCENT_RANK within its event type — quantile
    normalization, the other standard feature transform: a broadcast
    per-type lattice CDF (vocabulary x lattice sized), then a map-only
    searchsorted rank lookup; the fact stream never shuffles.

    Exactness: pr = (#strictly-smaller)/(n-1) — both factors exact
    int64, ONE division, mirrored by SQL PERCENT_RANK's min-rank
    tie rule on the snapped lattice."""
    ds = _events(sf_dir, ["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str), "q": q})
            .groupby(["event_type", "q"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "q"], as_index=False)["cnt"]
        .sum()
        .sort_values(["event_type", "q"], ignore_index=True)
    )
    cdf = {}
    for t, g in hist.groupby("event_type"):
        q = g["q"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        cdf[str(t)] = (q, below, int(c.sum()))
    cdf_ref = ray.put(cdf)

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        tbl = ray.get(cdf_ref)
        et = df["event_type"].astype(str).to_numpy()
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        pr = np.empty(len(q), dtype=np.float64)
        for t in np.unique(et):
            lat, below, n = tbl[t]
            m = et == t
            idx = np.searchsorted(lat, q[m])
            pr[m] = below[idx].astype(np.float64) / (n - 1.0)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": et,
                "pr": _r6away(pr),
            }
        )

    out = ds.map_batches(transform, batch_format="pandas").to_pandas()
    return out.sort_values("event_id", ignore_index=True)


# ------------------------------------------------------ HHI concentration
def nation_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """Herfindahl-Hirschman concentration index of customer revenue per
    nation: HHI = sum(share_i^2) over each nation's customers — the
    market-concentration readout complementing the global ``gini``
    (per-GROUP sum-of-squares concentration, a different moment).

    Shape: per-customer cents ride the :func:`_per_customer_cents`
    exchange; the customer->nation map is BROADCAST (customer-dimension
    sized — at true 100 TB customer cardinality this becomes a Bloom-led
    join, same contract as ``dq_audit``); per-nation (n, sum, sum-of-
    squares) int64 lanes reduce to a nation-sized table.

    Exactness: cents^2 itself fits int64 (bound: per-customer cents
    < 3.03e9, i.e. ~$30M — far past any sf here), but the SUM of
    squares crosses 2^63 already at sf0.1 (~4e19; DuckDB's SUM(BIGINT)
    returns HUGEINT, our int64 lane wrapped NEGATIVE — caught by the
    r5 sf0.1 gate). The square therefore rides TWO int64 lanes
    (hi = sq >> 30, lo = sq & (2^30-1)); each lane's sum stays exact
    through ~6e8 customers per nation, and the driver reassembles the
    exact Python-int total before the ONE mirrored float chain."""
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    ).set_index("c_custkey")["n_name"].astype(str)
    nmap_ref = ray.put(nmap)

    def lanes(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(nmap_ref)
        c = df["cents"].to_numpy(np.int64)
        sq = c * c  # exact: cents < 3.03e9 by schema bound
        d = pd.DataFrame(
            {
                "n_name": nm.reindex(df["cust"].to_numpy(np.int64)).to_numpy(),
                "n_customers": np.ones(len(c), dtype=np.int64),
                "total_cents": c,
                "sq_hi": sq >> np.int64(30),
                "sq_lo": sq & np.int64((1 << 30) - 1),
            }
        )
        return d.groupby("n_name", as_index=False).sum()

    out = (
        _per_customer_cents(sf_dir)
        .map_batches(lanes, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(n_name=object, n_customers=np.int64,
                           total_cents=np.int64, hhi=np.float64)
    out = (
        out.groupby("n_name", as_index=False)[
            ["n_customers", "total_cents", "sq_hi", "sq_lo"]
        ]
        .sum()
        .sort_values("n_name", ignore_index=True)
    )
    s = out["total_cents"].to_numpy(np.int64).astype(np.float64)
    # exact HUGEINT-equivalent reassembly in Python ints, then ONE
    # float cast per nation (mirrors the oracle's HUGEINT -> DOUBLE)
    sq = np.array(
        [
            float((int(h) << 30) + int(lo))
            for h, lo in zip(out["sq_hi"], out["sq_lo"])
        ],
        dtype=np.float64,
    )
    return pd.DataFrame(
        {
            "n_name": out["n_name"].astype(str),
            "n_customers": out["n_customers"].astype(np.int64),
            "total_cents": out["total_cents"].astype(np.int64),
            "hhi": _r6away(sq / (s * s)),
        }
    )


# --------------------------------------------------------------- CUSUM
def cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM change-point statistic per event type over the dense global
    hourly axis (absent hours count 0): S_t = max(0, S_{t-1} + x_t - k)
    with integer drift k = CEIL(mean hourly count) — the upward-shift
    detector; reported is the max excursion and the FIRST hour achieving
    it.  Ceil (not floor) keeps k >= mean so S decays between bursts
    even for sparse types (floor gives k = 0 below one event/hour and S
    degenerates to the running total).

    Shape: the ``autocorr_lag1_hourly`` contract — per-batch (type,
    hour) count partials, one hash exchange, and the recurrence runs on
    the |types| x |hours| table (time-range bounded, NOT data bounded).
    The recurrence itself is VECTORIZED via the prefix identity
    S_t = P_t - min(P_0..P_t), P = cumsum(x - k), P_0 = 0 — no per-step
    Python.

    Determinism: pure int64 throughout (counts, floor drift, prefix
    sums), so the oracle's recursive-CTE replay matches bit-exactly."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "h": hr})
            .groupby(["event_type", "h"], sort=False)
            .size()
            .rename("x")
            .reset_index()
        )

    cnt = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "h"],
            lambda g: g.groupby(["event_type", "h"], as_index=False)[
                "x"
            ].sum(),
            num_partitions=8,
        )
        .to_pandas()
        .groupby(["event_type", "h"], as_index=False)["x"]
        .sum()
    )
    if len(cnt) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_type=object, max_cusum=np.int64,
                           first_hour=np.int64)
    h0, h1 = int(cnt["h"].min()), int(cnt["h"].max())
    H = h1 - h0 + 1
    rows = []
    for t, g in cnt.groupby("event_type"):
        x = np.zeros(H, dtype=np.int64)
        x[g["h"].to_numpy(np.int64) - h0] = g["x"].to_numpy(np.int64)
        k = (int(x.sum()) + H - 1) // H
        p = np.cumsum(x - k)
        # S_t = P_t - min(P_0..P_t); the accumulate includes P_0 = 0
        s = p - np.minimum.accumulate(np.concatenate([[0], p]))[1:]
        i = int(np.argmax(s))
        rows.append((t, int(s[i]), h0 + i))
    out = pd.DataFrame(rows,
                       columns=["event_type", "max_cusum", "first_hour"])
    out["max_cusum"] = out["max_cusum"].astype(np.int64)
    out["first_hour"] = out["first_hour"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


# ------------------------------------------------- cross correlation
def type_cross_correlation(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlation between the HOURLY count series of
    every event-type pair on the dense global hour axis (absent hours
    count 0) — the co-movement matrix ("do errors spike with clicks?")
    complementing ``autocorr_lag1_hourly``'s within-series view.

    Shape: the same (type, hour) count partials and ONE hash exchange;
    the pair moments run on the |types|^2 x |hours| grid at the driver
    (time-range and vocabulary bounded, NOT data bounded), every moment
    an order-free int64 lane.

    Exactness: the ``autocorr`` contract — num = n*sxy - sx*sy stays
    int64; the denominator multiplies the two int variance terms AS
    DOUBLES before one IEEE sqrt, identical op-for-op in the oracle."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "h": hr})
            .groupby(["event_type", "h"], sort=False)
            .size()
            .rename("x")
            .reset_index()
        )

    cnt = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "h"],
            lambda g: g.groupby(["event_type", "h"], as_index=False)[
                "x"
            ].sum(),
            num_partitions=8,
        )
        .to_pandas()
        .groupby(["event_type", "h"], as_index=False)["x"]
        .sum()
    )
    if len(cnt) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(type_a=object, type_b=object, corr=np.float64)
    h0, h1 = int(cnt["h"].min()), int(cnt["h"].max())
    H = h1 - h0 + 1
    types = sorted(cnt["event_type"].unique())
    dense = {}
    for t, g in cnt.groupby("event_type"):
        x = np.zeros(H, dtype=np.int64)
        x[g["h"].to_numpy(np.int64) - h0] = g["x"].to_numpy(np.int64)
        dense[t] = x
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            xa, xb = dense[ta], dense[tb]
            n = np.int64(H)
            sx, sy = xa.sum(), xb.sum()
            sxx = (xa * xa).sum()
            syy = (xb * xb).sum()
            sxy = (xa * xb).sum()
            num = n * sxy - sx * sy
            vx = float(n * sxx - sx * sx)
            vy = float(n * syy - sy * sy)
            r = float(num) / np.sqrt(vx * vy)
            rows.append((ta, tb, float(_r6away(r))))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "corr"])


# ------------------------------------------------------------- Benford
def benford_first_digit(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the classic fraud / data-quality screen
    (complements ``dq_audit``'s null/range checks with a value-shape
    check).

    Shape: the leading digit comes from the exact CENTS integer
    (o_totalprice is 2-decimal, so the first significant digit of the
    value equals that of cents) via ~12 vectorized //10 sweeps — no
    string conversion, no np.char (CLAUDE.md _vec_string hazard);
    digit-count partials are vocabulary-bounded (9 rows/batch) so the
    reduce is a driver sum — NO shuffle.

    Determinism: counts are int64; share is ONE division; benford_p =
    log10(1 + 1/d) rounds identically in numpy and DuckDB (checked all
    nine digits; nearest 6-decimal tie is 0.009 ulp-of-rounding away)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = np.round(
            df["o_totalprice"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        d = d[d > 0]
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        dig, n = np.unique(d, return_counts=True)
        return pd.DataFrame({"digit": dig, "n": n})

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("digit", as_index=False)["n"]
        .sum()
    )
    c["digit"] = c["digit"].astype(np.int64)
    c["n"] = c["n"].astype(np.int64)
    tot = float(c["n"].sum())
    c["share"] = _r6away(c["n"].to_numpy(np.float64) / tot)
    c["benford_p"] = _r6away(
        np.log10(1.0 + 1.0 / c["digit"].to_numpy(np.float64))
    )
    return c.sort_values("digit", ignore_index=True)


# ------------------------------------------------------ seasonality map
def seasonality_profile(sf_dir: str) -> pd.DataFrame:
    """Event seasonality heat-map: count per (event_type, day-of-week,
    hour-of-day) cell plus the cell's share of its type — the weekly
    rhythm readout dashboards draw (``chi2_event_hour`` tests the hour
    axis; this maps the full dow x hod grid).

    Shape: vocabulary-bounded (|types| x 7 x 24) count partials, driver
    reduce — NO shuffle.

    Determinism: dow/hod are integer arithmetic on epoch_us (dow =
    (epoch_day + 4) % 7, matching DuckDB dayofweek's Sunday=0 with
    1970-01-01 = Thursday = 4; positive timestamps only); share is ONE
    division per cell over exact int64 marginals."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].astype(str),
                    "dow": (us // DAY_US + 4) % 7,
                    "hod": (us // HOUR_US) % 24,
                }
            )
            .groupby(["event_type", "dow", "hod"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "dow", "hod"], as_index=False)["n"]
        .sum()
    )
    for col in ("dow", "hod", "n"):
        c[col] = c[col].astype(np.int64)
    tt = c.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    c["share"] = _r6away(c["n"].to_numpy(np.float64) / tt.astype(np.float64))
    return c.sort_values(["event_type", "dow", "hod"], ignore_index=True)


# ------------------------------------------------------ Spearman (exact)
def spearman_value_hour(sf_dir: str) -> pd.DataFrame:
    """EXACT tie-corrected Spearman rank correlation between event value
    and hour-of-day per event_type — the monotone-association readout
    (``corr_value_props`` / ``type_cross_correlation`` are Pearson on
    raw moments; this is the rank statistic, robust to monotone
    transforms).

    Shape: values snap once to the 2^10 lattice (``corr_value_props``
    precedent); (type, q, hod) count partials ride ONE (type, q)-keyed
    hash exchange that collapses duplicates, so the driver sees only
    DISTINCT joint cells (lattice x 24 bounded, corpus-size
    independent).  Ranks come from the marginal histograms: the DOUBLED
    midrank of a tie group starting after m rows with c members is
    2m + c + 1 — an exact integer.

    Determinism: all six moment lanes (n, sx, sxx, sy, syy, sxy over
    doubled midranks) accumulate in arbitrary-precision PYTHON INTS over
    the bounded cell table (the SQL mirrors with HUGEINT sums); the
    final rho is ONE float chain over identically-rounded doubles
    (HUGEINT -> DOUBLE casts round to nearest, verified past 2^53).
    Zero-variance groups emit NULL on both sides."""
    ds = _events(sf_dir, ["event_type", "value", "ts"])
    _S = np.float64(1024.0)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].astype(str),
                    "q": np.floor(
                        df["value"].to_numpy(np.float64) * _S + 0.5
                    ).astype(np.int64),
                    "h": (us // HOUR_US) % 24,
                }
            )
            .groupby(["event_type", "q", "h"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "q", "h"], as_index=False)["n"].sum()

    cells = hash_combine(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "q"],
        combine,
    ).to_pandas()
    cells["event_type"] = cells["event_type"].astype(str)

    rows = []
    for et, g in cells.groupby("event_type"):
        g = g.sort_values(["q", "h"], kind="mergesort")
        # doubled midranks off the marginal histograms (exact ints)
        qs = g.groupby("q")["n"].sum().sort_index()
        rdq = {}
        cum = 0
        for q, c in qs.items():
            rdq[q] = 2 * cum + int(c) + 1
            cum += int(c)
        hs = g.groupby("h")["n"].sum().sort_index()
        rdh = {}
        cum = 0
        for h, c in hs.items():
            rdh[h] = 2 * cum + int(c) + 1
            cum += int(c)
        n = sx = sxx = sy = syy = sxy = 0
        for q, h, c in zip(g["q"], g["h"], g["n"]):
            rx, ry, c = rdq[int(q)], rdh[int(h)], int(c)
            n += c
            sx += c * rx
            sxx += c * rx * rx
            sy += c * ry
            syy += c * ry * ry
            sxy += c * rx * ry
        num = float(n) * float(sxy) - float(sx) * float(sy)
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(syy) - float(sy) * float(sy)
        den = np.sqrt(vx * vy)
        rho = np.nan if den == 0.0 else float(_r6away(np.float64(num / den)))
        rows.append((et, n, rho))
    out = pd.DataFrame(rows, columns=["event_type", "n", "spearman"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


# ----------------------------------------------------- weighted median
def weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """EXACT quantity-weighted LOWER median of line price per
    returnflag: the smallest price whose cumulative quantity reaches
    half the flag's total — the robust "typical traded price" (the
    unweighted lattice medians live in ``median_mad_by_type``; this
    weights by units moved, on exact cents, no lattice snap).

    Shape: (flag, cents) -> quantity-weight partials collapse duplicate
    prices map-side; ONE hash exchange dedups cross-batch; the driver
    reduce is bounded by the DISTINCT-PRICE vocabulary per flag (~rows
    at the tested sf; the documented scale path is the gini-style
    Dataset.sort + block-prefix stitch, which needs no driver
    materialization).

    Determinism: cents and quantities are exact ints; the lower-median
    rule (2*cumw >= total) avoids interpolation entirely, so the only
    float is med_cents / 100."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "flag": df["l_returnflag"].astype(str),
                    "cents": np.floor(
                        df["l_extendedprice"].to_numpy(np.float64) * 100
                        + 0.5
                    ).astype(np.int64),
                    "w": df["l_quantity"].to_numpy(np.float64).astype(
                        np.int64
                    ),
                }
            )
            .groupby(["flag", "cents"], as_index=False)["w"]
            .sum()
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["flag", "cents"],
            lambda g: g.groupby(["flag", "cents"], as_index=False)["w"].sum(),
        )
        .to_pandas()
        .sort_values(["flag", "cents"], kind="mergesort", ignore_index=True)
    )
    rows = []
    for flag, g in cells.groupby("flag"):
        w = g["w"].to_numpy(np.int64)
        cw = np.cumsum(w)
        tot = int(cw[-1])
        idx = int(np.searchsorted(2 * cw, tot))
        rows.append(
            (flag, tot, float(g["cents"].to_numpy(np.int64)[idx]) / 100.0)
        )
    out = pd.DataFrame(
        rows, columns=["l_returnflag", "total_qty", "wmedian_price"]
    ).sort_values("l_returnflag", ignore_index=True)
    out["total_qty"] = out["total_qty"].astype(np.int64)
    return out


# -------------------------------------------------------------- PSI drift
def psi_value_drift(sf_dir: str) -> pd.DataFrame:
    """Population-Stability-Index drift cells per event_type between the
    EARLY and LATE halves of the corpus (split at the midpoint calendar
    day): per value-bin observed counts and the bin's PSI term — the
    train/serve distribution-drift monitor every feature pipeline needs.
    Per-CELL output keeps every float a single mirrored chain (the
    ``chi2_event_hour`` precedent); the caller sums terms for the
    headline PSI.

    Shape: one tiny min/max pre-pass fixes the integer cutoff day; then
    vocabulary-bounded (type, bin, period) count partials (bins are the
    2^10 value lattice // 32768, i.e. 32-unit-wide value bins), driver
    reduce — NO shuffle.

    Determinism: counts and the cutoff are exact ints; p_early/p_late
    are ONE division each over exact marginals; ln(p/q) rounds inside
    ROUND6 with ulp-scale slack (term magnitude <= ~1).  Bins observed
    in only one period are omitted (the un-smoothed PSI convention),
    their mass still visible via the marginal counts."""
    ds = _events(sf_dir, ["event_type", "value", "ts"])

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        return pd.DataFrame({"lo": [d.min()], "hi": [d.max()]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    if len(mm) == 0 or mm["lo"].isna().all():  # all rows filtered (q11 class)
        return typed_empty(event_type=object, bin=np.int64,
                           n_early=np.int64, n_late=np.int64,
                           psi_term=np.float64)
    cut = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        q = np.floor(df["value"].to_numpy(np.float64) * 1024.0 + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].astype(str),
                    "bin": q // 32768,
                    "early": (d <= cut).astype(np.int64),
                }
            )
            .groupby(["event_type", "bin"], sort=False)
            .agg(n_early=("early", "sum"), n=("early", "size"))
            .reset_index()
        )

    c = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "bin"], as_index=False)[["n_early", "n"]]
        .sum()
    )
    c["n_late"] = (c["n"] - c["n_early"]).astype(np.int64)
    c["n_early"] = c["n_early"].astype(np.int64)
    c["bin"] = c["bin"].astype(np.int64)
    te = c.groupby("event_type")["n_early"].transform("sum").to_numpy(np.int64)
    tl = c.groupby("event_type")["n_late"].transform("sum").to_numpy(np.int64)
    keep = (c["n_early"].to_numpy() > 0) & (c["n_late"].to_numpy() > 0)
    p = c["n_early"].to_numpy(np.float64) / te.astype(np.float64)
    q = c["n_late"].to_numpy(np.float64) / tl.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        term = (p - q) * np.log(p / q)
    out = c.loc[keep, ["event_type", "bin", "n_early", "n_late"]].copy()
    out["psi_term"] = _r6away(term[keep])
    return out.sort_values(["event_type", "bin"], ignore_index=True)


# ------------------------------------------------------------ ACF table
def acf_profile_hourly(sf_dir: str, max_lag: int = 24) -> pd.DataFrame:
    """Autocorrelation PROFILE of each type's hourly count series:
    lags 1..24 on the dense global hour axis — the full daily-cycle
    fingerprint (``autocorr_lag1_hourly`` is the single-lag readout;
    this is the table a seasonality detector consumes).

    Shape: identical single (type, hr) exchange; the reduced table is
    time-range bounded, so all 24 lag alignments are numpy slices over
    the SAME dense scatter — no extra passes.

    Determinism: moment lanes are exact PYTHON ints (the SQL mirrors
    with HUGEINT) and the correlation is one mirrored float chain;
    zero-variance lags emit NULL on both sides."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hr = df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US
        return (
            pd.DataFrame({"event_type": df["event_type"].astype(str),
                          "hr": hr})
            .groupby(["event_type", "hr"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    h = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "hr"],
            lambda g: g.groupby(["event_type", "hr"], as_index=False)[
                "c"
            ].sum(),
            num_partitions=8,
        )
        .to_pandas()
        .groupby(["event_type", "hr"], as_index=False)["c"]
        .sum()
    )
    if len(h) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_type=object, lag=np.int64,
                           n_pairs=np.int64, autocorr=np.float64)
    lo, hi = int(h["hr"].min()), int(h["hr"].max())
    H = hi - lo + 1
    rows = []
    for t, g in h.groupby("event_type"):
        dense = np.zeros(H, np.int64)
        dense[g["hr"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        for lag in range(1, max_lag + 1):
            x, y = dense[:-lag], dense[lag:]
            n = int(len(x))
            sx, sy = int(x.sum()), int(y.sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx == 0 or vy == 0:
                r = np.nan
            else:
                r = float(
                    _r6away(
                        np.float64(
                            float(n * sxy - sx * sy)
                            / np.sqrt(float(vx) * float(vy))
                        )
                    )
                )
            rows.append((t, lag, n, r))
    out = pd.DataFrame(
        rows, columns=["event_type", "lag", "n_pairs", "autocorr"]
    ).sort_values(["event_type", "lag"], ignore_index=True)
    out["lag"] = out["lag"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


# -------------------------------------------------------- Kendall tau-b
def kendall_tau_daily(sf_dir: str) -> pd.DataFrame:
    """Exact Kendall tau-b per user between the DAY index and the day's
    total value — the rank-correlation companion to
    ``theil_sen_slope_per_user`` (same pair lattice, concordance counts
    instead of slope medians) and the non-parametric alternative to
    ``trend_ols_1h``'s OLS slope sign.

    Shape: per-(user, day) value-lattice sums ride ONE user-hash
    exchange; the combine reduces each partition to its (user, day)
    cells, then builds every (earlier-day, later-day) pair with the
    segment repeat/arange arithmetic and counts concordant / discordant
    / tied pairs via one bincount each — no per-user Python. Pair count
    is quadratic in DAYS per user (~31 here), not events.

    Determinism: C, D, ties and n0 are exact integers on a day axis
    with no x-ties (n1 = 0), so tau_b = (C - D)/sqrt(n0*(n0 - n2)) is a
    single mirrored float chain; all-tied users emit NULL on both
    sides."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        )
        lat = np.floor(
            df["value"].to_numpy(np.float64) * 1024.0 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"user_id": df["user_id"].to_numpy(np.int64),
                 "day": day, "lat": lat}
            )
            .groupby(["user_id", "day"], as_index=False)["lat"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "n_days": pd.Series(dtype=np.int64),
             "n_pairs": pd.Series(dtype=np.int64),
             "tau_b": pd.Series(dtype=np.float64)}
        )
        g = g.groupby(["user_id", "day"], as_index=False)["lat"].sum()
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        y = g["lat"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return empty
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        nseg = int(seg_id[-1]) + 1
        seg_sizes = np.bincount(seg_id, minlength=nseg)
        starts = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = seg_sizes[seg_id] - loc - 1
        a = np.repeat(np.arange(n), reps)
        if len(a) == 0:
            # every user in this partition has a single day: tau NULL
            return pd.DataFrame(
                {"user_id": u[starts],
                 "n_days": seg_sizes.astype(np.int64),
                 "n_pairs": np.zeros(nseg, np.int64),
                 "tau_b": np.full(nseg, np.nan)}
            )
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        ps = seg_id[a]
        conc = np.bincount(ps[y[b] > y[a]], minlength=nseg)
        disc = np.bincount(ps[y[b] < y[a]], minlength=nseg)
        tied = np.bincount(ps[y[b] == y[a]], minlength=nseg)
        n0 = conc + disc + tied
        denom_in = n0.astype(np.float64) * (n0 - tied).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            tau = np.where(
                denom_in > 0,
                _r6away(
                    (conc - disc).astype(np.float64) / np.sqrt(denom_in)
                ),
                np.nan,
            )
        return pd.DataFrame(
            {"user_id": u[starts],
             "n_days": seg_sizes.astype(np.int64),
             "n_pairs": n0.astype(np.int64),
             "tau_b": tau}
        )

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], combine
    ).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_days"] = out["n_days"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out["tau_b"] = out["tau_b"].astype(np.float64)
    return out


# ------------------------------------------------- linear interpolation
MIN_US = 60 * US


def interp_fill_1m(sf_dir: str) -> pd.DataFrame:
    """Linear interpolation over the dense per-type 1-minute axis:
    observed buckets carry the exact lattice MEAN of their values; gap
    buckets between consecutive observed buckets are filled with the
    straight line between the two neighbours — the standard resampling
    fill a forecasting pipeline applies before a fixed-step model
    (``gap_fill_1m`` marks gaps; this VALUES them; the Kalman smoother
    is the uncertainty-aware generalisation).

    Shape: per-(type, bucket) lattice sums + counts ride ONE hash
    exchange; the reduced table is (types x minutes) bounded, so the
    gap expansion (segment repeat/arange over consecutive observed
    pairs) runs once on the driver like the other dense-axis ops.

    Determinism: bucket means are one division over exact int sums;
    each interpolated value is the SAME IEEE chain
    v + (vn - v) * (pos / len) on both sides, rounded at emit."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].astype("datetime64[us]").astype(np.int64) // MIN_US
        lat = np.floor(
            df["value"].to_numpy(np.float64) * 1024.0 + 0.5
        ).astype(np.int64)
        p = pd.DataFrame(
            {"event_type": df["event_type"].astype(str), "b": b,
             "lat": lat}
        )
        out = p.groupby(["event_type", "b"], as_index=False).agg(
            lat=("lat", "sum"), n=("lat", "size")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "b"], as_index=False)[
            ["lat", "n"]
        ].sum()

    h = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "b"], comb, num_partitions=8,
        )
        .to_pandas()
        .groupby(["event_type", "b"], as_index=False)[["lat", "n"]]
        .sum()
        .sort_values(["event_type", "b"], kind="mergesort",
                     ignore_index=True)
    )
    t = h["event_type"].astype(str).to_numpy()
    bkt = h["b"].to_numpy(np.int64)
    v = h["lat"].to_numpy(np.int64).astype(np.float64) / (
        1024.0 * h["n"].to_numpy(np.int64).astype(np.float64)
    )
    n = len(h)
    same = np.zeros(n, dtype=bool)
    same[:-1] = t[1:] == t[:-1]
    glen = np.zeros(n, np.int64)
    glen[:-1] = bkt[1:] - bkt[:-1]
    gaps = np.flatnonzero(same & (glen > 1))
    parts = [
        pd.DataFrame(
            {"event_type": t, "bucket_min": bkt,
             "value": _r6away(v),
             "interpolated": np.zeros(n, dtype=bool)}
        )
    ]
    if len(gaps):
        reps = glen[gaps] - 1
        src = np.repeat(gaps, reps)
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        pos = np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1
        gl = glen[src].astype(np.float64)
        iv = v[src] + (v[src + 1] - v[src]) * (
            pos.astype(np.float64) / gl
        )
        parts.append(
            pd.DataFrame(
                {"event_type": t[src], "bucket_min": bkt[src] + pos,
                 "value": _r6away(iv),
                 "interpolated": np.ones(len(src), dtype=bool)}
            )
        )
    out = pd.concat(parts, ignore_index=True).sort_values(
        ["event_type", "bucket_min"], kind="mergesort", ignore_index=True
    )
    out["bucket_min"] = out["bucket_min"].astype(np.int64)
    out["value"] = out["value"].astype(np.float64)
    return out


# ------------------------------------------------------------- survival
def survival_curve(sf_dir: str) -> pd.DataFrame:
    """Discrete survival/hazard table over user lifespans (days between
    first and last event): per observed lifespan t — how many users
    churned AT t, how many were still at risk (lifespan >= t), and the
    discrete hazard d/n — the Kaplan-Meier input table
    (``cohort_retention`` counts comebacks per calendar week; this is
    the duration-axis readout).

    Shape: per-user (min_day, max_day) partials ride ONE user-hash
    exchange; each partition reduces its users to LIFESPAN-HISTOGRAM
    cells, so the driver reduce is day-span bounded, never user
    bounded.  n_at_risk is a reverse running sum over the cells.

    Determinism: all-integer counts; hazard is one mirrored division."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        return (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "lo": day, "hi": day})
            .groupby("user_id", as_index=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max")
        )
        span = (g["hi"] - g["lo"]).to_numpy(np.int64)
        return (
            pd.DataFrame({"lifespan": span})
            .groupby("lifespan", as_index=False)
            .size()
            .rename(columns={"size": "n_churned"})
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby("lifespan", as_index=False)["n_churned"]
        .sum()
        .sort_values("lifespan", ascending=False, ignore_index=True)
    )
    at_risk = cells["n_churned"].to_numpy(np.int64).cumsum()
    out = pd.DataFrame(
        {"lifespan": cells["lifespan"].to_numpy(np.int64),
         "n_churned": cells["n_churned"].to_numpy(np.int64),
         "n_at_risk": at_risk}
    ).sort_values("lifespan", ignore_index=True)
    out["hazard"] = _r6away(
        out["n_churned"].to_numpy(np.float64)
        / out["n_at_risk"].to_numpy(np.float64)
    )
    return out


# ------------------------------------------------- doc length quantiles
def doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact q25/q50/q75 of document length per language via the
    crossing rule: the smallest length whose running count covers
    ceil(q*n) — the discrete quantile every corpus-curation cut uses
    (``weighted_median_price`` is the weighted sibling on prices).

    Shape: (lang, n_chars) count cells ride one exchange (bounded by
    the distinct-length vocabulary, not docs); the crossing scan is a
    per-lang cumsum over the reduced cells.

    Determinism: pure integers — the crossing rule needs no
    interpolation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"lang": df["lang"].astype(str),
                          "n_chars": df["n_chars"].to_numpy(np.int64)})
            .groupby(["lang", "n_chars"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["lang", "n_chars"],
            lambda g: g.groupby(["lang", "n_chars"], as_index=False)[
                "cnt"
            ].sum(),
        )
        .to_pandas()
        .groupby(["lang", "n_chars"], as_index=False)["cnt"]
        .sum()
        .sort_values(["lang", "n_chars"], kind="mergesort",
                     ignore_index=True)
    )
    rows = []
    for lang, g in cells.groupby("lang", sort=True):
        v = g["n_chars"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        for q in (25, 50, 75):
            k = (q * n + 99) // 100  # ceil(q*n/100)
            rows.append((str(lang), q, n, int(v[np.searchsorted(cum, k)])))
    out = pd.DataFrame(
        rows, columns=["lang", "q", "n_docs", "p_value"]
    )
    out["q"] = out["q"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["p_value"] = out["p_value"].astype(np.int64)
    return out


# --------------------------------------------------- quantile alignment
def quantile_align_sources(sf_dir: str) -> pd.DataFrame:
    """Quantile alignment table: each source's doc-length deciles next
    to the GLOBAL decile values (both by the crossing rule) — the
    lookup quantile normalization applies to re-shape one source's
    distribution onto the corpus (``psi_value_drift`` scores the
    mismatch; this emits the correction table).

    Shape: (source, n_chars) count cells ride one exchange (distinct
    lengths bound the reduce); the global distribution is the same
    cells re-reduced — no second pass over the corpus.

    Determinism: pure integer crossings at ceil(q*n/100)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"source": df["source"].astype(str),
                          "n_chars": df["n_chars"].to_numpy(np.int64)})
            .groupby(["source", "n_chars"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["source", "n_chars"],
            lambda g: g.groupby(["source", "n_chars"], as_index=False)[
                "cnt"
            ].sum(),
        )
        .to_pandas()
        .groupby(["source", "n_chars"], as_index=False)["cnt"]
        .sum()
    )
    qs = list(range(10, 100, 10))
    if len(cells) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(source=object, q=np.int64, n_docs=np.int64,
                           src_value=np.int64, global_value=np.int64)

    def crossing(vals: np.ndarray, cnts: np.ndarray) -> dict[int, int]:
        order = np.argsort(vals, kind="mergesort")
        v, c = vals[order], cnts[order].cumsum()
        n = int(c[-1])
        return {q: int(v[np.searchsorted(c, (q * n + 99) // 100)])
                for q in qs}, n

    gl = cells.groupby("n_chars", as_index=False)["cnt"].sum()
    gmap, _ = crossing(gl["n_chars"].to_numpy(np.int64),
                       gl["cnt"].to_numpy(np.int64))
    rows = []
    for src, g in cells.groupby("source", sort=True):
        smap, n = crossing(g["n_chars"].to_numpy(np.int64),
                           g["cnt"].to_numpy(np.int64))
        for q in qs:
            rows.append((str(src), q, n, smap[q], gmap[q]))
    out = pd.DataFrame(
        rows,
        columns=["source", "q", "n_docs", "src_value", "global_value"],
    )
    for col in ("q", "n_docs", "src_value", "global_value"):
        out[col] = out[col].astype(np.int64)
    return out


# ------------------------------------------------ seasonal anomaly flags
def seasonal_baseline_anomaly(sf_dir: str) -> pd.DataFrame:
    """Seasonal-baseline anomaly cells: each (type, week, dow, hod)
    cell's mean value against the pooled mean of the SAME weekly slot
    over all PRIOR weeks (expanding baseline); a cell flags when it
    exceeds twice its baseline — the seasonality-aware monitor
    (``zscore_anomaly_24h`` trails a flat window;
    ``seasonality_profile`` is the static heat-map this one learns
    per-slot and walks forward in time).

    Shape: (type, week, dow, hod) lattice cells ride one exchange
    (calendar-bounded); the expanding scan is one shifted cumsum per
    slot on the reduced table.

    Determinism: int lattice sums; cell mean, baseline and the flag
    compare are mirrored double chains (the compare sees identical
    bits on both sides)."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    WEEK_US = 7 * DAY_US

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        day = us // DAY_US
        return (
            pd.DataFrame(
                {"event_type": df["event_type"].astype(str),
                 "week": us // WEEK_US,
                 "dow": (day + 3) % 7,
                 "hod": (us // HOUR_US) % 24,
                 "lat": np.floor(
                     df["value"].to_numpy(np.float64) * 1024.0 + 0.5
                 ).astype(np.int64)}
            )
            .groupby(["event_type", "week", "dow", "hod"],
                     as_index=False)
            .agg(lat=("lat", "sum"), n=("lat", "size"))
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["event_type", "dow", "hod"],
            lambda g: g.groupby(["event_type", "week", "dow", "hod"],
                                as_index=False)[["lat", "n"]].sum(),
        )
        .to_pandas()
        .groupby(["event_type", "week", "dow", "hod"], as_index=False)[
            ["lat", "n"]
        ]
        .sum()
        .sort_values(["event_type", "dow", "hod", "week"],
                     kind="mergesort", ignore_index=True)
    )
    t = cells["event_type"].to_numpy()
    dow = cells["dow"].to_numpy(np.int64)
    hod = cells["hod"].to_numpy(np.int64)
    lat = cells["lat"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    m = len(cells)
    new = np.ones(m, dtype=bool)
    new[1:] = (t[1:] != t[:-1]) | (dow[1:] != dow[:-1]) | (
        hod[1:] != hod[:-1]
    )
    seg = np.cumsum(new) - 1
    cl = np.concatenate([[0], np.cumsum(lat)[:-1]])
    cn = np.concatenate([[0], np.cumsum(n)[:-1]])
    base_starts = np.concatenate(
        [[0], np.cumsum(np.bincount(seg))[:-1]]
    )
    prior_lat = cl - cl[base_starts[seg]]
    prior_n = cn - cn[base_starts[seg]]
    value = lat.astype(np.float64) / (1024.0 * n.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        baseline = np.where(
            prior_n > 0,
            prior_lat.astype(np.float64)
            / (1024.0 * prior_n.astype(np.float64)),
            np.nan,
        )
    flag = np.where(np.isnan(baseline), False, value > 2.0 * baseline)
    out = pd.DataFrame(
        {"event_type": t,
         "week": cells["week"].to_numpy(np.int64),
         "dow": dow, "hod": hod, "n": n,
         "cell_mean": _r6away(value),
         "baseline": np.where(np.isnan(baseline), np.nan,
                              _r6away(baseline)),
         "is_anomaly": flag.astype(bool)}
    ).sort_values(["event_type", "week", "dow", "hod"],
                  ignore_index=True)
    return out


# ---------------------------------------------------- Wilson conversion
def daily_conversion_wilson(sf_dir: str, z2: int = 4) -> pd.DataFrame:
    """Daily purchase-conversion rate with a Wilson score interval
    (z^2 = 4, i.e. ~95.4%): the uncertainty-aware KPI readout an
    experimenter trusts over the raw ratio (``ab_conversion`` compares
    two arms; this bands ONE series day by day).

    Shape: per-day (events, purchases) int partials ride one exchange;
    the interval is a fixed arithmetic chain over the two integers, so
    both sides compute identical doubles.

    Determinism: k, n exact ints; rate/lo/hi are mirrored chains
    rounded at emit."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
        isp = (df["event_type"].astype(str) == "purchase").astype(
            np.int64
        )
        return (
            pd.DataFrame({"day": day, "k": isp,
                          "n": np.ones(len(df), np.int64)})
            .groupby("day", as_index=False)[["k", "n"]]
            .sum()
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["day"],
            lambda g: g.groupby("day", as_index=False)[["k", "n"]].sum(),
        )
        .to_pandas()
        .groupby("day", as_index=False)[["k", "n"]]
        .sum()
        .sort_values("day", ignore_index=True)
    )
    k = cells["k"].to_numpy(np.int64).astype(np.float64)
    n = cells["n"].to_numpy(np.int64).astype(np.float64)
    p = k / n
    z2f = float(z2)
    center = (p + z2f / (2.0 * n)) / (1.0 + z2f / n)
    half = (
        np.sqrt(z2f)
        * np.sqrt(p * (1.0 - p) / n + z2f / (4.0 * (n * n)))
        / (1.0 + z2f / n)
    )
    out = pd.DataFrame(
        {"day": cells["day"].to_numpy(np.int64),
         "n_events": cells["n"].to_numpy(np.int64),
         "n_purchases": cells["k"].to_numpy(np.int64),
         "rate": _r6away(p),
         "wilson_lo": _r6away(center - half),
         "wilson_hi": _r6away(center + half)}
    )
    return out


# ------------------------------------------------------- split census
def dataset_split_census(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment census: each doc's split
    is a pure function of md5(doc_id) (first hex char: 0-9,a -> train
    11/16, b-c -> val 2/16, d-f -> test 3/16) — the reproducible split
    every training pipeline needs to survive restarts and re-shards
    (``epoch_shuffle`` orders within a split; this assigns membership).

    Shape: map-only fingerprint + one (source, split)-keyed reduce.

    Determinism: md5 both sides; integer counts."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h1 = df["doc_id"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest()[0]
        )
        split = np.where(
            h1 <= "a", "train", np.where(h1 <= "c", "val", "test")
        )
        return (
            pd.DataFrame({"source": df["source"].astype(str),
                          "split": split,
                          "doc_id": df["doc_id"].to_numpy(np.int64)})
            .groupby(["source", "split"], as_index=False)
            .agg(n_docs=("doc_id", "size"), sum_ids=("doc_id", "sum"))
        )

    out = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"),
            ["source", "split"],
            lambda g: g.groupby(["source", "split"], as_index=False)[
                ["n_docs", "sum_ids"]
            ].sum(),
        )
        .to_pandas()
        .groupby(["source", "split"], as_index=False)[
            ["n_docs", "sum_ids"]
        ]
        .sum()
        .sort_values(["source", "split"], ignore_index=True)
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_ids"] = out["sum_ids"].astype(np.int64)
    return out


# ------------------------------------------------------ size dispersion
def order_size_dispersion(sf_dir: str) -> pd.DataFrame:
    """Order-size distribution with the Poisson dispersion index: the
    line-count histogram plus one row of exact moments (mean, biased
    variance, variance/mean) — the overdispersion screen that tells a
    capacity planner whether baskets are Poisson-like or bursty
    (``interarrival_stats`` asks the same of time gaps).

    Shape: per-order line counts ride ONE orderkey-hash exchange; the
    histogram reduce is size-vocabulary bounded and the moment lanes
    are exact integers.

    Determinism: HUGEINT-safe integer sums; the three floats are
    mirrored division chains."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64)})
            .groupby("k", as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("k", as_index=False)["c"].sum()
        return (
            g.groupby("c", as_index=False)
            .size()
            .rename(columns={"size": "n_orders"})
        )

    hist = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["k"],
            combine,
        )
        .to_pandas()
        .groupby("c", as_index=False)["n_orders"]
        .sum()
        .sort_values("c", ignore_index=True)
    )
    c = hist["c"].to_numpy(np.int64)
    n = hist["n_orders"].to_numpy(np.int64)
    tot = int(n.sum())
    if tot == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(n_lines=np.int64, n_orders=np.int64,
                           mean_size=np.float64, var_size=np.float64,
                           dispersion=np.float64)
    s1 = int((c * n).sum())
    s2 = int((c * c * n).sum())
    mean = float(s1) / float(tot)
    var = float(tot * s2 - s1 * s1) / float(tot * tot)
    out = pd.DataFrame(
        {"n_lines": c, "n_orders": n.astype(np.int64),
         "mean_size": np.full(len(c), _r6away(np.float64(mean))),
         "var_size": np.full(len(c), _r6away(np.float64(var))),
         "dispersion": np.full(
             len(c), _r6away(np.float64(var / mean))
         )}
    )
    return out


# ------------------------------------------------------- load factor
def daily_load_factor(sf_dir: str) -> pd.DataFrame:
    """Daily load factor: each day's PEAK hourly event count over its
    MEAN hourly count (observed hours only) — the burstiness KPI a
    capacity dashboard tracks per day (``peak_concurrency`` finds the
    all-time peak instant; this normalizes per day).

    Shape: (day, hod) count cells ride one exchange (calendar
    bounded); max and mean reduce per day on the tiny cell table.

    Determinism: integer counts; load_factor is the chain
    max * n_hours / total in exact ints, ONE division."""
    ds = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame({"day": us // DAY_US,
                          "hod": (us // HOUR_US) % 24})
            .groupby(["day", "hod"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    cells = (
        hash_combine(
            ds.map_batches(partial, batch_format="pandas"), ["day"],
            lambda g: g.groupby(["day", "hod"], as_index=False)[
                "n"
            ].sum(),
        )
        .to_pandas()
        .groupby(["day", "hod"], as_index=False)["n"]
        .sum()
    )
    agg = cells.groupby("day").agg(
        peak=("n", "max"), total=("n", "sum"), n_hours=("n", "size")
    )
    out = pd.DataFrame(
        {"day": agg.index.to_numpy(np.int64),
         "n_hours": agg["n_hours"].to_numpy(np.int64),
         "peak_hour_events": agg["peak"].to_numpy(np.int64),
         "total_events": agg["total"].to_numpy(np.int64)}
    ).sort_values("day", ignore_index=True)
    out["load_factor"] = _r6away(
        (out["peak_hour_events"].to_numpy(np.int64)
         * out["n_hours"].to_numpy(np.int64)).astype(np.float64)
        / out["total_events"].to_numpy(np.int64).astype(np.float64)
    )
    return out
