"""Sketch / sampling operators and round-3 stream-operator semantics.

Oracle strategy: the SQL-expressible ops (counter rate, band count,
histogram, z-score, argmax, props extraction, heavy hitters, bottom-k
sample, doc repetition) are gated by DuckDB oracles in __ray_entry__;
here we pin the NON-SQL contracts: Misra-Gries survival guarantee,
t-digest accuracy + merge invariance, HyperLogLog error bound, and
counter-reset semantics on a hand-built corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _tiny_events(tmp_path, rows: dict) -> str:
    """Write a minimal events.parquet into tmp_path and return the dir."""
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


# ----------------------------------------------------------- Misra-Gries
def test_mg_survival_guarantee():
    """Any key with true count > N/capacity must survive compaction."""
    from ecov003_l2t_stars_ray.pipelines.sketches import _mg_summarize

    rng = np.random.default_rng(7)
    keys = np.r_[np.repeat(999, 500), rng.integers(0, 2000, 5000)]
    counts = pd.Series(keys).value_counts()
    n, capacity = len(keys), 64
    out = _mg_summarize(counts, capacity)
    assert len(out) <= capacity
    for k, c in counts.items():
        if c > n / capacity:
            assert k in out.index, f"hot key {k} (count {c}) was evicted"
    # residual counts are lower bounds on the truth
    assert (out <= counts.loc[out.index]).all()


def test_heavy_hitters_exact_under_small_capacity():
    """With capacity far below the distinct count, the two-pass recount
    still returns the EXACT top-k when the hot keys clear N/capacity."""
    from ecov003_l2t_stars_ray.pipelines.sketches import heavy_hitters

    got = heavy_hitters(SF, k=10, capacity=64)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["props"])
    kv = ev["props"].str.extract(r'"k":\s*(-?\d+)', expand=False).dropna().astype(
        np.int64
    )
    exact = (
        kv.value_counts()
        .rename_axis("key")
        .reset_index(name="cnt")
        .sort_values(["cnt", "key"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    # the recount pass is exact for every surviving candidate; any key in
    # the returned top-k must carry its true count
    merged = got.merge(exact, on="key", suffixes=("", "_true"))
    assert (merged["cnt"] == merged["cnt_true"]).all()


# --------------------------------------------------------------- t-digest
def test_tdigest_accuracy_and_merge_invariance():
    from ecov003_l2t_stars_ray.pipelines.sketches import (
        _tdigest_build,
        _tdigest_quantile,
    )

    rng = np.random.default_rng(11)
    vals = np.sort(rng.lognormal(0.0, 1.0, 20_000))
    qs = np.array([0.5, 0.9, 0.99])
    exact = np.quantile(vals, qs)

    m, c = _tdigest_build(vals, np.ones(len(vals), dtype=np.int64), delta=200)
    assert len(m) < 5 * 200  # bounded by O(delta) regardless of n
    approx = _tdigest_quantile(m, c, qs)
    # rank error: the value returned sits within 1% rank of the true quantile
    ranks = np.searchsorted(vals, approx) / len(vals)
    assert np.abs(ranks - qs).max() < 0.01

    # merge invariance: digest-of-digests stays within the same rank bound
    mid = len(vals) // 3
    parts = [vals[:mid], vals[mid:]]
    means, cnts = [], []
    for p in parts:
        pm, pc = _tdigest_build(np.sort(p), np.ones(len(p), dtype=np.int64), 200)
        means.append(pm)
        cnts.append(pc)
    order = np.argsort(np.concatenate(means), kind="mergesort")
    mm, cc = _tdigest_build(
        np.concatenate(means)[order], np.concatenate(cnts)[order], 200
    )
    ranks2 = np.searchsorted(vals, _tdigest_quantile(mm, cc, qs)) / len(vals)
    assert np.abs(ranks2 - qs).max() < 0.015


def test_tdigest_latency_quantiles_close_to_exact():
    from ecov003_l2t_stars_ray.pipelines.analytics import latency_quantiles
    from ecov003_l2t_stars_ray.pipelines.sketches import tdigest_latency_quantiles

    approx = tdigest_latency_quantiles(SF, qs=(0.5, 0.95))
    exact = latency_quantiles(SF)
    m = approx.merge(exact, on="user_id", suffixes=("_a", "_e"))
    assert len(m) == len(exact)
    for q in ("p50_s", "p95_s"):
        rel = np.abs(m[f"{q}_a"] - m[f"{q}_e"]) / np.maximum(m[f"{q}_e"], 1e-9)
        # median relative error across users is small; tails may wobble
        assert np.median(rel) < 0.05, f"{q}: median rel err {np.median(rel)}"


# ------------------------------------------------------------ HyperLogLog
def test_hll_error_bound():
    from ecov003_l2t_stars_ray.pipelines.sketches import (
        _hll_estimate,
        _hll_registers,
    )

    rng = np.random.default_rng(3)
    for true_n in (100, 5_000, 200_000):
        vals = rng.choice(np.arange(true_n * 3, dtype=np.int64), true_n, False)
        est = _hll_estimate(_hll_registers(vals, p=12))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_distinct_vs_exact():
    from ecov003_l2t_stars_ray.pipelines.sketches import hll_distinct

    got = hll_distinct(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    for _, row in got.iterrows():
        t = exact.loc[row["event_type"]]
        assert abs(row["approx_distinct"] - t) / t < 0.05


def test_hll_register_merge_is_order_free():
    from ecov003_l2t_stars_ray.pipelines.sketches import _hll_registers

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 40, 10_000, dtype=np.int64)
    whole = _hll_registers(vals, p=10)
    a = _hll_registers(vals[:3000], p=10)
    b = _hll_registers(vals[3000:], p=10)
    assert np.array_equal(whole, np.maximum(a, b))


# -------------------------------------------------- counter rate semantics
def test_counter_rate_reset_detection(tmp_path):
    """prev=10, v=3 is a RESET: the delta contributes v (3), not v-prev."""
    from ecov003_l2t_stars_ray.pipelines.analytics import counter_rate_1h

    ts0 = pd.Timestamp("2025-01-01 00:00:00")
    sf = _tiny_events(
        tmp_path,
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 8],
            "ts": [ts0, ts0 + pd.Timedelta("1min"), ts0 + pd.Timedelta("2min"),
                   ts0 + pd.Timedelta("61min"), ts0],
            "event_type": ["c"] * 5,
            "value": [10.0, 13.5, 3.0, 4.0, 1.0],
            "props": ["{}"] * 5,
        },
    )
    out = counter_rate_1h(sf)
    # user 7 hour 0: deltas 3.5 (advance) + 3.0 (reset -> v) = 6.5
    h0 = out[(out.user_id == 7) & (out.bucket_start == ts0)]
    assert h0["n_deltas"].iloc[0] == 2 and h0["rate_sum"].iloc[0] == 6.5
    # user 7 hour 1: one delta 1.0 (4 - 3, bucket of the CURRENT event)
    h1 = out[(out.user_id == 7) & (out.bucket_start == ts0 + pd.Timedelta("1h"))]
    assert h1["n_deltas"].iloc[0] == 1 and h1["rate_sum"].iloc[0] == 1.0
    # user 8 has a single event -> no deltas anywhere
    assert (out.user_id != 8).all()


def test_band_count_matches_brute_force(tmp_path):
    from ecov003_l2t_stars_ray.pipelines.analytics import band_count_5m

    rng = np.random.default_rng(13)
    n = 400
    ts0 = pd.Timestamp("2025-01-01").value // 1000
    rows = {
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 5, n),
        "ts": pd.to_datetime(
            ts0 + np.sort(rng.integers(0, 3_600_000_000, n)), unit="us"
        ),
        "event_type": ["x"] * n,
        "value": rng.normal(size=n),
        "props": ["{}"] * n,
    }
    sf = _tiny_events(tmp_path, rows)
    out = band_count_5m(sf).set_index("event_id")["n_trailing_5m"]
    df = pd.DataFrame(rows)
    band = pd.Timedelta("5min")
    for _, r in df.sample(60, random_state=0).iterrows():
        brute = (
            (df.user_id == r.user_id)
            & (df.ts >= r.ts - band)
            & (df.ts <= r.ts)
        ).sum()
        assert out.loc[r.event_id] == brute


def test_zscore_window_clamps_at_series_start(tmp_path):
    """The first bucket's window is itself only -> z = 0, win_n = n."""
    from ecov003_l2t_stars_ray.pipelines.analytics import zscore_anomaly_24h

    ts0 = pd.Timestamp("2025-01-01")
    sf = _tiny_events(
        tmp_path,
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": [ts0, ts0 + pd.Timedelta("1h"), ts0 + pd.Timedelta("2h")],
            "event_type": ["x"] * 3,
            "value": [1.0, 1.0, 100.0],
            "props": ["{}"] * 3,
        },
    )
    out = zscore_anomaly_24h(sf).sort_values("bucket_start", ignore_index=True)
    assert out["win_n"].tolist() == [1, 2, 3]
    assert out["zscore"].iloc[0] == 0.0  # sd undefined in first window
    assert out["zscore"].iloc[1] == 0.0  # two equal values, sd 0
    assert bool(out["is_anomaly"].iloc[2]) is False or out["zscore"].iloc[2] > 0
