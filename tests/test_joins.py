"""hash_join primitive + Bloom semi-join + window-rank semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def _sides(seed=0, nl=5000, nr=800):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 1000, nl),
            "v": rng.normal(size=nl),
            "name": [f"l{i}" for i in range(nl)],  # shared col name
            "ts": pd.to_datetime(rng.integers(0, 10**15, nl), unit="us"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 1200, nr),  # some keys unmatched each way
            "w": rng.integers(0, 100, nr),
            "name": [f"r{i}" for i in range(nr)],
        }
    )
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).sort_values(
        sorted(df.columns), ignore_index=True
    )


def test_hash_join_inner_matches_pandas_merge():
    from ecov003_l2t_stars_ray.functions.shuffle import hash_join

    left, right = _sides()
    got = hash_join(
        ray.data.from_pandas(left).repartition(7),
        ray.data.from_pandas(right).repartition(3),
        on=["k"],
    ).to_pandas()
    want = left.merge(right, on="k", how="inner", suffixes=("_l", "_r"))
    assert _canon(got).equals(_canon(want))
    # dtypes survive the None-padded union round-trip
    assert got["w"].dtype == np.int64
    assert got["ts"].dtype == left["ts"].dtype


def test_hash_join_left_keeps_unmatched():
    from ecov003_l2t_stars_ray.functions.shuffle import hash_join

    left, right = _sides(seed=1)
    got = hash_join(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(2),
        on=["k"],
        how="left",
    ).to_pandas()
    want = left.merge(right, on="k", how="left", suffixes=("_l", "_r"))
    assert len(got) == len(want)
    g, w = _canon(got.fillna(-1)), _canon(want.fillna(-1))
    assert g.equals(w)


def test_hash_join_multi_key_and_empty_side():
    from ecov003_l2t_stars_ray.functions.shuffle import hash_join

    left = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"], "v": [1, 2, 3]})
    right = pd.DataFrame({"a": [1, 2], "b": ["x", "z"], "w": [10, 20]})
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on=["a", "b"]
    ).to_pandas()
    assert len(got) == 1 and got["v"].iloc[0] == 1 and got["w"].iloc[0] == 10

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="object"),
                          "w": pd.Series(dtype="int64")})
    got2 = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(empty), on=["a", "b"]
    ).to_pandas()
    assert len(got2) == 0


def test_bloom_no_false_negatives_and_low_fp():
    from ecov003_l2t_stars_ray.pipelines.joins import bloom_build, bloom_test

    rng = np.random.default_rng(2)
    members = np.unique(rng.integers(0, 10**12, 5000))
    bits = bloom_build(members)
    # no false negatives, ever
    assert bloom_test(bits, members).all()
    probe = rng.integers(0, 10**12, 50_000)
    outside = probe[~np.isin(probe, members)]
    fp = bloom_test(bits, outside).mean()
    assert fp < 0.02, f"false-positive rate {fp}"


def test_window_rank_tie_semantics(tmp_path):
    """RANK() gives equal values the same (min) rank and skips after."""
    from ecov003_l2t_stars_ray.pipelines.analytics import window_rank

    ts0 = pd.Timestamp("2025-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "ts": [ts0 + pd.Timedelta(minutes=i) for i in range(4)],
            "event_type": ["x"] * 4,
            "value": [5.0, 9.0, 9.0, 1.0],
            "props": ["{}"] * 4,
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = window_rank(str(tmp_path)).set_index("event_id")
    assert out.loc[2, "value_rank"] == 1 and out.loc[3, "value_rank"] == 1
    assert out.loc[1, "value_rank"] == 3 and out.loc[4, "value_rank"] == 4
    assert out["rn"].tolist() == [1, 2, 3, 4]
    assert np.isnan(out.loc[1, "prev_value"]) and np.isnan(out.loc[4, "next_value"])
    assert out.loc[4, "running_sum"] == 24.0
