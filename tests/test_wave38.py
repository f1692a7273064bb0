"""Wave-38 operators: frequent 3-itemsets, source-vs-global quantile
alignment.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_frequent_triples_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.joins import frequent_triples

    got = frequent_triples(SF, min_support=2)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    counts = {}
    for _, g in li.groupby("l_orderkey"):
        for tri in itertools.combinations(
            sorted(g["l_partkey"].unique()), 3
        ):
            counts[tri] = counts.get(tri, 0) + 1
    want = sorted((k, v) for k, v in counts.items() if v >= 2)
    assert len(got) == len(want)
    got_t = [((a, b, c), s) for a, b, c, s in got.to_numpy()]
    assert got_t == want
    # every triple's pairs must each co-occur at least as often
    assert (got["support"] >= 2).all()


def test_quantile_align_sources_crossing():
    from ecov003_l2t_stars_ray.pipelines.stats import quantile_align_sources

    got = quantile_align_sources(SF)
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["source", "n_chars"]
    )
    gv = np.sort(docs["n_chars"].to_numpy(np.int64))
    gn = len(gv)
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        sub = got[got["source"] == str(src)].set_index("q")
        for q in range(10, 100, 10):
            assert int(sub.loc[q]["src_value"]) == v[(q * n + 99) // 100 - 1]
            assert int(sub.loc[q]["global_value"]) == gv[
                (q * gn + 99) // 100 - 1
            ]
            assert int(sub.loc[q]["n_docs"]) == n
    # alignment columns are monotone in q
    for _, g in got.groupby("source"):
        g = g.sort_values("q")
        assert (np.diff(g["src_value"]) >= 0).all()
        assert (np.diff(g["global_value"]) >= 0).all()
