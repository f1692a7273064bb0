"""Wave-33 operators: co-purchase triangle census, symmetric banded
self-join co-occurrence, per-source regex extraction census.

Local replays pin the ENGINE against refactors; the SQL oracles run at
the driver / check_oracle gate."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_triangle_stats_matches_literal_count():
    from ecov003_l2t_stars_ray.pipelines.joins import triangle_stats

    got = triangle_stats(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(
            sorted(g["l_partkey"].unique()), 2
        ):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b] & {c for c in adj[a] if c > b})
    deg = {k: len(v) for k, v in adj.items()}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    row = got.iloc[0]
    assert int(row["n_nodes"]) == len(adj)
    assert int(row["n_edges"]) == len(edges)
    assert int(row["n_wedges"]) == wedges
    assert int(row["n_triangles"]) == tri
    if wedges:
        assert abs(row["global_clustering"] - 3 * tri / wedges) < 2e-6


def test_band_join_cooccur_matches_literal_pairs():
    from ecov003_l2t_stars_ray.pipelines.joins import band_join_cooccur

    got = band_join_cooccur(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    band = np.timedelta64(300, "s")
    counts = {}
    for _, g in ev.groupby("user_id"):
        ts = g["ts"].to_numpy()
        et = g["event_type"].astype(str).to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if ts[j] - ts[i] > band:
                    break
                key = tuple(sorted((et[i], et[j])))
                counts[key] = counts.get(key, 0) + 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(counts.items())],
        columns=["type_a", "type_b", "n_pairs"],
    )
    g = got.reset_index(drop=True)
    assert len(g) == len(want)
    assert (g["n_pairs"].to_numpy(np.int64)
            == want["n_pairs"].to_numpy(np.int64)).all()
    assert list(g["type_a"]) == list(want["type_a"])
    assert list(g["type_b"]) == list(want["type_b"])


def test_regex_extract_stats_matches_re_module():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        regex_extract_stats,
    )

    got = regex_extract_stats(SF).set_index("source")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["source", "text"]
    )
    tok = re.compile(r"(^| )s[a-z]+")
    run = re.compile(r"table( table)+")
    first = re.compile(r"(^| )(s[a-z]+)")
    for src, g in docs.groupby("source"):
        texts = g["text"].astype(str)
        n_tok = sum(len(tok.findall(t)) for t in texts)
        n_run = sum(len(run.findall(t)) for t in texts)
        n_marker = sum("spark" in t for t in texts)
        firsts = {
            m.group(2) for t in texts if (m := first.search(t))
        }
        row = got.loc[str(src)]
        assert int(row["n_docs"]) == len(g)
        assert int(row["s_tokens"]) == n_tok
        assert int(row["table_runs"]) == n_run
        assert int(row["n_marker_docs"]) == n_marker
        assert int(row["n_first_tokens"]) == len(firsts)
