"""Wave-44 operators: incremental prefix-fingerprint dedup, part-name
token census."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.dedup import incremental_dedup

    got = incremental_dedup(SF).set_index("source")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    cut = (int(docs["doc_id"].min()) + int(docs["doc_id"].max())) // 2
    fp = docs["text"].astype(str).map(
        lambda t: hashlib.md5(" ".join(t.split(" ")[:4]).encode())
        .hexdigest()
    )
    docs = docs.assign(fp=fp)
    prior = set(docs.loc[docs["doc_id"] <= cut, "fp"])
    new = docs[docs["doc_id"] > cut]
    for src, g in new.groupby("source"):
        row = got.loc[str(src)]
        assert int(row["n_new"]) == len(g)
        assert int(row["n_dup_vs_prior"]) == int(
            g["fp"].isin(prior).sum()
        )
    assert int(got["n_new"].sum()) == len(new)
    # the check is non-vacuous at this sf: some collisions exist
    assert int(got["n_dup_vs_prior"].sum()) > 0


def test_part_token_census_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        part_token_census,
    )

    got = part_token_census(SF).set_index("token")
    part = pd.read_parquet(f"{SF}/part.parquet")
    rows = {}
    for _, r in part.iterrows():
        for tok in str(r["p_name"]).split(" "):
            if not tok:
                continue
            s = rows.setdefault(tok, (set(), set(), set()))
            s[0].add(r["p_partkey"])
            s[1].add(r["p_brand"])
            s[2].add(r["p_type"])
    assert len(got) == len(rows)
    for tok, (pk, br, ty) in rows.items():
        row = got.loc[tok]
        assert int(row["n_parts"]) == len(pk)
        assert int(row["n_brands"]) == len(br)
        assert int(row["n_types"]) == len(ty)
