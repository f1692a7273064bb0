"""Wave-43 operator: global vocabulary build + broadcast dictionary
encode."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_vocab_encode_matches_literal():
    from ecov003_l2t_stars_ray.pipelines.text_analysis import (
        vocab_encode_docs,
    )

    got = vocab_encode_docs(SF).set_index("doc_id")
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    vocab = sorted(
        {t for s in docs["text"].astype(str)
         for t in s.split(" ") if t}
    )
    ids = {t: i + 1 for i, t in enumerate(vocab)}
    for _, r in docs.sample(n=min(80, len(docs)), random_state=3).iterrows():
        toks = [t for t in str(r["text"]).split(" ") if t]
        row = got.loc[r["doc_id"]]
        assert int(row["n_tokens"]) == len(toks)
        assert int(row["sum_token_ids"]) == sum(ids[t] for t in toks)
    assert len(got) == len(docs)
    # id mapping is dense 1..|V|: a doc of k tokens sums within bounds
    assert (got["sum_token_ids"] >= got["n_tokens"]).all()
    assert (got["sum_token_ids"] <= got["n_tokens"] * len(vocab)).all()
