"""Text-analysis pipelines over the ``documents`` table.

Stateless vectorized ``map_batches`` stages from ``functions.text``:
token counting, quality features, fingerprinting (SQL-checkable), plus the
language-ID heuristic (rows-only — not SQL-expressible).
"""

from __future__ import annotations

import pandas as pd
import ray.data

from ..functions.text import (
    detect_language,
    fingerprint_md5,
    quality_features,
    token_count,
)


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_token_stats(sf_dir: str) -> pd.DataFrame:
    """Per-doc token/char counts + MD5 fingerprint (matches SQL md5)."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars_calc": df["text"].str.len().astype("int64"),
                "n_tokens": token_count(df["text"]),
                "fp": fingerprint_md5(df["text"]),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality features per doc (rounded for the SQL oracle compare)."""

    def q(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_features(df)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "n_tokens": out["n_tokens"],
                "n_punct": out["n_punct"],
                "avg_token_len": out["avg_token_len"].round(6),
                "punct_ratio": out["punct_ratio"].round(6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(q, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def doc_langid(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic vs the table's lang label (rows-only check)."""

    def lid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang": df["lang"],
                "lang_pred": detect_language(df["text"]),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(lid, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    return out
