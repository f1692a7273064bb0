"""Text-analysis pipelines over the ``documents`` table.

Stateless vectorized ``map_batches`` stages from ``functions.text``:
token counting, quality features, fingerprinting (SQL-checkable), plus the
language-ID heuristic (rows-only — not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
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


def doc_bpe_tokens(sf_dir: str) -> pd.DataFrame:
    """BPE-ish token counting (letter runs, single digits, single symbol
    chars — the tokenizer-shape proxy) next to whitespace tokens, with the
    subword/word expansion ratio. Vectorized ``str.count`` per batch."""
    import numpy as np

    from ..functions.text import BPEISH_RE, token_count

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        bpe = df["text"].str.count(BPEISH_RE).astype("int64")
        ws = token_count(df["text"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_bpe_tokens": bpe,
                "n_ws_tokens": ws,
                "expansion": np.round(
                    bpe.to_numpy(dtype=np.float64)
                    / np.maximum(ws.to_numpy(), 1), 6
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def doc_char_ngrams(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Distinct character k-gram count per doc — the rolling-hash
    fingerprint cardinality (document-fingerprinting family). Per-doc
    numpy sliding windows; no per-character Python."""
    from ..functions.text import char_ngram_hashes

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        counts = np.fromiter(
            (len(np.unique(char_ngram_hashes(t, k))) for t in df["text"].to_numpy()),
            dtype=np.int64, count=len(df),
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "n_distinct_ngrams": counts})

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def doc_winnow(sf_dir: str, k: int = 5, window: int = 4) -> pd.DataFrame:
    """Winnowing fingerprints per doc (rows-only; the near-dup overlap
    property is pytest-verified)."""
    from ..functions.text import winnow_fingerprints

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        fps = [winnow_fingerprints(t, k=k, window=window)
               for t in df["text"].to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_fingerprints": np.array([len(f) for f in fps], dtype=np.int64),
                "min_fp": np.array(
                    [int(f.min()) if len(f) else 0 for f in fps], dtype=np.uint64
                ).astype("uint64"),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Word-repetition quality signals (Gopher/C4-style dedup-within-doc
    features): per doc, word count, distinct-word count, duplicate-word
    fraction (1 - distinct/words) and the most-frequent word's share.

    Fully vectorized ACROSS docs: one str.split + explode + two groupbys
    per batch — no per-doc Python."""

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        w = df.set_index("doc_id")["text"].str.split(" ").explode()
        per = w.groupby([w.index, w]).size()
        by_doc = per.groupby(level=0)
        n_words = by_doc.sum()
        n_distinct = by_doc.size()
        top = by_doc.max()
        nw = n_words.to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": n_words.index.to_numpy(),
                "n_words": n_words.to_numpy(dtype=np.int64),
                "n_distinct": n_distinct.to_numpy(dtype=np.int64),
                "dup_word_frac": np.round(
                    1.0 - n_distinct.to_numpy(dtype=np.float64) / nw, 6),
                "top_word_frac": np.round(
                    top.to_numpy(dtype=np.float64) / nw, 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(rep, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
