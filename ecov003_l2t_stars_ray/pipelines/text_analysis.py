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


# ------------------------------------------------- round-3 corpus operators
def span_dedup(sf_dir: str, width: int = 8, min_docs: int = 2) -> pd.DataFrame:
    """Exact substring (word-span) dedup across the corpus, the
    training-data signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") at fixed span width: every ``width``-word
    window of every document, reported when it recurs in >= ``min_docs``
    distinct documents.

    Scale shape: map-side the spans of each doc are built VECTORIZED (one
    split + a stride-trick window join per batch) and pre-deduplicated to
    (span, doc) pairs with an occurrence count — the only thing that rides
    the one hash shuffle; the distinct-doc count and total-occurrence sum
    are a per-partition vectorized combine. At 100 TB the span STRING is
    the shuffle payload; hashing spans to uint64 keys (collision-checked at
    combine) halves the exchange — noted, not needed at oracle scale.
    """

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        words = df["text"].str.split(" ")
        for doc_id, ws in zip(df["doc_id"].to_numpy(), words):
            n = len(ws) - width + 1
            if n <= 0:
                continue
            arr = np.array(ws, dtype=object)
            cols = [arr[i : i + n] for i in range(width)]
            sp = cols[0]
            for c in cols[1:]:
                sp = np.char.add(np.char.add(sp.astype(str), " "), c.astype(str))
            frames.append(pd.DataFrame({"span": sp, "doc_id": doc_id}))
        if not frames:
            return pd.DataFrame({"span": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "n_occ": pd.Series(dtype="int64")})
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["span", "doc_id"], sort=False, as_index=False).agg(
            n_occ=("doc_id", "size")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # partial rows are already (span, doc) unique per input batch; a
        # doc's spans can still arrive from two batches of the same doc —
        # re-reduce, then count distinct docs + sum occurrences
        g = g.groupby(["span", "doc_id"], as_index=False)["n_occ"].sum()
        agg = g.groupby("span").agg(
            n_docs=("doc_id", "nunique"), n_occ=("n_occ", "sum")
        )
        agg = agg[agg["n_docs"] >= min_docs].reset_index()
        agg["n_docs"] = agg["n_docs"].astype("int64")
        agg["n_occ"] = agg["n_occ"].astype("int64")
        return agg

    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        spans, batch_format="pandas"
    )
    return (
        hash_combine(ds, ["span"], combine)
        .to_pandas()
        .sort_values("span", ignore_index=True)
    )


def top_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global top-k word bigrams across the corpus: map-side vectorized
    bigram counts per batch (one split + one shifted join, no per-row
    Python), partial counts ride one hash shuffle, per-partition combine,
    driver merges P tiny top-k lists. Ties at rank k break on the bigram
    string (mirrored ORDER BY in the oracle)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].str.split(" ").explode()
        nxt = ex.groupby(level=0).shift(-1)
        mask = nxt.notna()
        big = ex[mask] + " " + nxt[mask]
        c = big.value_counts()
        return pd.DataFrame({"bigram": c.index.to_numpy(),
                             "cnt": c.to_numpy(dtype=np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("bigram", as_index=False)["cnt"].sum()
        # per-partition top-k is safe: the global top-k is a subset of the
        # union of per-partition top-k (each bigram lives in ONE partition)
        return agg.sort_values(["cnt", "bigram"], ascending=[False, True],
                               kind="mergesort").head(k)

    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pandas"
    )
    out = hash_combine(ds, ["bigram"], combine).to_pandas()
    return (
        out.sort_values(["cnt", "bigram"], ascending=[False, True],
                        kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def scrub_props(sf_dir: str) -> pd.DataFrame:
    """Redaction operator (PII-scrub family): replace digit runs in the
    semi-structured ``props`` payload with '#' and count redactions —
    pyarrow RE2 kernels (`replace_substring_regex`/`count_substring_regex`),
    the same regex engine DuckDB's regexp_replace uses, so oracle parity is
    by construction. Pure map — no shuffle; at 100 TB this runs at read
    bandwidth."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "scrubbed": pc.replace_substring_regex(
                    props, pattern=r"\d+", replacement="#"
                ),
                "n_redacted": pc.cast(
                    pc.count_substring_regex(props, pattern=r"\d+"), pa.int64()
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "props"]
        )
        .map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def pack_sequences(sf_dir: str, budget: int = 256) -> pd.DataFrame:
    """Sequence packing: assign documents to fixed-token-budget bins (the
    sample-packing step that turns a curated corpus into fixed-length
    training batches). First-fit-decreasing WITHIN each hash partition of
    the corpus; bins are namespaced by the partition's min doc_id
    (bin_id = min_doc * 2^32 + local bin — unique with no coordination),
    so the operator is embarrassingly parallel — the deliberate trade (documented, same as
    every production packer) is a bounded per-partition tail of underfull
    bins rather than a global optimum.

    Determinism: partition membership is the corpus' standard key hash;
    within a partition docs are packed in (n_tokens desc, doc_id) order.
    Output: one row per doc with its bin and offset; per-bin fill stats
    ride along for the oracle-side invariants. Oversized docs (> budget)
    get a bin of their own, truncated = True.
    """
    from ..functions.shuffle import hash_combine
    from ..functions.text import token_count

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": token_count(df["text"]).to_numpy(),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        # namespace = the partition's min doc_id: unique across partitions
        # (a doc lives in exactly one), no coordination needed
        pid = int(g["doc_id"].min())
        ids = g["doc_id"].to_numpy()
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        # first-fit-decreasing: bins held as a fill array; docs within a
        # partition are O(thousands) — the scan is per-doc over OPEN bins
        # via argmax on remaining capacity (vectorized inner step)
        fills: list[int] = []
        bin_of = np.empty(len(ids), dtype=np.int64)
        offset = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(toks):
            t_eff = min(int(t), budget)
            placed = False
            for b, f in enumerate(fills):
                if f + t_eff <= budget:
                    bin_of[i] = b
                    offset[i] = f
                    fills[b] = f + t_eff
                    placed = True
                    break
            if not placed:
                bin_of[i] = len(fills)
                offset[i] = 0
                fills.append(t_eff)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": toks,
                "bin_id": np.int64(pid) * np.int64(2**32) + bin_of,
                "offset": offset,
                "truncated": toks > budget,
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pandas"
    )
    return (
        hash_combine(ds, ["doc_id"], pack, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
