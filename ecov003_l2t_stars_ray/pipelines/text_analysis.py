"""Text-analysis pipelines over the ``documents`` table.

Stateless vectorized ``map_batches`` stages from ``functions.text``:
token counting, quality features, fingerprinting (SQL-checkable), plus the
language-ID heuristic (rows-only — not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.scalars import round6_away as _r6away
from ..functions.shuffle import typed_empty
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
                "avg_token_len": _r6away(out["avg_token_len"]),
                "punct_ratio": _r6away(out["punct_ratio"]),
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
                "dup_word_frac": _r6away(
                    1.0 - n_distinct.to_numpy(dtype=np.float64) / nw),
                "top_word_frac": _r6away(
                    top.to_numpy(dtype=np.float64) / nw),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(rep, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


# ------------------------------------------------- round-3 corpus operators
def _window_starts(df: pd.DataFrame, width: int):
    """Flatten a batch of docs into one word stream and enumerate every
    in-doc window start, fully vectorized (no per-doc Python loop).

    Returns ``(flat, starts, span_doc)``: ``flat`` is a pyarrow string
    array of every word of every doc in batch order, ``starts`` the flat
    indices where a ``width``-word window fits inside one doc, and
    ``span_doc`` the owning doc_id per window. ``None`` if no window fits.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    lists = pc.split_pattern(pa.array(df["text"], type=pa.string()), " ")
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n_spans = np.maximum(counts - width + 1, 0)
    total = int(n_spans.sum())
    if total == 0:
        return None
    doc_off = np.concatenate(([0], np.cumsum(counts)))[:-1]
    # window starts: for each doc d, doc_off[d] + [0, n_spans[d])
    span_doc_pos = np.repeat(np.arange(len(counts)), n_spans)
    first = np.concatenate(([0], np.cumsum(n_spans)))[:-1]
    starts = (
        np.arange(total) - np.repeat(first, n_spans)
        + doc_off[span_doc_pos]
    )
    span_doc = df["doc_id"].to_numpy()[span_doc_pos]
    return flat, starts, span_doc


def span_dedup(sf_dir: str, width: int = 8, min_docs: int = 2) -> pd.DataFrame:
    """Exact substring (word-span) dedup across the corpus, the
    training-data signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") at fixed span width: every ``width``-word
    window of every document, reported when it recurs in >= ``min_docs``
    distinct documents.

    Scale shape: map-side the spans of each doc are built VECTORIZED (one
    Arrow split + flat-index window joins per batch — NEVER ``np.char``,
    which is ~66 us/row on this host) and pre-deduplicated to (span, doc)
    pairs with an occurrence count — the only thing that rides the one
    hash shuffle; the distinct-doc count and total-occurrence sum are a
    per-partition vectorized combine. At 100 TB the span STRING is the
    shuffle payload; :func:`span_dedup_hashed` ships dual uint64 hashes
    instead (collision-checked at combine) for that shape.
    """
    import pyarrow.compute as pc

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        w = _window_starts(df, width)
        if w is None:
            return pd.DataFrame({"span": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "n_occ": pd.Series(dtype="int64")})
        flat, starts, span_doc = w
        sp = pc.binary_join_element_wise(
            *(flat.take(starts + j) for j in range(width)), " "
        )
        out = pd.DataFrame({"span": sp.to_pandas(), "doc_id": span_doc})
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


#: FNV-64 prime: the polynomial base for rolling span hashes (odd, so the
#: map x -> x*B is a bijection mod 2**64 — no systematic bit loss).
_SPAN_HASH_BASE = np.uint64(0x100000001B3)
_HASH_KEYS = ("0123456789123456", "6543210987654321")


def span_dedup_hashed(
    sf_dir: str, width: int = 8, min_docs: int = 2
) -> pd.DataFrame:
    """:func:`span_dedup` at the 100 TB shuffle shape: each span rides the
    exchange as TWO independent uint64 hashes (16 bytes) instead of its
    ~50-byte string. h1 is the partition/group key; h2 (independent word
    hash key) is the collision CHECK — a group whose members disagree on
    h2 means two distinct spans collided on h1, and the combine raises
    rather than silently merging their doc counts (probability ~2**-64
    per pair under either hash alone, ~2**-128 jointly).

    Returns the duplicate-span histogram ``(n_docs, n_occ, n_spans)`` —
    hash-keyed group identities are meaningless to a reader, but the
    histogram is exactly comparable to the string variant AND
    SQL-expressible, so this entry stays on the strong oracle gate.
    Each h1 lives in exactly ONE hash partition, so per-partition
    histograms are disjoint-by-span and the driver merge is a trivial
    sum over P x distinct(n_docs, n_occ) tiny rows.
    """

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"h1": pd.Series(dtype="uint64"),
                              "h2": pd.Series(dtype="uint64"),
                              "doc_id": pd.Series(dtype="int64"),
                              "n_occ": pd.Series(dtype="int64")})
        w = _window_starts(df, width)
        if w is None:
            return empty
        flat, starts, span_doc = w
        words = flat.to_numpy(zero_copy_only=False)
        hs = []
        for key in _HASH_KEYS:
            hw = pd.util.hash_array(words, hash_key=key)
            h = np.zeros(len(starts), dtype=np.uint64)
            for j in range(width):  # width vector ops, not per-row Python
                h = h * _SPAN_HASH_BASE + hw[starts + j]
            hs.append(h)
        out = pd.DataFrame({"h1": hs[0], "h2": hs[1], "doc_id": span_doc})
        # nh2 tracks same-doc same-batch h1 collisions that a bare
        # ``first`` would silently merge; it rides the shuffle so the
        # combine's collision check covers within-doc cases too
        return out.groupby(["h1", "doc_id"], sort=False, as_index=False).agg(
            h2=("h2", "first"), n_occ=("doc_id", "size"), nh2=("h2", "nunique")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["h1", "doc_id"], as_index=False).agg(
            h2=("h2", "nunique"), h2_rep=("h2", "first"),
            n_occ=("n_occ", "sum"), nh2=("nh2", "max"),
        )
        # detection is exact: a within-batch collision shows as nh2 > 1,
        # a cross-batch or cross-doc one as >1 distinct h2 per group
        collided = bool(len(g)) and (
            int(g["h2"].max()) > 1 or int(g["nh2"].max()) > 1
        )
        agg = g.groupby("h1").agg(
            n_docs=("doc_id", "nunique"), n_occ=("n_occ", "sum"),
            n_h2=("h2_rep", "nunique"),
        )
        if collided or (len(agg) and int(agg["n_h2"].max()) > 1):
            raise ValueError(
                "span-hash collision detected (h1 group with >1 h2); "
                "rerun span_dedup (string keys) for this corpus"
            )
        agg = agg[agg["n_docs"] >= min_docs]
        hist = agg.groupby(["n_docs", "n_occ"], as_index=False).size()
        return pd.DataFrame({
            "n_docs": hist["n_docs"].astype("int64"),
            "n_occ": hist["n_occ"].astype("int64"),
            "n_spans": hist["size"].astype("int64"),
        })

    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        spans, batch_format="pandas"
    )
    out = hash_combine(ds, ["h1"], combine).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(n_docs=np.int64, n_occ=np.int64,
                           n_spans=np.int64)
    return (
        out.groupby(["n_docs", "n_occ"], as_index=False)["n_spans"].sum()
        .sort_values(["n_docs", "n_occ"], ignore_index=True)
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
    out = hash_combine(ds, ["doc_id"], pack, num_partitions=8).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(doc_id=np.int64, n_tokens=np.int64,
                           bin_id=np.int64, offset=np.int64,
                           truncated=bool)
    return out.sort_values("doc_id", ignore_index=True)


class _EvalHits:
    """Actor stage counting per-doc distinct shingle hashes that appear in
    the broadcast eval-set array (``ray.put`` once, zero-copy numpy read in
    every actor — never re-shipped per batch)."""

    def __init__(self, ev_ref, k: int, eval_mod: int):
        import ray as _ray

        self.ev = _ray.get(ev_ref)  # sorted uint64 shingle hashes
        self.k = k
        self.eval_mod = eval_mod

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _shingle_hash_flat

        sub = df[df["doc_id"].to_numpy() % self.eval_mod != 0]
        sub = sub[sub["text"].str.split(" ").str.len() >= self.k]
        empty = pd.DataFrame(
            {"doc_id": pd.array([], dtype="int64"),
             "n_hit_shingles": pd.array([], dtype="int64")}
        )
        if not len(sub) or not len(self.ev):
            return empty
        pos, h = _shingle_hash_flat(sub["text"], self.k)
        # distinct (doc, shingle): lexsort + consecutive-duplicate mask
        order = np.lexsort((h, pos))
        pos, h = pos[order], h[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (pos[1:] != pos[:-1]) | (h[1:] != h[:-1])
        pos, h = pos[keep], h[keep]
        idx = np.minimum(np.searchsorted(self.ev, h), len(self.ev) - 1)
        hit = self.ev[idx] == h
        if not hit.any():
            return empty
        cnt = np.bincount(pos[hit], minlength=len(sub))
        nz = cnt > 0
        return pd.DataFrame(
            {"doc_id": sub["doc_id"].to_numpy()[nz],
             "n_hit_shingles": cnt[nz].astype(np.int64)}
        )


def decontaminate(sf_dir: str, k: int = 8, eval_mod: int = 97) -> pd.DataFrame:
    """Eval-set n-gram decontamination (training-data hygiene, GPT-3
    appendix C style): flag every corpus doc sharing a word-``k``-gram with
    the held-out eval slice (here docs with ``doc_id % eval_mod == 0``
    stand in for the eval suite), with the count of distinct overlapping
    shingles.

    Two streaming passes, the 100 TB shape: (1) the eval slice — small and
    FIXED-size by construction (an eval suite doesn't grow with the
    corpus) — streams to a deduped sorted uint64 hash array, broadcast once
    via ``ray.put``; (2) one embarrassingly-parallel ``map_batches`` scan
    counts per-doc distinct hits via ``searchsorted`` against the broadcast
    array. Shingles ride as 8-byte rolling hashes (the ``span_dedup_hashed``
    convention, collision odds ~2**-64/pair); the oracle compares distinct
    STRING shingles — parity holds because the corpus is single-space
    tokenized (repo-wide convention, verified) and docs shorter than ``k``
    tokens are excluded on both sides."""
    import ray

    docs = _docs(sf_dir, ["doc_id", "text"])

    def eval_part(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _shingle_hash_flat

        sub = df[df["doc_id"].to_numpy() % eval_mod == 0]
        sub = sub[sub["text"].str.split(" ").str.len() >= k]
        if not len(sub):
            return pd.DataFrame({"h": pd.array([], dtype="uint64")})
        _, h = _shingle_hash_flat(sub["text"], k)
        return pd.DataFrame({"h": np.unique(h)})

    ev = (
        docs.map_batches(eval_part, batch_format="pandas")
        .to_pandas()["h"]
        .to_numpy(dtype=np.uint64)
    )
    ev_ref = ray.put(np.unique(ev))

    out = docs.map_batches(
        _EvalHits,
        fn_constructor_args=(ev_ref, k, eval_mod),
        batch_format="pandas",
        concurrency=(1, 8),
    ).to_pandas()
    if "doc_id" not in out.columns:  # all-empty Dataset drops the schema
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hit_shingles": pd.Series(dtype="int64")})
    return out.sort_values("doc_id", ignore_index=True)


def tfidf_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Top-k TF-IDF terms per document: score = tf * ln(N / df) over the
    space-token vocabulary (same tokenizer as :func:`top_bigrams`, so the
    oracle tokenizes identically with ``string_split``).

    Two passes, both streaming:
    1. document frequencies — per-batch distinct (doc, term) collapse,
       counts ride ONE term-hash exchange; the combined df table is
       vocabulary-sized and is broadcast once via ``ray.put`` (at 100 TB a
       heavy-tailed vocabulary would cap this with a min-df cut or a
       Misra-Gries top-vocab pass — documented contract; the gate corpus
       vocabulary is thousands of terms).
    2. map-only scoring — documents are row-contained, so tf, the score
       and the per-doc top-k never leave the batch: no second shuffle.

    Determinism: ranking uses ``score_milli`` = half-away-rounded
    ``1000 * score`` as an int64 (BIGINT on both sides) with the term
    string as tiebreak, so a last-ulp difference between numpy's and
    DuckDB's ``ln`` cannot flip ranks; the emitted score is half-away
    ROUND(x, 6) (CLAUDE.md float-compare invariant).
    """
    import ray as _ray

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].astype(str).str.split(" ").explode()
        pairs = pd.DataFrame(
            {"doc": ex.index.to_numpy(), "term": ex.to_numpy()}
        ).drop_duplicates()
        c = pairs.groupby("term", sort=False).size()
        return pd.DataFrame(
            {"term": c.index.to_numpy(), "df": c.to_numpy(np.int64)}
        )

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["term"] = g["term"].astype(str)
        return g.groupby("term", as_index=False)["df"].sum()

    from ..functions.shuffle import hash_combine

    n_docs = _docs(sf_dir, ["doc_id"]).count()
    df_tbl = hash_combine(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            df_partial, batch_format="pandas"
        ),
        ["term"],
        df_combine,
    ).to_pandas()
    df_ref = _ray.put(
        pd.Series(
            df_tbl["df"].to_numpy(np.int64), index=df_tbl["term"].astype(str)
        )
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfs = _ray.get(df_ref)
        ex = df["text"].astype(str).str.split(" ").explode()
        tf = (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].reindex(ex.index).to_numpy(np.int64),
                    "term": ex.to_numpy(),
                }
            )
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        dfv = dfs.reindex(tf["term"]).to_numpy(np.float64)
        s = tf["tf"].to_numpy(np.float64) * np.log(n_docs / dfv)
        tf["score_milli"] = np.floor(s * 1e3 + 0.5).astype(np.int64)
        tf["score"] = np.floor(s * 1e6 + 0.5) / 1e6
        tf["df"] = dfs.reindex(tf["term"]).to_numpy(np.int64)
        tf = tf.sort_values(
            ["doc_id", "score_milli", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = tf.groupby("doc_id", sort=False).head(k)
        return top[["doc_id", "term", "tf", "df", "score"]]

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    out["tf"] = out["tf"].astype(np.int64)
    return out.sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True],
        ignore_index=True,
    )


def vocab_growth(sf_dir: str, bucket_docs: int = 64) -> pd.DataFrame:
    """Per-source vocabulary growth (the Heaps-law curve a curation
    pipeline tracks to spot template collapse): for each source, how many
    NEW terms first appear in each ``bucket_docs``-wide doc_id bucket.

    Distributed first-occurrence: map batches emit per-batch
    (source, term, min doc_id) partials; ONE (source, term)-hash exchange
    co-locates every sighting of a term, the combine takes the global min
    and histograms first-buckets per partition — (source, bucket) counts
    are additive, so the driver reduction is curve-sized.  The term-keyed
    exchange is the genuinely corpus-scale shuffle here (vocabulary-sized
    payload, 3 narrow columns); same tokenizer as :func:`tfidf_topk` so
    the oracle's ``string_split`` matches exactly.  Reference analog: the
    first-seen accounting in the prior/posterior chain — which tile dates
    contribute NEW information to the composite
    (`ECOv003_L2T_STARS/load_prior.py:14-60`)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # positional explode-index math
        ex = df["text"].astype(str).str.split(" ").explode()
        idx = ex.index.to_numpy()
        b = pd.DataFrame(
            {
                "source": df["source"].astype(str).to_numpy()[idx],
                "term": ex.to_numpy(),
                "first_doc": df["doc_id"].to_numpy(np.int64)[idx],
            }
        )
        return b.groupby(["source", "term"], sort=False, as_index=False)[
            "first_doc"
        ].min()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby(["source", "term"], as_index=False)["first_doc"].min()
        f["bucket"] = f["first_doc"].to_numpy(np.int64) // bucket_docs
        h = f.groupby(["source", "bucket"], as_index=False).size()
        return h.rename(columns={"size": "new_terms"})

    from ..functions.shuffle import hash_combine

    parts = hash_combine(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "term"], combine,
    ).to_pandas()
    out = parts.groupby(["source", "bucket"], as_index=False)["new_terms"].sum()
    out["source"] = out["source"].astype(str)
    out["bucket"] = out["bucket"].astype(np.int64)
    out["new_terms"] = out["new_terms"].astype(np.int64)
    return out.sort_values(["source", "bucket"], ignore_index=True)


def cross_source_ngram_matrix(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Cross-source contamination matrix: for every source pair, the
    number of DISTINCT word k-grams occurring in both — the standard
    corpus-hygiene readout for shared boilerplate / leakage between
    ingestion feeds (decontaminate's eval-vs-train variant, applied
    source-vs-source).

    Shape: per-batch vectorized k-gram build (one split + k-1 shifted
    joins, the top_bigrams pattern — no per-row Python, no np.char per
    CLAUDE.md), local (source, gram) dedup, ONE gram-hash exchange; the
    combine self-merges each partition on gram to emit (src_a < src_b)
    pair counts — every gram lives in exactly one partition, so pair
    counts are additive and only the |sources|^2-bounded matrix reaches
    the driver.  At 100 TB the gram payload rides as a uint64 hash with
    collision check (the span_dedup_hashed shape); the string form here
    keeps the oracle exact."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = df["text"].str.split(" ").explode()
        parts = [ex]
        for j in range(1, k):
            parts.append(ex.groupby(level=0).shift(-j))
        mask = parts[-1].notna()
        gram = parts[0][mask]
        for p in parts[1:]:
            gram = gram + " " + p[mask]
        src = df["source"].astype(str).reindex(gram.index.get_level_values(0) if gram.index.nlevels > 1 else gram.index)
        return pd.DataFrame(
            {"source": src.to_numpy(), "gram": gram.to_numpy()}
        ).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        m = d.merge(d, on="gram")
        m = m[m["source_x"] < m["source_y"]]
        return (
            m.groupby(["source_x", "source_y"], sort=False)
            .size()
            .rename("n_shared")
            .reset_index()
            .rename(columns={"source_x": "src_a", "source_y": "src_b"})
        )

    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pandas"
    )
    out = hash_combine(ds, ["gram"], combine).to_pandas()
    out = out.groupby(["src_a", "src_b"], as_index=False)["n_shared"].sum()
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["src_a", "src_b"], ignore_index=True)


# ------------------------------------------------- corpus rarity score
def doc_rarity_score(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM-flavoured document quality score: each token's rarity
    is the INTEGER floor(log2(total_tokens / corpus_count(term))) —
    the bit-cost of the term under the corpus's own unigram model — and
    a document scores the token-weighted mean.  High-rarity docs are
    OCR damage / codes / boilerplate-free prose; near-zero docs are
    repetition.  The classic perplexity filter with the float log-sum
    replaced by an exact integer carrier (order-free at any scale).

    Exactness: q = total // cnt in int64; floor(log2(q)) ==
    floor(log2(total/cnt)) because floor crosses powers of two with its
    argument; the engine takes the exponent from ``np.frexp`` (exact for
    q < 2^53), the oracle from LENGTH(bin(q)) - 1.  The per-doc mean is
    ONE int/int division.

    Shape: three exchanges, no vocabulary broadcast — (1) term-hash
    combine builds the reduced (term, cnt) table once (materialized:
    it is reused for the global total and the join); (2) term-hash join
    decorates (doc_id, term, tf) partials with b; (3) doc-hash combine
    sums the per-doc integer moments.  The vocabulary never leaves the
    cluster and never lands on the driver."""
    from .stats import _r6away
    from ..functions.shuffle import hash_combine, hash_join

    ds = _docs(sf_dir, ["doc_id", "text"])

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].str.split(" ").explode()
        c = ex.groupby([ex.index, ex.values]).size()
        out = c.rename("tf").reset_index()
        out.columns = ["doc_id", "term", "tf"]
        out["tf"] = out["tf"].astype(np.int64)
        return out

    tf = ds.map_batches(tf_partial, batch_format="pandas")

    # lazy: consumed once here (pass A) and once by the join (pass B)
    tc = hash_combine(
        tf.map_batches(
            lambda df: df.groupby("term", as_index=False)["tf"]
            .sum()
            .rename(columns={"tf": "cnt"}),
            batch_format="pandas",
        ),
        ["term"],
        lambda g: g.groupby("term", as_index=False)["cnt"].sum(),
    ).materialize()  # reduced |vocab| table, reused twice

    stp = tc.map_batches(
        lambda df: pd.DataFrame({"s": [np.int64(df["cnt"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    if len(stp) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(doc_id=np.int64, n_tokens=np.int64,
                           rarity_u=np.int64, rarity_mean=np.float64)
    total = int(stp["s"].sum())

    def add_bits(df: pd.DataFrame) -> pd.DataFrame:
        q = total // df["cnt"].to_numpy(np.int64)
        b = (np.frexp(q.astype(np.float64))[1] - 1).astype(np.int64)
        return pd.DataFrame({"term": df["term"], "b": b})

    joined = hash_join(
        tf, tc.map_batches(add_bits, batch_format="pandas"), on=["term"]
    )

    EMPTY = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "rarity_u": pd.Series([], dtype=np.int64),
        }
    )

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "tf" not in df.columns:
            return EMPTY.copy()
        t = df["tf"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "n_tokens": t,
                    "rarity_u": t * df["b"].to_numpy(np.int64),
                }
            )
            .groupby("doc_id", as_index=False)[["n_tokens", "rarity_u"]]
            .sum()
        )

    out = (
        hash_combine(
            joined.map_batches(doc_partial, batch_format="pandas"),
            ["doc_id"],
            lambda g: g.groupby("doc_id", as_index=False)[
                ["n_tokens", "rarity_u"]
            ].sum(),
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["rarity_u"] = out["rarity_u"].astype(np.int64)
    out["rarity_mean"] = _r6away(
        out["rarity_u"].to_numpy(np.int64) / out["n_tokens"].to_numpy(np.int64)
    )
    return out


def term_postings(sf_dir: str, min_df: int = 5) -> pd.DataFrame:
    """Inverted-index construction stats: per TERM document frequency,
    collection frequency, and the top posting (doc with max tf, ties ->
    min doc_id) — the per-term dual of :func:`tfidf_topk`'s per-doc
    view, i.e. the build step of a posting-list index over the corpus.

    Shape: documents are row-contained, so per-(term, doc) tf partials
    are GLOBALLY unique already (a doc is one row and never spans
    batches) -> ONE term-hash exchange -> per-partition vectorized
    reduce: df/cf via one groupby, the argmax posting via ONE
    (term, tf DESC, doc ASC) sort + group-head over ALL the partition's
    terms (never per-term Python).  Output is vocabulary-sized and
    min_df-pruned inside the combine, so only surviving terms leave the
    partition.

    Determinism: all counts int64; the argmax tiebreak (tf DESC, doc_id
    ASC) is a total order.  Tokenizer is the shared space-split (same as
    ``tfidf_topk``/``top_bigrams``), mirrored by ``string_split`` in the
    oracle."""
    from ..functions.shuffle import hash_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].astype(str).str.split(" ").explode()
        tf = (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"]
                    .reindex(ex.index)
                    .to_numpy(np.int64),
                    "term": ex.to_numpy(),
                }
            )
            .groupby(["term", "doc_id"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        tf["term"] = tf["term"].astype(str)
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["term"] = g["term"].astype(str)
        agg = g.groupby("term", as_index=False).agg(
            df=("tf", "size"), cf=("tf", "sum")
        )
        top = (
            g.sort_values(
                ["term", "tf", "doc_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("term", as_index=False)
            .first()
            .rename(columns={"doc_id": "top_doc_id", "tf": "top_tf"})
        )
        out = agg.merge(top, on="term")
        out = out[out["df"].to_numpy(np.int64) >= min_df]
        return pd.DataFrame(
            {
                "term": out["term"].astype(str),
                "df": out["df"].to_numpy(np.int64),
                "cf": out["cf"].to_numpy(np.int64),
                "top_doc_id": out["top_doc_id"].to_numpy(np.int64),
                "top_tf": out["top_tf"].to_numpy(np.int64),
            }
        )

    out = hash_combine(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["term"],
        combine,
    ).to_pandas()
    return out.sort_values("term", ignore_index=True)



def coverage_curve_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source Pareto coverage curve: the smallest number of (largest)
    documents whose characters reach 50% / 80% of the source's total —
    the heavy-tail readout that decides per-source sampling quotas when
    mixing corpora (:func:`sketches.source_mixture_sample`'s sizing
    input); the per-GROUP variant of ``stats.pareto_revenue_share``.

    Shape: a 3-column projection rides ONE source-hash exchange; the
    combine sorts its partition once ((source, n_chars DESC, doc_id))
    and derives every source's exclusive prefix + threshold counts from
    grouped cumsums — all sources of a partition in one vectorized pass.

    Determinism: counting rows with excl_prefix*100 < pct*total is
    tie-order invariant (equal sizes contribute identical prefix
    multisets), all int64."""
    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"].astype(str),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "doc_id": df["doc_id"].to_numpy(np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        ch = g["n_chars"].to_numpy(np.int64)
        grp = g.groupby("source", sort=False)
        incl = grp["n_chars"].cumsum().to_numpy()
        excl = incl - ch
        tot = grp["n_chars"].transform("sum").to_numpy()
        d = pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "c50": (excl * 100 < 50 * tot).astype(np.int64),
                "c80": (excl * 100 < 80 * tot).astype(np.int64),
                "n_chars": ch,
            }
        )
        out = d.groupby("source", as_index=False).agg(
            n_docs_50pct=("c50", "sum"),
            n_docs_80pct=("c80", "sum"),
            total_chars=("n_chars", "sum"),
        )
        return out

    out = hash_combine(
        ds.map_batches(project, batch_format="pandas"), ["source"], combine
    ).to_pandas()
    for c in ["n_docs_50pct", "n_docs_80pct", "total_chars"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source", ignore_index=True)


def k_anonymity_audit(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """k-anonymity audit over the (lang, source) quasi-identifier tuple:
    group count, smallest group, and how many groups / documents fall
    below the anonymity threshold ``k`` — the privacy-hygiene gate a
    corpus release runs before publishing per-slice statistics.

    Shape: per-batch (lang, source) count partials (the tuple space is
    bounded), a tuple-sized driver reduce, then four scalar lanes — no
    shuffle at all.

    Determinism: pure integer counts."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "lang": df["lang"].astype(str),
                    "source": df["source"].astype(str),
                }
            )
            .groupby(["lang", "source"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    g = (
        _docs(sf_dir, ["lang", "source"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "source"], as_index=False)["c"]
        .sum()
    )
    c = g["c"].to_numpy(np.int64)
    if len(c) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(n_groups=np.int64, min_group_size=np.int64,
                           n_groups_below_k=np.int64,
                           n_docs_below_k=np.int64)
    below = c < k
    return pd.DataFrame(
        {
            "n_groups": [np.int64(len(c))],
            "min_group_size": [np.int64(c.min())],
            "n_groups_below_k": [np.int64(below.sum())],
            "n_docs_below_k": [np.int64(c[below].sum())],
        }
    )


# -------------------------------------------------------- regex extract
def regex_extract_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source regex extraction census: non-overlapping match counts
    for a token pattern and a repeated-word-run pattern, the number of
    docs containing a marker literal, and the distinct vocabulary of
    each doc's FIRST extracted token — the regex-ETL stage every text
    pipeline runs (PII scrubbing's read-only sibling; ``scrub_props``
    rewrites, this measures).

    Engine shape: both Arrow's ``count_substring_regex`` /
    ``extract_regex`` and DuckDB's ``regexp_*`` compile RE2, so the
    match semantics (leftmost, non-overlapping) are identical by
    construction.  Counts ride as per-(source) int partials; the
    distinct-first-token set rides the SAME small exchange keyed
    (source, token) — vocabulary-bounded, never row-bounded.

    Determinism: pure integer counts over identical RE2 semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_combine

    ds = _docs(sf_dir, ["source", "text"])
    tok_pat = "(^| )s[a-z]+"        # word-initial s-tokens
    run_pat = "table( table)+"      # repeated-word runs
    marker = "spark"

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        txt = batch["text"]
        n_tok = pc.count_substring_regex(txt, pattern=tok_pat)
        n_run = pc.count_substring_regex(txt, pattern=run_pat)
        has_m = pc.greater(
            pc.count_substring(txt, pattern=marker), 0
        )
        first = pc.struct_field(
            pc.extract_regex(txt, pattern="(?P<pre>^| )(?P<w>s[a-z]+)"),
            "w",
        )
        df = pd.DataFrame(
            {"source": src.to_pandas().astype(str),
             "n_tok": n_tok.to_numpy(zero_copy_only=False).astype(np.int64),
             "n_run": n_run.to_numpy(zero_copy_only=False).astype(np.int64),
             "has_m": has_m.to_numpy(zero_copy_only=False).astype(np.int64),
             "w": first.to_pandas()}
        )
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("n_tok", "size"), s_tokens=("n_tok", "sum"),
            table_runs=("n_run", "sum"), n_marker_docs=("has_m", "sum"),
        )
        toks = (
            df[df["w"].notna()][["source", "w"]]
            .drop_duplicates()
            .rename(columns={"w": "tok"})
        )
        agg["tok"] = ""
        toks["n_docs"] = 0
        toks["s_tokens"] = 0
        toks["table_runs"] = 0
        toks["n_marker_docs"] = 0
        out = pd.concat(
            [agg[["source", "tok", "n_docs", "s_tokens", "table_runs",
                  "n_marker_docs"]],
             toks[["source", "tok", "n_docs", "s_tokens", "table_runs",
                   "n_marker_docs"]]],
            ignore_index=True,
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["source", "tok"], as_index=False)[
                ["n_docs", "s_tokens", "table_runs", "n_marker_docs"]
            ].sum()
        )

    h = hash_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "tok"], combine,
    ).to_pandas()
    h = h.groupby(["source", "tok"], as_index=False)[
        ["n_docs", "s_tokens", "table_runs", "n_marker_docs"]
    ].sum()
    counts = h[h["tok"] == ""].set_index("source")
    vocab = (
        h[h["tok"] != ""].groupby("source")["tok"].nunique()
    )
    out = pd.DataFrame(
        {"source": counts.index.astype(str),
         "n_docs": counts["n_docs"].to_numpy(np.int64),
         "s_tokens": counts["s_tokens"].to_numpy(np.int64),
         "table_runs": counts["table_runs"].to_numpy(np.int64),
         "n_marker_docs": counts["n_marker_docs"].to_numpy(np.int64),
         "n_first_tokens": vocab.reindex(counts.index).fillna(0)
         .to_numpy(np.int64)}
    ).sort_values("source", ignore_index=True)
    return out


# --------------------------------------------------------- vocab encode
def vocab_encode_docs(sf_dir: str) -> pd.DataFrame:
    """Global vocabulary build + broadcast-dictionary encode: token ids
    are ranks in the SORTED global vocabulary; every doc re-emits as
    (n_tokens, sum of its token ids) — the tokenizer-fitting step of a
    training pipeline collapsed to an auditable integer signature
    (``doc_bpe_tokens`` counts merges; this pins the id MAPPING
    itself, the part that must be identical across every worker).

    Engine shape: per-batch distinct tokens -> a vocabulary-bounded
    driver union (two passes over metadata-scale data, zero shuffles);
    the sorted vocab broadcasts once via ``ray.put`` and each batch
    encodes with ONE searchsorted + segment-sum (np.add.reduceat over
    the Arrow list offsets).

    Determinism: ids are ranks in a total string order; sums are
    integers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ..functions.shuffle import hash_combine  # noqa: F401 (shape doc)

    ds = _docs(sf_dir, ["doc_id", "text"])

    vocab = (
        ds.map_batches(
            lambda t: pa.table(
                {"tok": pc.unique(
                    pc.list_flatten(
                        pc.split_pattern(t["text"], pattern=" ")
                    )
                )}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["tok"]
        .unique()
    )
    vocab = np.sort(vocab[vocab != ""].astype(str))
    vref = ray.put(vocab)

    class Encode:
        def __init__(self, r):
            self.vocab = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(
                t["text"], pattern=" "
            ).combine_chunks()
            flat = toks.flatten().to_numpy(zero_copy_only=False)
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            offs = offs - offs[0]
            ids = np.searchsorted(self.vocab, flat) + 1
            ids[flat == ""] = 0  # empty splits carry no id
            n_tok = np.add.reduceat(
                (flat != "").astype(np.int64), offs[:-1]
            )
            sums = np.add.reduceat(ids.astype(np.int64), offs[:-1])
            # reduceat on an empty segment repeats the next value: zero
            # both lanes for zero-length docs
            empty = np.diff(offs) == 0
            n_tok[empty] = 0
            sums[empty] = 0
            return pa.table(
                {"doc_id": t["doc_id"],
                 "n_tokens": pa.array(n_tok, pa.int64()),
                 "sum_token_ids": pa.array(sums, pa.int64())}
            )

    out = ds.map_batches(
        Encode, fn_constructor_args=(vref,), batch_format="pyarrow",
        concurrency=(1, 4),
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(doc_id=np.int64, n_tokens=np.int64,
                           sum_token_ids=np.int64)
    out = out.sort_values("doc_id", ignore_index=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out


# ------------------------------------------------------ part token census
def part_token_census(sf_dir: str) -> pd.DataFrame:
    """Token census over part NAMES with group diversity: per name
    token — how many parts carry it, how many distinct brands and
    types those parts span (the catalog-attribute diversity a search
    facet needs; the explode family applied to a dimension table
    rather than the corpus).

    Shape: one Arrow split + explode per batch, (token, brand, type)
    distinct partials on ONE token-hash exchange, token-vocabulary
    bounded reduce.

    Determinism: pure integer distinct counts."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_combine

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name",
                                           "p_brand", "p_type"]
    )

    def explode(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["p_name"], pattern=" ").combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        flat = toks.flatten().to_pandas().astype(str)
        reps = np.diff(offs)
        idx = np.repeat(np.arange(len(t)), reps)
        df = pd.DataFrame(
            {"tok": flat.to_numpy(),
             "part": t["p_partkey"].to_numpy()[idx],
             "brand": t["p_brand"].to_pandas().astype(str)
             .to_numpy()[idx],
             "ptype": t["p_type"].to_pandas().astype(str)
             .to_numpy()[idx]}
        )
        df = df[df["tok"] != ""]
        return df.drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        return g.groupby("tok", as_index=False).agg(
            n_parts=("part", "nunique"), n_brands=("brand", "nunique"),
            n_types=("ptype", "nunique"),
        )

    out = (
        hash_combine(
            ds.map_batches(explode, batch_format="pyarrow"), ["tok"],
            combine,
        )
        .to_pandas()
        .sort_values("tok", ignore_index=True)
    )
    for c in ("n_parts", "n_brands", "n_types"):
        out[c] = out[c].astype(np.int64)
    out = out.rename(columns={"tok": "token"})
    return out
