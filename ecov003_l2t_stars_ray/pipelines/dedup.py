"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Large-scale training-data dedup, Ray-Data-first:

- exact: content-hash in ``map_batches`` -> hash-keyed groupby -> keep
  first (min doc_id). The reference's drop-duplicates analog
  (``VNP09GA.py:1138``) at content granularity.
- MinHash + LSH: shingle -> minhash signature per batch -> explode to
  (band_id, band_hash, doc_id) rows -> groupby(band bucket) -> candidate
  pairs -> exact-Jaccard verification. Signature generation is embarrassingly
  parallel; only the tiny band-bucket stream shuffles.
- SimHash: 64-bit signature; Hamming-<=k blocking via band exact-match.
- embedding near-dup: cosine >= threshold against hash-bucketed candidates.

All stages are deterministic (fixed hash seeds) so results are reproducible
across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.text import fingerprint_md5, shingle_hashes

# fixed MinHash parameters (deterministic across processes)
_MERSENNE = np.uint64((1 << 61) - 1)
_NUM_PERM = 64
_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = _NUM_PERM // _BANDS
_RNG = np.random.default_rng(1234)
_A = _RNG.integers(1, _MERSENNE, size=_NUM_PERM, dtype=np.uint64)
_B = _RNG.integers(0, _MERSENNE, size=_NUM_PERM, dtype=np.uint64)


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One row per distinct text: (h, keep_id, n_copies).

    keep_id = min(doc_id) — deterministic survivor choice.
    """

    from ..functions.shuffle import hash_combine

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": fingerprint_md5(df["text"]), "doc_id": df["doc_id"]})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False)["doc_id"].agg(["min", "count"]).reset_index()
        return g.rename(columns={"min": "keep_id", "count": "n_copies"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("h", as_index=False).agg(
            keep_id=("keep_id", "min"), n_copies=("n_copies", "sum")
        )

    hashed = docs.map_batches(add_hash, batch_format="pandas")
    return hash_combine(
        hashed.map_batches(partial, batch_format="pandas"), ["h"], combine
    )


def minhash_signatures(df: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """(doc_id, band_id, band_hash) rows — one per band per document."""
    out_doc, out_band, out_hash = [], [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
        sh = shingle_hashes(text, k=k)
        if not len(sh):
            continue
        with np.errstate(over="ignore"):
            # h_i(x) = (a_i * x + b_i) mod p, minimized over shingles
            prod = (sh[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
        sig = prod.min(axis=1)
        bands = sig.reshape(_BANDS, _ROWS_PER_BAND)
        for b in range(_BANDS):
            bh = hashlib.blake2b(bands[b].tobytes(), digest_size=8).hexdigest()
            out_doc.append(doc_id)
            out_band.append(b)
            out_hash.append(bh)
    return pd.DataFrame(
        {"doc_id": np.asarray(out_doc, dtype=np.int64),
         "band_id": np.asarray(out_band, dtype=np.int8),
         "band_hash": out_hash}
    )


def minhash_candidates(docs: ray.data.Dataset, k: int = 5) -> pd.DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) from LSH band collisions."""
    sigs = docs.map_batches(
        lambda df: minhash_signatures(df, k=k), batch_format="pandas"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = sigs.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    df = cand.to_pandas()
    if not len(df):
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    return df.drop_duplicates(ignore_index=True).sort_values(
        ["doc_a", "doc_b"], ignore_index=True
    )


def jaccard_verify(
    docs: ray.data.Dataset, pairs: pd.DataFrame, k: int = 5, threshold: float = 0.7
) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs (broadcast doc lookup).

    The candidate set is LSH-pruned and small; texts for it are fetched via
    a broadcast id->text map (``ray.put`` once — small-side join, no
    shuffle). At 100 TB the map becomes a per-bucket join instead.
    """
    if not len(pairs):
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    wanted = set(pairs["doc_a"]) | set(pairs["doc_b"])
    texts = {}
    for batch in docs.iter_batches(batch_size=4096, batch_format="pandas"):
        m = batch["doc_id"].isin(wanted)
        texts.update(zip(batch.loc[m, "doc_id"], batch.loc[m, "text"]))
    sh = {d: shingle_hashes(t, k=k) for d, t in texts.items()}
    jac = np.empty(len(pairs))
    for i, (a, b) in enumerate(zip(pairs["doc_a"], pairs["doc_b"])):
        sa, sb = sh.get(a), sh.get(b)
        if sa is None or sb is None or not len(sa) or not len(sb):
            jac[i] = 0.0
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac[i] = inter / (len(sa) + len(sb) - inter)
    out = pairs.copy()
    out["jaccard"] = jac
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def simhash_signatures(df: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash per doc over whitespace tokens (deterministic)."""
    sigs = np.zeros(len(df), dtype=np.uint64)
    for i, text in enumerate(df["text"].to_numpy()):
        words = text.split()
        if not words:
            continue
        hs = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
             for w in words),
            dtype=np.uint64, count=len(words),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        sigs[i] = np.packbits((acc > 0)[::-1]).view(">u8")[0]
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": sigs})


def simhash_near_dups(docs: ray.data.Dataset, hamming_k: int = 3) -> pd.DataFrame:
    """Near-dup pairs with Hamming distance <= k via 4-band blocking
    (pigeonhole: any pair within k<=3 bits agrees on >=1 of 4 16-bit bands)."""
    sigs = docs.map_batches(simhash_signatures, batch_format="pandas").to_pandas()
    sig_arr = dict(zip(sigs["doc_id"], sigs["simhash"]))
    frames = []
    for band in range(4):
        shift = np.uint64(band * 16)
        key = (sigs["simhash"].to_numpy() >> shift) & np.uint64(0xFFFF)
        frames.append(pd.DataFrame({"doc_id": sigs["doc_id"], "band": band, "key": key}))
    blocks = pd.concat(frames, ignore_index=True)
    pairs = set()
    for (_b, _k), g in blocks.groupby(["band", "key"], sort=False):
        ids = np.sort(g["doc_id"].unique())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in sorted(pairs):
        dist = int(bin(int(sig_arr[a]) ^ int(sig_arr[b])).count("1"))
        if dist <= hamming_k:
            rows.append((a, b, dist))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
    )


def embedding_near_dups(
    emb: ray.data.Dataset, threshold: float = 0.95
) -> pd.DataFrame:
    """Cosine near-dup pairs over the embedding column.

    Batch-local numpy normalization + an all-pairs pass against a broadcast
    normalized matrix (fine at test scale; the IVF/LSH path in
    ``similarity.py`` is the 100 TB variant).
    """
    import ray as _ray

    mat_df = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = mat_df["vec_id"].to_numpy()
    m = np.stack(mat_df["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = _ray.put((ids, m))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_m = _ray.get(ref)
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ all_m.T
        qi, ci = np.nonzero(sims >= threshold)
        qa = df["vec_id"].to_numpy()[qi]
        cb = all_ids[ci]
        keep = qa < cb
        return pd.DataFrame(
            {"vec_a": qa[keep], "vec_b": cb[keep],
             "cosine": sims[qi, ci][keep]}
        )

    out = emb.map_batches(scan, batch_format="pandas").to_pandas()
    if "vec_a" not in out.columns:  # no pair anywhere -> schema-less empty
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


def dup_groups(pairs: pd.DataFrame, max_rounds: int = 20) -> pd.DataFrame:
    """Connected components over near-dup pairs -> (doc_id, group_id).

    Min-label propagation: every node starts labeled with its own id; each
    round every edge pushes the smaller endpoint label to the larger, until
    a fixpoint (group_id = min doc_id of the component). Each round is two
    vectorized merges + a groupby-min — exactly the per-round shape of the
    distributed `hash_combine` version; at candidate-set scale (LSH-pruned)
    a handful of rounds converge.
    """
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "group_id": pd.Series(dtype="int64")})
    nodes = np.unique(np.concatenate([pairs["doc_a"], pairs["doc_b"]]))
    label = pd.Series(nodes, index=nodes)
    edges = pairs[["doc_a", "doc_b"]].to_numpy()
    for _ in range(max_rounds):
        la = label.loc[edges[:, 0]].to_numpy()
        lb = label.loc[edges[:, 1]].to_numpy()
        lo = np.minimum(la, lb)
        prop = pd.DataFrame(
            {"node": np.concatenate([edges[:, 0], edges[:, 1]]),
             "lab": np.concatenate([lo, lo])}
        ).groupby("node")["lab"].min()
        new = label.copy()
        new.loc[prop.index] = np.minimum(new.loc[prop.index].to_numpy(), prop.to_numpy())
        if (new == label).all():
            break
        label = new
    return pd.DataFrame({"doc_id": label.index.to_numpy(),
                         "group_id": label.to_numpy()}).sort_values(
        "doc_id", ignore_index=True
    )


def near_dup_groups(docs: ray.data.Dataset, k: int = 5,
                    threshold: float = 0.5) -> pd.DataFrame:
    """Full MinHash dedup pipeline: shingle -> LSH candidates -> exact
    Jaccard verify -> connected components -> survivor choice (min doc_id
    per group)."""
    pairs = minhash_candidates(docs, k=k)
    verified = jaccard_verify(docs, pairs, k=k, threshold=threshold)
    groups = dup_groups(verified)
    if not len(groups):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "group_id": pd.Series(dtype="int64"),
                             "is_survivor": pd.Series(dtype="bool")})
    groups["is_survivor"] = groups["doc_id"] == groups["group_id"]
    return groups
