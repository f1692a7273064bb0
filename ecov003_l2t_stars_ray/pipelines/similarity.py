"""Similarity search over the ``embeddings`` table (list<float> column).

- ``brute_force_topk``: exact cosine top-k — the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul and emits its LOCAL
  top-k candidates, and a tiny per-query reduce keeps the global top-k.
  Shuffle volume is O(n_queries x k x n_blocks), never the corpus.
- ``SRPIndexedSearch``: the scale path — signed-random-projection (SRP)
  bucketing; candidates are restricted to colliding buckets (multi-probe
  over all hyperplane sign flips within radius 1), trading recall for a
  corpus-size-independent candidate set.

Stateful pieces (query matrix, hyperplanes) live in actor ``__init__`` via
broadcast refs — the K6 one-time-setup pattern (``login.py:15-61``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..functions.scalars import round6_away as _r6away
from ..functions.shuffle import typed_empty


def _to_matrix(col: pd.Series) -> np.ndarray:
    m = np.stack(col.to_numpy()).astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Actor-pool stage: local cosine top-k of one batch vs all queries."""

    def __init__(self, query_ref, k: int):
        self.query_ids, self.q = ray.get(query_ref)  # once per actor
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(df["embedding"])
        ids = df["vec_id"].to_numpy()
        sims = self.q @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(sims.shape[0]), k)
        cols = top.ravel()
        return pd.DataFrame(
            {
                "query_id": self.query_ids[rows],
                "vec_id": ids[cols],
                "cosine": sims[rows, cols],
            }
        )


def brute_force_topk(
    emb: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k per query; deterministic tie-break by vec_id."""
    q = query_matrix.astype(np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    ref = ray.put((np.asarray(query_ids), q))

    local = emb.map_batches(
        _BatchTopK,
        fn_constructor_args=(ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(2, 16),  # scale with the node; 2 actors starved 32 CPUs
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    out = local.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True],
                     ignore_index=True)
    )


class SRPIndexedSearch:
    """Signed-random-projection bucketed ANN (the 100 TB path).

    Index build = one ``map_batches`` pass assigning each vector a bucket
    (sign bits of ``n_planes`` fixed random hyperplanes). Search probes the
    query's bucket plus all Hamming-radius-1 neighbors and brute-forces
    only those candidates.
    """

    def __init__(self, n_planes: int = 8, seed: int = 7, dim: int = 64):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.n_planes = n_planes

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits << np.arange(self.n_planes)).sum(axis=1).astype(np.int64)

    def build(self, emb: ray.data.Dataset) -> ray.data.Dataset:
        planes = self.planes
        n_planes = self.n_planes

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            m = _to_matrix(df["embedding"])
            bits = (m @ planes.T) > 0
            df = df.copy()
            df["bucket"] = (bits << np.arange(n_planes)).sum(axis=1).astype(np.int64)
            return df

        return emb.map_batches(assign, batch_format="pandas")

    def search(
        self,
        indexed: ray.data.Dataset,
        query_ids: np.ndarray,
        query_matrix: np.ndarray,
        k: int = 10,
    ) -> pd.DataFrame:
        q = query_matrix.astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        qb = self.bucket_of(q)
        # multi-probe: own bucket + radius-1 sign flips
        probes = {
            int(b) ^ (1 << p) for b in qb for p in range(self.n_planes)
        } | {int(b) for b in qb}
        ref = ray.put((np.asarray(query_ids), q, probes))
        kk = k

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            ids_, qm, probe_set = ray.get(ref)
            df = df[df["bucket"].isin(probe_set)]
            if not len(df):
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     "vec_id": pd.Series(dtype="int64"),
                                     "cosine": pd.Series(dtype="float64")})
            m = _to_matrix(df["embedding"])
            sims = qm @ m.T
            vid = df["vec_id"].to_numpy()
            kl = min(kk, sims.shape[1])
            top = np.argpartition(-sims, kl - 1, axis=1)[:, :kl]
            rows = np.repeat(np.arange(sims.shape[0]), kl)
            cols = top.ravel()
            return pd.DataFrame({"query_id": ids_[rows], "vec_id": vid[cols],
                                 "cosine": sims[rows, cols]})

        local = indexed.map_batches(scan, batch_format="pandas")

        def final_topk(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                              kind="mergesort")
            return g.head(kk)

        return (
            local.groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .to_pandas()
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True], ignore_index=True)
        )


class IVFIndex:
    """IVF (inverted-file) ANN: k-means-lite centroids, nprobe search.

    Fit: Lloyd iterations on a driver-side sample (the K5/A6 pattern —
    small-sample model fit on the driver, broadcast to workers). Build: one
    ``map_batches`` pass assigning each vector its nearest centroid.
    Search: scan only vectors whose centroid is among each query's
    ``n_probe`` nearest — candidate set independent of corpus size.
    """

    def __init__(self, n_centroids: int = 16, n_probe: int = 4,
                 iters: int = 8, seed: int = 11):
        self.n_centroids = n_centroids
        self.n_probe = n_probe
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, emb: ray.data.Dataset, sample_size: int = 2048) -> "IVFIndex":
        sample = emb.limit(sample_size).to_pandas()
        if len(sample) == 0:  # empty corpus (q11 class): no centroids
            self.centroids = np.zeros((0, 1), dtype=np.float64)
            return self
        m = _to_matrix(sample["embedding"])
        rng = np.random.default_rng(self.seed)
        c = m[rng.choice(len(m), size=min(self.n_centroids, len(m)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(m @ c.T, axis=1)
            for j in range(len(c)):
                members = m[assign == j]
                if len(members):
                    v = members.mean(axis=0)
                    c[j] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = c
        return self

    def build(self, emb: ray.data.Dataset) -> ray.data.Dataset:
        ref = ray.put(self.centroids)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            cc = ray.get(ref)
            m = _to_matrix(df["embedding"])
            df = df.copy()
            df["centroid"] = np.argmax(m @ cc.T, axis=1).astype(np.int32)
            return df

        return emb.map_batches(assign, batch_format="pandas")

    def search(self, indexed: ray.data.Dataset, query_ids: np.ndarray,
               query_matrix: np.ndarray, k: int = 10) -> pd.DataFrame:
        q = query_matrix.astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(q @ self.centroids.T), axis=1)[:, : self.n_probe]
        probes = {int(c) for row in order for c in row}
        ref = ray.put((np.asarray(query_ids), q, probes))
        kk = k

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            ids_, qm, probe_set = ray.get(ref)
            df = df[df["centroid"].isin(probe_set)]
            if not len(df):
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     "vec_id": pd.Series(dtype="int64"),
                                     "cosine": pd.Series(dtype="float64")})
            m = _to_matrix(df["embedding"])
            sims = qm @ m.T
            vid = df["vec_id"].to_numpy()
            kl = min(kk, sims.shape[1])
            top = np.argpartition(-sims, kl - 1, axis=1)[:, :kl]
            rows = np.repeat(np.arange(sims.shape[0]), kl)
            cols = top.ravel()
            return pd.DataFrame({"query_id": ids_[rows], "vec_id": vid[cols],
                                 "cosine": sims[rows, cols]})

        local = indexed.map_batches(scan, batch_format="pandas")

        def final_topk(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                                 kind="mergesort").head(kk)

        return (
            local.groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .to_pandas()
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True], ignore_index=True)
        )


def ivf_near_dups(
    emb: ray.data.Dataset,
    threshold: float = 0.9,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 11,
) -> pd.DataFrame:
    """APPROXIMATE cosine near-dup pairs via IVF bucket routing — the
    corpus-size-independent candidate path (vs the exact block-pair scan
    in ``dedup.embedding_near_dups``).

    Each vector is multi-assigned to its ``n_probe`` nearest centroids
    (recall knob: two genuinely-near vectors share a bucket with high
    probability at high thresholds); pair generation is bucket-local —
    one vectorized matmul per centroid bucket inside a hash-partitioned
    combine, candidates never leave their bucket. Recall < 1 by design;
    exactness at moderate thresholds needs the block scan.
    """
    from ..functions.shuffle import hash_combine

    idx = IVFIndex(n_centroids=n_centroids, n_probe=n_probe, seed=seed).fit(emb)
    if idx.centroids is None or len(idx.centroids) == 0:  # empty corpus
        return typed_empty(vec_a=np.int64, vec_b=np.int64,
                           cosine=np.float64)
    ref = ray.put(idx.centroids)

    def assign_multi(df: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(ref)
        m = _to_matrix(df["embedding"])
        # tiny corpora can fit fewer centroids than n_probe — clamp
        p = min(n_probe, cc.shape[0])
        order = np.argsort(-(m @ cc.T), axis=1)[:, :p]
        return pd.DataFrame(
            {
                "centroid": order.reshape(-1).astype(np.int32),
                "vec_id": np.repeat(df["vec_id"].to_numpy(), p),
                "emb": list(np.repeat(m, p, axis=0)),
            }
        )

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        frames = []
        for _c, b in g.groupby("centroid", sort=False):
            b = b.drop_duplicates("vec_id")
            if len(b) < 2:
                continue
            m = np.stack(b["emb"].to_numpy())
            ids = b["vec_id"].to_numpy()
            sims = m @ m.T
            ai, bj = np.nonzero(sims >= threshold)
            keep = ids[ai] < ids[bj]
            if keep.any():
                frames.append(
                    pd.DataFrame({"vec_a": ids[ai][keep], "vec_b": ids[bj][keep],
                                  "cosine": sims[ai, bj][keep]})
                )
        return pd.concat(frames, ignore_index=True) if frames else empty

    out = hash_combine(
        emb.map_batches(assign_multi, batch_format="pandas"),
        ["centroid"], pairs_in_partition, num_partitions=8,
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.drop_duplicates(["vec_a", "vec_b"]).sort_values(
        ["vec_a", "vec_b"], ignore_index=True
    )


# ------------------------------------------------ distributed k-means (Lloyd)
def kmeans_embed(sf_dir: str, k: int = 8, iters: int = 8) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus — the
    clustering step of embedding-based corpus curation (topic balancing,
    near-dup blocking). Every iteration is one streaming pass: centroids
    ride `ray.put` once per round, each batch computes assignments with one
    matmul and emits k partial rows (scaled-int sum vector + count), the
    driver reduces k * n_batches tiny partials.

    Determinism contract (bitwise, any batch order / cluster count):
    vectors are L2-normalized float64; partial sums accumulate as
    np.round(m * 2^20) int64 (order-independent); centroid = int_sum /
    (2^20 * count), re-normalized; assignment = argmax cosine, first-index
    tie-break; empty cluster keeps its previous centroid. Init = the k
    vectors with smallest md5(vec_id) (bottom-k partials, no full
    materialization). The pytest oracle replays the identical recurrence
    single-process.
    """
    import hashlib

    SCALE = float(1 << 20)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def md5_bottomk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = df["vec_id"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest()
        )
        return df.sort_values(["h", "vec_id"], kind="mergesort").head(k)

    seed_df = (
        emb.map_batches(md5_bottomk, batch_format="pandas")
        .to_pandas()
    )
    if len(seed_df) == 0:  # empty corpus (q11 class)
        return typed_empty(vec_id=np.int64, cluster=np.int64,
                           cosine=np.float64)
    seed_df = seed_df.sort_values(["h", "vec_id"], kind="mergesort").head(k)
    c = _to_matrix(seed_df["embedding"])

    def partial_update(ref):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            cc = ray.get(ref)
            m = _to_matrix(df["embedding"])
            a = np.argmax(m @ cc.T, axis=1)
            s = np.round(m * SCALE).astype(np.int64)
            sums = np.zeros((len(cc), m.shape[1]), dtype=np.int64)
            np.add.at(sums, a, s)
            cnt = np.bincount(a, minlength=len(cc)).astype(np.int64)
            return pd.DataFrame(
                {
                    "cluster": np.arange(len(cc), dtype=np.int64),
                    "sum_vec": list(sums),
                    "count": cnt,
                }
            )
        return f

    for _ in range(iters):
        ref = ray.put(c)
        parts = emb.map_batches(partial_update(ref), batch_format="pandas").to_pandas()
        sums = np.zeros_like(c, dtype=np.int64)
        cnts = np.zeros(len(c), dtype=np.int64)
        for cl, sv, n in zip(parts["cluster"], parts["sum_vec"], parts["count"]):
            sums[cl] += np.asarray(sv, dtype=np.int64)
            cnts[cl] += n
        nz = cnts > 0
        upd = sums[nz].astype(np.float64) / (SCALE * cnts[nz, None])
        upd /= np.maximum(np.linalg.norm(upd, axis=1, keepdims=True), 1e-12)
        c = c.copy()
        c[nz] = upd

    ref = ray.put(c)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(ref)
        m = _to_matrix(df["embedding"])
        sims = m @ cc.T
        a = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "cluster": a.astype(np.int64),
                "cosine": _r6away(sims[np.arange(len(a)), a]),
            }
        )

    return (
        emb.map_batches(assign, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )


def label_compactness(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding compactness: the mean cosine similarity of
    each vector to its own label centroid — the cluster-quality /
    class-separability readout embedding-curation pipelines run after
    labeling (a one-sided silhouette).

    Shape: two passes, both streaming — (1) per-batch per-label vector
    SUMS (a labels x dims partial, label-cardinality sized) reduced on
    the driver into centroids; (2) the tiny centroid matrix broadcast
    via ``ray.put`` and a map-only batched cosine (one matmul per batch),
    then label-sized mean partials.  The embedding stream never
    shuffles.

    Determinism: float32 inputs are widened to float64 BEFORE any
    arithmetic on both sides; centroid sums and per-vector dots are
    ~O(n_label)- and dims-term float chains at O(1) magnitude, absorbed
    by ROUND(x, 6) (the entropy/trig precedent — not the banned 1e9
    accumulation).  The oracle mirrors via UNNEST WITH ORDINALITY."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        out = []
        for l in np.unique(lab):
            sel = m[lab == l]
            out.append((int(l), int(sel.shape[0]), sel.sum(axis=0)))
        return pd.DataFrame(
            {
                "label": [o[0] for o in out],
                "n": [o[1] for o in out],
                "svec": [o[2] for o in out],
            }
        )

    parts = ds.map_batches(sums, batch_format="pandas").to_pandas()
    if len(parts) == 0:  # empty corpus (q11 class)
        return typed_empty(label=np.int64, n=np.int64, mean_cos=np.float64)
    agg = parts.groupby("label")
    labels = np.array(sorted(parts["label"].unique()), dtype=np.int64)
    cent = {}
    for l in labels:
        g = agg.get_group(l)
        n = int(g["n"].sum())
        s = np.sum(np.stack(g["svec"].to_numpy()), axis=0)
        cent[int(l)] = s / float(n)
    cent_ref = ray.put(cent)

    def cos_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy(np.int64)
        out = []
        for l in np.unique(lab):
            sel = m[lab == l]
            cv = c[int(l)]
            dots = sel @ cv
            cs = dots / (
                np.sqrt((sel * sel).sum(axis=1)) * np.sqrt((cv * cv).sum())
            )
            out.append((int(l), int(sel.shape[0]), float(cs.sum())))
        return pd.DataFrame(
            {
                "label": [o[0] for o in out],
                "n": [o[1] for o in out],
                "cs_sum": [o[2] for o in out],
            }
        )

    red = (
        ds.map_batches(cos_partial, batch_format="pandas")
        .to_pandas()
        .groupby("label", as_index=False)[["n", "cs_sum"]]
        .sum()
    )
    red = red.sort_values("label", ignore_index=True)
    sgn = red["cs_sum"].to_numpy(np.float64)
    n = red["n"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "label": red["label"].to_numpy(np.int64),
            "n": n,
            "mean_cos": np.sign(sgn / n)
            * np.floor(np.abs(sgn / n) * 1e6 + 0.5)
            / 1e6,
        }
    )


def embedding_dim_variance(sf_dir: str) -> pd.DataFrame:
    """Per-DIMENSION mean/variance profile of the embedding space — the
    feature-selection readout (dead or dominating dimensions) embedding
    pipelines check before indexing.

    Shape: map-side per-batch dimension-axis moment partials (three
    length-d vectors per batch: n, sum, sum-of-squares), a dims-sized
    driver reduce, no shuffle at all.

    Determinism: float32 widened to DOUBLE before arithmetic; sums are
    O(corpus) chains at O(1) magnitude, absorbed by ROUND(x, 6) (the
    entropy/compactness precedent); the variance is the same mirrored
    (s2 - s1*s1/n)/(n-1) chain as ``stats.value_zscore_by_type``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(1, m.shape[1] + 1, dtype=np.int64),
                "n": np.full(m.shape[1], m.shape[0], dtype=np.int64),
                "s1": m.sum(axis=0),
                "s2": (m * m).sum(axis=0),
            }
        )

    mo = ds.map_batches(moments, batch_format="pandas").to_pandas()
    if len(mo) == 0:  # empty corpus (q11 class)
        return typed_empty(dim=np.int64, n=np.int64, mean_x=np.float64,
                           var_x=np.float64)
    agg = (
        mo.groupby("dim", as_index=False)[["n", "s1", "s2"]]
        .sum()
        .sort_values("dim", ignore_index=True)
    )
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    s1 = agg["s1"].to_numpy(np.float64)
    s2 = agg["s2"].to_numpy(np.float64)
    r6 = lambda x: np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {
            "dim": agg["dim"].to_numpy(np.int64),
            "n": agg["n"].astype(np.int64),
            "mean_x": r6(s1 / n),
            "var_x": r6((s2 - s1 * s1 / n) / (n - 1.0)),
        }
    )
