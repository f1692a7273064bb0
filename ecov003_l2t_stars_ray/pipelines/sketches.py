"""Sketch / sampling operators: bounded-memory answers over unbounded keys.

The reference never needs sketches (a tile is a fixed 3660x3660 raster,
`/root/reference/ECOv003_L2T_STARS/L2T_STARS.py:239` one worker per tile);
a 100 TB event stream does. Four operator families:

- ``heavy_hitters``: EXACT distributed top-k by frequency in two streaming
  passes — pass 1 is a merged Misra-Gries summary per batch (bounded
  ``capacity`` entries survive each batch; merging summaries keeps the
  classic guarantee that any key with true count > N/capacity survives),
  pass 2 recounts ONLY the surviving candidates exactly and takes top-k.
  Exactness contract: exact whenever every true top-k key clears the
  N/capacity survival bound — size ``capacity`` to k / skew accordingly
  (pytest covers both regimes; the driver query uses capacity >= distinct
  so the recount is unconditionally exact and SQL-oracled).
- ``bottomk_sample``: deterministic distributed uniform sample — the k
  rows with the smallest md5(event_id) rank. Each batch keeps its local
  bottom-k, one tiny combine merges them; the md5 rank makes the sample
  reproducible across any partitioning AND expressible in the DuckDB
  oracle (``ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT k``).
- ``tdigest_quantiles``: mergeable t-digest (merging variant, scale
  function k1-lite): per-batch digests built from sorted values under the
  4*delta*q(1-q) centroid-size bound, merged pairwise, quantiles by
  centroid interpolation. Approximate by contract -> rows-only + pytest
  accuracy bound vs the exact sort.
- ``hll_distinct``: HyperLogLog (p-bit registers, splitmix64 hash) with
  linear-counting small-range correction. Approximate -> rows-only +
  pytest relative-error bound vs exact COUNT(DISTINCT).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from ..functions.shuffle import hash_combine, typed_empty, typed_pandas
from .analytics import _events


# ----------------------------------------------------------- heavy hitters
def _mg_summarize(counts: pd.Series, capacity: int) -> pd.Series:
    """Misra-Gries compaction of an exact (key -> count) map to at most
    ``capacity`` entries: subtract the (capacity+1)-th largest count from
    everyone, keep positive remainders (vectorized; no per-key loop)."""
    if len(counts) <= capacity:
        return counts
    c = counts.to_numpy()
    thresh = np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1]
    keep = c > thresh
    return pd.Series(c[keep] - thresh, index=counts.index[keep])


def heavy_hitters(
    sf_dir: str, k: int = 10, capacity: int = 256
) -> pd.DataFrame:
    """Exact top-k ``props.k`` values by count over events (ties -> smaller
    key first). Two passes: MG candidate pass, exact recount of the
    (<= capacity-ish) surviving candidates via broadcast membership."""

    def extract(df: pd.DataFrame) -> pd.Series:
        return (
            df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
            .dropna().astype(np.int64)
        )

    def mg_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = _mg_summarize(extract(df).value_counts(), capacity)
        return pd.DataFrame({"key": s.index.to_numpy(dtype=np.int64),
                             "cnt": s.to_numpy(dtype=np.int64)})

    ds = _events(sf_dir, ["props"])
    # pass 1: per-batch MG summaries -> merged MG summary (add counts,
    # re-compact). The merged summary is tiny (<= capacity per batch,
    # combined on the driver: O(batches * capacity) rows, key-only).
    summaries = ds.map_batches(mg_partial, batch_format="pandas").to_pandas()
    merged = _mg_summarize(
        summaries.groupby("key")["cnt"].sum().sort_values(ascending=False),
        capacity,
    )
    candidates = np.sort(merged.index.to_numpy(dtype=np.int64))

    # pass 2: exact recount of candidates only (vectorized isin filter,
    # int-exact partial/combine)
    def recount(df: pd.DataFrame) -> pd.DataFrame:
        s = extract(df)
        s = s[np.isin(s.to_numpy(), candidates)]
        vc = s.value_counts()
        return pd.DataFrame({"key": vc.index.to_numpy(dtype=np.int64),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("key", as_index=False)["cnt"].sum()

    exact = hash_combine(
        ds.map_batches(recount, batch_format="pandas"), ["key"], combine
    ).to_pandas()
    return (
        exact.sort_values(["cnt", "key"], ascending=[False, True],
                          kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


# --------------------------------------------------------- bottom-k sample
def _md5_rank(ids: pd.Series) -> pd.Series:
    # per-row md5 is the sample's determinism contract (numpy has no md5;
    # a sampling operator's cost is bounded by k-per-batch partials)
    return ids.astype(str).map(
        lambda s: hashlib.md5(s.encode()).hexdigest()
    )

def bottomk_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic uniform sample: the k events with the smallest
    md5(event_id) rank. Local bottom-k per batch, one global merge of
    <= k * n_batches tiny partials."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = _md5_rank(df["event_id"])
        return df.sort_values(["h", "event_id"], kind="mergesort").head(k)

    out = ds.map_batches(local, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["h", "event_id"], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        [["event_id", "user_id", "ts", "value", "h"]]
    )


# ------------------------------------------------------------------ t-digest
def _tdigest_build(sorted_vals: np.ndarray, counts: np.ndarray,
                   delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right centroid merge of (sorted value, count) pairs
    under the size bound 4*N*q(1-q)/delta (merging t-digest). Returns
    (means, counts). Deterministic; loop is over centroids (<= ~2*delta
    surviving), not rows."""
    n = counts.sum()
    if n == 0:
        return np.empty(0), np.empty(0, dtype=np.int64)
    means, cnts = [], []
    cur_sum = sorted_vals[0] * counts[0]
    cur_cnt = int(counts[0])
    done = 0  # count fully to the left of the current centroid
    for i in range(1, len(sorted_vals)):
        c = int(counts[i])
        q = (done + cur_cnt / 2.0) / n
        lim = max(1.0, 4.0 * n * q * (1.0 - q) / delta)
        if cur_cnt + c <= lim:
            cur_sum += sorted_vals[i] * c
            cur_cnt += c
        else:
            means.append(cur_sum / cur_cnt)
            cnts.append(cur_cnt)
            done += cur_cnt
            cur_sum = sorted_vals[i] * c
            cur_cnt = c
    means.append(cur_sum / cur_cnt)
    cnts.append(cur_cnt)
    return np.asarray(means), np.asarray(cnts, dtype=np.int64)


def _tdigest_quantile(means: np.ndarray, cnts: np.ndarray,
                      qs: np.ndarray) -> np.ndarray:
    """Quantile by linear interpolation between centroid midpoints."""
    n = cnts.sum()
    mid = np.cumsum(cnts) - cnts / 2.0
    return np.interp(qs * n, mid, means)


class TDigestAgg:
    """Callable-class stage (K6 pattern): builds one digest per group key
    inside each batch; digests merge associatively in the combine."""

    def __init__(self, delta: int = 100):
        self.delta = delta

    def partial(self, df: pd.DataFrame, key: str, col: str) -> pd.DataFrame:
        out = []
        df = df.sort_values([key, col], kind="mergesort")
        for kv, g in df.groupby(key, sort=False):
            v = g[col].to_numpy(dtype=np.float64)
            m, c = _tdigest_build(v, np.ones(len(v), dtype=np.int64), self.delta)
            out.append(pd.DataFrame({key: kv, "mean": m, "cnt": c}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {key: pd.Series(dtype="int64"), "mean": pd.Series(dtype="float64"),
             "cnt": pd.Series(dtype="int64")}
        )


def tdigest_latency_quantiles(
    sf_dir: str, delta: int = 200, qs=(0.5, 0.9, 0.99)
) -> pd.DataFrame:
    """Approximate per-user inter-event-gap quantiles via mergeable
    t-digests — the bounded-memory scale path beside the exact
    ``latency_quantiles`` sort (contract mirrors VERDICT r2's exact/approx
    split for near-dups). Rows-only; pytest bounds the error vs exact."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    agg = TDigestAgg(delta)

    def gaps_partial(g: pd.DataFrame) -> pd.DataFrame:
        # per-partition: derive gaps (needs per-user order), then digest
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        d = pd.DataFrame({"user_id": u[same],
                          "gap_s": (t[same] - np.roll(t, 1)[same]) / 1e6})
        return agg.partial(d, "user_id", "gap_s")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        g = g.sort_values(["user_id", "mean"], kind="mergesort")
        for kv, gg in g.groupby("user_id", sort=False):
            m, c = _tdigest_build(
                gg["mean"].to_numpy(), gg["cnt"].to_numpy(dtype=np.int64),
                agg.delta,
            )
            qv = _tdigest_quantile(m, c, np.asarray(qs))
            out.append({"user_id": kv, "n_gaps": int(c.sum()),
                        **{f"p{int(q*100):02d}_s": v
                           for q, v in zip(qs, qv)}})
        return pd.DataFrame(out)

    out = hash_combine(
        hash_combine(ds, ["user_id"], gaps_partial), ["user_id"], finalize
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(user_id=np.int64, n_gaps=np.int64,
                           **{f"p{int(q * 100):02d}_s": np.float64
                              for q in qs})
    return out.sort_values("user_id", ignore_index=True)


# ------------------------------------------------------------- HyperLogLog
def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hll_registers(vals: np.ndarray, p: int) -> np.ndarray:
    """Max leading-zero-rank register array (2^p) for int64 values."""
    h = _splitmix64(vals.astype(np.int64).view(np.uint64))
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rank = leading zeros of rest + 1, computed via bit_length
    lz = np.zeros(len(h), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(64 - shift))
        lz += np.where(big, 0, shift)
        x = np.where(big, x, x << np.uint64(shift))
    rank = lz + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, bucket, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


def hll_distinct(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Approximate distinct user_id per event_type via HyperLogLog:
    per-batch register arrays, merged with elementwise max (associative,
    order-free). Rows-only; pytest bounds relative error vs exact."""
    ds = _events(sf_dir, ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            regs = _hll_registers(g["user_id"].to_numpy(), p)
            nz = np.flatnonzero(regs)  # ship only touched registers
            out.append(pd.DataFrame({"event_type": str(et), "reg": nz,
                                     "rank": regs[nz].astype(np.int64)}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "reg": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "reg"], as_index=False)["rank"].max()
        out = []
        for et, gg in g.groupby("event_type", sort=False):
            regs = np.zeros(1 << p, dtype=np.int8)
            regs[gg["reg"].to_numpy()] = gg["rank"].to_numpy().astype(np.int8)
            out.append({"event_type": et,
                        "approx_distinct": round(_hll_estimate(regs))})
        return pd.DataFrame(out)

    out = hash_combine(
        ds.map_batches(partial, batch_format="pandas"), ["event_type"],
        combine,
    ).to_pandas()
    if len(out) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(event_type=object, approx_distinct=np.int64)
    return out.sort_values("event_type", ignore_index=True)


# --------------------------------------------- stratified deterministic sample
def stratified_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Deterministic stratified sample: per event_type stratum, the k
    events with the smallest md5(event_id) rank — the per-class balanced
    variant of :func:`bottomk_sample` (training-data curation's
    class-balancing step).

    Scale shape: each batch keeps only its local bottom-k PER STRATUM
    (<= k * n_strata rows leave a batch), those tiny partials ride one
    hash shuffle keyed by stratum, each partition combine re-takes bottom-k
    per stratum. No full sort, no global shuffle of the input."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts", "value"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = _md5_rank(df["event_id"])
        df = df.sort_values(["h", "event_id"], kind="mergesort")
        return df.groupby("event_type", sort=False).head(k)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"], kind="mergesort")
        return g.groupby("event_type", sort=False).head(k)

    out = hash_combine(
        ds.map_batches(local, batch_format="pandas"), ["event_type"], combine
    ).to_pandas()
    return (
        out.sort_values(["event_type", "h", "event_id"], kind="mergesort")
        .reset_index(drop=True)
        [["event_id", "user_id", "event_type", "ts", "value", "h"]]
    )


# ------------------------------------------------------ weighted sample
def weighted_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each order draws key = -ln(u)/w with
    w = o_totalprice and u a splitmix64-derived uniform in (0, 1); the
    k SMALLEST keys win — heavier orders exponentially more likely, one
    streaming pass, mergeable bottom-k partials (``bottomk_sample`` is
    the uniform special case w = 1).

    Shape: local bottom-k per batch, one tiny global merge of
    <= k * n_blocks rows — corpus-size independent driver state.

    Not SQL-oracled (the splitmix64 bit mix has no reasonable SQL
    mirror); the pytest replays the key chain literally and checks the
    weighted-rank invariant."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def keys(df: pd.DataFrame) -> np.ndarray:
        h = _splitmix64(
            df["o_orderkey"].to_numpy(np.int64).view(np.uint64)
        )
        # uniform in (0,1): (h >> 11) * 2^-53, nudged off exact zero
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0**-53
        w = df["o_totalprice"].to_numpy(np.float64)
        return -np.log(u) / w

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["key"] = keys(df)
        return df.sort_values(["key", "o_orderkey"],
                              kind="mergesort").head(k)

    out = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = (
        out.sort_values(["key", "o_orderkey"], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    out["o_custkey"] = out["o_custkey"].astype(np.int64)
    return out[["o_orderkey", "o_custkey", "o_totalprice", "key"]]


# -------------------------------------------------------- epoch shuffle
def epoch_shuffle(sf_dir: str, epochs: int = 2, k: int = 50) -> pd.DataFrame:
    """Deterministic per-epoch training shuffle: every document's
    position in epoch e is rank(md5(e || ':' || doc_id)) — the seeded
    re-shuffle a multi-epoch training loader needs (same corpus,
    different deterministic order each epoch, reproducible across
    restarts; ``bottomk_sample``'s contract per epoch).  Emits the
    first ``k`` manifest rows of each epoch.

    Shape: the full ordering never materializes — local bottom-k per
    (epoch, batch), one tiny global merge per epoch.

    Determinism: md5 on both sides."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        ids = df["doc_id"].astype(str)
        for e in range(epochs):
            h = ids.map(
                lambda s, e=e: hashlib.md5(
                    f"{e}:{s}".encode()
                ).hexdigest()
            )
            d = pd.DataFrame(
                {"epoch": np.int64(e),
                 "doc_id": df["doc_id"].to_numpy(np.int64),
                 "source": df["source"].astype(str), "h": h}
            )
            outs.append(
                d.sort_values(["h", "doc_id"], kind="mergesort").head(k)
            )
        return pd.concat(outs, ignore_index=True)

    out = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = (
        out.sort_values(["epoch", "h", "doc_id"], kind="mergesort")
        .groupby("epoch", as_index=False, group_keys=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["position"] = out.groupby("epoch").cumcount().astype(np.int64)
    out["epoch"] = out["epoch"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["epoch", "position", "doc_id", "source", "h"]]
