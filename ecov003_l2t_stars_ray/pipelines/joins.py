"""Distributed join operators: big-big shuffle hash join and the
Bloom-filter semi-join scale path.

The reference joins rasters by date axis (`ECOv003_L2T_STARS/L2T_STARS.py:
generate_STARS_inputs` date-keyed composites) — always one-small-side, so
its engine never needs a big-big exchange. A 100 TB tabular engine does;
these operators supply it:

- ``hash_join`` (functions/shuffle.py): both sides large -> one hash
  exchange on the key, per-partition vectorized pandas merge. Chosen over
  Ray 2.49's native ``Dataset.join`` by measurement: at sf0.1
  (600 K x 150 K filtered) the native hash-shuffle join operator pays a
  per-aggregator constant comparable to the sort-based Aggregate this
  engine already avoids (see CLAUDE.md); the union-exchange form reuses
  the proven one-shuffle shape and fuses the downstream partial aggregate
  into the same stage.
- ``bloom_semijoin``: the J5 anti/semi-join family at scale — a broadcast
  Bloom filter (splitmix64 double-hashing, vectorized membership test)
  prunes the big side BEFORE any exchange; survivors are verified against
  the exact member set so the operator stays EXACT (false positives are
  re-checked, false negatives are impossible by construction). At 100 TB
  the bloom (m bits ~ 10 bits/member) rides `ray.put` once per node while
  the exact set stays sharded; here the member set is small enough to
  broadcast whole.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.shuffle import hash_combine, hash_join

CUTOFF = pd.Timestamp("2000-01-01")


def join_topk_revenue(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3-shaped pipeline: lineitem JOIN orders (big-big ->
    ``hash_join``) with the customer segment filter broadcast into the
    orders read (small side never shuffles), integer-cents revenue
    aggregate per order, global top-k.

    Determinism contract: revenue accumulates as int64
    cents x (100 - discount%) units; ONE double division + round(6) at the
    end, mirrored op-for-op in the oracle SQL. Ties at rank k break on
    orderkey.

    Scale shape: both reads are column-pruned AND row-filtered at the
    parquet scan (predicate pushdown); the orders side is pre-filtered by
    a broadcast membership test before the exchange; the revenue partial
    aggregate runs inside the join's partition groups (same task), so the
    only all-to-all is the one join exchange; per-partition top-k keeps the
    driver merge at O(P * k) rows.
    """
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    building = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy()
    )
    building_ref = ray.put(building)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pc.scalar(CUTOFF),
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < pc.scalar(CUTOFF),
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        # pre-aggregate to integer revenue units BEFORE the exchange:
        # cents * (100 - discount%) is exact in int64
        ep_c = np.round(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return (
            pd.DataFrame({"orderkey": df["l_orderkey"],
                          "rev_u": ep_c * (100 - disc)})
            .groupby("orderkey", sort=False, as_index=False)["rev_u"]
            .agg(rev_u="sum", n_lines="count")
        )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        members = ray.get(building_ref)
        keep = df[
            np.isin(df["o_custkey"].to_numpy(), members, assume_unique=False)
        ]
        return pd.DataFrame(
            {"orderkey": keep["o_orderkey"],
             "o_orderdate": keep["o_orderdate"],
             "o_orderpriority": keep["o_orderpriority"]}
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(orders_prep, batch_format="pandas"),
        on=["orderkey"],
        how="inner",
    )

    def topk_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        ).agg(rev_u=("rev_u", "sum"), n_lines=("n_lines", "sum"))
        g["revenue"] = np.round(
            g["rev_u"].to_numpy(dtype=np.float64) / 10000.0, 6
        )
        return g.sort_values(
            ["revenue", "orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    out = joined.map_batches(topk_part, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["revenue", "orderkey"], ascending=[False, True],
                        kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        [["orderkey", "o_orderdate", "o_orderpriority", "n_lines", "revenue"]]
    )


# ------------------------------------------------------------ Bloom filter
def _bloom_hashes(vals: np.ndarray, m_bits: int, n_hashes: int,
                  ) -> np.ndarray:
    """(n_hashes, len(vals)) bit indices via splitmix64 double hashing
    (h1 + i*h2 mod m — classic Kirsch-Mitzenmacher construction)."""
    from .sketches import _splitmix64

    v = vals.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_build(members: np.ndarray, bits_per_member: int = 10,
                n_hashes: int = 4) -> np.ndarray:
    m_bits = max(64, 1 << int(np.ceil(np.log2(
        max(1, len(members)) * bits_per_member))))
    bits = np.zeros(m_bits, dtype=bool)
    idx = _bloom_hashes(members, m_bits, n_hashes)
    bits[idx.ravel()] = True
    return bits


def bloom_test(bits: np.ndarray, vals: np.ndarray,
               n_hashes: int = 4) -> np.ndarray:
    """Vectorized membership test: True = maybe-member (never a false
    negative), False = definitely absent."""
    idx = _bloom_hashes(vals, len(bits), n_hashes)
    return bits[idx].all(axis=0)


def bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """Event counts per type, restricted to users who ever purchased —
    the semi-join pruned by a broadcast Bloom filter, verified exactly.

    Output: (event_type, n_events, n_users) for bloom-surviving,
    set-verified rows; int-exact counts.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    purch = (
        ds.map_batches(
            lambda df: pd.DataFrame(
                {"user_id": df.loc[df["event_type"] == "purchase", "user_id"]
                 .unique()}
            ),
            batch_format="pandas",
        )
        .to_pandas()["user_id"]
        .unique()
    )
    members = np.sort(purch)
    bits_ref = ray.put(bloom_build(members))
    members_ref = ray.put(members)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        maybe = bloom_test(ray.get(bits_ref), u)
        # exactness: bloom false positives are culled by the real set
        sub = df[maybe]
        truly = np.isin(sub["user_id"].to_numpy(), ray.get(members_ref),
                        assume_unique=False)
        sub = sub[truly]
        return (
            sub.groupby(["event_type", "user_id"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per_user = g.groupby(["event_type", "user_id"], as_index=False)["n"].sum()
        return per_user.groupby("event_type", as_index=False).agg(
            n_events=("n", "sum"), n_users=("user_id", "count")
        )

    return (
        hash_combine(ds.map_batches(partial, batch_format="pandas"),
                     ["event_type"], combine)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )


def q5_local_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-shaped 6-table join: revenue per ASIA nation over 1996-97
    orders whose CUSTOMER and line SUPPLIER sit in the same nation.

    Scale shape: region -> nation -> (customer, supplier) maps are tiny
    and ride ``ray.put`` broadcasts into the two fact scans (J2 pattern);
    both fact reads are column-pruned and the orders read date-filtered at
    the parquet scan. The ONE all-to-all is lineitem x filtered-orders on
    orderkey (``hash_join``); the nation-equality filter and the
    integer-cents revenue partial run inside the join's partition groups,
    and only ~|nations| rows ever leave them.

    Determinism: revenue accumulates as int64 cents x (100 - disc%); ONE
    double division + round(6) mirrored in the oracle SQL."""
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    asia_key = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    asia = nation[nation["n_regionkey"] == asia_key]
    name_of = asia.set_index("n_nationkey")["n_name"]

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust = cust[cust["c_nationkey"].isin(name_of.index)]
    cust_nat_ref = ray.put(cust.set_index("c_custkey")["c_nationkey"])
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp = supp[supp["s_nationkey"].isin(name_of.index)]
    supp_nat_ref = ray.put(supp.set_index("s_suppkey")["s_nationkey"])

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1998-01-01")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pc.scalar(lo))
        & (pc.field("o_orderdate") < pc.scalar(hi)),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        cnat = df["o_custkey"].map(ray.get(cust_nat_ref))
        keep = cnat.notna()
        return pd.DataFrame(
            {"orderkey": df.loc[keep, "o_orderkey"],
             "cnat": cnat[keep].astype("int64")}
        )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        snat = df["l_suppkey"].map(ray.get(supp_nat_ref))
        keep = snat.notna().to_numpy()
        ep_c = np.round(
            df["l_extendedprice"].to_numpy()[keep] * 100.0
        ).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy()[keep] * 100.0).astype(np.int64)
        # pre-aggregate per (orderkey, supplier nation) BEFORE the exchange
        return (
            pd.DataFrame(
                {"orderkey": df["l_orderkey"].to_numpy()[keep],
                 "snat": snat[keep].astype("int64").to_numpy(),
                 "rev_u": ep_c * (100 - disc)}
            )
            .groupby(["orderkey", "snat"], sort=False, as_index=False)["rev_u"]
            .sum()
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(orders_prep, batch_format="pandas"),
        on=["orderkey"],
        how="inner",
    )

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["snat"] == df["cnat"]]
        return m.groupby("snat", as_index=False)["rev_u"].sum()

    out = hash_combine(
        joined.map_batches(nation_partial, batch_format="pandas"),
        ["snat"],
        lambda g: g.groupby("snat", as_index=False)["rev_u"].sum(),
        num_partitions=4,
    ).to_pandas()
    out["n_name"] = out["snat"].map(name_of)
    out["revenue"] = np.round(out["rev_u"].to_numpy(dtype=np.float64) / 10000.0, 6)
    return out[["n_name", "revenue"]].sort_values("n_name", ignore_index=True)


def q22_no_orders(
    sf_dir: str, nations: tuple = (1, 3, 5, 7, 9, 11, 13)
) -> pd.DataFrame:
    """TPC-H Q22 shape (phone-prefix list -> nation-key list, the synthetic
    customer table has no phone column): per selected nation, the count and
    total balance of ABOVE-AVERAGE-balance customers who never placed an
    URGENT order — the classic scalar-subquery + anti-join composite (the
    synthetic generator gives every customer at least one order, so the
    anti-join side is the urgent-priority subset to stay non-vacuous).

    Exactness: balances are 2-decimal, so they ride as int64 cents; the
    "above average of the positive pool" threshold is evaluated as the
    integer cross-product test ``cents * n_pos > s_pos`` on BOTH sides —
    no float average exists anywhere, so the filter cannot flip on an ulp
    (CLAUDE.md float-compare invariant).  ``totacctbal`` is ONE division
    of an exact int sum by 100.0.

    Shape: (1) a tiny two-int driver reduce computes the pool sums over
    the nation-filtered stream; (2) filtered customers and per-batch
    DISTINCT order custkeys ride ONE custkey-hash exchange (schemas
    aligned, no padding) and each partition drops customers whose key has
    an order row — the fully distributed anti-join (J5 family; the Bloom
    variant above is the pre-filter at 100 TB); (3) per-partition
    (nation) partials are 7 rows each, summed on the driver."""
    nat = list(nations)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nationkey"].isin(nat)]
        return pd.DataFrame(
            {
                "k": d["c_custkey"].to_numpy(np.int64),
                "nat": d["c_nationkey"].to_numpy(np.int64),
                "cents": np.rint(d["c_acctbal"].to_numpy(np.float64) * 100)
                .astype(np.int64),
                "is_order": np.zeros(len(d), dtype=np.int64),
            }
        )

    filtered = cust.map_batches(cust_rows, batch_format="pandas")

    def pool_partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["cents"].to_numpy(np.int64)
        pos = pos[pos > 0]
        return pd.DataFrame({"n": [len(pos)], "s": [pos.sum()]})

    pool = filtered.map_batches(pool_partial, batch_format="pandas").to_pandas()
    n_pos, s_pos = int(pool["n"].sum()), int(pool["s"].sum())

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_orderpriority"].astype(str) == "1-URGENT"]
        k = np.unique(d["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "k": k,
                "nat": np.full(len(k), -1, dtype=np.int64),
                "cents": np.zeros(len(k), dtype=np.int64),
                "is_order": np.ones(len(k), dtype=np.int64),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(order_rows, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        ordered = set(g.loc[g["is_order"] == 1, "k"].tolist())
        c = g[g["is_order"] == 0]
        keep = (~c["k"].isin(ordered)) & (
            c["cents"].to_numpy(np.int64) * n_pos > s_pos
        )
        c = c[keep]
        return c.groupby("nat", as_index=False).agg(
            numcust=("k", "size"), s_cents=("cents", "sum")
        )

    parts = hash_combine(filtered.union(orders), ["k"], combine).to_pandas()
    out = parts.groupby("nat", as_index=False).sum()
    out["numcust"] = out["numcust"].astype(np.int64)
    out["totacctbal"] = out["s_cents"].to_numpy(np.float64) / 100.0
    out = out.rename(columns={"nat": "cntrycode"})
    return out.sort_values("cntrycode", ignore_index=True)[
        ["cntrycode", "numcust", "totacctbal"]
    ]


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for shipdates in 1996 —
    a two-aggregate division over a dimension-filtered fact stream.

    The part side is dimension-sized, so it never shuffles: the PROMO
    partkey set rides ONE ``ray.put`` broadcast and the fact scan tests
    membership vectorized per batch (the J2 broadcast-lookup pattern; at
    100 TB the set is ~2e8 int64 = 1.6 GB — still one object per node,
    or the bloom_semijoin path above if it outgrows that).  Revenue is
    the engine's exact integer form (cents * (100 - discount_pct)); the
    partial stream is ONE row per batch and the share is a single float
    chain over two exact int sums, mirrored op-for-op.  FK integrity
    (every l_partkey resolves) makes broadcast membership equivalent to
    the oracle's inner join — asserted in pytest, not assumed."""
    import ray as _ray

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    promo = part.loc[
        part["p_type"].astype(str).str.startswith("PROMO"), "p_partkey"
    ].to_numpy(np.int64)
    promo_ref = _ray.put(np.sort(promo))

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].astype("datetime64[us]").to_numpy()
        m = (sd >= lo) & (sd < hi)
        pk = df["l_partkey"].to_numpy(np.int64)[m]
        pc_ = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[m] * 100 + 0.5
        ).astype(np.int64)
        dc = np.floor(
            df["l_discount"].to_numpy(np.float64)[m] * 100 + 0.5
        ).astype(np.int64)
        rc = pc_ * (100 - dc)
        ps = _ray.get(promo_ref)
        isp = ps[np.clip(np.searchsorted(ps, pk), 0, len(ps) - 1)] == pk \
            if len(ps) else np.zeros(len(pk), dtype=bool)
        return pd.DataFrame(
            {"s_promo": [np.int64(rc[isp].sum())],
             "s_all": [np.int64(rc.sum())]}
        )

    t = li.map_batches(partial, batch_format="pandas").to_pandas().sum()
    sp, sa = np.float64(t["s_promo"]), np.float64(t["s_all"])
    share = np.sign(sp) * np.floor(np.abs(sp * 100.0 / sa) * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {
            "promo_share_pct": [np.float64(share)],
            "promo_revenue": [np.int64(t["s_promo"]) / 10000.0],
            "total_revenue": [np.int64(t["s_all"]) / 10000.0],
        }
    )
