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

from ..functions.scalars import round6_away as _r6away
from ..functions.shuffle import hash_combine, hash_join, typed_empty, typed_pandas

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

    out = typed_pandas(
        joined.map_batches(topk_part, batch_format="pandas"),
        {"orderkey": "int64", "o_orderdate": "datetime64[us]",
         "o_orderpriority": "object", "n_lines": "int64",
         "rev_u": "int64", "revenue": "float64"},
    )
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
    asia_sel = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    if len(asia_sel) == 0:  # empty dimension tables (q11 class)
        return typed_empty(n_name=object, revenue=np.float64)
    asia_key = asia_sel.iloc[0]
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

    out = typed_pandas(
        hash_combine(
            joined.map_batches(nation_partial, batch_format="pandas"),
            ["snat"],
            lambda g: g.groupby("snat", as_index=False)["rev_u"].sum(),
            num_partitions=4,
        ),
        {"snat": "int64", "rev_u": "int64"},
    )
    out["n_name"] = out["snat"].map(name_of)
    out["revenue"] = _r6away(out["rev_u"].to_numpy(dtype=np.float64) / 10000.0)
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

    pool = typed_pandas(
        filtered.map_batches(pool_partial, batch_format="pandas"),
        {"n": "int64", "s": "int64"},
    )
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

    parts = typed_pandas(
        hash_combine(filtered.union(orders), ["k"], combine),
        {"nat": "int64", "numcust": "int64", "s_cents": "int64"},
    )
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


# ----------------------------------------------------- Q18 large orders
def q18_large_orders(sf_dir: str, qty_threshold: int = 300) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds the threshold, joined back to order and customer
    attributes — the HAVING-filtered aggregate -> fact re-join composite.

    Shape: per-order int quantity partials ride ONE orderkey-hash
    exchange; the HAVING filter runs inside the combine, so only the
    (rare) qualifying orders — not the aggregate — leave the exchange; the
    tiny survivor set broadcasts back over the orders scan as a
    vectorized membership filter (the classic magic-set reduction; a
    second big-big exchange would ship every order row for a <0.1% hit
    rate), and customer names attach from a broadcast dimension map.
    Quantities are integral by data contract and ride as int64."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["l_quantity"].to_numpy(np.float64) + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"okey": df["l_orderkey"].to_numpy(np.int64), "q": q})
            .groupby("okey", as_index=False)["q"]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("okey", as_index=False)["q"].sum()
        return agg[agg["q"] > qty_threshold]

    big = hash_combine(
        li.map_batches(partial, batch_format="pandas"), ["okey"], combine
    ).to_pandas()
    qty_map = dict(zip(big["okey"].astype(np.int64), big["q"].astype(np.int64)))
    keys = np.sort(big["okey"].to_numpy(np.int64))
    keys_ref = ray.put(keys)

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    name_map_ref = ray.put(
        dict(zip(cust["c_custkey"].astype(np.int64), cust["c_name"].astype(str)))
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        ok = df["o_orderkey"].to_numpy(np.int64)
        m = (
            ks[np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)] == ok
            if len(ks)
            else np.zeros(len(ok), dtype=bool)
        )
        keep = df[m]
        names = ray.get(name_map_ref)
        cents = np.floor(
            keep["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "c_name": keep["o_custkey"].map(names).astype(str),
                "o_custkey": keep["o_custkey"].astype(np.int64),
                "l_orderkey": keep["o_orderkey"].astype(np.int64),
                "o_orderdate": keep["o_orderdate"],
                "total_price": cents / 100.0,
                "sum_qty": keep["o_orderkey"].map(qty_map).astype(np.int64),
            }
        )

    out = orders.map_batches(attach, batch_format="pandas").to_pandas()
    return out.sort_values("l_orderkey", ignore_index=True)


# -------------------------------------------------- Q16 supplier counts
def q16_supplier_cnt(
    sf_dir: str, exclude_brand: str = "Brand#11"
) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each
    (brand, size) part class, excluding one brand — the COUNT(DISTINCT)
    over a dimension-decorated big scan.

    Shape: part attributes broadcast once as int-indexed arrays (the
    dimension side never shuffles); each lineitem batch maps partkey ->
    (brand, size) vectorized, dedups (brand, size, supplier) locally, and
    the triples ride ONE (brand, size)-hash exchange where the combine
    finishes the distinct count — every (brand, size) class lives in
    exactly one partition, so counts need no second pass."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    part = part[part["p_brand"].astype(str) != exclude_brand]
    pk = part["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk)
    attrs_ref = ray.put(
        (
            pk[order],
            part["p_brand"].astype(str).to_numpy()[order],
            part["p_size"].to_numpy(np.int64)[order],
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, brand, size = ray.get(attrs_ref)
        pkv = df["l_partkey"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(keys, pkv), 0, len(keys) - 1)
        m = keys[idx] == pkv  # drops the excluded brand's parts
        return pd.DataFrame(
            {
                "p_brand": brand[idx[m]],
                "p_size": size[idx[m]],
                "supp": df["l_suppkey"].to_numpy(np.int64)[m],
            }
        ).drop_duplicates()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop_duplicates()
            .groupby(["p_brand", "p_size"], as_index=False)["supp"]
            .nunique()
            .rename(columns={"supp": "supplier_cnt"})
        )

    out = typed_pandas(
        hash_combine(
            li.map_batches(partial, batch_format="pandas"),
            ["p_brand", "p_size"],
            combine,
        ),
        {"p_brand": "object", "p_size": "int64", "supplier_cnt": "int64"},
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(["p_brand", "p_size"], ignore_index=True)


# ------------------------------------------------- Q10 returned items
def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item report): revenue of RETURNED lines
    per customer, top-k customers with their attributes — a big-big join
    RE-KEYED into a second aggregation on a different key than the join
    key (orderkey -> custkey), the composite the Q3-shaped
    ``join_topk_revenue`` doesn't exercise.

    Shape: returnflag filter pushed to the parquet scan; per-order int
    revenue partials join orders via the ONE orderkey hash exchange;
    inside the join partitions rows re-key to custkey and pre-aggregate,
    so the second (custkey) exchange ships at most one row per (customer,
    partition); per-partition top-k bounds the driver merge at O(P*k).
    Ties at rank k break on custkey (mirrored in the oracle)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == pc.scalar("R"),
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        ep_c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dm = np.floor(
            df["l_discount"].to_numpy(np.float64) * 1000 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "okey": df["l_orderkey"].to_numpy(np.int64),
                    "rev_u": ep_c * (1000 - dm),
                }
            )
            .groupby("okey", as_index=False)["rev_u"]
            .sum()
        )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "custkey": df["o_custkey"].to_numpy(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("custkey", as_index=False)["rev_u"].sum()

    per_cust = hash_combine(
        joined.map_batches(rekey, batch_format="pandas"),
        ["custkey"],
        lambda g: g.groupby("custkey", as_index=False)["rev_u"]
        .sum()
        .sort_values(["rev_u", "custkey"], ascending=[False, True],
                     kind="mergesort")
        .head(k),
    )
    per_cust = typed_pandas(per_cust, {"custkey": "int64",
                                       "rev_u": "int64"})

    top = (
        per_cust.sort_values(["rev_u", "custkey"], ascending=[False, True],
                             kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    ).set_index("c_custkey")
    picked = cust.loc[top["custkey"].to_numpy(np.int64)]
    return pd.DataFrame(
        {
            "c_custkey": top["custkey"].astype(np.int64),
            "c_name": picked["c_name"].astype(str).to_numpy(),
            "c_nationkey": picked["c_nationkey"].to_numpy(np.int64),
            "c_acctbal": np.floor(
                picked["c_acctbal"].to_numpy(np.float64) * 100 + 0.5
            ).astype(np.int64)
            / 100.0,
            "revenue": top["rev_u"].to_numpy(np.int64) / 100000.0,
        }
    )


# ------------------------------------------------ Q7 nation volume
def q7_nation_volume(
    sf_dir: str,
    supp_nations: tuple = (1, 2),
    cust_nations: tuple = (3, 4),
) -> pd.DataFrame:
    """TPC-H Q7 shape (volume shipping): returned revenue per
    (supplier nation, customer nation, ship year) for selected nation
    pairs — a fact-fact join decorated by TWO broadcast dimensions.

    Shape: supplier->nation and nation-name maps broadcast once
    (dimension side); lineitem rows pre-filter on supplier nation and
    pre-aggregate to (okey, snat, year) int partials BEFORE the one
    orderkey exchange; orders carry custkey; inside the join partitions
    the customer-nation filter (broadcast) drops non-selected pairs and
    the tiny (snat, cnat, year) table sums on the driver."""
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    s_sel = supp[supp["s_nationkey"].isin(list(supp_nations))]
    sk = s_sel["s_suppkey"].to_numpy(np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], s_sel["s_nationkey"].to_numpy(np.int64)[so]))

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    c_sel = cust[cust["c_nationkey"].isin(list(cust_nations))]
    ck = c_sel["c_custkey"].to_numpy(np.int64)
    co = np.argsort(ck)
    cust_ref = ray.put((ck[co], c_sel["c_nationkey"].to_numpy(np.int64)[co]))

    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nname = dict(zip(nation["n_nationkey"].astype(np.int64),
                     nation["n_name"].astype(str)))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        keys, nats = ray.get(supp_ref)
        sv = df["l_suppkey"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(keys, sv), 0, max(len(keys) - 1, 0))
        m = keys[idx] == sv if len(keys) else np.zeros(len(sv), dtype=bool)
        d = df[m]
        ep_c = np.floor(
            d["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dm = np.floor(d["l_discount"].to_numpy(np.float64) * 1000 + 0.5).astype(
            np.int64
        )
        year = d["l_shipdate"].dt.year.to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "okey": d["l_orderkey"].to_numpy(np.int64),
                    "snat": nats[idx[m]],
                    "year": year,
                    "rev_u": ep_c * (1000 - dm),
                }
            )
            .groupby(["okey", "snat", "year"], as_index=False)["rev_u"]
            .sum()
        )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        keys, nats = ray.get(cust_ref)
        cv = df["o_custkey"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(keys, cv), 0, max(len(keys) - 1, 0))
        m = keys[idx] == cv if len(keys) else np.zeros(len(cv), dtype=bool)
        d = df[m]
        return pd.DataFrame(
            {
                "okey": d["o_orderkey"].to_numpy(np.int64),
                "cnat": nats[idx[m]],
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )

    EMPTY = pd.DataFrame(
        {
            "snat": pd.Series([], dtype=np.int64),
            "cnat": pd.Series([], dtype=np.int64),
            "year": pd.Series([], dtype=np.int64),
            "rev_u": pd.Series([], dtype=np.int64),
        }
    )

    def part_agg(df: pd.DataFrame) -> pd.DataFrame:
        # an all-filtered partition arrives as a columnless empty block
        if len(df) == 0 or "snat" not in df.columns:
            return EMPTY.copy()
        return df.groupby(["snat", "cnat", "year"], as_index=False)[
            "rev_u"
        ].sum()

    agg = pd.concat(
        [EMPTY, joined.map_batches(part_agg, batch_format="pandas").to_pandas()]
    ).groupby(["snat", "cnat", "year"], as_index=False)["rev_u"].sum()
    return pd.DataFrame(
        {
            "supp_nation": agg["snat"].map(nname).astype(str),
            "cust_nation": agg["cnat"].map(nname).astype(str),
            "l_year": agg["year"].astype(np.int64),
            "revenue": agg["rev_u"].to_numpy(np.int64) / 100000.0,
        }
    ).sort_values(["supp_nation", "cust_nation", "l_year"], ignore_index=True)


# -------------------------------------------------- Q4 order priority
def q4_late_orders(sf_dir: str, grace_days: int = 30) -> pd.DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders with at least one
    line shipped more than ``grace_days`` after the order date, counted
    per priority — the correlated-EXISTS composite, rewritten as a
    per-key MAX reduction + join (EXISTS(ship > odate+g) <=> max(ship) >
    odate+g), so the big side ships ONE row per order into the exchange
    instead of a semi-join probe per line.

    Shape: per-order max-shipdate int partials -> one orderkey hash
    exchange joining the orders stream (aligned-union form via
    hash_join); the priority counts are 5-row partials summed on the
    driver.  All comparisons are int64 microseconds."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        us = df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        return (
            pd.DataFrame(
                {"okey": df["l_orderkey"].to_numpy(np.int64), "max_ship": us}
            )
            .groupby("okey", as_index=False)["max_ship"]
            .max()
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "odate": df["o_orderdate"]
                .astype("datetime64[us]")
                .astype(np.int64),
                "priority": df["o_orderpriority"].astype(str),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )
    grace_us = grace_days * 24 * 3600 * 1_000_000

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "max_ship" not in df.columns:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype=str),
                    "order_count": pd.Series([], dtype=np.int64),
                }
            )
        # li_prep emits per-BATCH maxima, so an order can arrive as
        # several rows; the join partition holds ALL of them — finish the
        # max here before testing the grace window
        g = df.groupby(["okey", "odate", "priority"], as_index=False)[
            "max_ship"
        ].max()
        late = g[
            g["max_ship"].to_numpy(np.int64)
            > g["odate"].to_numpy(np.int64) + grace_us
        ]
        return (
            late.groupby("priority", sort=False)
            .size()
            .rename("order_count")
            .reset_index()
            .rename(columns={"priority": "o_orderpriority"})
        )

    out = (
        typed_pandas(
            joined.map_batches(part_counts, batch_format="pandas"),
            {"o_orderpriority": "object", "order_count": "int64"},
        )
        .groupby("o_orderpriority", as_index=False)["order_count"]
        .sum()
    )
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("o_orderpriority", ignore_index=True)


# ---------------------------------------------------- Q6 filter-agg
def q6_revenue_delta(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): one predicate-heavy
    filter + global aggregate — the canonical read-pruning benchmark.
    Ship-date and quantity predicates push into the parquet scan (row
    groups outside 1997 never leave storage); the discount band filters
    on the exact milli lattice in the map; revenue delta accumulates as
    int64 cents x milli-discount, ONE division at the end."""
    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pc.scalar(lo))
            & (pc.field("l_shipdate") < pc.scalar(hi))
            & (pc.field("l_quantity") < pc.scalar(24.0))
        ),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dm = np.floor(df["l_discount"].to_numpy(np.float64) * 1000 + 0.5).astype(
            np.int64
        )
        m = (dm >= 50) & (dm <= 70)
        ep = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[m] * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {"n": [np.int64(m.sum())], "s": [np.int64((ep * dm[m]).sum())]}
        )

    t = li.map_batches(partial, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame(
        {
            "n_lines": [np.int64(t["n"])],
            "revenue_delta": [np.int64(t["s"]) / 100000.0],
        }
    )


# ------------------------------------------------ Q13 count histogram
def q13_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    order counts INCLUDING the zero class — the double-groupby +
    left-outer-count composite.

    Scale shape: per-batch custkey value_counts partials -> one custkey
    hash exchange; each combine partition then reduces its per-customer
    counts to a count-of-counts partial, so only |distinct count values|
    rows (bounded by the max orders any customer has) reach the driver.
    The zero class is set difference by CARDINALITY (total customers -
    customers with >=1 order) — no customer-side join ships at all."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_custkey"].value_counts()
        return pd.DataFrame(
            {"c": v.index.to_numpy(np.int64), "cnt": v.to_numpy(np.int64)}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("c", as_index=False)["cnt"].sum()
        h = per_cust["cnt"].value_counts()
        return pd.DataFrame(
            {
                "c_count": h.index.to_numpy(np.int64),
                "custdist": h.to_numpy(np.int64),
            }
        )

    hist = (
        hash_combine(orders.map_batches(partial, batch_format="pandas"),
                     ["c"], combine)
        .to_pandas()
        .groupby("c_count", as_index=False)["custdist"]
        .sum()
    )
    n_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    zero = n_cust - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False], ignore_index=True
    )


# --------------------------------------- Q17 correlated-avg threshold
def q17_small_qty_revenue(sf_dir: str, brand: str = "Brand#23") -> pd.DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue of lines
    whose quantity is below 20% of the per-part average — the correlated
    scalar-aggregate threshold, done as two passes with a BROADCAST
    per-part threshold instead of a correlated re-join.

    Exactness: quantities are integral, so qty < 0.2 * (S/n) is the
    INTEGER comparison 5*qty*n < S — no float enters the predicate.
    Scale shape: pass 1 builds per-part (S, n) partials for the brand's
    parts only (part side filters BEFORE the scan via a broadcast partkey
    set, bounded by |parts of one brand|); the reduced threshold table
    rides ``ray.put`` into pass 2's scan, which accumulates int64 cents.
    avg_yearly is ONE division (cents / 700.0) mirrored in the oracle."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    bp = set(part.loc[part["p_brand"].astype(str) == brand, "p_partkey"]
             .astype(np.int64))
    bp_ref = ray.put(bp)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["l_partkey"].to_numpy(np.int64)
        m = np.isin(pk, np.fromiter(ray.get(bp_ref), np.int64))
        q = np.floor(df["l_quantity"].to_numpy(np.float64)[m] + 0.5).astype(
            np.int64
        )
        return (
            pd.DataFrame({"pk": pk[m], "s": q, "n": np.int64(1)})
            .groupby("pk", as_index=False)[["s", "n"]]
            .sum()
        )

    thr = (
        typed_pandas(
            hash_combine(
                li.map_batches(qty_partial, batch_format="pandas"),
                ["pk"],
                lambda g: g.groupby("pk", as_index=False)[["s", "n"]].sum(),
                num_partitions=8,
            ),
            {"pk": "int64", "s": "int64", "n": "int64"},
        )
        .groupby("pk", as_index=False)[["s", "n"]]
        .sum()
    )
    thr_ref = ray.put(thr.set_index("pk"))

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        m = np.isin(pk, t.index.to_numpy(np.int64))
        if not m.any():
            return pd.DataFrame({"n": [np.int64(0)], "s": [np.int64(0)]})
        sub = t.loc[pk[m]]
        q = np.floor(df["l_quantity"].to_numpy(np.float64)[m] + 0.5).astype(
            np.int64
        )
        keep = 5 * q * sub["n"].to_numpy(np.int64) < sub["s"].to_numpy(
            np.int64
        )
        ep = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[m][keep] * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {"n": [np.int64(keep.sum())], "s": [np.int64(ep.sum())]}
        )

    t = li.map_batches(rev_partial, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame(
        {
            "n_lines": [np.int64(t["n"])],
            "avg_yearly": [np.int64(t["s"]) / 700.0],
        }
    )


# --------------------------------------------- Q15 argmax-over-aggregate
def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue over one
    quarter, returning the MAX-revenue supplier(s) WITH ties — argmax
    over a distributed aggregate.

    Scale shape: date-pruned scan -> per-batch (suppkey, rev_u) int
    partials -> one suppkey hash exchange; each combine partition emits
    only its LOCAL max row(s), so the driver reduces |partitions| rows,
    never |suppliers|. Names join from the tiny supplier table on the
    driver."""
    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1997-04-01")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= pc.scalar(lo))
        & (pc.field("l_shipdate") < pc.scalar(hi)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ep = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dm = np.floor(
            df["l_discount"].to_numpy(np.float64) * 1000 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"sk": df["l_suppkey"].to_numpy(np.int64),
                 "u": ep * (1000 - dm)}
            )
            .groupby("sk", as_index=False)["u"]
            .sum()
        )

    def local_max(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("sk", as_index=False)["u"].sum()
        if len(per) == 0:
            return per
        return per[per["u"] == per["u"].max()]

    cand = typed_pandas(
        hash_combine(
            li.map_batches(partial, batch_format="pandas"), ["sk"],
            local_max, num_partitions=8,
        ),
        {"sk": "int64", "u": "int64"},
    )
    best = cand[cand["u"] == cand["u"].max()]
    names = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).set_index("s_suppkey")["s_name"]
    out = pd.DataFrame(
        {
            "s_suppkey": best["sk"].to_numpy(np.int64),
            "s_name": best["sk"].map(names).astype(str),
            "total_revenue": best["u"].to_numpy(np.int64) / 100000.0,
        }
    )
    return out.sort_values("s_suppkey", ignore_index=True)


# ------------------------------------------------- Q19 OR-band revenue
_Q19_BANDS = (
    ("Brand#12", 1, 15, 1, 20),
    ("Brand#23", 5, 25, 1, 35),
    ("Brand#31", 15, 40, 1, 50),
)


def q19_banded_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR of predicate bands):
    revenue of lines matching ANY (brand, quantity-range, size-range)
    band — the disjunctive multi-attribute predicate composite.

    Scale shape: the part side reduces to a partkey -> (q_lo, q_hi)
    band map on the driver (brands are disjoint per part, so each part
    carries at most one band) and rides ``ray.put``; the fact scan
    filters and accumulates int64 cents x (1000 - milli-discount)
    per batch, so only 2 ints per batch leave the scan — the OR never
    becomes a join or a second pass."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pb = part["p_brand"].astype(str)
    sz = part["p_size"].to_numpy(np.int64)
    qlo = np.full(len(part), -1, np.int64)
    qhi = np.full(len(part), -1, np.int64)
    for brand, b_qlo, b_qhi, s_lo, s_hi in _Q19_BANDS:
        m = (pb == brand).to_numpy() & (sz >= s_lo) & (sz <= s_hi)
        qlo[m] = b_qlo
        qhi[m] = b_qhi
    band = pd.DataFrame(
        {
            "pk": part["p_partkey"].to_numpy(np.int64)[qlo >= 0],
            "qlo": qlo[qlo >= 0],
            "qhi": qhi[qlo >= 0],
        }
    ).set_index("pk")
    band_ref = ray.put(band)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(band_ref)
        pk = df["l_partkey"].to_numpy(np.int64)
        m = np.isin(pk, b.index.to_numpy(np.int64))
        if not m.any():
            return pd.DataFrame({"n": [np.int64(0)], "s": [np.int64(0)]})
        sub = b.loc[pk[m]]
        q = np.floor(df["l_quantity"].to_numpy(np.float64)[m] + 0.5).astype(
            np.int64
        )
        keep = (q >= sub["qlo"].to_numpy(np.int64)) & (
            q <= sub["qhi"].to_numpy(np.int64)
        )
        ep = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[m][keep] * 100 + 0.5
        ).astype(np.int64)
        dm = np.floor(
            df["l_discount"].to_numpy(np.float64)[m][keep] * 1000 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(keep.sum())],
                "s": [np.int64((ep * (1000 - dm)).sum())],
            }
        )

    t = li.map_batches(partial, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame(
        {
            "n_lines": [np.int64(t["n"])],
            "revenue": [np.int64(t["s"]) / 100000.0],
        }
    )


# ------------------------------------------------- Q8 market share
def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    ptype: str = "STANDARD",
    nation: str = "NATION_19",
) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): of the revenue from a
    region's customers buying a part type, the fraction supplied by one
    nation, per order year — the conditional-sum ratio over a multi-way
    join.

    Scale shape: part-type partkeys, region custkeys, and the supplier ->
    is-target-nation map are all small-side ``ray.put`` broadcasts into
    the two fact scans; the ONE all-to-all is (filtered lineitem) x
    (filtered orders) on orderkey. Revenue rides as int64 cents x
    (1000 - milli) split into (total, target) lanes per year inside the
    join partitions, so only |years| x 2 ints reach the driver; the share
    is ONE int/int division + round(6) mirrored in the oracle."""
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk_sel = reg.loc[reg["r_name"].astype(str) == region, "r_regionkey"]
    nk_sel = nat.loc[nat["n_name"].astype(str) == nation, "n_nationkey"]
    if len(rk_sel) == 0 or len(nk_sel) == 0:  # empty dims (q11 class)
        return typed_empty(o_year=np.int64, mkt_share=np.float64,
                           total_revenue=np.float64)
    rk = rk_sel.iloc[0]
    region_nations = set(
        nat.loc[nat["n_regionkey"] == rk, "n_nationkey"].astype(np.int64)
    )
    target_key = int(nk_sel.iloc[0])

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust.loc[
        cust["c_nationkey"].astype(np.int64).isin(region_nations), "c_custkey"
    ].to_numpy(np.int64)
    ck_ref = ray.put(ck)

    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = part.loc[part["p_type"].astype(str) == ptype, "p_partkey"].to_numpy(
        np.int64
    )
    pk_ref = ray.put(pk)

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    tgt = supp.loc[
        supp["s_nationkey"].astype(np.int64) == target_key, "s_suppkey"
    ].to_numpy(np.int64)
    tgt_ref = ray.put(tgt)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(df["o_custkey"].to_numpy(np.int64), ray.get(ck_ref))
        d = df[keep]
        return pd.DataFrame(
            {
                "okey": d["o_orderkey"].to_numpy(np.int64),
                "o_year": d["o_orderdate"]
                .astype("datetime64[us]")
                .dt.year.to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(df["l_partkey"].to_numpy(np.int64), ray.get(pk_ref))
        d = df[keep]
        ep = np.floor(
            d["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dm = np.floor(
            d["l_discount"].to_numpy(np.float64) * 1000 + 0.5
        ).astype(np.int64)
        u = ep * (1000 - dm)
        is_t = np.isin(d["l_suppkey"].to_numpy(np.int64), ray.get(tgt_ref))
        return (
            pd.DataFrame(
                {"okey": d["l_orderkey"].to_numpy(np.int64), "u": u,
                 "t": np.where(is_t, u, 0)}
            )
            .groupby("okey", as_index=False)[["u", "t"]]
            .sum()
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "o_year" not in df.columns:
            return pd.DataFrame(
                {"o_year": pd.Series([], dtype=np.int64),
                 "u": pd.Series([], dtype=np.int64),
                 "t": pd.Series([], dtype=np.int64)}
            )
        return df.groupby("o_year", as_index=False)[["u", "t"]].sum()

    agg = (
        typed_pandas(
            joined.map_batches(year_partial, batch_format="pandas"),
            {"o_year": "int64", "u": "int64", "t": "int64"},
        )
        .groupby("o_year", as_index=False)[["u", "t"]]
        .sum()
    )
    # half-AWAY rounding to match DuckDB ROUND exactly (shares are >= 0)
    ratio = agg["t"].to_numpy(np.int64) / agg["u"].to_numpy(np.int64)
    share = np.floor(ratio * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {
            "o_year": agg["o_year"].to_numpy(np.int64),
            "mkt_share": share,
            "total_revenue": agg["u"].to_numpy(np.int64) / 100000.0,
        }
    ).sort_values("o_year", ignore_index=True)


# -------------------------------------------- Q9 profit by nation/year
def q9_nation_profit(sf_dir: str, keyword: str = "red") -> pd.DataFrame:
    """TPC-H Q9 shape (product-type profit): discounted revenue per
    (supplier nation, order year) for parts whose name contains
    ``keyword`` — the five-table star composite (part + supplier +
    nation broadcast dimensions, lineitem x orders big-big fact join).
    The testdata carries no partsupp/supplycost, so profit degenerates
    to ep x (1 - discount); the SHAPE (two broadcast prunes feeding one
    orderkey exchange) is the Q9 plan.
    Reference parity: the reference composites dimension rasters onto a
    date-keyed fact the same one-fact-exchange way
    (ECOv003-L2T-STARS/L2T_STARS.py generate_STARS_inputs).

    Determinism: profit accumulates as int64 cents x (100 - disc%);
    ONE division on the |nations| x |years| driver table."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    pk = np.sort(
        part.loc[
            part["p_name"].astype(str).str.contains(keyword, regex=False),
            "p_partkey",
        ].to_numpy(np.int64)
    )
    pk_ref = ray.put(pk)

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy(np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], supp["s_nationkey"].to_numpy(np.int64)[so]))
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nname = dict(
        zip(nation["n_nationkey"].astype(np.int64), nation["n_name"].astype(str))
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        parts = ray.get(pk_ref)
        pv = df["l_partkey"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(parts, pv), 0, max(len(parts) - 1, 0))
        m = parts[idx] == pv if len(parts) else np.zeros(len(pv), dtype=bool)
        d = df[m]
        keys, nats = ray.get(supp_ref)
        sv = d["l_suppkey"].to_numpy(np.int64)
        si = np.searchsorted(keys, sv)
        ep_c = np.floor(
            d["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dc = np.floor(
            d["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "okey": d["l_orderkey"].to_numpy(np.int64),
                    "snat": nats[si],
                    "profit_u": ep_c * (100 - dc),
                }
            )
            .groupby(["okey", "snat"], as_index=False)["profit_u"]
            .sum()
        )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )

    EMPTY = pd.DataFrame(
        {
            "snat": pd.Series([], dtype=np.int64),
            "o_year": pd.Series([], dtype=np.int64),
            "profit_u": pd.Series([], dtype=np.int64),
        }
    )

    def part_agg(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "snat" not in df.columns:
            return EMPTY.copy()
        d = df[df["profit_u"].notna()]
        return d.groupby(["snat", "o_year"], as_index=False)["profit_u"].sum()

    agg = (
        pd.concat(
            [EMPTY,
             joined.map_batches(part_agg, batch_format="pandas").to_pandas()]
        )
        .groupby(["snat", "o_year"], as_index=False)["profit_u"]
        .sum()
    )
    return pd.DataFrame(
        {
            "nation": agg["snat"].map(nname).astype(str),
            "o_year": agg["o_year"].astype(np.int64),
            "profit_u": agg["profit_u"].astype(np.int64),
            "profit": agg["profit_u"].to_numpy(np.int64) / 10000.0,
        }
    ).sort_values(["nation", "o_year"], ignore_index=True)


# --------------------------------------- Q11 global-share concentration
def q11_concentrated_parts(
    sf_dir: str, denom: int | None = None
) -> pd.DataFrame:
    """TPC-H Q11 shape (important stock): parts whose total discounted
    lineitem value exceeds 1.25x the MEAN part share of the GLOBAL
    total — the HAVING-against-a-global-scalar-subquery composite.  The
    testdata has no partsupp, so "stock value" is the part's lineitem
    revenue; the plan shape (grouped aggregate filtered by a second,
    global aggregate of the same stream) is Q11's.

    The threshold is SCALE-FREE: with ``denom=None`` (default) it is
    derived from the data as value_u * 4 * n_parts > 5 * total, i.e.
    "share > 1.25x the mean share" at EVERY sf (the r4 fixed
    ``denom=1600`` encoded that ratio only for sf0.01's 2,000 parts and
    left zero survivors at sf0.1 — VERDICT r4 item 1).  An explicit
    ``denom`` keeps the old fixed 1/denom-of-total semantics for tests.

    Exactness: the share test is evaluated ENTIRELY in integers —
    u * d > T  <=>  u > T // d for positive ints (u > floor(T/d) <=>
    u >= floor(T/d)+1 <=> u*d >= d*(floor(T/d)+1) > T; u <= floor(T/d)
    gives u*d <= T), so no float threshold ever exists; the driver
    computes T and d in unbounded Python ints, the oracle in HUGEINT.
    Shape: one partkey hash exchange builds the bounded per-part table
    ONCE (materialized — it is the reduced output, |parts| rows, not
    the fact stream); the global total and part count reduce from the
    same table; the filter is a broadcast-scalar map.  The empty path
    is TYPED (reindex over the declared columns) so a threshold that
    eliminates every part yields a 0-row frame, never a KeyError."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ep_c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dc = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "partkey": df["l_partkey"].to_numpy(np.int64),
                    "value_u": ep_c * (100 - dc),
                }
            )
            .groupby("partkey", as_index=False)["value_u"]
            .sum()
        )

    per_part = hash_combine(
        li.map_batches(partial, batch_format="pandas"),
        ["partkey"],
        lambda g: g.groupby("partkey", as_index=False)["value_u"].sum(),
    ).materialize()  # bounded: |parts| rows (the REDUCED table, reused twice)

    sums = per_part.map_batches(
        lambda df: pd.DataFrame(
            {"s": [np.int64(df["value_u"].sum())], "n": [np.int64(len(df))]}
        ),
        batch_format="pandas",
    ).to_pandas()
    if len(sums) == 0:  # all rows filtered upstream (q11 class)
        return typed_empty(partkey=np.int64, value_u=np.int64,
                           part_value=np.float64)
    total = int(sums["s"].sum())
    n_parts = int(sums["n"].sum())
    if denom is None:
        # scale-free: u * (4*n_parts) > 5*total  <=>  u > (5*total)//(4*n)
        thr = (5 * total) // (4 * n_parts) if n_parts else 0
    else:
        thr = total // denom  # u*denom > total  <=>  u > thr (ints)

    out = (
        per_part.map_batches(
            lambda df: df[df["value_u"].to_numpy(np.int64) > thr],
            batch_format="pandas",
        )
        .to_pandas()
        .reindex(columns=["partkey", "value_u"])  # typed even when empty
        .sort_values(["value_u", "partkey"], ascending=[False, True],
                     ignore_index=True)
    )
    out["partkey"] = out["partkey"].astype(np.int64)
    out["value_u"] = out["value_u"].astype(np.int64)
    out["part_value"] = out["value_u"].to_numpy(np.int64) / 10000.0
    return out


# ------------------------------------------- Q21 sole-late supplier
def q21_sole_late_supplier(sf_dir: str, grace_days: int = 30) -> pd.DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    multi-supplier orders where EXACTLY ONE supplier shipped any line
    more than ``grace_days`` after the order date, count such orders per
    offending supplier — the EXISTS(other supplier) AND NOT
    EXISTS(other LATE supplier) double-correlated composite, rewritten
    as a per-order grouped reduction (n_suppliers, n_late, the sole
    late suppkey) so each order crosses the exchange as one row per
    (order, supplier) instead of a per-line semi-join probe.  The
    testdata has no commit/receipt dates, so "late" is shipdate >
    orderdate + grace (the Q4 lateness convention).

    Shape: per-(okey, skey) max-shipdate partials -> ONE orderkey hash
    exchange joined with the orders date stream; each partition reduces
    its orders to per-supplier wait counts (|suppliers|-bounded), the
    driver sums and decorates names from the broadcast supplier table."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "okey": df["l_orderkey"].to_numpy(np.int64),
                    "skey": df["l_suppkey"].to_numpy(np.int64),
                    "max_ship": df["l_shipdate"]
                    .astype("datetime64[us]")
                    .astype(np.int64),
                }
            )
            .groupby(["okey", "skey"], as_index=False)["max_ship"]
            .max()
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "odate": df["o_orderdate"]
                .astype("datetime64[us]")
                .astype(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )
    grace_us = grace_days * 24 * 3600 * 1_000_000

    EMPTY = pd.DataFrame(
        {
            "skey": pd.Series([], dtype=np.int64),
            "numwait": pd.Series([], dtype=np.int64),
        }
    )

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "max_ship" not in df.columns:
            return EMPTY.copy()
        # li_prep emits per-BATCH maxima: finish the per-(okey, skey) max
        # first, then reduce each order to (n_supp, n_late, sole suppkey)
        g = df.groupby(["okey", "odate", "skey"], as_index=False)[
            "max_ship"
        ].max()
        g["late"] = (
            g["max_ship"].to_numpy(np.int64)
            > g["odate"].to_numpy(np.int64) + grace_us
        ).astype(np.int64)
        o = g.groupby("okey").agg(
            n_supp=("skey", "size"),
            n_late=("late", "sum"),
            late_skey=("skey", "first"),  # placeholder, fixed below
        )
        # the sole late suppkey: max over late rows only (exactly one
        # late row when the filter keeps the order, so max == that key)
        lk = (
            g[g["late"] == 1]
            .groupby("okey")["skey"]
            .max()
            .reindex(o.index, fill_value=-1)
        )
        hit = o[(o["n_supp"] > 1) & (o["n_late"] == 1)]
        w = lk.loc[hit.index].value_counts()
        return pd.DataFrame(
            {
                "skey": w.index.to_numpy(np.int64),
                "numwait": w.to_numpy(np.int64),
            }
        )

    agg = (
        pd.concat(
            [EMPTY,
             joined.map_batches(part_counts, batch_format="pandas").to_pandas()]
        )
        .groupby("skey", as_index=False)["numwait"]
        .sum()
    )
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    sname = dict(
        zip(supp["s_suppkey"].astype(np.int64), supp["s_name"].astype(str))
    )
    out = pd.DataFrame(
        {
            "s_name": agg["skey"].map(sname).astype(str),
            "numwait": agg["numwait"].astype(np.int64),
        }
    )
    return out.sort_values(
        ["numwait", "s_name"], ascending=[False, True], ignore_index=True
    )


def q2_min_cost_supplier(
    sf_dir: str, region: str = "EUROPE", size_max: int = 10, k: int = 100
) -> pd.DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for every part in a slice
    (p_size <= ``size_max``), the supplier(s) inside ``region`` offering
    the minimum supply cost, reported with supplier account details and
    ordered by account balance.  The testdata carries no partsupp, so
    supply cost is derived as the pair's minimum observed line price
    (MIN extendedprice cents per (part, supplier)) — the SHAPE (correlated
    argmin-per-part subquery + region-pruned dimension chain + all-tie
    retention + top-k) is the Q2 plan.
    Reference parity: the reference's per-tile best-source selection
    (ECOv003-L2T-STARS/L2T_STARS.py VNP43NRT vs calibrated-GEOS fallback)
    is the same argmin-join-back pattern on a coarser axis.

    Determinism: costs are int64 cents end-to-end; ONE division for the
    reported min_cost; total order (s_acctbal DESC, n_name, s_name,
    partkey) is unique, so LIMIT k is stable."""
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkeys = set(
        reg.loc[reg["r_name"] == region, "r_regionkey"].astype(np.int64)
    )
    nat = nation[nation["n_regionkey"].astype(np.int64).isin(rkeys)]
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    supp = supp.merge(
        nat[["n_nationkey", "n_name"]],
        left_on="s_nationkey",
        right_on="n_nationkey",
    )
    sk_arr = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sk_ref = ray.put(sk_arr)

    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    pk_arr = np.sort(
        part.loc[
            part["p_size"].astype(np.int64) <= size_max, "p_partkey"
        ].to_numpy(np.int64)
    )
    pk_ref = ray.put(pk_arr)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def _member(sorted_keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(sorted_keys) == 0:
            return np.zeros(len(vals), dtype=bool)
        idx = np.clip(np.searchsorted(sorted_keys, vals), 0, len(sorted_keys) - 1)
        return sorted_keys[idx] == vals

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        # both broadcast prunes BEFORE the exchange; partial per-pair MIN
        pv = df["l_partkey"].to_numpy(np.int64)
        sv = df["l_suppkey"].to_numpy(np.int64)
        m = _member(ray.get(pk_ref), pv) & _member(ray.get(sk_ref), sv)
        d = df[m]
        cost_u = np.floor(
            d["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "partkey": d["l_partkey"].to_numpy(np.int64),
                    "sk": d["l_suppkey"].to_numpy(np.int64),
                    "cost_u": cost_u,
                }
            )
            .groupby(["partkey", "sk"], as_index=False)["cost_u"]
            .min()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a partkey land in one partition: finish the pair
        # MIN, then keep every supplier tied at the per-part minimum
        ps = g.groupby(["partkey", "sk"], as_index=False)["cost_u"].min()
        mc = ps.groupby("partkey")["cost_u"].transform("min")
        return ps[ps["cost_u"] == mc]

    best = hash_combine(
        li.map_batches(li_prep, batch_format="pandas"), ["partkey"], combine
    ).to_pandas()
    if len(best) == 0:
        return pd.DataFrame(
            {
                "s_acctbal": pd.Series([], dtype=np.float64),
                "s_name": pd.Series([], dtype=str),
                "n_name": pd.Series([], dtype=str),
                "partkey": pd.Series([], dtype=np.int64),
                "min_cost": pd.Series([], dtype=np.float64),
            }
        )
    out = best.merge(
        supp[["s_suppkey", "s_name", "s_acctbal", "n_name"]],
        left_on="sk",
        right_on="s_suppkey",
    )
    out = pd.DataFrame(
        {
            "s_acctbal": out["s_acctbal"].to_numpy(np.float64),
            "s_name": out["s_name"].astype(str),
            "n_name": out["n_name"].astype(str),
            "partkey": out["partkey"].astype(np.int64),
            "min_cost": out["cost_u"].to_numpy(np.int64) / 100.0,
        }
    ).sort_values(
        ["s_acctbal", "n_name", "s_name", "partkey"],
        ascending=[False, True, True, True],
        ignore_index=True,
    )
    return out.head(k).reset_index(drop=True)


def q12_delay_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (shipmode priority split): lineitem x orders
    big-big join, lines bucketed by ship delay band (the testdata has no
    l_shipmode, so the band over shipdate - orderdate replaces it), and
    per band the CASE-sum split of urgent/high vs lower priorities.
    Reference parity: the reference buckets composite inputs by
    acquisition lag the same way (coarse date-offset classes) when
    choosing fusion sources (ECOv003-L2T-STARS/L2T_STARS.py).

    Determinism: pure int64 day arithmetic and counts; band edges at
    30/90 days; floor division matches DuckDB ``//``."""
    US_PER_DAY = 86_400_000_000
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "ship_us": df["l_shipdate"]
                .astype("datetime64[us]")
                .astype(np.int64)
                .to_numpy(),
            }
        )

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        pri = df["o_orderpriority"].astype(str).to_numpy()
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].to_numpy(np.int64),
                "ord_us": df["o_orderdate"]
                .astype("datetime64[us]")
                .astype(np.int64)
                .to_numpy(),
                "high": np.isin(pri, ["1-URGENT", "2-HIGH"]).astype(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(o_prep, batch_format="pandas"),
        on=["okey"],
    )

    EMPTY = pd.DataFrame(
        {
            "band": pd.Series([], dtype=str),
            "high_line_count": pd.Series([], dtype=np.int64),
            "low_line_count": pd.Series([], dtype=np.int64),
        }
    )

    def part_agg(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "ship_us" not in df.columns:
            return EMPTY.copy()
        d = df[df["ship_us"].notna() & df["ord_us"].notna()]
        delay = (
            d["ship_us"].to_numpy(np.int64) - d["ord_us"].to_numpy(np.int64)
        ) // US_PER_DAY
        band = np.array(["00-30d", "31-90d", "91d+"], dtype=object)[
            np.searchsorted(np.array([30, 90]), delay, side="left")
        ]
        high = d["high"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {"band": band, "high_line_count": high,
                 "low_line_count": 1 - high}
            )
            .groupby("band", as_index=False)
            .sum()
        )

    agg = (
        pd.concat(
            [EMPTY,
             joined.map_batches(part_agg, batch_format="pandas").to_pandas()]
        )
        .groupby("band", as_index=False)[["high_line_count", "low_line_count"]]
        .sum()
    )
    agg["high_line_count"] = agg["high_line_count"].astype(np.int64)
    agg["low_line_count"] = agg["low_line_count"].astype(np.int64)
    return agg.sort_values("band", ignore_index=True)


def q20_excess_suppliers(
    sf_dir: str, prefix: str = "small", cutoff: str = "1999-01-01"
) -> pd.DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of promo parts):
    suppliers having at least one part named ``prefix``* whose RECENT
    shipped quantity exceeds half the pair's all-time quantity — a
    nested semi-join whose inner predicate compares two aggregates of
    the same fact (the partsupp availqty > 0.5*SUM(qty) correlated
    threshold, re-expressed on the tables the testdata has).
    Reference parity: the reference's coarse/fine availability gate
    (ECOv003-L2T-STARS/L2T_STARS.py BlankOutput when source coverage is
    below threshold) is the same two-aggregate comparison.

    Determinism: quantities are integral; the predicate is
    2*recent > tot in int64; output is the distinct qualifying
    supplier list with nation, ordered by s_name."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    pk_arr = np.sort(
        part.loc[
            part["p_name"].astype(str).str.startswith(prefix), "p_partkey"
        ].to_numpy(np.int64)
    )
    pk_ref = ray.put(pk_arr)
    cut = pd.Timestamp(cutoff)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        parts = ray.get(pk_ref)
        pv = df["l_partkey"].to_numpy(np.int64)
        if len(parts):
            idx = np.clip(np.searchsorted(parts, pv), 0, len(parts) - 1)
            m = parts[idx] == pv
        else:
            m = np.zeros(len(pv), dtype=bool)
        d = df[m]
        qty = np.floor(d["l_quantity"].to_numpy(np.float64) + 0.5).astype(
            np.int64
        )
        recent = (d["l_shipdate"] >= cut).to_numpy()
        return (
            pd.DataFrame(
                {
                    "sk": d["l_suppkey"].to_numpy(np.int64),
                    "pk": d["l_partkey"].to_numpy(np.int64),
                    "tot": qty,
                    "recent": np.where(recent, qty, 0),
                }
            )
            .groupby(["sk", "pk"], as_index=False)[["tot", "recent"]]
            .sum()
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["sk", "pk"], as_index=False)[["tot", "recent"]].sum()
        q = agg[2 * agg["recent"].to_numpy(np.int64)
                > agg["tot"].to_numpy(np.int64)]
        # only the distinct supplier ids leave the partition
        return q[["sk"]].drop_duplicates()

    sks = typed_pandas(
        hash_combine(
            li.map_batches(li_prep, batch_format="pandas"), ["sk", "pk"],
            combine,
        ),
        {"sk": "int64"},
    )
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name",
                                               "s_nationkey"],
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = (
        sks.drop_duplicates()
        .merge(supp, left_on="sk", right_on="s_suppkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    )
    return pd.DataFrame(
        {"s_name": out["s_name"].astype(str),
         "n_name": out["n_name"].astype(str)}
    ).sort_values(["s_name", "n_name"], ignore_index=True)


def copurchase_pairs(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Market-basket co-purchase pairs: the top-k (part_a, part_b) pairs
    by the number of orders containing BOTH — the
    frequently-bought-together readout, and the within-group PAIR
    EXPLOSION shape (a self-join inside each order) no other operator
    exercises.

    Shape: distinct (order, part) partials -> ONE orderkey-hash exchange
    -> per-partition vectorized pair generation (orders sorted, parts
    strictly increasing inside each order, the (i<j) pairs built with
    repeat/arange segment arithmetic — no per-order Python) -> pair
    counts ride a second (pa, pb)-hash exchange -> per-partition top-k
    candidates (each pair's count is complete inside one partition) ->
    tiny driver merge.  The explosion is bounded by max-lines-per-order
    (k*(k-1)/2 per order, ~13 lines max in this schema).

    Determinism: integer counts; the (n DESC, pa, pb) tiebreak is a
    total order, so LIMIT k is stable.
    Reference parity: the reference's coincident-observation pairing
    (VNP43/GEOS same-tile matchups in the calibration step,
    ECOv003-L2T-STARS L2T_STARS.py) is the same within-key pairing."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "pkey": df["l_partkey"].to_numpy(np.int64),
            }
        ).drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["okey", "pkey"]).sort_values(
            ["okey", "pkey"], kind="mergesort"
        )
        o = d["okey"].to_numpy(np.int64)
        p = d["pkey"].to_numpy(np.int64)
        n = len(o)
        if n < 2:
            return pd.DataFrame(
                {"pa": pd.Series(dtype=np.int64),
                 "pb": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64)}
            )
        # segment arithmetic: for row i with local index l in a segment
        # of size s, emit (s - l - 1) pairs (i, i+1..end-of-segment)
        new = np.concatenate([[True], o[1:] != o[:-1]])
        seg_id = np.cumsum(new) - 1
        seg_sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = seg_sizes[seg_id] - loc - 1
        a_idx = np.repeat(np.arange(n), reps)
        # offset 1..reps within each repeat group
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        off = np.arange(reps.sum()) - np.repeat(cum, reps) + 1
        b_idx = a_idx + off
        pp = pd.DataFrame({"pa": p[a_idx], "pb": p[b_idx]})
        c = pp.groupby(["pa", "pb"], sort=False).size().rename("n")
        return c.reset_index()

    pair_counts = hash_combine(
        li.map_batches(dedup, batch_format="pandas"), ["okey"], pairs
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["pa", "pb"], as_index=False)["n"].sum()
        return c.sort_values(
            ["n", "pa", "pb"], ascending=[False, True, True]
        ).head(k)

    cand = typed_pandas(
        hash_combine(pair_counts, ["pa", "pb"], topk),
        {"pa": "int64", "pb": "int64", "n": "int64"},
    )
    out = cand.sort_values(
        ["n", "pa", "pb"], ascending=[False, True, True], ignore_index=True
    ).head(k)
    out["pa"] = out["pa"].astype(np.int64)
    out["pb"] = out["pb"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def brand_price_realization(sf_dir: str) -> pd.DataFrame:
    """Price realization per part brand: the aggregate ratio of realized
    line revenue to quantity x catalog retail price — the
    markup/discount readout over the one catalog column no other
    operator exercises (p_retailprice).

    Shape: the part catalog's (brand, retail cents) columns are
    BROADCAST once (`ray.put`); map-side int64 lanes (count, extended
    cents, quantity x retail cents) pre-aggregate per brand before a
    brand-sized driver reduce — the fact stream never shuffles.

    Determinism: all three lanes exact int64 (qty x retail_cents <=
    ~5e8 per line; sums < 2^63 through ~sf10); the ratio is ONE
    mirrored division."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand",
                                           "p_retailprice"]
    )
    pmap = pd.DataFrame(
        {
            "brand": part["p_brand"].astype(str),
            "retail_c": np.floor(
                part["p_retailprice"].to_numpy(np.float64) * 100 + 0.5
            ).astype(np.int64),
        },
        index=part["p_partkey"].to_numpy(np.int64),
    )
    pref = ray.put(pmap)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def lanes(df: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(pref)
        pk = df["l_partkey"].to_numpy(np.int64)
        sel = pm.reindex(pk)
        ext_c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        qty = np.floor(df["l_quantity"].to_numpy(np.float64) + 0.5).astype(
            np.int64
        )
        d = pd.DataFrame(
            {
                "brand": sel["brand"].to_numpy(),
                "n_lines": np.ones(len(pk), dtype=np.int64),
                "ext_c": ext_c,
                "qr_c": qty * sel["retail_c"].to_numpy(np.int64),
            }
        )
        return d.groupby("brand", as_index=False).sum()

    out = (
        li.map_batches(lanes, batch_format="pandas")
        .to_pandas()
        .groupby("brand", as_index=False)[["n_lines", "ext_c", "qr_c"]]
        .sum()
        .sort_values("brand", ignore_index=True)
    )
    return pd.DataFrame(
        {
            "p_brand": out["brand"].astype(str),
            "n_lines": out["n_lines"].astype(np.int64),
            "realized_ratio": np.sign(
                out["ext_c"].to_numpy(np.float64)
                / out["qr_c"].to_numpy(np.int64)
            )
            * np.floor(
                np.abs(
                    out["ext_c"].to_numpy(np.int64).astype(np.float64)
                    / out["qr_c"].to_numpy(np.int64)
                )
                * 1e6
                + 0.5
            )
            / 1e6,
        }
    )



def triangle_stats(sf_dir: str) -> pd.DataFrame:
    """Global triangle census of the co-purchase graph (parts are nodes,
    an edge joins two parts that share an order): nodes, edges, wedges,
    triangles and the global clustering coefficient — the graph-analytics
    readout (``copurchase_pairs`` builds the weighted edge list;
    ``minhash_dup_groups`` runs connected components; this closes the
    classic triad).

    Engine shape (edge-broadcast wedge scan):
      1. order-hash exchange -> per-partition distinct (order, part),
         segment pair-explosion (a < b), local edge dedup;
      2. edge-hash exchange -> global distinct edges + degree partials;
      3. the distinct edge set packs into ONE sorted uint64 array
         (a << 32 | b) and broadcasts via ``ray.put`` — edge-vocabulary
         bounded (8 B/edge; ~10 MB at a million edges), the graph
         family's small side;
      4. edges oriented low->high by (degree, node) — bounds per-node
         out-degree at O(sqrt(m)) on skewed graphs — ride ONE
         source-hash exchange; each partition pair-explodes its
         sources' out-neighbours and closes wedges IN PLACE with a
         vectorized searchsorted membership test against the broadcast
         edge array.  The 30 M+ wedge stream never leaves its
         partition (measured: shipping it cost 40+ s at sf0.1; the
         local scan runs in the explosion's own numpy pass).  At an
         edge set too big to broadcast this falls back to a (b, c)-hash
         exchange of wedge/marker rows — documented, not needed at
         part-pair vocabulary.

    Determinism: everything is exact integer counting; the clustering
    coefficient is the single mirrored chain 3*tri / wedges."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().rename(
            columns={"l_orderkey": "o", "l_partkey": "p"}
        )

    def edges_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["o", "p"], kind="mergesort")
        o = g["o"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        new = np.concatenate([[True], o[1:] != o[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = sizes[seg_id] - loc - 1
        a = np.repeat(np.arange(n), reps)
        if len(a) == 0:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        e = pd.DataFrame({"a": p[a], "b": p[b]}).drop_duplicates()
        return e

    edges = hash_combine(
        li.map_batches(project, batch_format="pandas"), ["o"], edges_of
    )
    # stage 2: global edge dedup (one (a,b)-hash exchange)
    edges = hash_combine(
        edges, ["a", "b"], lambda g: g.drop_duplicates()
    ).materialize()
    n_edges = edges.count()
    deg_pd = (
        edges.map_batches(
            lambda df: pd.DataFrame(
                {"node": np.concatenate(
                    [df["a"].to_numpy(np.int64),
                     df["b"].to_numpy(np.int64)])}
            ).groupby("node", as_index=False).size()
            .rename(columns={"size": "d"}),
            batch_format="pandas",
        )
        .to_pandas()
        .reindex(columns=["node", "d"])  # typed when edge stream is empty
        .groupby("node", as_index=False)["d"]
        .sum()
    )
    n_nodes = len(deg_pd)
    d_by_node = deg_pd.sort_values("node")
    d = deg_pd["d"].to_numpy(np.int64)
    n_wedges = int((d * (d - 1) // 2).sum())
    if n_edges == 0:
        return pd.DataFrame(
            {"n_nodes": [np.int64(0)], "n_edges": [np.int64(0)],
             "n_wedges": [np.int64(0)], "n_triangles": [np.int64(0)],
             "global_clustering": [np.nan]}
        )
    nodes_sorted = d_by_node["node"].to_numpy(np.int64)
    dvals = d_by_node["d"].to_numpy(np.int64)
    # (a<<32)|b packing is injective ONLY while node ids fit 32 bits
    # (TPC-H partkey crosses 2^32 near sf ~21k — ADVICE r4); fail loudly
    # rather than silently alias edges past that.
    if n_nodes and int(nodes_sorted[-1]) >= 2**32:
        raise ValueError(
            f"triangle_stats: max node id {int(nodes_sorted[-1])} >= 2^32; "
            "uint64 edge packing would alias — switch to 2-array keys"
        )
    # the broadcast small side: packed sorted edge keys (a < b always)
    ep = edges.to_pandas()
    packed = np.sort(
        (ep["a"].to_numpy(np.int64).astype(np.uint64) << np.uint64(32))
        | ep["b"].to_numpy(np.int64).astype(np.uint64)
    )
    refs = ray.put((nodes_sorted, dvals, packed))

    class Orient:
        """(degree, node)-ordered direction via vectorized searchsorted
        over the broadcast degree table."""

        def __init__(self, r):
            self.nodes, self.d, _ = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            da = self.d[np.searchsorted(self.nodes, a)]
            db = self.d[np.searchsorted(self.nodes, b)]
            fwd = (da < db) | ((da == db) & (a < b))
            return pd.DataFrame(
                {"u": np.where(fwd, a, b), "w": np.where(fwd, b, a)}
            )

    oriented = edges.map_batches(
        Orient, fn_constructor_args=(refs,), batch_format="pandas",
        concurrency=(1, 4),
    )

    def close_wedges(g: pd.DataFrame) -> pd.DataFrame:
        """Pair-explode each source's out-neighbours and close against
        the broadcast edge set in place — no wedge leaves the task."""
        edge_keys = ray.get(refs)[2]
        g = g.sort_values(["u", "w"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"t": [0]})
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = sizes[seg_id] - loc - 1
        a = np.repeat(np.arange(n), reps)
        if len(a) == 0:
            return pd.DataFrame({"t": [0]})
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        x = np.minimum(w[a], w[b]).astype(np.uint64)
        y = np.maximum(w[a], w[b]).astype(np.uint64)
        key = (x << np.uint64(32)) | y
        pos = np.searchsorted(edge_keys, key)
        pos = np.minimum(pos, len(edge_keys) - 1)
        t = int((edge_keys[pos] == key).sum())
        return pd.DataFrame({"t": [t]})

    tri = int(
        hash_combine(oriented, ["u"], close_wedges).to_pandas()["t"].sum()
    )
    cc = (
        float(
            np.sign(3.0 * tri / n_wedges)
            * np.floor(abs(3.0 * tri / n_wedges) * 1e6 + 0.5)
            / 1e6
        )
        if n_wedges
        else np.nan
    )
    return pd.DataFrame(
        {"n_nodes": [np.int64(n_nodes)], "n_edges": [np.int64(n_edges)],
         "n_wedges": [np.int64(n_wedges)],
         "n_triangles": [np.int64(tri)],
         "global_clustering": [np.float64(cc)]}
    )


# ------------------------------------------------------------ band join
def band_join_cooccur(sf_dir: str, band_s: int = 300) -> pd.DataFrame:
    """Banded (non-equi) self-join: pairs of events of the SAME user
    within ``band_s`` seconds of each other, counted per unordered
    type pair — the co-occurring-signals readout, and the missing
    non-equi member of the join family (``asof_purchase_view`` is the
    one-sided variant; this is the symmetric band).

    Engine shape: one user-hash exchange; each partition sorts its
    users' events once and finds every forward window with ONE
    searchsorted over the partition's time axis (segment-bounded), then
    pair-explodes with the repeat/arange arithmetic — the band join
    never builds the quadratic cross product, only the in-band pairs.
    At cluster scale the same kernel runs after bucketing ts into
    band-width buckets (each event joins its own + next bucket), which
    keeps partitions time-local; with user cardinality >> partitions
    the user hash already bounds skew here.

    Determinism: each unordered pair is generated exactly once (from
    its earlier event; ties by event row order are symmetric in the
    canonical type pair), mirrored by the oracle's strict (type, id)
    dedup predicate; counts are integers."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
             "event_id": df["event_id"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str)}
        )

    band_us = band_s * 1_000_000

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"type_a": pd.Series(dtype=str),
             "type_b": pd.Series(dtype=str),
             "n_pairs": pd.Series(dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].astype(str).to_numpy()
        n = len(g)
        new = np.concatenate([[True], u[1:] != u[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        # rebase each segment onto its own block of a strictly
        # increasing axis so ONE searchsorted answers every forward
        # band query and can never cross a user boundary
        t_rel = t - t[starts[seg_id]]
        big = int(t_rel.max()) + band_us + 1
        t_adj = t_rel + seg_id * big
        hi = np.searchsorted(t_adj, t_adj + band_us, side="right")
        reps = hi - np.arange(n) - 1
        reps = np.maximum(reps, 0)
        total = int(reps.sum())
        if total == 0:
            return empty
        a = np.repeat(np.arange(n), reps)
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(total) - np.repeat(cum, reps) + 1)
        ta, tb = et[a], et[b]
        lo_t = np.where(ta <= tb, ta, tb)
        hi_t = np.where(ta <= tb, tb, ta)
        return (
            pd.DataFrame({"type_a": lo_t, "type_b": hi_t})
            .groupby(["type_a", "type_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_pairs"})
        )

    out = (
        hash_combine(
            ds.map_batches(project, batch_format="pandas"), ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby(["type_a", "type_b"], as_index=False)["n_pairs"]
        .sum()
        .sort_values(["type_a", "type_b"], ignore_index=True)
    )
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


# -------------------------------------------------------- reconciliation
def order_reconciliation(sf_dir: str, tol_pct: int = 1) -> pd.DataFrame:
    """Financial reconciliation of the order header against its lines:
    per order-status, how many orders' header total agrees with the sum
    of line net amounts (ext * (1-disc) * (1+tax)) within ``tol_pct``
    percent, how many have NO lines at all, and the aggregate absolute
    gap — the cross-table arithmetic audit (``dq_audit`` checks keys and
    ranges; this checks the money adds up).

    Engine shape: both sides project to exact integer lanes (header
    cents; line net at cents x 10^4 from the two percent factors), ride
    ONE orderkey-hash exchange as a tagged union, and each partition
    reconciles its orders vectorized; the reduce is status-vocabulary
    sized.  The within-tolerance predicate is pure integer arithmetic
    (|total*10^4 - lines| * 100 <= tol * total * 10^4).

    Determinism: int64/HUGEINT lanes end-to-end; the one emitted float
    (gap ratio) is a single mirrored division."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": df["o_orderkey"].to_numpy(np.int64),
             "status": df["o_orderstatus"].astype(str),
             "total_c": np.floor(
                 df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
             ).astype(np.int64),
             "net": np.zeros(len(df), np.int64),
             "n_lines": np.zeros(len(df), np.int64)}
        )

    def l_part(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        d = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        t = np.floor(
            df["l_tax"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        net = c * (100 - d) * (100 + t)  # cents x 10^4
        p = pd.DataFrame(
            {"k": df["l_orderkey"].to_numpy(np.int64), "net": net}
        ).groupby("k", as_index=False).agg(
            net=("net", "sum"), n_lines=("net", "size")
        )
        p["status"] = ""
        p["total_c"] = 0
        p["n_lines"] = p["n_lines"].astype(np.int64)
        return p[["k", "status", "total_c", "net", "n_lines"]]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("k", as_index=False).agg(
            status=("status", "max"), total_c=("total_c", "sum"),
            net=("net", "sum"), n_lines=("n_lines", "sum"),
        )
        total4 = agg["total_c"].to_numpy(np.int64) * 10_000
        net = agg["net"].to_numpy(np.int64)
        gap = np.abs(total4 - net)
        ok = gap * 100 <= tol_pct * total4
        has = agg["n_lines"].to_numpy(np.int64) > 0
        d = pd.DataFrame(
            {"status": agg["status"].astype(str),
             "n_orders": 1,
             "n_no_lines": (~has).astype(np.int64),
             "n_within_tol": (ok & has).astype(np.int64),
             "sum_total_c": agg["total_c"].to_numpy(np.int64),
             "sum_abs_gap4": np.where(has, gap, 0)}
        )
        return d.groupby("status", as_index=False).sum()

    out = (
        hash_combine(
            orders.map_batches(o_part, batch_format="pandas").union(
                lines.map_batches(l_part, batch_format="pandas")
            ),
            ["k"], combine,
        )
        .to_pandas()
        .groupby("status", as_index=False)[
            ["n_orders", "n_no_lines", "n_within_tol", "sum_total_c",
             "sum_abs_gap4"]
        ]
        .sum()
        .sort_values("status", ignore_index=True)
    )
    gap_ratio = out["sum_abs_gap4"].to_numpy(np.float64) / (
        out["sum_total_c"].to_numpy(np.float64) * 10_000.0
    )
    out["gap_ratio"] = np.sign(gap_ratio) * np.floor(
        np.abs(gap_ratio) * 1e6 + 0.5
    ) / 1e6
    for c in ["n_orders", "n_no_lines", "n_within_tol", "sum_total_c",
              "sum_abs_gap4"]:
        out[c] = out[c].astype(np.int64)
    return out


# --------------------------------------------------------------- PageRank
def pagerank_parts(
    sf_dir: str, damping: float = 0.85, iters: int = 15, k: int = 50
) -> pd.DataFrame:
    """PageRank over the undirected co-purchase graph (each edge walks
    both ways), fixed ``iters`` power iterations, top-``k`` parts by
    rank — the iterative-graph member of the family
    (``minhash_dup_groups`` = connected components, ``triangle_stats``
    = triads; this is the stationary walk).

    Engine shape: the edge list (built with the same two-exchange
    dedup as ``triangle_stats``) stays a materialized Dataset across
    iterations; the rank vector is node-dimension bounded, so each
    iteration broadcasts it once (``ray.put``) and every edge block
    scatters its contributions into a dense partial vector with one
    ``np.add.at`` — per iteration: one map over edge blocks + one
    node-vector driver reduce, NO per-iteration shuffle.  At a node
    vocabulary too big to broadcast this becomes a (dst-hash) exchange
    per iteration — documented, not needed at part scale.

    Not SQL-oracled (iterative float fixpoint); the pytest replays the
    same iteration count with a literal dense-matrix power iteration."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().rename(
            columns={"l_orderkey": "o", "l_partkey": "p"}
        )

    def edges_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["o", "p"], kind="mergesort")
        o = g["o"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        new = np.concatenate([[True], o[1:] != o[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        loc = np.arange(n) - starts[seg_id]
        reps = sizes[seg_id] - loc - 1
        a = np.repeat(np.arange(n), reps)
        if len(a) == 0:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        b = a + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        return pd.DataFrame({"a": p[a], "b": p[b]}).drop_duplicates()

    edges = hash_combine(
        hash_combine(li.map_batches(project, batch_format="pandas"),
                     ["o"], edges_of),
        ["a", "b"], lambda g: g.drop_duplicates(),
    ).materialize()

    # node index + degrees (node-vocabulary bounded)
    deg_pd = (
        edges.map_batches(
            lambda df: pd.DataFrame(
                {"node": np.concatenate(
                    [df["a"].to_numpy(np.int64),
                     df["b"].to_numpy(np.int64)])}
            ).groupby("node", as_index=False).size()
            .rename(columns={"size": "d"}),
            batch_format="pandas",
        )
        .to_pandas()
        .reindex(columns=["node", "d"])  # typed when edge stream is empty
        .groupby("node", as_index=False)["d"]
        .sum()
        .sort_values("node", ignore_index=True)
    )
    nodes = deg_pd["node"].to_numpy(np.int64)
    deg = deg_pd["d"].to_numpy(np.float64)
    nn = len(nodes)
    if nn == 0:
        return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.float64)})
    nodes_ref = ray.put(nodes)
    rank = np.full(nn, 1.0 / nn)

    def scatter(df: pd.DataFrame, *, r_ref, share_ref) -> pd.DataFrame:
        nd = ray.get(r_ref)
        share = ray.get(share_ref)
        a = np.searchsorted(nd, df["a"].to_numpy(np.int64))
        b = np.searchsorted(nd, df["b"].to_numpy(np.int64))
        acc = np.zeros(len(nd), np.float64)
        np.add.at(acc, b, share[a])
        np.add.at(acc, a, share[b])
        return pd.DataFrame({"i": np.arange(len(nd)), "c": acc})

    for _ in range(iters):
        share_ref = ray.put(rank / deg)
        parts = edges.map_batches(
            scatter, batch_format="pandas",
            fn_kwargs={"r_ref": nodes_ref, "share_ref": share_ref},
        ).to_pandas()
        acc = np.zeros(nn, np.float64)
        np.add.at(acc, parts["i"].to_numpy(np.int64),
                  parts["c"].to_numpy(np.float64))
        rank = (1.0 - damping) / nn + damping * acc

    top = np.argsort(-rank, kind="stable")[:k]
    # stable tie order on rank then node id
    order = np.lexsort((nodes[top], -rank[top]))
    top = top[order]
    return pd.DataFrame(
        {"part": nodes[top].astype(np.int64),
         "rank": rank[top].astype(np.float64)}
    )


# --------------------------------------------------------- order backlog
def order_backlog_daily(sf_dir: str) -> pd.DataFrame:
    """Daily open-order backlog: an order is OPEN from its order date
    until the day its last line ships (orders with no lines never
    open); the backlog on day d counts orders open through d — the
    operations sweep every fulfilment dashboard runs
    (``peak_concurrency`` sweeps event intervals; this one is
    cross-table and day-grained).

    Shape: per-order last-ship partials join the header date on ONE
    orderkey-hash exchange (tagged-union, ``order_reconciliation``
    shape); each closed interval emits two signed deltas; the delta
    cells reduce by day (day-span bounded), and the running sum over
    the reduced day axis is a driver cumsum.

    Determinism: pure integer counting; days where the running backlog
    is unchanged-but-observed emit too (the axis is the delta days)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    DAY = 86_400_000_000

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"k": df["o_orderkey"].to_numpy(np.int64),
             "open_d": d // DAY,
             "ship_d": np.full(len(df), -1, np.int64)}
        )

    def l_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        p = pd.DataFrame(
            {"k": df["l_orderkey"].to_numpy(np.int64), "ship_d": d // DAY}
        ).groupby("k", as_index=False)["ship_d"].max()
        p["open_d"] = -1
        return p[["k", "open_d", "ship_d"]]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("k", as_index=False).agg(
            open_d=("open_d", "max"), ship_d=("ship_d", "max")
        )
        has = (agg["open_d"].to_numpy(np.int64) >= 0) & (
            agg["ship_d"].to_numpy(np.int64) >= 0
        )
        o = agg["open_d"].to_numpy(np.int64)[has]
        s = agg["ship_d"].to_numpy(np.int64)[has]
        s = np.maximum(s, o)  # a ship date before the order date clamps
        d = pd.DataFrame(
            {"day": np.concatenate([o, s + 1]),
             "delta": np.concatenate(
                 [np.ones(len(o), np.int64), -np.ones(len(s), np.int64)]
             )}
        )
        return d.groupby("day", as_index=False)["delta"].sum()

    cells = (
        hash_combine(
            orders.map_batches(o_part, batch_format="pandas").union(
                lines.map_batches(l_part, batch_format="pandas")
            ),
            ["k"], combine,
        )
        .to_pandas()
        .groupby("day", as_index=False)["delta"]
        .sum()
        .sort_values("day", ignore_index=True)
    )
    out = pd.DataFrame(
        {"day": cells["day"].to_numpy(np.int64),
         "backlog": cells["delta"].to_numpy(np.int64).cumsum()}
    )
    return out


# ------------------------------------------------------ business days
def business_day_lag(sf_dir: str) -> pd.DataFrame:
    """Ship delay per order priority measured in BUSINESS days
    (weekdays in (order_date, ship_date]), via the closed-form weekday
    count G(d) = 5*((d+3)//7) + min((d+3)%7 + 1, 5) - 3 (day 0 =
    Thursday) — calendar arithmetic with no per-row branching, the
    working-days KPI behind every SLA dashboard (``q12_delay_priority``
    counts calendar-day buckets; this counts the clock that stops on
    weekends).

    Shape: header dates join line ship dates on ONE orderkey-hash
    exchange (tagged union); the reduce is priority-vocabulary sized.

    Determinism: all-integer weekday counts; the mean is one mirrored
    division."""
    DAY = 86_400_000_000
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def gdays(d: np.ndarray) -> np.ndarray:
        s = d + 3
        return 5 * (s // 7) + np.minimum(s % 7 + 1, 5) - 3

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": df["o_orderkey"].to_numpy(np.int64),
             "prio": df["o_orderpriority"].astype(str),
             "oday": df["o_orderdate"].astype("datetime64[us]")
             .astype(np.int64) // DAY,
             "sday": np.full(len(df), -1, np.int64)}
        )

    def l_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": df["l_orderkey"].to_numpy(np.int64),
             "prio": "",
             "oday": np.full(len(df), -1, np.int64),
             "sday": df["l_shipdate"].astype("datetime64[us]")
             .astype(np.int64) // DAY}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        heads = g[g["sday"] < 0][["k", "prio", "oday"]]
        ls = g[g["sday"] >= 0][["k", "sday"]]
        j = ls.merge(heads, on="k", how="inner")
        if len(j) == 0:
            return pd.DataFrame(
                {"o_orderpriority": pd.Series(dtype=str),
                 "n_lines": pd.Series(dtype=np.int64),
                 "sum_bdays": pd.Series(dtype=np.int64),
                 "max_bdays": pd.Series(dtype=np.int64)}
            )
        bd = gdays(j["sday"].to_numpy(np.int64)) - gdays(
            j["oday"].to_numpy(np.int64)
        )
        bd = np.maximum(bd, 0)  # pre-order shipments clamp at zero
        return (
            pd.DataFrame({"o_orderpriority": j["prio"].astype(str),
                          "bd": bd})
            .groupby("o_orderpriority", as_index=False)
            .agg(n_lines=("bd", "size"), sum_bdays=("bd", "sum"),
                 max_bdays=("bd", "max"))
        )

    out = (
        hash_combine(
            orders.map_batches(o_part, batch_format="pandas").union(
                lines.map_batches(l_part, batch_format="pandas")
            ),
            ["k"], combine,
        )
        .to_pandas()
        .groupby("o_orderpriority", as_index=False)
        .agg(n_lines=("n_lines", "sum"), sum_bdays=("sum_bdays", "sum"),
             max_bdays=("max_bdays", "max"))
        .sort_values("o_orderpriority", ignore_index=True)
    )
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["sum_bdays"] = out["sum_bdays"].astype(np.int64)
    out["max_bdays"] = out["max_bdays"].astype(np.int64)
    out["mean_bdays"] = (
        np.sign(out["sum_bdays"])
        * np.floor(
            np.abs(
                out["sum_bdays"].to_numpy(np.float64)
                / out["n_lines"].to_numpy(np.float64)
            ) * 1e6 + 0.5
        ) / 1e6
    )
    return out


# ------------------------------------------------------ frequent triples
def frequent_triples(sf_dir: str, min_support: int = 2) -> pd.DataFrame:
    """Frequent 3-itemsets of the co-purchase basket (parts bought
    together in one order, counted across orders, support >=
    ``min_support``) — the Apriori step past ``copurchase_pairs``'
    2-itemsets, and a second-order segment explosion (pairs -> triples
    by re-applying the repeat/arange arithmetic to the pair stream).

    Shape: one order-hash exchange; each partition explodes its orders'
    sorted part sets to (a < b < c) triples in two vectorized passes
    and pre-counts locally; one (a, b)-hash exchange combines counts
    and applies the support filter.

    Determinism: pure integer support counts; ordering (a, b, c)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().rename(
            columns={"l_orderkey": "o", "l_partkey": "p"}
        )

    def triples_of(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64),
             "b": pd.Series(dtype=np.int64),
             "c": pd.Series(dtype=np.int64),
             "n": pd.Series(dtype=np.int64)}
        )
        g = g.drop_duplicates().sort_values(["o", "p"], kind="mergesort")
        o = g["o"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return empty
        new = np.concatenate([[True], o[1:] != o[:-1]])
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        ends = starts + sizes
        loc = np.arange(n) - starts[seg_id]
        reps = sizes[seg_id] - loc - 1
        i = np.repeat(np.arange(n), reps)
        if len(i) == 0:
            return empty
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        j = i + (np.arange(int(reps.sum())) - np.repeat(cum, reps) + 1)
        # second pass: for each pair (i, j) the third index runs j+1 ..
        # segment end — the SAME arithmetic applied to the pair stream
        reps2 = ends[seg_id[j]] - j - 1
        i2 = np.repeat(i, reps2)
        j2 = np.repeat(j, reps2)
        if len(i2) == 0:
            return empty
        cum2 = np.concatenate([[0], np.cumsum(reps2)[:-1]])
        k2 = j2 + (np.arange(int(reps2.sum()))
                   - np.repeat(cum2, reps2) + 1)
        return (
            pd.DataFrame({"a": p[i2], "b": p[j2], "c": p[k2]})
            .groupby(["a", "b", "c"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    out = (
        hash_combine(
            hash_combine(
                li.map_batches(project, batch_format="pandas"), ["o"],
                triples_of,
            ),
            ["a", "b"],
            lambda g: g.groupby(["a", "b", "c"], as_index=False)[
                "n"
            ].sum(),
        )
    )
    out = typed_pandas(
        out, {"a": "int64", "b": "int64", "c": "int64", "n": "int64"}
    )
    out = out[out["n"] >= min_support].sort_values(
        ["a", "b", "c"], ignore_index=True
    )
    for col in ("a", "b", "c", "n"):
        out[col] = out[col].astype(np.int64)
    return out.rename(columns={"n": "support"})
