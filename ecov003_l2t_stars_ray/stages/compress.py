"""Tier-block compression stage: Gorilla chunks per (conv, metric, tier).

A stateless ``map_batches`` stage over tier rows: within each batch, every
(conv_id, metric, tier) run is compressed into one chunk row holding the
Gorilla payload for its (bucket_start, value) series — the Gorilla paper's
2-hour block pattern, with Ray Data blocks as the chunk boundary. Chunks
concatenate on decode, so correctness is independent of how the executor
splits batches.

Chunk schema: (conv_id, metric, tier, first_bucket, n_points, payload).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.gorilla import compress, decompress

CHUNK_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("metric", pa.string()),
        ("tier", pa.string()),
        ("first_bucket", pa.timestamp("us")),
        ("n_points", pa.int64()),
        ("payload", pa.binary()),
    ]
)


def compress_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Tier rows -> one Gorilla chunk per (conv, metric, tier) run."""
    rows = []
    batch = batch.copy()
    for c in ("conv_id", "metric", "tier"):  # categorical -> object (no
        batch[c] = batch[c].astype(str)      # phantom unobserved groups)
    batch = batch[~batch["metric"].str.startswith("_")]
    batch = batch.sort_values(["conv_id", "metric", "tier", "bucket_start"])
    for (conv, metric, tier), g in batch.groupby(
        ["conv_id", "metric", "tier"], sort=False
    ):
        ts = g["bucket_start"].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = g["value"].to_numpy(dtype=np.float64)
        rows.append(
            {
                "conv_id": conv,
                "metric": metric,
                "tier": tier,
                "first_bucket": pd.Timestamp(ts[0], unit="us"),
                "n_points": len(ts),
                "payload": compress(ts, vals),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA])


def decompress_chunks(chunks: pd.DataFrame) -> pd.DataFrame:
    """Chunk rows -> (conv_id, metric, tier, bucket_start, value) points."""
    out = []
    for row in chunks.itertuples(index=False):
        ts, vals = decompress(row.payload)
        out.append(
            pd.DataFrame(
                {
                    "conv_id": row.conv_id,
                    "metric": row.metric,
                    "tier": row.tier,
                    "bucket_start": ts.view("datetime64[us]"),
                    "value": vals,
                }
            )
        )
    if not out:
        return pd.DataFrame(
            columns=["conv_id", "metric", "tier", "bucket_start", "value"]
        )
    return pd.concat(out, ignore_index=True)


def compress_tiers(tiers_ds):
    """Dataset of tier rows -> Dataset of Gorilla chunk rows."""
    return tiers_ds.map_batches(compress_batch, batch_format="pandas")


def write_compressed_tiers(tiers_ds, out_dir: str) -> None:
    """The compressed retention format: Gorilla chunk tables partitioned by
    tier — the at-rest layout for cold tiers (raw/1m past their hot
    window), decoded on read by :func:`read_compressed_tiers`."""
    compress_tiers(tiers_ds).write_parquet(out_dir, partition_cols=["tier"])


def read_compressed_tiers(path: str):
    """Compressed chunk dir -> Dataset of decoded (conv, metric, tier,
    bucket_start, value) points (streaming decode per batch)."""
    import ray.data

    chunks = ray.data.read_parquet(path)

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tier"] = df["tier"].astype(str)
        return decompress_chunks(df)

    return chunks.map_batches(decode, batch_format="pandas")
