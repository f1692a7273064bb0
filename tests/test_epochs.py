"""Incremental epochs: watermark close rule, state chain, manifest resume.

Golden check: running the corpus as two incremental epochs + a flush epoch
must reproduce the full-batch oracle rollup exactly (same dense axes, same
Kalman recurrence continued through the checkpoint) — the reference's
prior/posterior chain semantics (``L2T_STARS.py:327-335``).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ecov003_l2t_stars_ray import oracle
from ecov003_l2t_stars_ray.pipelines.epochs import read_tiers, run_epoch
from ecov003_l2t_stars_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def epoch_setup(tmp_path_factory, small_transcripts):
    base = tmp_path_factory.mktemp("epochs")
    pdf = small_transcripts.to_pandas()
    ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    mid = int(np.quantile(ts_us, 0.6))
    frag_dir = base / "frags"
    os.makedirs(frag_dir)
    f1 = str(frag_dir / "f1.parquet")
    f2 = str(frag_dir / "f2.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf[ts_us <= mid], preserve_index=False), f1
    )
    pq.write_table(
        pa.Table.from_pandas(pdf[ts_us > mid], preserve_index=False), f2
    )
    return str(base / "root"), f1, f2, pdf


def _combined(root, epochs):
    df = read_tiers(root, epochs)
    df = df[~df["metric"].str.startswith("_")].copy()
    df["bucket_start"] = df["bucket_start"].astype("datetime64[us]")
    return df.sort_values(
        ["tier", "conv_id", "metric", "bucket_start"], ignore_index=True
    )


def test_incremental_epochs_match_full_batch(epoch_setup):
    root, f1, f2, pdf = epoch_setup
    r1 = run_epoch([f1], root, epoch=1, num_partitions=4)
    assert r1["rows"] > 0 and r1["cells"] > 0
    r2 = run_epoch([f2], root, epoch=2, num_partitions=4)
    # flush epoch: close the give-up horizon so every bucket finalizes
    r3 = run_epoch([], root, epoch=3, num_partitions=4, giveup_buckets=0)

    got = _combined(root, [1, 2, 3])
    want = oracle.tier_rollup(pdf, smooth=True)

    key = ["tier", "conv_id", "metric", "bucket_start"]
    got_i = got.set_index(key).sort_index()
    want_i = want.set_index(key).sort_index()
    assert len(got_i) == len(want_i), (len(got_i), len(want_i))
    assert (got_i.index == want_i.index).all()
    assert (got_i["count"].to_numpy() == want_i["count"].to_numpy()).all()
    assert (got_i["gap_filled"].to_numpy() == want_i["gap_filled"].to_numpy()).all()
    np.testing.assert_array_equal(got_i["min"].to_numpy(), want_i["min"].to_numpy())
    np.testing.assert_array_equal(got_i["max"].to_numpy(), want_i["max"].to_numpy())
    for col in ["sum", "mean", "value", "value_sd"]:
        np.testing.assert_allclose(
            got_i[col].to_numpy(), want_i[col].to_numpy(),
            rtol=1e-7, atol=1e-9, err_msg=col,
        )


def test_manifest_cells_and_rerun_skips(epoch_setup):
    root, f1, f2, _ = epoch_setup
    man = Manifest(os.path.join(root, "manifest"))
    cells = man.committed(1)
    assert any(t == "1m" for (_p, t, _e) in cells)
    # identical rerun of a committed epoch is a no-op
    r = run_epoch([f1], root, epoch=1, num_partitions=4)
    assert r.get("skipped") is True


def test_late_data_beyond_giveup_dropped(tmp_path, small_transcripts):
    """A turn arriving in epoch 2 whose bucket was committed in epoch 1 is
    excluded deterministically (VIIRS_GIVEUP_DAYS analog)."""
    root = str(tmp_path / "root")
    pdf = small_transcripts.to_pandas()
    conv = pdf["conv_id"].iloc[0]
    cdf = pdf[pdf["conv_id"] == conv].reset_index(drop=True)

    f1 = str(tmp_path / "f1.parquet")
    pq.write_table(pa.Table.from_pandas(cdf, preserve_index=False), f1)
    run_epoch([f1], root, epoch=1, num_partitions=2, giveup_buckets=0)
    before = _combined(root, [1])

    # craft one late turn: ts two days before the conversation began
    late = cdf.tail(1).copy()
    late["turn_idx"] = late["turn_idx"] + 1
    late["ts"] = cdf["ts"].iloc[0] - pd.Timedelta(days=2)
    f2 = str(tmp_path / "f2.parquet")
    pq.write_table(pa.Table.from_pandas(late, preserve_index=False), f2)
    r2 = run_epoch([f2], root, epoch=2, num_partitions=2, giveup_buckets=0)
    after = _combined(root, [1, 2])

    t1 = before[(before.tier == "1m") & (before.metric == "turn_rate")]
    t2 = after[(after.tier == "1m") & (after.metric == "turn_rate")]
    # the late turn fell in an already-committed bucket: counts unchanged,
    # and the drop is visible in the epoch's lineage metrics
    assert t1["count"].sum() == t2["count"].sum()
    assert r2["late_turns"] >= 1
    # and the per-partition lineage records carry the drop count on
    # exactly the late conversation's partition
    mf = Manifest(os.path.join(root, "manifest")).load()
    e2 = mf[(mf["epoch"] == 2) & (mf["tier"] == "all")]
    assert e2["late_turns"].sum() == r2["late_turns"]
    assert (e2[e2["late_turns"] > 0]["partition_id"].nunique()) == 1


def test_corrupted_pending_fragment_aborts_epoch(tmp_path, small_transcripts):
    """A pending fragment silently rewritten between epochs fails the CRC
    verify recorded in the previous epoch's meta, aborting before any
    compute (reference: checksum verify before use, delete-and-refetch on
    mismatch, ``LPDAACDataPool.py:368-430``)."""
    from ecov003_l2t_stars_ray.pipelines.epochs import FragmentIntegrityError

    root = str(tmp_path / "root")
    pdf = small_transcripts.to_pandas()
    ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    mid = int(np.quantile(ts_us, 0.6))
    f1 = str(tmp_path / "f1.parquet")
    f2 = str(tmp_path / "f2.parquet")
    first, second = pdf[ts_us <= mid], pdf[ts_us > mid]
    pq.write_table(pa.Table.from_pandas(first, preserve_index=False), f1)
    pq.write_table(pa.Table.from_pandas(second, preserve_index=False), f2)

    r1 = run_epoch([f1], root, epoch=1, num_partitions=2)
    assert f1 in r1["pending_fragments"]

    # rewrite f1 in place with subtly different content (one ts nudged)
    mod = first.copy()
    mod.iloc[0, mod.columns.get_loc("ts")] += pd.Timedelta(microseconds=1)
    pq.write_table(pa.Table.from_pandas(mod, preserve_index=False), f1)

    with pytest.raises(FragmentIntegrityError):
        run_epoch([f2], root, epoch=2, num_partitions=2)


def test_partial_commit_resume(tmp_path, small_transcripts):
    """Deleting some committed cells forces recompute of only those
    partitions; result is identical afterwards."""
    root = str(tmp_path / "root")
    pdf = small_transcripts.to_pandas()
    f1 = str(tmp_path / "f1.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f1)
    run_epoch([f1], root, epoch=1, num_partitions=4, giveup_buckets=0)
    full = _combined(root, [1])

    # simulate a crash: drop partition 0's commit marker + its output
    man_dir = os.path.join(root, "manifest")
    for p in glob.glob(os.path.join(man_dir, "cell-p00000-*-e00001.parquet")):
        os.remove(p)
    os.remove(os.path.join(root, "state", "state-e00001.parquet"))
    import shutil

    for d in glob.glob(os.path.join(root, "tiers", "epoch=00001", "tier=*", "partition_id=0")):
        shutil.rmtree(d)
    # plus a half-written garbage file in another uncommitted partition
    for p in glob.glob(os.path.join(man_dir, "cell-p00001-*-e00001.parquet")):
        os.remove(p)
    junk_dir = os.path.join(root, "tiers", "epoch=00001", "tier=1m", "partition_id=1")
    with open(os.path.join(junk_dir, "garbage.parquet"), "wb") as f:
        f.write(b"\x00not a parquet file")

    r = run_epoch([f1], root, epoch=1, num_partitions=4, giveup_buckets=0)
    assert not r.get("skipped")
    again = _combined(root, [1])
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_product_assembly(epoch_setup):
    """S7 analog: consolidate epochs into one tier-partitioned product with
    BlankOutput validation; counts match the per-epoch cells."""
    import pytest as _pytest

    from ecov003_l2t_stars_ray.pipelines.product import (
        BlankProductError,
        assemble_product,
    )

    root, f1, f2, pdf = epoch_setup
    if not os.path.isdir(os.path.join(root, "tiers")):  # standalone run
        run_epoch([f1], root, epoch=1, num_partitions=4)
        run_epoch([f2], root, epoch=2, num_partitions=4)
        run_epoch([], root, epoch=3, num_partitions=4, giveup_buckets=0)
    out = os.path.join(root, "product")
    summary = assemble_product(root, [1, 2, 3], out)
    want = _combined(root, [1, 2, 3])
    got_total = sum(summary["tier_rows"][t] for t in ("1m", "1h", "1d"))
    assert got_total == len(want)
    assert os.path.exists(os.path.join(out, "summary.json"))

    with _pytest.raises(BlankProductError):
        assemble_product(root + "-nope", [1], out + "2")


def test_five_epoch_chain_matches_full_batch(tmp_path, small_transcripts):
    """Five time-sliced epochs + flush == one full-batch run (state chain
    stress: repeated checkpoint handoffs, pending re-reads, context rows)."""
    root = str(tmp_path / "root")
    pdf = small_transcripts.to_pandas()
    ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    qs = np.quantile(ts_us, [0.25, 0.45, 0.6, 0.8])
    bounds = [ts_us.min() - 1, *[int(q) for q in qs], ts_us.max() + 1]
    frags = []
    for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        f = str(tmp_path / f"f{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf[(ts_us > a) & (ts_us <= b)], preserve_index=False), f
        )
        frags.append(f)
    for e, f in enumerate(frags, start=1):
        run_epoch([f], root, epoch=e, num_partitions=4)
    run_epoch([], root, epoch=len(frags) + 1, num_partitions=4, giveup_buckets=0)

    got = _combined(root, list(range(1, len(frags) + 2)))
    want = oracle.tier_rollup(pdf, smooth=True)
    key = ["tier", "conv_id", "metric", "bucket_start"]
    got_i = got.set_index(key).sort_index()
    want_i = want.set_index(key).sort_index()
    assert len(got_i) == len(want_i)
    assert (got_i.index == want_i.index).all()
    assert (got_i["count"].to_numpy() == want_i["count"].to_numpy()).all()
    np.testing.assert_allclose(
        got_i["value"].to_numpy(), want_i["value"].to_numpy(), rtol=1e-7, atol=1e-9
    )


def test_empty_epoch_is_noop(tmp_path):
    r = run_epoch([], str(tmp_path / "root"), epoch=1, num_partitions=2)
    assert r["skipped"] is True and r["rows"] == 0


def test_deferred_need_predecessor_in_closed_fragment(tmp_path):
    """ADVICE regression: a turn deferred by the close rule whose
    predecessor lives in a CLOSED fragment (different day, never re-read)
    must still resolve its latency gap in the next epoch via the carried
    per-turn context records."""
    day = pd.Timestamp("2025-03-10")
    conv = "conv-x"

    def frag(path, rows):
        pdf = pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": np.array([r[0] for r in rows], dtype=np.int32),
                "role": "user",
                "text": "t",
                "tool": "",
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            }
        )
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        return path

    root = str(tmp_path / "root")
    # frag1: day D, ends 23:59 — its day closes in epoch 1
    f1 = frag(str(tmp_path / "f1.parquet"), [
        (0, day + pd.Timedelta("23:50:00")),
        (1, day + pd.Timedelta("23:55:00")),
        (2, day + pd.Timedelta("23:59:00")),
    ])
    # frag2: day D+1 — turn 3's predecessor (turn 2) is in f1
    f2 = frag(str(tmp_path / "f2.parquet"), [
        (3, day + pd.Timedelta("1 days 00:30:00")),
        (4, day + pd.Timedelta("1 days 01:00:00")),
    ])
    r1 = run_epoch([f1, f2], root, epoch=1, num_partitions=2)
    # f1's day is closed -> not pending; f2's day is open -> pending
    assert f2 in r1["pending_fragments"] and f1 not in r1["pending_fragments"]

    # epoch 2: new fragment two days later closes day D+1
    f3 = frag(str(tmp_path / "f3.parquet"), [
        (5, day + pd.Timedelta("2 days 12:00:00")),
    ])
    run_epoch([f3], root, epoch=2, num_partitions=2)
    run_epoch([], root, epoch=3, num_partitions=2, giveup_buckets=0)

    df = _combined(root, [1, 2, 3])
    lat_1h = df[(df.tier == "1h") & (df.metric == "latency") & (df["count"] > 0)]
    # the cross-fragment gap 23:59 -> 00:30 must appear in day D+1's first
    # hour bucket (1860 s); without the carried predecessor it is lost
    b = lat_1h[lat_1h.bucket_start == day + pd.Timedelta("1 days")]
    assert len(b) == 1, lat_1h[["bucket_start", "count", "sum"]]
    assert b["count"].iloc[0] == 1 and abs(b["sum"].iloc[0] - 1860.0) < 1e-9
