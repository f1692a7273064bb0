"""Scalar function library: date/time codecs, partition-path codecs.

Engine analogs of the reference's scalar helpers (SURVEY.md §2.8):

- parse-any date + inclusive daily range (``daterange/daterange.py:10-35``)
- %Y%j day-of-year codec (``VIIRSDataPool.py:36``, ``VNP43NRT.py:186``)
- earliest/latest datetime of a day (``VNP09GA.py:1003-1020``)
- tier-output filename template + parser, the partition-path codec analog
  of ``STARS_{variable}_{date}_{tile}_{cellsize}m.tif``
  (``generate_filename.py:26-37``; parse ``VIIRSDataPool.py:31-44``).
"""

from __future__ import annotations

import re
from datetime import date, datetime, time, timedelta

US_PER_DAY = 86_400_000_000


def parse_date(d: "str | date | datetime") -> date:
    """Parse-any date coercion (``daterange.py:10-20`` analog)."""
    if isinstance(d, datetime):
        return d.date()
    if isinstance(d, date):
        return d
    for fmt in ("%Y-%m-%d", "%Y%j", "%Y-%m-%dT%H:%M:%S", "%Y/%m/%d"):
        try:
            return datetime.strptime(d, fmt).date()
        except ValueError:
            continue
    raise ValueError(f"unparseable date: {d!r}")


def date_range(start, end) -> list[date]:
    """Inclusive daily range (``daterange.py:23-35`` analog)."""
    a, b = parse_date(start), parse_date(end)
    if b < a:
        raise ValueError("end before start")
    return [a + timedelta(days=i) for i in range((b - a).days + 1)]


def to_doy(d) -> str:
    """Day-of-year codec: date -> 'YYYYDDD' (``%Y%j``)."""
    return parse_date(d).strftime("%Y%j")


def from_doy(s: str) -> date:
    return datetime.strptime(s, "%Y%j").date()


def day_bounds(d) -> tuple[datetime, datetime]:
    """Earliest/latest datetime of the day (``VNP09GA.py:1003-1020``)."""
    dd = parse_date(d)
    return (
        datetime.combine(dd, time.min),
        datetime.combine(dd, time.max.replace(microsecond=999999)),
    )


_FRAGMENT_RE = re.compile(
    r"^tiers_(?P<tier>1m|1h|1d|raw)_e(?P<epoch>\d{5})_p(?P<partition>\d{5})\.parquet$"
)


def fragment_name(tier: str, epoch: int, partition: int) -> str:
    """Tier fragment filename codec (``generate_filename.py:26-37`` analog):
    encodes (tier, epoch, partition) exactly as the reference encodes
    (variable, date, tile, cellsize) in its product names."""
    return f"tiers_{tier}_e{epoch:05d}_p{partition:05d}.parquet"


def parse_fragment_name(name: str) -> dict:
    """Inverse codec (``VIIRSDataPool.py:31-44`` analog)."""
    m = _FRAGMENT_RE.match(name)
    if not m:
        raise ValueError(f"not a tier fragment name: {name!r}")
    return {
        "tier": m["tier"],
        "epoch": int(m["epoch"]),
        "partition": int(m["partition"]),
    }


def round6_away(x):
    """ROUND(x, 6) half-AWAY-from-zero — the bit-mirror of DuckDB ROUND
    on DOUBLE. ``np.round`` / pandas ``.round`` are half-EVEN and flip
    exact 6-dp ties the other way (first seen at sf0.1, where ~95k-row
    outputs land real ties: 60.8816825 -> 60.881682 vs the oracle's
    60.881683 — r5 gate). Every float column that is SQL-ROUND-mirrored
    must round through this helper."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
