"""ecov003_l2t_stars_ray — a Ray-Data-native time-series rollup engine.

A from-scratch engine with the query / data-processing capabilities of the
reference ECOv003-L2T-STARS Bayesian time-series fusion system (surveyed in
SURVEY.md), re-expressed over ``ray.data.Dataset`` pipelines:

- raw -> 1m -> 1h -> 1d continuous-aggregate rollup tiers over Parquet
  transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``
  (reference analog: the 70m/490m/980m resolution ladder,
  ``ECOv003_L2T_STARS/constants.py:29-31``);
- stateful Kalman/Bayesian gap-fill smoothers per (conv_id, metric) series
  (reference analog: the STARS fusion kernel,
  ``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``);
- Gorilla delta-of-delta timestamp + XOR value compression per tier block;
- per-partition lineage manifest with watermarks and checkpoint epochs for
  resumable, exactly-once output (reference analog: file-exists skip +
  prior/posterior state chain, ``L2T_STARS.py:134-138,327-335``).

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"

import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
# Allocator RETENTION (second host pathology, found r3 after a sandbox
# reboot): with the slow hypervisor fault path, 4 KB first-touch faults cap
# at ~2.8 GB/s VM-WIDE, so any allocator that returns freed memory to the
# OS (glibc trim/munmap, mimalloc purge) re-pays faults every batch.
# Keep freed memory resident: faults are then paid once per high-water
# mark per process (measured 2.3x on repeated 400 MB numpy allocs).
# Env vars cover child processes (Ray workers inherit); mallopt below
# covers the current process, whose glibc already read its env.
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
_os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
_os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")
_os.environ.setdefault("MIMALLOC_PAGE_RESET", "0")

try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None, use_errno=True)
    _libc.mallopt(_ctypes.c_int(-1), _ctypes.c_int(0x7FFFFFFF))  # M_TRIM_THRESHOLD
    _libc.mallopt(_ctypes.c_int(-3), _ctypes.c_int(0x40000000))  # M_MMAP_THRESHOLD
except Exception:  # pragma: no cover - non-glibc platforms
    pass

import numpy as _np  # noqa: E402
import pyarrow as _pa  # noqa: E402

try:
    # On hosts with transparent_hugepage=madvise whose 2 MB fault path is
    # slow (measured here: ~0.4 s per 2 MB fault under the sandbox
    # hypervisor — np.cumsum over a fresh 160 MB buffer took 16-26 s vs
    # 0.16 s without THP madvise, a ~100x swing on every large fresh
    # allocation), numpy's MADV_HUGEPAGE on >=4 MB buffers is a severe
    # pessimization. Flip the runtime switch so EVERY process that imports
    # this package (driver, Ray workers, pytest, bench) takes 4 KB faults;
    # the env var above covers child processes that import numpy first.
    _np.core.multiarray._set_madvise_hugepage(False)
except Exception:  # pragma: no cover - numpy-version dependent
    pass

try:
    # Arrow's default jemalloc pool madvises THP too (measured 36 s to
    # first-touch 200 MB vs 0.23 s under mimalloc on this host); the env
    # var above fixes processes that import pyarrow later, this fixes the
    # current one
    if _pa.default_memory_pool().backend_name == "jemalloc":
        _pa.set_memory_pool(_pa.mimalloc_memory_pool())
except Exception:  # pragma: no cover - build-dependent pools
    pass

from . import schema  # noqa: F401,E402
