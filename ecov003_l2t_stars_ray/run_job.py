"""CLI entry point: run one rollup epoch from a JSON job config.

The ``ECOv003-L2T-STARS`` console-script analog (``main.py:13-165`` ->
``L2T_STARS(...)``): parse config, run the epoch, exit code per failure
class (``L2T_STARS.py:477-503``). This script OWNS the Ray session
(guarded init; library code never calls ray.init).

    python -m ecov003_l2t_stars_ray.run_job --config job.json
    python -m ecov003_l2t_stars_ray.run_job --input 'data/*.parquet' \
        --output /tmp/out --epoch 1
"""

from __future__ import annotations

import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
# allocator retention: see package __init__ (slow-fault host; keep freed
# memory resident so first-touch faults are paid once, not per batch)
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")
os.environ.setdefault("MIMALLOC_PAGE_RESET", "0")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")  # see package __init__

import argparse
import glob
import json
import sys

EXIT_OK = 0
EXIT_CONFIG = 2
EXIT_RUNTIME = 3


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="path to RollupJobConfig JSON")
    ap.add_argument("--input", help="glob of input transcript parquet fragments")
    ap.add_argument("--output", help="output root directory")
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--giveup-buckets", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--address", default="local",
        help='Ray address: "local" starts a single-node session; "auto" '
             "connects to a running cluster (ray job submit / ray up)",
    )
    args = ap.parse_args(argv)

    from .config import RollupJobConfig

    try:
        if args.config:
            cfg = RollupJobConfig.load(args.config)
        else:
            if not (args.input and args.output):
                raise ValueError("--input and --output required without --config")
            cfg = RollupJobConfig(
                input_fragments=sorted(glob.glob(args.input)),
                output_root=args.output,
                epoch=args.epoch,
                num_partitions=args.num_partitions,
            )
        if args.giveup_buckets is not None:
            cfg.giveup_buckets = args.giveup_buckets
        if args.num_cpus is not None:
            cfg.num_cpus = args.num_cpus
        cfg.validate()
    except (ValueError, OSError, json.JSONDecodeError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return EXIT_CONFIG

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.address == "local":
            kwargs["num_cpus"] = cfg.num_cpus  # single-node dev/test session
        ray.init(address=args.address, **kwargs)
    try:
        from .pipelines.epochs import run_epoch

        summary = run_epoch(
            cfg.input_fragments,
            cfg.output_root,
            cfg.epoch,
            num_partitions=cfg.num_partitions,
            giveup_buckets=cfg.giveup_buckets,
            smooth=cfg.smooth,
        )
        print(json.dumps(summary))
        return EXIT_OK
    except Exception as e:  # runtime failure class
        print(f"runtime error: {type(e).__name__}: {e}", file=sys.stderr)
        return EXIT_RUNTIME
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
