"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import os

# before Ray starts workers: THP-madvise numpy faults are ~100x slow on
# this host (see package __init__); workers inherit this env
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
# allocator retention: see package __init__ (slow-fault host; keep freed
# memory resident so first-touch faults are paid once, not per batch)
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")
os.environ.setdefault("MIMALLOC_PAGE_RESET", "0")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_transcripts():
    """Deterministic small corpus (FIXTURES.md F1 'small' scale)."""
    from ecov003_l2t_stars_ray.sources.synthetic import generate_transcripts

    return generate_transcripts(n_convs=60, seed=42, mean_turns=40)


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    from ecov003_l2t_stars_ray.sources.synthetic import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_convs=60, seed=42, mean_turns=40, n_shards=4)
    return str(d)
