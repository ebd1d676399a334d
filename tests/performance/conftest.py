"""Performance tier (mirrors /root/reference/test/performance/conftest.py:1-30).

The reference parametrizes its benchmark suite over TGB dataset tiers
(small: tgbl-wiki / tgbn-trade, …) loaded from disk; the `tgb` package is not
installed here, so the same shapes are synthesized (wiki-shaped stream:
~9k nodes, ~157k edges, 172-dim edge features, second-resolution timestamps
spanning ~1 month). Throughputs are reported in M events/sec exactly like the
reference's `benchmark.extra_info['throughput_M_events_per_sec']`.

Gated behind RUN_PERF=1 so the (timing-sensitive) tier never runs inside the
functional CPU suite — the reference likewise runs its perf suite in a
dedicated workflow (.github/workflows/performance.yml).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_PERF"):
        return
    skip = pytest.mark.skip(reason="performance tier: set RUN_PERF=1")
    for item in items:
        if "tests/performance" in str(getattr(item, "fspath", "")):
            item.add_marker(skip)


# (name, num_nodes, num_edges, edge_dim) — "small tier" wiki shape plus a
# coarse trade-like shape (few nodes, yearly granularity in the reference).
DATASETS = [
    ("wiki-shaped", 9_227, 157_474, 172),
    ("trade-shaped", 255, 40_000, 1),
]


def build_raw(name: str):
    """Raw numpy columns for a dataset shape (the from_raw input — what the
    reference's from_tgb reads off disk before validation/sorting)."""
    shape = {d[0]: d for d in DATASETS}[name]
    _, num_nodes, num_edges, edge_dim = shape
    rng = np.random.default_rng(0)
    # ~1 month of second-resolution events (supports D/M/Y discretization).
    t = np.sort(rng.integers(0, 30 * 86_400, num_edges)).astype(np.int64)
    src = rng.integers(0, num_nodes // 2, num_edges)
    dst = rng.integers(num_nodes // 2, num_nodes, num_edges)
    edge_x = rng.normal(size=(num_edges, edge_dim)).astype(np.float32)
    return dict(
        edge_time=t, edge_index=np.stack([src, dst], 1), edge_x=edge_x,
        time_delta="s",
    )


def build_dataset(name: str):
    from tgm_tpu import DGData

    return DGData.from_raw(**build_raw(name))


@pytest.fixture(scope="session")
def preloaded_graphs():
    return {name: build_dataset(name) for name, *_ in DATASETS}


@pytest.fixture(autouse=True)
def _isolate_jit_caches():
    """Each benchmark measures from a clean compilation-cache state.

    Without this, executables + retained device buffers from earlier matrix
    cells accumulate tens of GB of RSS and the late cells slow down by
    orders of magnitude from allocator pressure (measured: the final cell
    runs in ~2 s in a fresh process but was still running 45 min into a
    full-matrix session)."""
    yield
    import jax

    jax.clear_caches()


def measure(fn, *, min_rounds: int = 3, warmup: int = 1) -> float:
    """Best-of-N wall-clock seconds (pytest-benchmark isn't installed)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(min_rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best
