"""Profiling helpers.

Parity: reference ``tools/profiling.py:11-42`` (cProfile context-decorator
with a top-cumtime report). TPU addition: ``device_trace`` wraps
``jax.profiler`` so a block's device execution can be captured to a
Perfetto-compatible trace directory.
"""

from __future__ import annotations

import cProfile
import contextlib
import io
import pstats
from typing import Optional


class Profiling(contextlib.ContextDecorator):
    """Host-side cProfile of a block; prints the top cumulative-time rows."""

    def __init__(self, top_fraction: float = 0.2, sort: str = "cumtime") -> None:
        if not 0 < top_fraction <= 1:
            raise ValueError("top_fraction must be in (0, 1]")
        self.top_fraction = top_fraction
        self.sort = sort
        self._profiler: Optional[cProfile.Profile] = None

    def __enter__(self) -> "Profiling":
        self._profiler = cProfile.Profile()
        self._profiler.enable()
        return self

    def __exit__(self, *exc) -> bool:
        assert self._profiler is not None
        self._profiler.disable()
        buf = io.StringIO()
        stats = pstats.Stats(self._profiler, stream=buf)
        stats.strip_dirs().sort_stats(self.sort).print_stats(self.top_fraction)
        print(buf.getvalue())
        return False


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax device trace (open with Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
