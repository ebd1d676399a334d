"""Micro-benchmark the Pallas recency window-select kernel block size.

The TGAT hop-2 select (6016 rows, buffer B=10, K=10) measured 247us/step in
the epoch profile (~41us/1000 rows) — grid-step DMA latency on narrow
(block, 10) tiles is the suspected floor. Sweeps the row-block size.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6016)
    ap.add_argument("--buf", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))

    from tgm_tpu.ops.pallas.recency_select import (
        recency_window_select_eid,
        recency_window_select_eid_lanes,
    )

    rng = np.random.default_rng(0)
    S, B = args.rows, args.buf
    ids = jnp.asarray(rng.integers(0, 9227, (S, B)).astype(np.int32))
    times = jnp.asarray(np.sort(rng.integers(0, 1 << 20, (S, B)), axis=1).astype(np.int32))
    eids = jnp.asarray(rng.integers(0, 157474, (S, B)).astype(np.int32))
    wp = jnp.asarray(rng.integers(0, B, (S,)).astype(np.int32))
    qt = jnp.asarray(rng.integers(0, 1 << 20, (S,)).astype(np.int32))

    ref = None
    for block in (128, 256, 512, 1024, 2048):
        f = jax.jit(
            lambda i, t, e, w, q, blk=block: recency_window_select_eid(
                i, t, e, w, q, k=args.k, block=blk
            )
        )
        out = f(ids, times, eids, wp, qt)
        jax.block_until_ready(out)
        if ref is None:
            ref = [np.asarray(o) for o in out]
        else:
            for a, b in zip(ref, out):
                np.testing.assert_array_equal(a, np.asarray(b))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(ids, times, eids, wp, qt)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e6
        print(f"block={block:5d}: {dt:8.1f} us  ({dt / S * 1000:.1f} us/1k rows)")

    for block in (512, 1024, 2048, 4096):
        f = jax.jit(
            lambda i, t, e, w, q, blk=block: recency_window_select_eid_lanes(
                i, t, e, w, q, k=args.k, block=blk
            )
        )
        try:
            out = f(ids, times, eids, wp, qt)
            jax.block_until_ready(out)
        except Exception as exc:  # VMEM OOM etc.
            print(f"lanes block={block:5d}: failed ({type(exc).__name__})")
            continue
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(a, np.asarray(b))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(ids, times, eids, wp, qt)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e6
        print(f"lanes block={block:5d}: {dt:8.1f} us  ({dt / S * 1000:.1f} us/1k rows)")


if __name__ == "__main__":
    main()
