"""Micro-benchmark TPU row-gather cost vs table rows / width / dtype.

Motivated by the TGAT aug-table result: gathering 60k rows from a
bf16[315200, 173] table profiled at 522us/step while the same 60k rows from
bf16[157600, 172] cost 192us — per-row gather cost is supposed to be
table-size independent, so measure what actually moves it.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-idx", type=int, default=60_000)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))

    rng = np.random.default_rng(0)

    for rows in (157_600, 315_200):
        for width in (172, 173, 176, 256):
            for dt in (jnp.bfloat16, jnp.float32):
                table = jnp.asarray(
                    rng.normal(size=(rows, width)).astype(np.float32), dt
                )
                idx = jnp.asarray(
                    rng.integers(0, rows, args.n_idx).astype(np.int32)
                )

                f = jax.jit(lambda t, i: t[i])
                out = f(table, idx)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = f(table, idx)
                jax.block_until_ready(out)
                dt_us = (time.perf_counter() - t0) / args.iters * 1e6
                print(
                    f"rows={rows:7d} width={width:3d} {jnp.dtype(dt).name:8s}: "
                    f"{dt_us:8.1f} us ({dt_us / args.n_idx * 1000:.2f} us/1k rows)"
                )


if __name__ == "__main__":
    main()
