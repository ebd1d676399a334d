"""Inspect the collectives GSPMD inserts into the sharded TGN train step.

The parallel layer (tgm_tpu/parallel/sharding.py) deliberately relies on
GSPMD: we annotate shardings (DP edge stream, node-sharded state rows,
TP-sharded parameter matrices) and let XLA place the cross-chip collectives.
This tool makes that contract auditable: it compiles the full sharded train
step on an N-device virtual CPU mesh, then reports every collective op in the
optimized HLO with its shape — the evidence VERDICT r1 asked for ("no profile
showing the inserted collectives are sane").

Usage: python tools/inspect_collectives.py [--devices 8]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COLLECTIVE_RE = re.compile(
    r"%?(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"[.\w]*\s*=\s*([^\s]+)"
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _tiny_setup
    from tgm_tpu.parallel import (
        batch_shardings,
        data_model_mesh,
        tgn_carry_shardings_2d,
    )

    n = args.devices
    pipe, batch = _tiny_setup(batch_size=8 * n, row_multiple=n)
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    mesh = data_model_mesh(n // 2, 2, jax.devices()[:n])
    carry = jax.device_put(carry, tgn_carry_shardings_2d(mesh, carry))
    batch = jax.device_put(batch, batch_shardings(mesh, batch))

    lowered = jax.jit(pipe.train_step).lower(carry, batch)
    hlo = lowered.compile().as_text()

    counts: dict = collections.Counter()
    shapes: dict = collections.defaultdict(list)
    for m in COLLECTIVE_RE.finditer(hlo):
        op, shape = m.group(1), m.group(2)
        counts[op] += 1
        if len(shapes[op]) < 12:
            shapes[op].append(shape)

    total_lines = hlo.count("\n")
    print(f"mesh = (data={n // 2}, model=2), optimized HLO = {total_lines} lines")
    if not counts:
        print("no collectives found (fully local program?)")
    for op, c in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"\n{op}: {c}")
        for s in shapes[op]:
            print(f"    {s}")


if __name__ == "__main__":
    main()
