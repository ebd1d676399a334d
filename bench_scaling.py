"""Multi-chip scaling benchmark: sharded TGN training across a device mesh.

Measures edges/s of the full sharded train step (DP over the batch edge axis
+ node-sharded memory/recency state, tgm_tpu/parallel layouts) at increasing
device counts, reporting scaling efficiency vs 1 device.

On real multi-chip hardware this is the ≥80%-efficiency measurement from
BASELINE.md; on a single-host environment pass ``--virtual-cpu`` to exercise
the identical program over virtual CPU devices (correctness/compile
validation only — CPU numbers are not throughput-meaningful).

Prints one JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--bsize-per-device", type=int, default=200)
    p.add_argument("--num-nodes", type=int, default=2048)
    p.add_argument("--num-edges", type=int, default=40_000)
    p.add_argument("--edge-dim", type=int, default=32)
    p.add_argument("--virtual-cpu", action="store_true")
    args = p.parse_args()

    if args.virtual_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        n = max(args.devices)
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()

    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    import numpy as np

    from bench import build_stream
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.parallel import batch_shardings, make_mesh, tgn_carry_shardings
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    data = build_stream(args.num_nodes, args.num_edges, args.edge_dim)
    dg = DGraph(data)

    base = None
    for n in args.devices:
        if n > len(jax.devices()):
            print(json.dumps({"metric": f"scaling_n{n}", "skipped": "not enough devices"}))
            continue
        mesh = make_mesh([n], ("data",), jax.devices()[:n])
        bs = args.bsize_per_device * n
        stream = DeviceEdgeStream(dg, bs)
        pipe = TGNPipeline(
            num_nodes=args.num_nodes, edge_dim=args.edge_dim, memory_dim=64,
            embed_dim=64, time_dim=32, num_nbrs=10,
            neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
            state_row_multiple=n,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(0))
        carry = jax.device_put(carry, tgn_carry_shardings(mesh, carry))

        def sharded_step(c, b):
            b = jax.tree_util.tree_map(
                lambda x, s: jax.lax.with_sharding_constraint(x, s),
                b, batch_shardings(mesh, b),
            )
            return pipe.train_step(c, b)

        epoch = jit_scan_epoch(sharded_step, stream.batch_at, stream.num_batches)
        carry, losses = epoch(carry)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        carry, losses = epoch(carry)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        eps = args.num_edges / dt
        if base is None:
            base = eps
        eff = eps / (base * n)
        print(
            json.dumps(
                {
                    "metric": f"tgn_sharded_edges_per_sec_n{n}",
                    "value": round(eps, 1),
                    "unit": "edges/s",
                    "devices": n,
                    "scaling_efficiency": round(eff, 3),
                    "loss_finite": bool(np.isfinite(np.asarray(losses)).all()),
                }
            )
        )


if __name__ == "__main__":
    main()
