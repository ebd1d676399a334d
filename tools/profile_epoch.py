"""Profile the scanned TGN/TGAT epoch on the ambient device and rank ops.

Captures a ``jax.profiler`` trace of one (pre-compiled) epoch and aggregates
the device plane's op durations by fused-op name, printing the top-N —
the measurement step behind every kernel/layout decision (CLAUDE.md: measure
before assuming; round-1 negative results came from skipping this).

The TensorBoard converter is version-broken in this image, so the xplane
protobuf is parsed directly (requires
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python``, set before imports below).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_xplane(trace_dir: str, top: int = 40, min_us: float = 1.0):
    """Aggregate device-plane event durations by op name from an xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    results = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals: dict = defaultdict(float)
        counts: dict = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e6  # -> us
                counts[name] += 1
        if totals:
            results[plane.name] = (totals, counts)
    return results


def print_report(results, top: int = 40):
    for plane, (totals, counts) in results.items():
        total_us = sum(totals.values())
        print(f"\n=== {plane}  (sum of op durations: {total_us/1e3:.2f} ms) ===")
        print(f"{'us total':>12} {'%':>6} {'count':>8}  op")
        for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{us:12.1f} {100*us/total_us:6.2f} {counts[name]:8d}  {name[:120]}")


def run_and_trace(args) -> str:
    import jax
    import numpy as np

    cache_dir = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES, build_stream
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import (
        DeviceEdgeStream,
        TGATPipeline,
        TGNPipeline,
        jit_scan_epoch,
    )

    if args.smoke:
        nn_, ne, ed = 500, 8_000, 32
    else:
        nn_, ne, ed = WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM
    data = build_stream(nn_, ne, ed)
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, args.bsize)
    if args.model == "tgat":
        import jax.numpy as jnp

        node_x = jnp.asarray(
            np.random.default_rng(0).normal(size=(nn_, 1)).astype(np.float32)
        )
        pipe = TGATPipeline(
            num_nodes=nn_, edge_dim=ed, node_x=node_x, num_nbrs=(10, 10),
            time_dim=100, embed_dim=100, lr=1e-4,
            neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
            edge_x_full=stream.edge_x,
        )
    else:
        pipe = TGNPipeline(
            num_nodes=nn_, edge_dim=ed, memory_dim=100, embed_dim=100,
            time_dim=100, num_nbrs=10, lr=1e-4,
            neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
            edge_x_full=stream.edge_x,
        )
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)

    carry, losses = epoch(carry)  # compile + warm
    jax.block_until_ready(losses)

    import time

    t0 = time.perf_counter()
    carry, losses = epoch(carry)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    print(f"epoch (untraced): {dt*1e3:.1f} ms -> {ne/dt:.0f} edges/s")

    with jax.profiler.trace(args.trace_dir):
        carry, losses = epoch(carry)
        jax.block_until_ready(losses)
    return args.trace_dir


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--model", type=str, default="tgn", choices=["tgn", "tgat"])
    p.add_argument("--trace-dir", type=str, default="/tmp/tgm_trace")
    p.add_argument("--parse-only", action="store_true",
                   help="only parse an existing trace dir")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    if not args.parse_only:
        run_and_trace(args)
    print_report(parse_xplane(args.trace_dir), top=args.top)


if __name__ == "__main__":
    main()
