"""Serving-style TGN link scoring: restore a checkpoint, stream new events,
emit link probabilities at scan rate.

A capability beyond the reference (which has no persistence or serving
story): train briefly, checkpoint the FULL carry (params + memory + recency
buffers + optimizer + PRNG), restore it in a fresh process-state, and score
an incoming event stream as one scanned XLA program — each batch is scored
against its edges BEFORE the state advances (reference eval ordering,
/root/reference/examples/linkproppred/tgn.py:125-184), so the output is a
causally-valid probability per event.

Usage::

    python examples/serving/tgn_scoring.py --dataset synthetic-300-4000
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from examples._datasets import load_dataset  # noqa: E402
from tgm_tpu import DGraph  # noqa: E402
from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch  # noqa: E402
from tgm_tpu.train.checkpoint import restore_checkpoint, save_checkpoint  # noqa: E402
from tgm_tpu.util import seed_everything  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint dir (default: a temp dir)")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    seed_everything(args.seed)
    data, _, _ = load_dataset(args.dataset)
    train_data, val_data, _ = data.split()
    train_dg, val_dg = DGraph(train_data), DGraph(val_data)
    num_nodes = data.num_nodes
    edge_dim = train_dg.edge_x_dim or 0

    pipe = TGNPipeline(
        num_nodes=num_nodes, edge_dim=edge_dim, memory_dim=32, embed_dim=32,
        time_dim=16, num_nbrs=5, lr=1e-3,
        neg_low=int(train_dg.edge_dst.min()), neg_high=int(train_dg.edge_dst.max()),
    )

    # --- train + checkpoint ------------------------------------------- #
    train_stream = DeviceEdgeStream(train_dg, args.bsize)
    epoch = jit_scan_epoch(pipe.train_step, train_stream.batch_at,
                           train_stream.num_batches)
    carry = pipe.init_carry(jax.random.PRNGKey(args.seed))
    for _ in range(args.epochs):
        carry, losses = epoch(carry)
    carry = pipe.flush_all(carry)

    ckpt_dir = args.ckpt or tempfile.mkdtemp(prefix="tgn_serving_")
    save_checkpoint(ckpt_dir, carry)
    print(f"checkpointed full carry -> {ckpt_dir}")

    # --- restore + serve ----------------------------------------------- #
    restored = restore_checkpoint(ckpt_dir, carry)

    serve_stream = DeviceEdgeStream(val_dg, args.bsize)

    def serve_step(c, batch):
        # Score the incoming events against the CURRENT state, then advance
        # it (eval-mode ordering) — one pure transition, scan-compatible.
        scores = jax.nn.sigmoid(pipe.forward_only(c, batch)[0])
        c, _ = pipe.eval_step(
            c, batch, jnp.full((batch.edge_src.shape[0], 1), -1, jnp.int32)
        )
        return c, scores

    serve = jit_scan_epoch(serve_step, serve_stream.batch_at,
                           serve_stream.num_batches, donate_carry=False)
    _, scores = serve(restored)  # compile + warm
    t0 = time.perf_counter()
    _, scores = serve(restored)
    jax.block_until_ready(scores)
    dt = time.perf_counter() - t0
    flat = np.asarray(scores).reshape(-1)
    n_events = val_dg.num_edge_events
    print(
        f"served {n_events} events in {dt*1e3:.1f} ms "
        f"({n_events/dt:.0f} events/s); "
        f"mean p(link)={flat[:n_events].mean():.4f}"
    )


if __name__ == "__main__":
    main()
