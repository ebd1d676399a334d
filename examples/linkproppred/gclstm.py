"""GC-LSTM snapshot (DTDG) link prediction.

Parity: /root/reference/examples/linkproppred/gclstm.py — discretize the
stream into snapshots, carry (H, C) through a GC-LSTM as snapshots advance,
predict event batches against the latest snapshot embedding, truncate BPTT at
snapshot boundaries, random negatives, MRR-free BCE training loop.
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph, TimeDeltaDG
from tgm_tpu.hooks import HookManager, RandomNegativeEdgeSamplerHook
from tgm_tpu.nn import GCLSTM, LinkPredictor
from tgm_tpu.util import seed_everything


def parse_args():
    p = argparse.ArgumentParser(description="GCLSTM snapshot link prediction")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--snapshot-ticks", type=int, default=100, help="graph ticks/snapshot")
    p.add_argument("--K", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 16)).astype(np.float32)
    num_nodes = data.num_nodes
    node_x = jnp.asarray(data.static_node_x)

    train_data, val_data, test_data = data.split()
    # Snapshot view: discretized to coarse buckets.
    coarse = TimeDeltaDG("s", args.snapshot_ticks)
    train_snap = DGraph(train_data.discretize(coarse))
    train_dg = DGraph(train_data)

    hm = HookManager(keys=["train"])
    dst = train_dg.edge_dst
    hm.register("train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max())))

    encoder = GCLSTM(in_channels=node_x.shape[1], out_channels=args.embed_dim, K=args.K)
    proj = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    enc_params = encoder.init(k1, node_x, e4, e4)
    dec_params = proj.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    @jax.jit
    def snapshot_step(params, H, C, sbatch):
        """Advance the recurrent state over one snapshot graph (BPTT truncated)."""
        H2, C2 = encoder.apply(
            params["enc"], node_x, sbatch.edge_src, sbatch.edge_dst,
            None, H, C, sbatch.edge_valid,
        )
        z = jax.nn.relu(H2)
        return jax.lax.stop_gradient(z), jax.lax.stop_gradient(H2), jax.lax.stop_gradient(C2)

    @partial(jax.jit, donate_argnums=(1,))
    def train_step(params, opt_state, z, batch):
        def loss_fn(p):
            safe = lambda ids: jnp.clip(ids, 0, num_nodes - 1)
            pos = proj.apply(p["dec"], z[safe(batch.edge_src)], z[safe(batch.edge_dst)])
            neg = proj.apply(p["dec"], z[safe(batch.edge_src)], z[safe(batch.neg)])
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    conversion = args.snapshot_ticks
    n_edges = train_dg.num_edge_events
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        H = C = jnp.zeros((num_nodes, args.embed_dim))
        snap_loader = iter(
            DGDataLoader(
                train_snap, args.snapshot_ticks, batch_unit="s",
                materialize_features=False,
            )
        )
        sbatch = next(snap_loader)
        z, H, C = snapshot_step(params, H, C, sbatch)
        snap_end = int(np.asarray(sbatch.edge_time).max())

        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                params, opt_state, loss = train_step(params, opt_state, z, batch)
                total += float(loss)
                nb += 1
                t_max = int(np.asarray(batch.edge_time).max())
                while t_max > (snap_end + 1) * conversion:
                    try:
                        sbatch = next(snap_loader)
                        z, H, C = snapshot_step(params, H, C, sbatch)
                        snap_end = int(np.asarray(sbatch.edge_time).max())
                    except StopIteration:
                        break
        dt = time.perf_counter() - t0
        print(f"epoch={epoch} loss={total / max(nb, 1):.4f} train_edges/s={n_edges / dt:.0f}")


if __name__ == "__main__":
    main()
