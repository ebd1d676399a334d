"""TGCN graph property prediction over snapshots.

Parity: /root/reference/examples/graphproppred/tgcn.py — TGCN recurrence over
snapshot graphs, pooled graph embedding regressing the per-snapshot target.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph, TimeDeltaDG
from tgm_tpu.nn import TGCN, GraphPredictor
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="TGCN graphproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embed-dim", type=int, default=32)
    p.add_argument("--snapshot-ticks", type=int, default=200)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 8)).astype(np.float32)
    node_x = jnp.asarray(data.static_node_x)
    num_nodes = data.num_nodes

    coarse = data.discretize(TimeDeltaDG("s", args.snapshot_ticks))
    loader = DGDataLoader(DGraph(coarse), args.snapshot_ticks, batch_unit="s",
                          materialize_features=False)
    snapshots = list(loader)
    counts = np.array([float(np.asarray(b.edge_valid).sum()) for b in snapshots])
    targets = counts[1:] / max(counts.max(), 1.0)
    snapshots = snapshots[:-1]
    n_train = int(len(snapshots) * 0.7)

    encoder = TGCN(in_channels=node_x.shape[1], out_channels=args.embed_dim)
    head = GraphPredictor(in_dim=args.embed_dim, out_dim=1)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "enc": encoder.init(k1, node_x, e4, e4),
        "head": head.init(k2, jnp.zeros((4, args.embed_dim))),
    }
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, H, batch, target):
        def loss_fn(p):
            H2 = encoder.apply(p["enc"], node_x, batch.edge_src, batch.edge_dst, None,
                               H, batch.edge_valid)
            pred = head.apply(p["head"], H2)[0]
            return (pred - target) ** 2, H2

        (loss, H2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, jax.lax.stop_gradient(H2), loss

    @jax.jit
    def predict(params, H, batch):
        H2 = encoder.apply(params["enc"], node_x, batch.edge_src, batch.edge_dst, None,
                           H, batch.edge_valid)
        return head.apply(params["head"], H2)[0], H2

    for epoch in range(args.epochs):
        H = jnp.zeros((num_nodes, args.embed_dim))
        total = 0.0
        for b, y in zip(snapshots[:n_train], targets[:n_train]):
            params, opt_state, H, loss = step(params, opt_state, H, b, jnp.asarray(y))
            total += float(loss)
        preds = []
        for b in snapshots[n_train:]:
            pred, H = predict(params, H, b)
            preds.append(float(pred))
        test_mse = float(np.mean((np.array(preds) - targets[n_train:]) ** 2))
        print(f"epoch={epoch} train_mse={total / max(n_train, 1):.5f} test_mse={test_mse:.5f}")


if __name__ == "__main__":
    main()
