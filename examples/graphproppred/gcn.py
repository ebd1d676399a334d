"""GCN graph property prediction over weekly snapshots.

Parity: /root/reference/examples/graphproppred/gcn.py — snapshot graphs pooled
into graph-level embeddings (GraphPredictor) regressing a per-snapshot target;
MSE metric. The reference reads custom token CSVs via ``from_pandas`` with a
``TemporalRatioSplit``; here the synthetic target is the (normalized) next
snapshot's edge count — predictable from current activity.
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
from tgm_tpu.nn import GCN, GraphPredictor
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="GCN graphproppred")
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

    coarse = data.discretize(TimeDeltaDG("s", args.snapshot_ticks))
    dg = DGraph(coarse)
    loader = DGDataLoader(dg, args.snapshot_ticks, batch_unit="s", materialize_features=False)
    snapshots = list(loader)
    # Target: next snapshot's edge count, normalized.
    counts = np.array([float(np.asarray(b.edge_valid).sum()) for b in snapshots])
    targets = counts[1:] / max(counts.max(), 1.0)
    snapshots = snapshots[:-1]
    n_train = int(len(snapshots) * 0.7)

    encoder = GCN(hidden_dim=args.embed_dim, out_dim=args.embed_dim, num_layers=2)
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

    def predict(p, batch):
        z = encoder.apply(p["enc"], node_x, batch.edge_src, batch.edge_dst, None,
                          batch.edge_valid)
        return head.apply(p["head"], z)[0]

    @jax.jit
    def train_step(params, opt_state, batch, target):
        def loss_fn(p):
            return (predict(p, batch) - target) ** 2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_predict = jax.jit(predict)

    for epoch in range(args.epochs):
        total = 0.0
        for b, y in zip(snapshots[:n_train], targets[:n_train]):
            params, opt_state, loss = train_step(params, opt_state, b, jnp.asarray(y))
            total += float(loss)
        preds = np.array([float(eval_predict(params, b)) for b in snapshots[n_train:]])
        test_mse = float(np.mean((preds - targets[n_train:]) ** 2))
        print(f"epoch={epoch} train_mse={total / max(n_train, 1):.5f} test_mse={test_mse:.5f}")


if __name__ == "__main__":
    main()
