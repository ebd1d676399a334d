"""GCN snapshot node property prediction.

Parity: /root/reference/examples/nodeproppred/gcn.py — per-snapshot GCN
embeddings, NodePredictor on labeled nodes, NDCG@10.
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
from tgm_tpu.eval.metrics import ndcg_at_k
from tgm_tpu.nn import GCN, NodePredictor
from tgm_tpu.util import seed_everything


def parse():
    p = argparse.ArgumentParser(description="GCN snapshot nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--snapshot-ticks", type=int, default=100)
    p.add_argument("--num-classes", type=int, default=10)
    return p.parse_args()


def make_encoder(args, node_dim):
    return GCN(hidden_dim=args.embed_dim, out_dim=args.embed_dim, num_layers=2)


def snapshot_apply(encoder, params, node_x, H, sbatch):
    z = encoder.apply(params, node_x, sbatch.edge_src, sbatch.edge_dst, None,
                      sbatch.edge_valid)
    return jax.lax.stop_gradient(z), None


def main(make_encoder=make_encoder, snapshot_apply=snapshot_apply, init_H=lambda *a: None):
    args = parse()
    seed_everything(args.seed)
    data, _, _ = load_dataset(args.dataset, node_label_classes=args.num_classes)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 16)).astype(np.float32)
    num_nodes = data.num_nodes
    num_classes = data.node_y.shape[1]
    node_x = jnp.asarray(data.static_node_x)
    splits = data.split()

    encoder = make_encoder(args, node_x.shape[1])
    head = NodePredictor(in_dim=args.embed_dim, out_dim=num_classes)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "enc": encoder.init(k1, node_x, e4, e4),
        "head": head.init(k2, jnp.zeros((1, args.embed_dim))),
    }
    opt_state = opt.init(params)
    snap_jit = jax.jit(lambda p, H, sb: snapshot_apply(encoder, p["enc"], node_x, H, sb))

    @partial(jax.jit, donate_argnums=(1,))
    def train_step(params, opt_state, z, batch):
        def loss_fn(p):
            logits = head.apply(p["head"], z[jnp.clip(batch.node_y_nids, 0, num_nodes - 1)])
            loss = optax.softmax_cross_entropy(logits, batch.node_y)
            m = batch.node_y_valid.astype(loss.dtype)
            return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, z, batch):
        logits = head.apply(params["head"], z[jnp.clip(batch.node_y_nids, 0, num_nodes - 1)])
        return ndcg_at_k(logits, batch.node_y, k=10, row_valid=batch.node_y_valid)

    coarse_td = TimeDeltaDG("s", args.snapshot_ticks)
    state = {"params": params, "opt": opt_state}

    def run(split_data, train: bool):
        dg = DGraph(split_data)
        snap_loader = iter(
            DGDataLoader(DGraph(split_data.discretize(coarse_td)), args.snapshot_ticks,
                         batch_unit="s", materialize_features=False)
        )
        H = init_H(num_nodes, args.embed_dim)
        try:
            sbatch = next(snap_loader)
        except StopIteration:
            return 0.0
        z, H = snap_jit(state["params"], H, sbatch)
        snap_end = int(np.asarray(sbatch.edge_time).max())
        metrics = []
        for batch in DGDataLoader(dg, args.bsize):
            if batch.node_y_nids is not None and bool(np.asarray(batch.node_y_valid).any()):
                if train:
                    state["params"], state["opt"], loss = train_step(
                        state["params"], state["opt"], z, batch
                    )
                    metrics.append(float(loss))
                else:
                    metrics.append(float(eval_step(state["params"], z, batch)))
            t_max = int(np.asarray(batch.edge_time).max())
            while t_max > (snap_end + 1) * args.snapshot_ticks:
                try:
                    sbatch = next(snap_loader)
                    z, H = snap_jit(state["params"], H, sbatch)
                    snap_end = int(np.asarray(sbatch.edge_time).max())
                except StopIteration:
                    break
        return float(np.mean(metrics)) if metrics else 0.0

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run(splits[0], train=True)
        dt = time.perf_counter() - t0
        val = run(splits[1], train=False) if len(splits) > 1 else 0.0
        print(f"epoch={epoch} loss={loss:.4f} val_ndcg={val:.4f} ({dt:.1f}s)")
    test = run(splits[-1], train=False)
    print(f"test_ndcg={test:.4f}")


if __name__ == "__main__":
    main()
