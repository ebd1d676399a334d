"""TGAT node property prediction.

Parity: /root/reference/examples/nodeproppred/tgat.py — recency neighbors
seeded on the labeled nodes at label time, TGAT embeddings, NodePredictor,
soft-label cross-entropy training, NDCG@10 eval.
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
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.eval.metrics import ndcg_at_k
from tgm_tpu.hooks import HookManager, RecencyNeighborHook
from tgm_tpu.nn import TGAT, NodePredictor
from tgm_tpu.train.tgat_pipeline import default_attn_bf16
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="TGAT nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[10])
    p.add_argument("--time-dim", type=int, default=32)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=10)
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset, node_label_classes=args.num_classes)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 8)).astype(np.float32)
    num_nodes = data.num_nodes
    num_classes = data.node_y.shape[1]
    node_x = jnp.asarray(data.static_node_x)
    splits = data.split()
    dgs = [DGraph(s) for s in splits]
    train_dg = dgs[0]
    edge_dim = train_dg.edge_x_dim or 0

    hm = HookManager(keys=["all"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nodes, args.n_nbrs, ["node_y_nids"], ["node_y_time"], edge_dim=edge_dim
        )
    )

    encoder = TGAT(
        node_dim=node_x.shape[1], edge_dim=edge_dim, time_dim=args.time_dim,
        embed_dim=args.embed_dim, num_layers=len(args.n_nbrs), dropout=args.dropout,
        kv_bf16=default_attn_bf16(),
    )
    decoder = NodePredictor(in_dim=args.embed_dim, out_dim=num_classes)
    opt = optax.adam(args.lr)

    with hm.activate("all"):
        b0 = next(
            b for b in DGDataLoader(train_dg, args.bsize, hook_manager=hm)
            if b.node_y_nids is not None
        )
    hm.reset_state()

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    enc_params = encoder.init(
        k1, node_x, b0.seed_nids, b0.seed_times, b0.nbr_nids, b0.nbr_edge_x, b0.nbr_edge_time
    )
    dec_params = decoder.init(k2, jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def predict(p, batch, rng=None):
        rngs = None if rng is None else {"dropout": rng}
        z = encoder.apply(
            p["enc"], node_x, batch.seed_nids, batch.seed_times,
            batch.nbr_nids, batch.nbr_edge_x, batch.nbr_edge_time,
            deterministic=rng is None, rngs=rngs,
        )
        return decoder.apply(p["dec"], z)

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, opt_state, rng, batch):
        rng, kd = jax.random.split(rng)

        def loss_fn(p):
            logits = predict(p, batch, kd)
            loss = optax.softmax_cross_entropy(logits, batch.node_y)
            m = batch.node_y_valid.astype(loss.dtype)
            return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    @jax.jit
    def eval_step(params, batch):
        logits = predict(params, batch)
        return ndcg_at_k(logits, batch.node_y, k=10, row_valid=batch.node_y_valid)

    def run(dg, train: bool):
        nonlocal params, opt_state, key
        metrics = []
        with hm.activate("all"):
            for batch in DGDataLoader(dg, args.bsize, hook_manager=hm):
                if batch.node_y_nids is None:
                    continue
                if train:
                    params, opt_state, key, loss = train_step(params, opt_state, key, batch)
                    metrics.append(float(loss))
                else:
                    metrics.append(float(eval_step(params, batch)))
        return float(np.mean(metrics)) if metrics else 0.0

    n_labels = train_dg.num_node_labels
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run(train_dg, train=True)
        dt = time.perf_counter() - t0
        val = run(dgs[1], train=False) if len(dgs) > 1 else 0.0
        print(f"epoch={epoch} loss={loss:.4f} val_ndcg={val:.4f} labels/s={n_labels / dt:.0f}")
        hm.reset_state()

    for dg in dgs[:-1]:
        with hm.activate("all"):
            for _ in DGDataLoader(dg, args.bsize, hook_manager=hm):
                pass
    test = run(dgs[-1], train=False)
    print(f"test_ndcg={test:.4f}")


if __name__ == "__main__":
    main()
