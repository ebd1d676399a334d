"""TPNet node property prediction.

Parity: /root/reference/examples/nodeproppred/tpnet.py — labeled nodes'
recent-neighbor sequences through TPNet (paired with themselves for the
random-projection pairwise features), NodePredictor head, NDCG@10.
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
from tgm_tpu.nn import NodePredictor, RandomProjectionModule, TPNet
from tgm_tpu.nn.encoder.tpnet import rp_update
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="TPNet nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, default=7)
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
    edge_dim = dgs[0].edge_x_dim or 0

    hm = HookManager(keys=["all"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nodes, [args.n_nbrs], ["node_y_nids"], ["node_y_time"], edge_dim=edge_dim
        )
    )

    rp = RandomProjectionModule(
        num_nodes=num_nodes, num_layer=2, time_decay_weight=1e-6,
        use_matrix=False, enforce_dim=min(64, num_nodes),
    )
    encoder = TPNet(
        node_feat_dim=node_x.shape[1], edge_x_dim=edge_dim, time_feat_dim=args.time_dim,
        output_dim=args.embed_dim, num_neighbors=args.n_nbrs, num_layers=1,
        dropout=args.dropout, random_projections=rp,
    )
    decoder = NodePredictor(in_dim=args.embed_dim, out_dim=num_classes)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    key, kr, k1, k2 = jax.random.split(key, 4)
    rp_state0 = rp.init_state(kr)

    def encode(p, rp_state, batch, rng=None):
        nids = batch.node_y_nids
        t = batch.node_y_time
        nbr = batch.nbr_nids[0]
        nt = batch.nbr_edge_time[0]
        nx = batch.nbr_edge_x[0]
        rngs = None if rng is None else {"dropout": rng}
        zs, _ = encoder.apply(
            p["enc"], node_x, nids, nids, t,
            jnp.concatenate([nbr, nbr]), jnp.concatenate([nt, nt]),
            jnp.concatenate([nx, nx]), rp_state,
            deterministic=rng is None, rngs=rngs,
        )
        return decoder.apply(p["dec"], zs)

    with hm.activate("all"):
        b0 = next(iter(DGDataLoader(dgs[0], args.bsize, hook_manager=hm)))
    hm.reset_state()
    nbr0 = b0.nbr_nids[0]
    enc_params = encoder.init(
        k1, node_x, b0.node_y_nids, b0.node_y_nids, b0.node_y_time,
        jnp.concatenate([nbr0, nbr0]), jnp.concatenate([b0.nbr_edge_time[0]] * 2),
        jnp.concatenate([b0.nbr_edge_x[0]] * 2), rp_state0,
    )
    params = {"enc": enc_params, "dec": decoder.init(k2, jnp.zeros((1, args.embed_dim)))}
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def train_step(params, opt_state, rng, rp_state, batch):
        rng, kd = jax.random.split(rng)

        def loss_fn(p):
            logits = encode(p, rp_state, batch, kd)
            loss = optax.softmax_cross_entropy(logits, batch.node_y)
            m = batch.node_y_valid.astype(loss.dtype)
            return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        rp_state = rp_update(
            rp_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_valid, rp.time_decay_weight,
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, rng, rp_state, loss

    @partial(jax.jit, donate_argnums=(1,))
    def eval_step(params, rp_state, batch):
        ndcg = ndcg_at_k(
            encode(params, rp_state, batch), batch.node_y, k=10,
            row_valid=batch.node_y_valid,
        )
        rp_state = rp_update(
            rp_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_valid, rp.time_decay_weight,
        )
        return rp_state, ndcg

    state = {"params": params, "opt": opt_state, "key": key, "rp": rp_state0}

    def run(dg, train: bool):
        out = []
        with hm.activate("all"):
            for batch in DGDataLoader(dg, args.bsize, hook_manager=hm):
                if batch.node_y_nids is None:
                    continue
                if train:
                    (state["params"], state["opt"], state["key"], state["rp"], loss
                     ) = train_step(state["params"], state["opt"], state["key"], state["rp"], batch)
                    out.append(float(loss))
                else:
                    state["rp"], ndcg = eval_step(state["params"], state["rp"], batch)
                    out.append(float(ndcg))
        return float(np.mean(out)) if out else 0.0

    for epoch in range(args.epochs):
        state["rp"] = rp.init_state(kr)
        t0 = time.perf_counter()
        loss = run(dgs[0], True)
        dt = time.perf_counter() - t0
        val = run(dgs[1], False) if len(dgs) > 1 else 0.0
        print(f"epoch={epoch} loss={loss:.4f} val_ndcg={val:.4f} ({dt:.1f}s)")
        if epoch < args.epochs - 1:
            hm.reset_state()
    print(f"test_ndcg={run(dgs[-1], False):.4f}")


if __name__ == "__main__":
    main()
