"""DyGFormer node property prediction.

Parity: /root/reference/examples/nodeproppred/dygformer.py — labeled nodes'
recent-neighbor sequences through the DyGFormer transformer (the node paired
with itself), NodePredictor head, seen-node tracking, NDCG@10.
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
from tgm_tpu.hooks import EdgeEventsSeenNodesTrackHook, HookManager, RecencyNeighborHook
from tgm_tpu.nn import DyGFormer, NodePredictor
from tgm_tpu.util import seed_everything
from tgm_tpu.util.precision import resolve_bf16


def main():
    p = argparse.ArgumentParser(description="DyGFormer nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, default=7)
    p.add_argument("--time-dim", type=int, default=32)
    p.add_argument("--channel-dim", type=int, default=16)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument(
        "--compute-bf16", choices=["auto", "on", "off"], default="auto",
        help="bf16 matmul path for the transformer/projections "
        "(auto: on for TPU backends)",
    )
    p.add_argument("--max-seq-len", type=int, default=8)
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
    hm.register_shared(EdgeEventsSeenNodesTrackHook(num_nodes))

    encoder = DyGFormer(
        node_feat_dim=node_x.shape[1], edge_x_dim=edge_dim, time_feat_dim=args.time_dim,
        channel_embedding_dim=args.channel_dim, output_dim=args.embed_dim,
        max_input_sequence_length=args.max_seq_len, dropout=args.dropout, num_layers=1,
        compute_bf16=resolve_bf16(args.compute_bf16),
    )
    decoder = NodePredictor(in_dim=args.embed_dim, out_dim=num_classes)
    opt = optax.adam(args.lr)

    def encode(p, batch, rng=None):
        """Each labeled node paired with itself (both transformer sides)."""
        nids = batch.node_y_nids
        t = batch.node_y_time
        nbr = batch.nbr_nids[0]
        nt = batch.nbr_edge_time[0]
        nx = batch.nbr_edge_x[0]
        rngs = None if rng is None else {"dropout": rng}
        zs, zd = encoder.apply(
            p["enc"], node_x, nids, nids, t,
            jnp.concatenate([nbr, nbr]), jnp.concatenate([nt, nt]),
            jnp.concatenate([nx, nx]),
            deterministic=rng is None, rngs=rngs,
        )
        return decoder.apply(p["dec"], zs)

    with hm.activate("all"):
        b0 = next(iter(DGDataLoader(dgs[0], args.bsize, hook_manager=hm)))
    hm.reset_state()
    key = jax.random.PRNGKey(args.seed)
    key, k1 = jax.random.split(key)
    B0 = b0.node_y_nids.shape[0]
    nbr0 = b0.nbr_nids[0]
    enc_params = encoder.init(
        k1, node_x, b0.node_y_nids, b0.node_y_nids, b0.node_y_time,
        jnp.concatenate([nbr0, nbr0]),
        jnp.concatenate([b0.nbr_edge_time[0]] * 2),
        jnp.concatenate([b0.nbr_edge_x[0]] * 2),
    )
    key, k2 = jax.random.split(key)
    params = {"enc": enc_params, "dec": decoder.init(k2, jnp.zeros((1, args.embed_dim)))}
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, opt_state, rng, batch):
        rng, kd = jax.random.split(rng)

        def loss_fn(p):
            logits = encode(p, batch, kd)
            loss = optax.softmax_cross_entropy(logits, batch.node_y)
            # Only score nodes already seen in edge events (reference uses the
            # seen-node track hook for exactly this).
            m = (batch.node_y_valid & batch.batch_nodes_mask).astype(loss.dtype)
            return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    @jax.jit
    def eval_step(params, batch):
        logits = encode(params, batch)
        return ndcg_at_k(
            logits, batch.node_y, k=10,
            row_valid=batch.node_y_valid & batch.batch_nodes_mask,
        )

    def run(dg, train: bool):
        nonlocal params, opt_state, key
        out = []
        with hm.activate("all"):
            for batch in DGDataLoader(dg, args.bsize, hook_manager=hm):
                if batch.node_y_nids is None:
                    continue
                if train:
                    params, opt_state, key, loss = train_step(params, opt_state, key, batch)
                    out.append(float(loss))
                else:
                    out.append(float(eval_step(params, batch)))
        return float(np.mean(out)) if out else 0.0

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run(dgs[0], True)
        dt = time.perf_counter() - t0
        val = run(dgs[1], False) if len(dgs) > 1 else 0.0
        print(f"epoch={epoch} loss={loss:.4f} val_ndcg={val:.4f} ({dt:.1f}s)")
        hm.reset_state()
    for dg in dgs[:-1]:
        with hm.activate("all"):
            for _ in DGDataLoader(dg, args.bsize, hook_manager=hm):
                pass
    print(f"test_ndcg={run(dgs[-1], False):.4f}")


if __name__ == "__main__":
    main()
