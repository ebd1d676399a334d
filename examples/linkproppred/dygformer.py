"""DyGFormer link prediction.

Parity: /root/reference/examples/linkproppred/dygformer.py — recency neighbor
sequences for src/dst seeds, DyGFormer patch transformer, LinkPredictor, TGB
MRR evaluation.
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
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.util.precision import resolve_bf16
from tgm_tpu.hooks import (
    candidate_rows,
    seed_lookup,
    HookManager,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
)
from tgm_tpu.nn import DyGFormer, LinkPredictor
from tgm_tpu.util import seed_everything


def parse_args():
    p = argparse.ArgumentParser(description="DyGFormer LinkPropPred Example")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, default=20)
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--channel-dim", type=int, default=50)
    p.add_argument("--embed-dim", type=int, default=172)
    p.add_argument("--patch-size", type=int, default=1)
    p.add_argument("--max-seq-len", type=int, default=32)
    p.add_argument(
        "--compute-bf16", choices=["auto", "on", "off"], default="auto",
        help="bf16 matmul path for the transformer/projections "
        "(auto: on for TPU backends)",
    )
    p.add_argument(
        "--eager", action="store_true",
        help="run the hook pipeline per batch from host Python instead of "
        "the default scanned hook-pipeline epochs",
    )
    return p.parse_args()


def main():
    args = parse_args()
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 1)).astype(np.float32)
    num_nodes = data.num_nodes
    node_x = jnp.asarray(data.static_node_x)
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)
    edge_dim = train_dg.edge_x_dim or 0

    hm = HookManager(keys=["train", "val", "test"])
    dst = train_dg.edge_dst
    hm.register("train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max())))
    if val_cands is not None:
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=val_cands))
        hm.register("test", TGBNegativeEdgeSamplerHook(candidates=test_cands))
    else:
        hm.register("val", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="val"))
        hm.register("test", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="test"))
    hm.register_shared(
        RecencyNeighborHook(
            num_nodes, [args.n_nbrs],
            ["edge_src", "edge_dst", "neg"], ["edge_time", "edge_time", "neg_time"],
            edge_dim=edge_dim,
        )
    )

    encoder = DyGFormer(
        node_feat_dim=node_x.shape[1], edge_x_dim=edge_dim, time_feat_dim=args.time_dim,
        channel_embedding_dim=args.channel_dim, output_dim=args.embed_dim,
        patch_size=args.patch_size, max_input_sequence_length=args.max_seq_len,
        dropout=args.dropout, compute_bf16=resolve_bf16(args.compute_bf16),
    )
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    def split_hops(batch, n_sides):
        """Neighbor rows for the first n_sides seed groups (src, dst[, neg])."""
        B = batch.edge_src.shape[0]
        return (
            batch.nbr_nids[0][: n_sides * B],
            batch.nbr_edge_time[0][: n_sides * B],
            batch.nbr_edge_x[0][: n_sides * B],
        )

    def encode_pair(p, batch, seed_a, seed_b, nbrs, nts, nxs, rng=None):
        det = rng is None
        rngs = None if det else {"dropout": rng}
        return encoder.apply(
            p["enc"], node_x, seed_a, seed_b, batch.edge_time, nbrs, nts, nxs,
            deterministic=det, rngs=rngs,
        )

    loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
    with hm.activate("train"):
        b0 = next(iter(loader))
    hm.reset_state()

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    B0 = b0.edge_src.shape[0]
    nbrs, nts, nxs = split_hops(b0, 2)
    enc_params = encoder.init(k1, node_x, b0.edge_src, b0.edge_dst, b0.edge_time, nbrs, nts, nxs)
    dec_params = decoder.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def train_core(carry, batch):
        params, opt_state, rng = carry
        rng, kd = jax.random.split(rng)
        B = batch.edge_src.shape[0]
        nbr = batch.nbr_nids[0]
        nt = batch.nbr_edge_time[0]
        nx = batch.nbr_edge_x[0]

        def loss_fn(p):
            # positive pair (src, dst): rows [0:B] + [B:2B]
            zs, zd = encode_pair(
                p, batch, batch.edge_src, batch.edge_dst,
                jnp.concatenate([nbr[:B], nbr[B : 2 * B]]),
                jnp.concatenate([nt[:B], nt[B : 2 * B]]),
                jnp.concatenate([nx[:B], nx[B : 2 * B]]),
                kd,
            )
            # negative pair (src, neg): rows [0:B] + [2B:3B]
            zs2, zn = encode_pair(
                p, batch, batch.edge_src, batch.neg,
                jnp.concatenate([nbr[:B], nbr[2 * B :]]),
                jnp.concatenate([nt[:B], nt[2 * B :]]),
                jnp.concatenate([nx[:B], nx[2 * B :]]),
                kd,
            )
            pos = decoder.apply(p["dec"], zs, zd)
            neg = decoder.apply(p["dec"], zs2, zn)
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), loss

    train_step = jax.jit(train_core, donate_argnums=(0,))

    def eval_core(params, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        nbr = batch.nbr_nids[0]
        nt = batch.nbr_edge_time[0]
        nx = batch.nbr_edge_x[0]
        zs, zd = encode_pair(
            params, batch, batch.edge_src, batch.edge_dst,
            jnp.concatenate([nbr[:B], nbr[B : 2 * B]]),
            jnp.concatenate([nt[:B], nt[B : 2 * B]]),
            jnp.concatenate([nx[:B], nx[B : 2 * B]]),
        )
        pos_score = decoder.apply(params["dec"], zs, zd)

        # negatives: (B*Q) pairs, sequences for src repeated per candidate.
        # ``neg`` seeds are the unique candidate set; locate each candidate's
        # neighbor rows via the seed-list lookup.
        negs = batch.neg_batch_list.reshape(-1)
        src_rep = jnp.repeat(batch.edge_src, Q)
        t_rep = jnp.repeat(batch.edge_time, Q)
        nbr_src_rep = jnp.repeat(nbr[:B], Q, axis=0)
        nt_src_rep = jnp.repeat(nt[:B], Q, axis=0)
        nx_src_rep = jnp.repeat(nx[:B], Q, axis=0)
        lut = seed_lookup(batch.seed_nids[0], node_x.shape[0])
        cand_rows, found = candidate_rows(lut, negs, nbr.shape[0])
        zs2, zn = encoder.apply(
            params["enc"], node_x, src_rep, negs, t_rep,
            jnp.concatenate([nbr_src_rep, nbr[cand_rows]]),
            jnp.concatenate([nt_src_rep, nt[cand_rows]]),
            jnp.concatenate([nx_src_rep, nx[cand_rows]]),
        )
        neg_score = decoder.apply(params["dec"], zs2, zn).reshape(B, Q)
        return params, mrr_sum_count(
            pos_score, neg_score,
            neg_valid=(batch.neg_batch_list != PADDED_NODE_ID)
            & found.reshape(B, Q),
            edge_valid=batch.edge_valid,
        )

    eval_step = jax.jit(eval_core)

    # --- scanned hook-pipeline epochs (default execution model) -------- #
    from tgm_tpu.train import DeviceEdgeStream, scanned_hook_epoch

    streams = (
        None
        if args.eager
        else {
            "train": DeviceEdgeStream(train_dg, args.bsize),
            "val": DeviceEdgeStream(val_dg, args.bsize),
            "test": DeviceEdgeStream(test_dg, args.bsize),
        }
    )
    dgs = {"train": train_dg, "val": val_dg, "test": test_dg}
    epoch_fns = {}

    def scanned_epoch(split, core):
        if split not in epoch_fns:
            epoch_fns[split] = scanned_hook_epoch(
                streams[split], hm, split, dgs[split], core
            )[0]
        _, hstates = hm.as_transform(split, dgs[split])
        return epoch_fns[split], hstates

    def run_train():
        nonlocal params, opt_state, key
        if not args.eager:
            ep, hstates = scanned_epoch("train", train_core)
            (params, opt_state, key), hstates, losses = ep(
                (params, opt_state, key), hstates
            )
            hm.adopt_states("train", hstates)
            return float(np.mean(np.asarray(losses)))
        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                (params, opt_state, key), loss = train_step(
                    (params, opt_state, key), batch
                )
                total += float(loss)
                nb += 1
        return total / max(nb, 1)

    def run_eval(dg, split):
        nonlocal params
        if not args.eager:
            ep, hstates = scanned_epoch(split, eval_core)
            params, hstates, (sv, cv) = ep(params, hstates)
            hm.adopt_states(split, hstates)
            return float(jnp.sum(sv)) / max(float(jnp.sum(cv)), 1.0)
        loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
        s, c = 0.0, 0.0
        with hm.activate(split):
            for batch in loader:
                params, (ds, dc) = eval_step(params, batch)
                s += float(ds)
                c += float(dc)
        return s / max(c, 1.0)

    def replay(split):
        """Advance hook state over a split without computing the model."""
        if not args.eager:
            key_ = f"replay-{split}"
            if key_ not in epoch_fns:
                epoch_fns[key_] = scanned_hook_epoch(
                    streams[split], hm, split, dgs[split],
                    lambda c, b: (c, jnp.float32(0)),
                )[0]
            _, hstates = hm.as_transform(split, dgs[split])
            _, hstates, _ = epoch_fns[key_](jnp.float32(0), hstates)
            hm.adopt_states(split, hstates)
            return
        with hm.activate(split):
            for _ in DGDataLoader(dgs[split], args.bsize, hook_manager=hm):
                pass

    n_edges = train_dg.num_edge_events
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run_train()
        dt = time.perf_counter() - t0
        val_mrr = run_eval(val_dg, "val")
        print(f"epoch={epoch} loss={loss:.4f} val_mrr={val_mrr:.4f} train_edges/s={n_edges / dt:.0f}")
        hm.reset_state()

    replay("train")
    replay("val")
    test_mrr = run_eval(test_dg, "test")
    print(f"test_mrr={test_mrr:.4f}")


if __name__ == "__main__":
    main()
