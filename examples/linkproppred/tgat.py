"""TGAT link prediction.

Parity: /root/reference/examples/linkproppred/tgat.py — recipe hook manager
(random negatives for train, TGB candidates for val/test), recency or uniform
neighbor sampling over [src, dst, neg] seeds, BCE training of
TGAT + LinkPredictor, TGB MRR evaluation.

TPU-first: the hook pipeline and the model step are composed into ONE jitted
function per phase; hook state (recency buffers, PRNG keys) is threaded
functionally and donated, so each batch is a single device dispatch.
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
from tgm_tpu.hooks import (
    HookManager,
    NeighborSamplerHook,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
    candidate_rows,
    seed_lookup,
)
from tgm_tpu.nn import TGAT, LinkPredictor
from tgm_tpu.train.tgat_pipeline import default_attn_bf16
from tgm_tpu.util import enable_logging, log_metric, seed_everything


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TGAT LinkPropPred Example")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-heads", type=int, default=2)
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[20, 20])
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=172)
    p.add_argument("--sampling", type=str, default="recency", choices=["uniform", "recency"])
    p.add_argument("--log-file-path", type=str, default=None)
    p.add_argument(
        "--eager", action="store_true",
        help="per-batch host loop instead of the default scanned epochs",
    )
    return p.parse_args()


def bce_with_logits(logits, target, mask):
    loss = optax.sigmoid_binary_cross_entropy(logits, target)
    w = mask.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def main() -> None:
    args = parse_args()
    enable_logging(log_file_path=args.log_file_path)
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 1)).astype(np.float32)
    num_nodes = data.num_nodes
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)
    node_x = jnp.asarray(data.static_node_x)

    # --- hooks -------------------------------------------------------- #
    hm = HookManager(keys=["train", "val", "test"])
    dst = train_dg.edge_dst
    hm.register("train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max())))
    if val_cands is not None:
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=val_cands))
        hm.register("test", TGBNegativeEdgeSamplerHook(candidates=test_cands))
    else:
        hm.register("val", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="val"))
        hm.register("test", TGBNegativeEdgeSamplerHook(args.dataset, split_mode="test"))

    seed_keys = ["edge_src", "edge_dst", "neg"]
    time_keys = ["edge_time", "edge_time", "neg_time"]
    if args.sampling == "recency":
        nbr_hook = RecencyNeighborHook(
            num_nodes, args.n_nbrs, seed_keys, time_keys,
            edge_dim=train_dg.edge_x_dim or 0,
            edge_x_full=data.edge_x,
        )
    else:
        nbr_hook = NeighborSamplerHook(args.n_nbrs, seed_keys, time_keys)
    hm.register_shared(nbr_hook)

    # --- model -------------------------------------------------------- #
    encoder = TGAT(
        node_dim=node_x.shape[1],
        edge_dim=train_dg.edge_x_dim or 0,
        time_dim=args.time_dim,
        embed_dim=args.embed_dim,
        num_layers=len(args.n_nbrs),
        n_heads=args.n_heads,
        dropout=args.dropout,
        kv_bf16=default_attn_bf16(),
    )
    decoder = LinkPredictor(node_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    # Init params from one materialized train batch.
    loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
    with hm.activate("train"):
        init_batch = next(iter(loader))
    hm.reset_state()

    key = jax.random.PRNGKey(args.seed)
    key, k_enc, k_dec = jax.random.split(key, 3)
    enc_params = encoder.init(
        k_enc,
        node_x,
        init_batch.seed_nids,
        init_batch.seed_times,
        init_batch.nbr_nids,
        init_batch.nbr_edge_x,
        init_batch.nbr_edge_time,
    )
    z_dim = args.embed_dim
    dec_params = decoder.init(k_dec, jnp.zeros((1, z_dim)), jnp.zeros((1, z_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def encode(p, batch, rng=None):
        det = rng is None
        rngs = None if det else {"dropout": rng}
        return encoder.apply(
            p["enc"],
            node_x,
            batch.seed_nids,
            batch.seed_times,
            batch.nbr_nids,
            batch.nbr_edge_x,
            batch.nbr_edge_time,
            deterministic=det,
            rngs=rngs,
        )

    def train_core(carry, batch):
        params, opt_state, rng = carry
        rng, dropout_rng = jax.random.split(rng)
        B = batch.edge_src.shape[0]

        def loss_fn(p):
            z = encode(p, batch, dropout_rng)
            z_src, z_dst, z_neg = z[:B], z[B : 2 * B], z[2 * B : 3 * B]
            pos = decoder.apply(p["dec"], z_src, z_dst)
            neg = decoder.apply(p["dec"], z_src, z_neg)
            m = batch.edge_valid
            return bce_with_logits(pos, jnp.ones_like(pos), m) + bce_with_logits(
                neg, jnp.zeros_like(neg), m
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), loss

    train_step = jax.jit(train_core, donate_argnums=(0,))

    def eval_core(params, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        z = encode(params, batch)
        z_src, z_dst = z[:B], z[B : 2 * B]
        # ``neg`` seeds are the UNIQUE candidate set (reference semantics);
        # locate each candidate's embedding row via the seed-list lookup.
        lut = seed_lookup(batch.seed_nids[0], num_nodes)
        rows_c, found = candidate_rows(lut, batch.neg_batch_list, z.shape[0])
        z_neg = z[rows_c]
        pos_score = decoder.apply(params["dec"], z_src, z_dst)
        neg_score = decoder.apply(
            params["dec"],
            jnp.repeat(z_src[:, None, :], Q, axis=1).reshape(B * Q, -1),
            z_neg.reshape(B * Q, -1),
        ).reshape(B, Q)
        return params, mrr_sum_count(
            pos_score,
            neg_score,
            neg_valid=(batch.neg_batch_list != PADDED_NODE_ID) & found,
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

    def run_train(epoch):
        nonlocal params, opt_state, key
        if not args.eager:
            ep, hstates = scanned_epoch("train", train_core)
            (params, opt_state, key), hstates, losses = ep(
                (params, opt_state, key), hstates
            )
            hm.adopt_states("train", hstates)
            return float(np.mean(np.asarray(losses)))
        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total_loss, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                (params, opt_state, key), loss = train_step(
                    (params, opt_state, key), batch
                )
                total_loss += float(loss)
                nb += 1
        return total_loss / max(nb, 1)

    def run_eval(dg, split):
        nonlocal params
        if not args.eager:
            ep, hstates = scanned_epoch(split, eval_core)
            params, hstates, (s, c) = ep(params, hstates)
            hm.adopt_states(split, hstates)
            return float(jnp.sum(s)) / max(float(jnp.sum(c)), 1.0)
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

    n_train_edges = train_dg.num_edge_events
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run_train(epoch)
        train_dt = time.perf_counter() - t0
        val_mrr = run_eval(val_dg, "val")
        log_metric("loss", loss, epoch=epoch)
        log_metric("val_mrr", val_mrr, epoch=epoch)
        print(
            f"epoch={epoch} loss={loss:.4f} val_mrr={val_mrr:.4f} "
            f"train_edges/s={n_train_edges / train_dt:.0f}"
        )
        hm.reset_state()

    # Final pass: replay train+val streams to warm hook state, then test.
    replay("train")
    replay("val")
    test_mrr = run_eval(test_dg, "test")
    log_metric("test_mrr", test_mrr)
    print(f"test_mrr={test_mrr:.4f}")


if __name__ == "__main__":
    main()
