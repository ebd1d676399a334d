"""TGN link prediction.

Parity: /root/reference/examples/linkproppred/tgn.py — TGN memory + staged
message application, GraphAttentionEmbedding over the recency-sampled batch
subgraph (local ids via the dedup hook), LinkPredictor decoder, BCE training,
TGB MRR evaluation, per-epoch hook/memory reset.

TPU-first: the memory is a ``TGNMemoryState`` pytree threaded through one
jitted train step (hook outputs + staging + embedding + loss + flush + message
store in a single XLA program); BPTT truncation is implicit per step.
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.hooks import (
    DeduplicationHook,
    HookManager,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
    map_to_local,
)
from tgm_tpu.nn import LinkPredictor
from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbedding, TGNMemory, tgn_store_messages
from tgm_tpu.util import enable_logging, log_metric, seed_everything


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TGN LinkPropPred Example")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[10])
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=100)
    p.add_argument("--memory-dim", type=int, default=100)
    p.add_argument("--log-file-path", type=str, default=None)
    p.add_argument(
        "--fast", action="store_true",
        help="train via the fully-scanned TGNPipeline (one XLA program per "
        "epoch, dense rowwise attention) instead of the hook-manager path",
    )
    return p.parse_args()


def run_fast(args) -> None:
    """Scanned-epoch training (the bench.py path) on this example's data."""
    import numpy as np

    from examples._datasets import load_dataset
    from tgm_tpu import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    seed_everything(args.seed)
    data, _, _ = load_dataset(args.dataset)
    train_data, _, _ = data.split()
    dg = DGraph(train_data)
    stream = DeviceEdgeStream(dg, args.bsize)
    pipe = TGNPipeline(
        num_nodes=data.num_nodes, edge_dim=dg.edge_x_dim or 0,
        memory_dim=args.memory_dim, embed_dim=args.embed_dim,
        time_dim=args.time_dim, num_nbrs=args.n_nbrs[0], lr=args.lr,
        neg_low=int(dg.edge_dst.min()), neg_high=int(dg.edge_dst.max()),
    )
    carry = pipe.init_carry(jax.random.PRNGKey(args.seed))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)
    n_edges = dg.num_edge_events
    for e in range(args.epochs):
        t0 = time.perf_counter()
        carry, losses = epoch(carry)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        print(
            f"epoch={e} loss={float(np.asarray(losses).mean()):.4f} "
            f"train_edges/s={n_edges / dt:.0f}"
        )


def bce_with_logits(logits, target, mask):
    loss = optax.sigmoid_binary_cross_entropy(logits, target)
    w = mask.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def build_local_edges(batch, num_nodes):
    """Local subgraph edges (seed -> neighbor) exactly as the reference example
    builds them (examples/linkproppred/tgn.py:74-95)."""
    g2l = batch.global_to_local
    seeds = batch.seed_nids[0]  # (S,)
    nbrs = batch.nbr_nids[0]  # (S, K)
    K = nbrs.shape[1]
    src_rep = jnp.repeat(seeds, K)
    nbr_flat = nbrs.reshape(-1)
    valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
    e_src = map_to_local(g2l, src_rep)
    e_dst = map_to_local(g2l, nbr_flat)
    e_t = batch.nbr_edge_time[0].reshape(-1)
    e_x = batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1)
    return e_src, e_dst, e_t, e_x, valid


def main() -> None:
    args = parse_args()
    enable_logging(log_file_path=args.log_file_path)
    if args.fast:
        run_fast(args)
        return
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    num_nodes = data.num_nodes
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)
    edge_dim = train_dg.edge_x_dim or 0

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
    hm.register_shared(
        RecencyNeighborHook(
            num_nodes,
            args.n_nbrs,
            ["edge_src", "edge_dst", "neg"],
            ["edge_time", "edge_time", "neg_time"],
            edge_dim=edge_dim,
        )
    )
    hm.register_shared(DeduplicationHook(num_nodes, seed_nodes_keys=["neg", "nbr_nids"]))

    # --- model -------------------------------------------------------- #
    memory = TGNMemory(
        num_nodes=num_nodes,
        raw_msg_dim=edge_dim,
        memory_dim=args.memory_dim,
        time_dim=args.time_dim,
    )
    encoder = GraphAttentionEmbedding(
        in_channels=args.memory_dim,
        out_channels=args.embed_dim,
        msg_dim=edge_dim,
        time_dim=args.time_dim,
        dropout=args.dropout,
    )
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    mem_state = memory.init_state()
    key = jax.random.PRNGKey(args.seed)
    key, k1, k2, k3 = jax.random.split(key, 4)

    nids0 = jnp.zeros(8, jnp.int32)
    mem_params = memory.init(k1, mem_state, nids0)
    enc_params = encoder.init(
        k2,
        jnp.zeros((8, args.memory_dim)),
        jnp.zeros(8, jnp.int32),
        jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.int32),
        jnp.zeros(4, jnp.int32),
        jnp.zeros((4, edge_dim)),
        jnp.ones(4, bool),
    )
    dec_params = decoder.init(k3, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"mem": mem_params, "enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def encode(p, mem_state, batch, training, dropout_rng=None):
        z_mem, last_upd = memory.apply(
            p["mem"], mem_state, batch.unique_nids, training, method=TGNMemory.stage
        )
        e_src, e_dst, e_t, e_x, e_valid = build_local_edges(batch, num_nodes)
        rngs = None if dropout_rng is None else {"dropout": dropout_rng}
        z = encoder.apply(
            p["enc"],
            z_mem,
            last_upd,
            e_src,
            e_dst,
            e_t,
            e_x,
            e_valid,
            deterministic=dropout_rng is None,
            rngs=rngs,
        )
        return z

    def raw_msg(batch):
        if batch.edge_x is not None:
            return batch.edge_x
        return jnp.zeros((batch.edge_src.shape[0], 0), jnp.float32)

    def commit(p, mem_state, batch):
        """Reference train-mode update_state: flush pending for batch nodes,
        then overwrite their message stores with this batch."""
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, num_nodes
        )
        mem_state = memory.apply(p["mem"], mem_state, nodes, method=TGNMemory.flush)
        return tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            raw_msg(batch), batch.edge_valid,
        )

    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def train_step(params, opt_state, mem_state, rng, batch):
        rng, dropout_rng = jax.random.split(rng)
        B = batch.edge_src.shape[0]
        g2l = batch.global_to_local

        def loss_fn(p):
            z = encode(p, mem_state, batch, training=True, dropout_rng=dropout_rng)
            pos = decoder.apply(
                p["dec"], z[map_to_local(g2l, batch.edge_src)], z[map_to_local(g2l, batch.edge_dst)]
            )
            neg = decoder.apply(
                p["dec"], z[map_to_local(g2l, batch.edge_src)], z[map_to_local(g2l, batch.neg)]
            )
            m = batch.edge_valid
            return bce_with_logits(pos, jnp.ones_like(pos), m) + bce_with_logits(
                neg, jnp.zeros_like(neg), m
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Reference order: update_state runs before opt.step (old params).
        mem_state = commit(params, mem_state, batch)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mem_state, rng, loss

    @partial(jax.jit, donate_argnums=(1,))
    def eval_step(params, mem_state, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        g2l = batch.global_to_local
        z = encode(params, mem_state, batch, training=False)
        z_src = z[map_to_local(g2l, batch.edge_src)]
        z_dst = z[map_to_local(g2l, batch.edge_dst)]
        z_neg = z[map_to_local(g2l, batch.neg_batch_list.reshape(-1))].reshape(B, Q, -1)
        pos_score = decoder.apply(params["dec"], z_src, z_dst)
        neg_score = decoder.apply(
            params["dec"],
            jnp.repeat(z_src[:, None, :], Q, axis=1).reshape(B * Q, -1),
            z_neg.reshape(B * Q, -1),
        ).reshape(B, Q)
        s, c = mrr_sum_count(
            pos_score,
            neg_score,
            neg_valid=batch.neg_batch_list != PADDED_NODE_ID,
            edge_valid=batch.edge_valid,
        )
        # Reference eval-mode update_state: store messages, then apply them.
        mem_state = tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            raw_msg(batch), batch.edge_valid,
        )
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, num_nodes
        )
        mem_state = memory.apply(params["mem"], mem_state, nodes, method=TGNMemory.flush)
        return mem_state, s, c

    flush_all = jax.jit(
        lambda p, s: memory.apply(p["mem"], s, method=TGNMemory.flush_all),
        donate_argnums=(1,),
    )

    def run_train():
        nonlocal params, opt_state, mem_state, key
        mem_state = memory.init_state()  # reference: memory.reset_state() per epoch
        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total_loss, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                params, opt_state, mem_state, key, loss = train_step(
                    params, opt_state, mem_state, key, batch
                )
                total_loss += float(loss)
                nb += 1
        return total_loss / max(nb, 1)

    def run_eval(dg, split):
        nonlocal mem_state
        loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
        s, c = 0.0, 0.0
        with hm.activate(split):
            for batch in loader:
                mem_state, ds, dc = eval_step(params, mem_state, batch)
                s += float(ds)
                c += float(dc)
        return s / max(c, 1.0)

    n_train_edges = train_dg.num_edge_events
    best_val, test_mrr = 0.0, 0.0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run_train()
        train_dt = time.perf_counter() - t0
        mem_state = flush_all(params, mem_state)  # train -> eval transition
        val_mrr = run_eval(val_dg, "val")
        log_metric("loss", loss, epoch=epoch)
        log_metric("val_mrr", val_mrr, epoch=epoch)
        print(
            f"epoch={epoch} loss={loss:.4f} val_mrr={val_mrr:.4f} "
            f"train_edges/s={n_train_edges / train_dt:.0f}"
        )
        if val_mrr >= best_val:
            best_val = val_mrr
            test_mrr = run_eval(test_dg, "test")
            log_metric("test_mrr", test_mrr, epoch=epoch)
        if epoch < args.epochs - 1:
            hm.reset_state()
    print(f"test_mrr={test_mrr:.4f}")


if __name__ == "__main__":
    main()
