"""CTAN link prediction.

Parity: /root/reference/examples/linkproppred/ctan.py — CTAN memory
(embedding store) + AntiSymmetricConv propagation over the recency subgraph,
LinkPredictor decoder, last-by-time memory writes for batch endpoints.
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._linkpred_common import base_parser, run_epochs, setup_linkpred
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.hooks import DeduplicationHook, RecencyNeighborHook, map_to_local
from tgm_tpu.nn import CTAN, LinkPredictor
from tgm_tpu.nn.encoder.ctan import ctan_memory_init, ctan_memory_update


def main():
    p = base_parser("CTAN LinkPropPred Example")
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[10])
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=100)
    p.add_argument("--num-iters", type=int, default=1)
    args = p.parse_args()

    setup = setup_linkpred(args, static_dim=8)
    num_nodes, edge_dim = setup.num_nodes, setup.edge_dim
    node_x = setup.node_x
    setup.hm.register_shared(
        RecencyNeighborHook(
            num_nodes, args.n_nbrs,
            ["edge_src", "edge_dst", "neg"], ["edge_time", "edge_time", "neg_time"],
            edge_dim=edge_dim,
        )
    )
    setup.hm.register_shared(DeduplicationHook(num_nodes, seed_nodes_keys=["neg", "nbr_nids"]))

    # Δt normalization from the training stream (reference example computes
    # mean/std of successive event deltas).
    t = np.asarray(setup.train_dg.edge_time, dtype=np.float64)
    dts = np.diff(t) if len(t) > 1 else np.ones(1)
    mean_dt, std_dt = float(dts.mean()), float(max(dts.std(), 1e-6))

    encoder = CTAN(
        edge_dim=edge_dim, memory_dim=args.embed_dim, time_dim=args.time_dim,
        node_dim=node_x.shape[1], num_iters=args.num_iters,
        mean_delta_t=mean_dt, std_delta_t=std_dt,
    )
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    e4 = jnp.zeros(4, jnp.int32)
    enc_params = encoder.init(
        k1, jnp.zeros((8, args.embed_dim + node_x.shape[1])), jnp.zeros(8, jnp.int32),
        e4, e4, e4, jnp.zeros((4, edge_dim)), jnp.ones(4, bool),
    )
    dec_params = decoder.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)
    mem_state = ctan_memory_init(num_nodes, args.embed_dim)

    def encode(p, mem_state, batch):
        g2l = batch.global_to_local
        uids = batch.unique_nids
        rows = jnp.where(uids >= 0, uids, num_nodes)
        x = jnp.concatenate(
            [mem_state.memory[rows], node_x[jnp.maximum(uids, 0)] * (uids >= 0)[:, None]],
            axis=1,
        )
        last_upd = mem_state.last_update[rows]
        seeds = batch.seed_nids[0]
        nbrs = batch.nbr_nids[0]
        K = nbrs.shape[1]
        src_rep = jnp.repeat(seeds, K)
        nbr_flat = nbrs.reshape(-1)
        e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
        z = encoder.apply(
            p["enc"], x, last_upd,
            map_to_local(g2l, src_rep), map_to_local(g2l, nbr_flat),
            batch.nbr_edge_time[0].reshape(-1),
            batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1), e_valid,
        )
        return z

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, opt_state, mem_state, batch):
        g2l = batch.global_to_local

        def loss_fn(p):
            z = encode(p, mem_state, batch)
            zs = z[map_to_local(g2l, batch.edge_src)]
            zd = z[map_to_local(g2l, batch.edge_dst)]
            zn = z[map_to_local(g2l, batch.neg)]
            pos = decoder.apply(p["dec"], zs, zd)
            neg = decoder.apply(p["dec"], zs, zn)
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            loss = (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d
            return loss, (zs, zd)

        (loss, (zs, zd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        mem_state = ctan_memory_update(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time, zs, zd,
            batch.edge_valid,
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mem_state, loss

    @partial(jax.jit, donate_argnums=(1,))
    def eval_step(params, mem_state, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        g2l = batch.global_to_local
        z = encode(params, mem_state, batch)
        zs = z[map_to_local(g2l, batch.edge_src)]
        zd = z[map_to_local(g2l, batch.edge_dst)]
        zn = z[map_to_local(g2l, batch.neg_batch_list.reshape(-1))].reshape(B, Q, -1)
        pos = decoder.apply(params["dec"], zs, zd)
        neg = decoder.apply(
            params["dec"],
            jnp.repeat(zs[:, None, :], Q, 1).reshape(B * Q, -1),
            zn.reshape(B * Q, -1),
        ).reshape(B, Q)
        s, c = mrr_sum_count(
            pos, neg, neg_valid=batch.neg_batch_list != PADDED_NODE_ID,
            edge_valid=batch.edge_valid,
        )
        mem_state = ctan_memory_update(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time, zs, zd,
            batch.edge_valid,
        )
        return mem_state, s, c

    state = {"params": params, "opt": opt_state, "mem": mem_state}

    def train_batch(batch):
        state["params"], state["opt"], state["mem"], loss = train_step(
            state["params"], state["opt"], state["mem"], batch
        )
        return loss

    def eval_batch(batch):
        state["mem"], s, c = eval_step(state["params"], state["mem"], batch)
        return s, c

    def on_epoch_start():
        state["mem"] = ctan_memory_init(num_nodes, args.embed_dim)

    run_epochs(setup, args, train_batch, eval_batch, on_epoch_start)


if __name__ == "__main__":
    main()
