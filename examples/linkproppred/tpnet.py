"""TPNet link prediction.

Parity: /root/reference/examples/linkproppred/tpnet.py — TPNet encoder over
recency neighbor sequences with random-projection pairwise features; the RP
state is updated per batch and backed up before val / reloaded before test
(reference tpnet.py:229-258 semantics; functionally, a pytree copy).
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._linkpred_common import base_parser, run_epochs, setup_linkpred
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.hooks import RecencyNeighborHook, candidate_rows, seed_lookup
from tgm_tpu.nn import LinkPredictor, RandomProjectionModule, TPNet
from tgm_tpu.nn.encoder.tpnet import rp_update


def main():
    p = base_parser("TPNet LinkPropPred Example")
    p.add_argument("--n-nbrs", type=int, default=20)
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=100)
    p.add_argument("--rp-layers", type=int, default=2)
    p.add_argument("--rp-time-decay", type=float, default=1e-6)
    p.add_argument("--rp-dim-factor", type=int, default=10)
    args = p.parse_args()

    setup = setup_linkpred(args, static_dim=8)
    num_nodes, edge_dim = setup.num_nodes, setup.edge_dim
    node_x = setup.node_x
    setup.hm.register_shared(
        RecencyNeighborHook(
            num_nodes, [args.n_nbrs],
            ["edge_src", "edge_dst", "neg"], ["edge_time", "edge_time", "neg_time"],
            edge_dim=edge_dim,
        )
    )

    rp = RandomProjectionModule(
        num_nodes=num_nodes, num_layer=args.rp_layers,
        time_decay_weight=args.rp_time_decay,
        beginning_time=float(setup.train_dg.start_time or 0),
        use_matrix=False, enforce_dim=min(64, num_nodes),
    )
    encoder = TPNet(
        node_feat_dim=node_x.shape[1], edge_x_dim=edge_dim, time_feat_dim=args.time_dim,
        output_dim=args.embed_dim, num_neighbors=args.n_nbrs, dropout=args.dropout,
        random_projections=rp,
    )
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2, k3 = jax.random.split(key, 4)
    rp_state = rp.init_state(k1)

    B0, K = 4, args.n_nbrs
    ez = lambda *s: jnp.zeros(s, jnp.int32)
    enc_params = encoder.init(
        k2, node_x, ez(B0), ez(B0), ez(B0), ez(2 * B0, K), ez(2 * B0, K),
        jnp.zeros((2 * B0, K, edge_dim)), rp_state,
    )
    dec_params = decoder.init(k3, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def rows(batch, a, b):
        B = batch.edge_src.shape[0]
        sel = lambda x: jnp.concatenate([x[a * B : (a + 1) * B], x[b * B : (b + 1) * B]])
        return (
            sel(batch.nbr_nids[0]),
            sel(batch.nbr_edge_time[0]),
            sel(batch.nbr_edge_x[0]),
        )

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, opt_state, rng, rp_state, batch):
        rng, kd = jax.random.split(rng)

        def loss_fn(p):
            zs, zd = encoder.apply(
                p["enc"], node_x, batch.edge_src, batch.edge_dst, batch.edge_time,
                *rows(batch, 0, 1), rp_state, deterministic=False, rngs={"dropout": kd},
            )
            zs2, zn = encoder.apply(
                p["enc"], node_x, batch.edge_src, batch.neg, batch.edge_time,
                *rows(batch, 0, 2), rp_state, deterministic=False, rngs={"dropout": kd},
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
        rp_state = rp_update(
            rp_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_valid, rp.time_decay_weight,
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, rp_state, loss

    @jax.jit
    def eval_step(params, rp_state, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        zs, zd = encoder.apply(
            params["enc"], node_x, batch.edge_src, batch.edge_dst, batch.edge_time,
            *rows(batch, 0, 1), rp_state,
        )
        pos = decoder.apply(params["dec"], zs, zd)
        negs = batch.neg_batch_list.reshape(-1)
        src_rep = jnp.repeat(batch.edge_src, Q)
        t_rep = jnp.repeat(batch.edge_time, Q)
        # ``neg`` seeds are the unique candidate set; locate each candidate's
        # neighbor rows via the seed-list lookup.
        nbr_all, nt_all, nx_all = batch.nbr_nids[0], batch.nbr_edge_time[0], batch.nbr_edge_x[0]
        nbr_src = jnp.repeat(nbr_all[:B], Q, axis=0)
        nt_src = jnp.repeat(nt_all[:B], Q, axis=0)
        nx_src = jnp.repeat(nx_all[:B], Q, axis=0)
        lut = seed_lookup(batch.seed_nids[0], node_x.shape[0])
        cand_rows, found = candidate_rows(lut, negs, nbr_all.shape[0])
        zs2, zn = encoder.apply(
            params["enc"], node_x, src_rep, negs, t_rep,
            jnp.concatenate([nbr_src, nbr_all[cand_rows]]),
            jnp.concatenate([nt_src, nt_all[cand_rows]]),
            jnp.concatenate([nx_src, nx_all[cand_rows]]),
            rp_state,
        )
        neg = decoder.apply(params["dec"], zs2, zn).reshape(B, Q)
        s, c = mrr_sum_count(
            pos, neg,
            neg_valid=(batch.neg_batch_list != PADDED_NODE_ID)
            & found.reshape(B, Q),
            edge_valid=batch.edge_valid,
        )
        rp_state = rp_update(
            rp_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_valid, rp.time_decay_weight,
        )
        return rp_state, s, c

    state = {"params": params, "opt": opt_state, "key": key, "rp": rp_state}

    def train_batch(batch):
        state["params"], state["opt"], state["key"], state["rp"], loss = train_step(
            state["params"], state["opt"], state["key"], state["rp"], batch
        )
        return loss

    def eval_batch(batch):
        state["rp"], s, c = eval_step(state["params"], state["rp"], batch)
        return s, c

    def on_epoch_start():
        state["rp"] = rp.init_state(k1)

    def on_train_end():
        # Reference: snapshot RP state before val so test can resume from it.
        state["backup"] = RandomProjectionModule.backup_random_projections(state["rp"])

    def on_test_start():
        if state.get("backup") is not None:
            state["rp"] = RandomProjectionModule.reload_random_projections(state["backup"])

    run_epochs(
        setup, args, train_batch, eval_batch, on_epoch_start, on_train_end, on_test_start
    )


if __name__ == "__main__":
    main()
