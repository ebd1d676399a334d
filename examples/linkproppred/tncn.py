"""TNCN link prediction: TGN memory + Temporal Neural Common Neighbor decoder.

Parity: /root/reference/examples/linkproppred/tncn.py — TGN memory staging +
GraphAttentionEmbedding over the recency subgraph, scored by the NCNPredictor
over local common-neighbor structure.
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
from tgm_tpu.hooks import (
    DeduplicationHook,
    RecencyNeighborHook,
    candidate_rows,
    map_to_local,
    seed_lookup,
)
from tgm_tpu.nn import NCNPredictor
from tgm_tpu.nn.decoder.ncnpred import (
    ncn_adjacency_rows,
    ncn_adjacency_rows_blocked,
)
from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbedding, TGNMemory, tgn_store_messages
from tgm_tpu.train import tncn_train_scores_occurrence


def main():
    p = base_parser("TNCN LinkPropPred Example")
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[10])
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=100)
    p.add_argument("--memory-dim", type=int, default=100)
    p.add_argument("--ncn-k", type=int, default=2, choices=[2, 4, 8])
    p.add_argument("--cn-time-decay", action="store_true")
    p.add_argument(
        "--exec", choices=["table", "occurrence"], default="table",
        dest="exec_mode",
        help="train-step scoring: table (reference-shaped: full-table "
        "staging + segment-softmax encoder + score_from_rows) or "
        "occurrence (tgm_tpu.train.tncn_train_scores_occurrence — same "
        "scores at fp tolerance, measured 3.0x train throughput on v5e; "
        "k=2, no decay). Eval always runs the table path.")
    args = p.parse_args()
    if args.exec_mode == "occurrence" and (
        args.ncn_k not in (2, 4) or args.cn_time_decay
    ):
        p.error("--exec occurrence supports --ncn-k {2,4} without "
                "--cn-time-decay")

    setup = setup_linkpred(args)
    num_nodes = setup.num_nodes
    edge_dim = setup.edge_dim
    setup.hm.register_shared(
        RecencyNeighborHook(
            num_nodes, args.n_nbrs,
            ["edge_src", "edge_dst", "neg"], ["edge_time", "edge_time", "neg_time"],
            edge_dim=edge_dim,
        )
    )
    setup.hm.register_shared(DeduplicationHook(num_nodes, seed_nodes_keys=["neg", "nbr_nids"]))

    memory = TGNMemory(num_nodes=num_nodes, raw_msg_dim=edge_dim,
                       memory_dim=args.memory_dim, time_dim=args.time_dim)
    encoder = GraphAttentionEmbedding(
        in_channels=args.memory_dim, out_channels=args.embed_dim,
        msg_dim=edge_dim, time_dim=args.time_dim, dropout=args.dropout,
    )
    decoder = NCNPredictor(
        in_channels=args.embed_dim, hidden_dim=args.embed_dim, out_channels=1,
        k=args.ncn_k, cn_time_decay=args.cn_time_decay,
    )
    opt = optax.adam(args.lr)

    mem_state = memory.init_state()
    key = jax.random.PRNGKey(args.seed)
    key, k1, k2, k3 = jax.random.split(key, 4)
    mem_params = memory.init(k1, mem_state, jnp.zeros(4, jnp.int32))
    e4 = jnp.zeros(4, jnp.int32)
    enc_params = encoder.init(
        k2, jnp.zeros((8, args.memory_dim)), jnp.zeros(8, jnp.int32), e4, e4, e4,
        jnp.zeros((4, edge_dim)), jnp.ones(4, bool),
    )
    dec_params = decoder.init(
        k3, jnp.zeros((8, args.embed_dim)), e4, e4, jnp.zeros(2, jnp.int32),
        jnp.zeros(2, jnp.int32), jnp.zeros(8, jnp.int32), jnp.zeros(2, jnp.int32),
    )
    params = {"mem": mem_params, "enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    def local_graph(batch):
        g2l = batch.global_to_local
        seeds = batch.seed_nids[0]
        nbrs = batch.nbr_nids[0]
        K = nbrs.shape[1]
        src_rep = jnp.repeat(seeds, K)
        nbr_flat = nbrs.reshape(-1)
        e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
        return (
            map_to_local(g2l, src_rep), map_to_local(g2l, nbr_flat),
            batch.nbr_edge_time[0].reshape(-1),
            batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1), e_valid,
        )

    # k in {2, 4}: adjacency rows for ALL hook seeds, computed once per batch
    # with equality-mask matmuls and shared by every query — no (U, U) dense
    # adjacency is ever built (ncn_adjacency_rows docstring; measured
    # 35.1k -> 51.7k edges/s on v5e at wiki shapes, bit-exact). k=8 needs
    # A@A diagonal corrections and keeps the dense path.
    use_rows = args.ncn_k in (2, 4)

    def seed_rows(batch, z_width, is_eval=False):
        g2l = batch.global_to_local
        seeds_l = map_to_local(g2l, batch.seed_nids[0])
        nbrs_l = map_to_local(g2l, batch.nbr_nids[0])
        nbr_ok = (batch.nbr_nids[0] != PADDED_NODE_ID) & (
            batch.seed_nids[0][:, None] != PADDED_NODE_ID
        )
        if is_eval:
            # Eval seeds are [src(B) ‖ dst(B) ‖ UNIQUE candidates]: the
            # blocked builder replaces the two S²·U consolidation matmuls
            # (~29% of the eval epoch at S=4,400, r5 profile) with S·2B·U
            # matmuls + two gathers, bit-exactly.
            B = batch.edge_src.shape[0]
            return ncn_adjacency_rows_blocked(
                seeds_l, nbrs_l, nbr_ok, z_width, unique_from=2 * B
            )
        return ncn_adjacency_rows(seeds_l, nbrs_l, nbr_ok, z_width)

    def encode(p, mem_state, batch, rng=None, is_eval=False):
        z_mem, last_upd = memory.apply(
            p["mem"], mem_state, batch.unique_nids, method=TGNMemory.stage
        )
        e_src, e_dst, e_t, e_x, e_valid = local_graph(batch)
        rngs = None if rng is None else {"dropout": rng}
        z = encoder.apply(
            p["enc"], z_mem, last_upd, e_src, e_dst, e_t, e_x, e_valid,
            deterministic=rng is None, rngs=rngs,
        )
        rows = seed_rows(batch, z.shape[0], is_eval) if use_rows else None
        return z, last_upd, (e_src, e_dst, e_valid, rows)

    def score(p, z, sub, g2l, src, dst, last_upd, t, rows_i=None, rows_j=None):
        e_src, e_dst, e_valid, _ = sub
        if rows_i is not None:
            return decoder.apply(
                p["dec"], z, rows_i, rows_j,
                map_to_local(g2l, src), map_to_local(g2l, dst),
                last_update=last_upd, edge_time=t,
                method=NCNPredictor.score_from_rows,
            )
        return decoder.apply(
            p["dec"], z, e_src, e_dst,
            map_to_local(g2l, src), map_to_local(g2l, dst),
            last_update=last_upd, edge_time=t, edge_valid=e_valid,
        )

    def commit(p, mem_state, batch):
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, num_nodes
        )
        mem_state = memory.apply(p["mem"], mem_state, nodes, method=TGNMemory.flush)
        raw = batch.edge_x if batch.edge_x is not None else jnp.zeros(
            (batch.edge_src.shape[0], 0)
        )
        return tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time, raw, batch.edge_valid
        )

    use_occurrence = args.exec_mode == "occurrence"

    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def train_step(params, opt_state, mem_state, rng, batch):
        rng, kd = jax.random.split(rng)
        g2l = batch.global_to_local

        def loss_occurrence(p):
            # Occurrence-space scoring works on RAW node ids (it never
            # touches the dedup table), so the hook setup is unchanged.
            B = batch.edge_src.shape[0]
            nbr_ok = (batch.nbr_nids[0] != PADDED_NODE_ID) & (
                batch.seed_nids[0][:, None] != PADDED_NODE_ID
            )
            pos, neg = tncn_train_scores_occurrence(
                memory, encoder, decoder, p, mem_state,
                batch.seed_nids[0], batch.nbr_nids[0],
                batch.nbr_edge_time[0], batch.nbr_edge_x[0], nbr_ok, B,
            )
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        def loss_fn(p):
            z, last_upd, sub = encode(p, mem_state, batch, kd)
            rows = sub[3]
            B = batch.edge_src.shape[0]
            ri = rows[:B] if rows is not None else None
            pos = score(p, z, sub, g2l, batch.edge_src, batch.edge_dst,
                        last_upd, batch.edge_time, ri,
                        rows[B : 2 * B] if rows is not None else None)
            neg = score(p, z, sub, g2l, batch.edge_src, batch.neg,
                        last_upd, batch.edge_time, ri,
                        rows[2 * B :] if rows is not None else None)
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        loss, grads = jax.value_and_grad(
            loss_occurrence if use_occurrence else loss_fn)(params)
        mem_state = commit(params, mem_state, batch)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mem_state, rng, loss

    @partial(jax.jit, donate_argnums=(1,))
    def eval_step(params, mem_state, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        g2l = batch.global_to_local
        z, last_upd, sub = encode(params, mem_state, batch, is_eval=True)
        rows = sub[3]
        negs = batch.neg_batch_list.reshape(-1)
        found = None
        if rows is not None:
            # Candidates are hook seeds ('neg' is the unique candidate set);
            # locate each per-edge candidate's seed row for its adjacency row.
            lut = seed_lookup(batch.seed_nids[0], num_nodes)
            cand_r, found = candidate_rows(lut, negs, rows.shape[0])
            ri_pos, rj_pos = rows[:B], rows[B : 2 * B]
            ri_neg = jnp.repeat(rows[:B], Q, axis=0)
            rj_neg = rows[cand_r]
        else:
            ri_pos = rj_pos = ri_neg = rj_neg = None
        pos = score(params, z, sub, g2l, batch.edge_src, batch.edge_dst,
                    last_upd, batch.edge_time, ri_pos, rj_pos)
        neg = score(
            params, z, sub, g2l,
            jnp.repeat(batch.edge_src, Q), negs,
            last_upd, jnp.repeat(batch.edge_time, Q), ri_neg, rj_neg,
        ).reshape(B, Q)
        neg_valid = batch.neg_batch_list != PADDED_NODE_ID
        if found is not None:
            neg_valid = neg_valid & found.reshape(B, Q)
        s, c = mrr_sum_count(
            pos, neg, neg_valid=neg_valid,
            edge_valid=batch.edge_valid,
        )
        mem_state = tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_x if batch.edge_x is not None else jnp.zeros((B, 0)),
            batch.edge_valid,
        )
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, num_nodes
        )
        mem_state = memory.apply(params["mem"], mem_state, nodes, method=TGNMemory.flush)
        return mem_state, s, c

    state = {"params": params, "opt": opt_state, "mem": mem_state, "key": key}

    def train_batch(batch):
        state["params"], state["opt"], state["mem"], state["key"], loss = train_step(
            state["params"], state["opt"], state["mem"], state["key"], batch
        )
        return loss

    def eval_batch(batch):
        state["mem"], s, c = eval_step(state["params"], state["mem"], batch)
        return s, c

    def on_epoch_start():
        state["mem"] = memory.init_state()

    def on_train_end():
        state["mem"] = jax.jit(
            lambda p, s: memory.apply(p["mem"], s, method=TGNMemory.flush_all)
        )(state["params"], state["mem"])

    run_epochs(setup, args, train_batch, eval_batch, on_epoch_start, on_train_end)


if __name__ == "__main__":
    main()
