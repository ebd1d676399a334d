"""TGN node property prediction.

Parity: /root/reference/examples/nodeproppred/tgn.py — TGN memory maintained
over the edge stream; labeled nodes embedded via memory + recency subgraph
attention at label time; NodePredictor head; NDCG@10 eval.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import ndcg_at_k
from tgm_tpu.hooks import DeduplicationHook, HookManager, RecencyNeighborHook, map_to_local
from tgm_tpu.nn import NodePredictor
from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbedding, TGNMemory, tgn_store_messages
from tgm_tpu.util import seed_everything


def main():
    p = argparse.ArgumentParser(description="TGN nodeproppred")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n-nbrs", type=int, nargs="+", default=[10])
    p.add_argument("--time-dim", type=int, default=32)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--memory-dim", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument(
        "--eager", action="store_true",
        help="per-batch host loop instead of the default scanned epochs",
    )
    args = p.parse_args()
    seed_everything(args.seed)

    data, _, _ = load_dataset(args.dataset, node_label_classes=args.num_classes)
    num_nodes = data.num_nodes
    num_classes = data.node_y.shape[1]
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
    hm.register_shared(DeduplicationHook(num_nodes, seed_nodes_keys=["nbr_nids"]))

    memory = TGNMemory(num_nodes=num_nodes, raw_msg_dim=edge_dim,
                       memory_dim=args.memory_dim, time_dim=args.time_dim)
    encoder = GraphAttentionEmbedding(
        in_channels=args.memory_dim, out_channels=args.embed_dim,
        msg_dim=edge_dim, time_dim=args.time_dim,
    )
    decoder = NodePredictor(in_dim=args.embed_dim, out_dim=num_classes)
    opt = optax.adam(args.lr)

    mem_state = memory.init_state()
    key = jax.random.PRNGKey(args.seed)
    key, k1, k2, k3 = jax.random.split(key, 4)
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "mem": memory.init(k1, mem_state, e4),
        "enc": encoder.init(
            k2, jnp.zeros((8, args.memory_dim)), jnp.zeros(8, jnp.int32), e4, e4, e4,
            jnp.zeros((4, edge_dim)), jnp.ones(4, bool),
        ),
        "dec": decoder.init(k3, jnp.zeros((1, args.embed_dim))),
    }
    opt_state = opt.init(params)

    def encode(p, mem_state, batch):
        z_mem, last_upd = memory.apply(
            p["mem"], mem_state, batch.unique_nids, method=TGNMemory.stage
        )
        g2l = batch.global_to_local
        seeds = batch.seed_nids[0]
        nbrs = batch.nbr_nids[0]
        K = nbrs.shape[1]
        src_rep = jnp.repeat(seeds, K)
        nbr_flat = nbrs.reshape(-1)
        e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
        z = encoder.apply(
            p["enc"], z_mem, last_upd,
            map_to_local(g2l, src_rep), map_to_local(g2l, nbr_flat),
            batch.nbr_edge_time[0].reshape(-1),
            batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1), e_valid,
        )
        return decoder.apply(p["dec"], z[map_to_local(g2l, batch.node_y_nids)])

    def commit(p, mem_state, batch):
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, num_nodes
        )
        mem_state = memory.apply(p["mem"], mem_state, nodes, method=TGNMemory.flush)
        raw = batch.edge_x if batch.edge_x is not None else jnp.zeros((batch.edge_src.shape[0], 0))
        return tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time, raw, batch.edge_valid
        )

    def train_core(carry, batch):
        """Pure train transition; label-less batches only advance memory (the
        optimizer step is masked out, matching the eager skip semantics)."""
        params, opt_state, mem_state = carry
        has = jnp.any(batch.node_y_valid)

        def loss_fn(p):
            logits = encode(p, mem_state, batch)
            loss = optax.softmax_cross_entropy(logits, batch.node_y)
            m = batch.node_y_valid.astype(loss.dtype)
            return jnp.sum(loss * m) / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        mem_state = commit(params, mem_state, batch)
        updates, opt_state2 = opt.update(grads, opt_state)
        params2 = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(has, a, b), new, old
        )
        return (keep(params2, params), keep(opt_state2, opt_state), mem_state), (
            jnp.where(has, loss, 0.0), has,
        )

    def eval_core(carry, batch):
        params, mem_state = carry
        has = jnp.any(batch.node_y_valid)
        logits = encode(params, mem_state, batch)
        ndcg = ndcg_at_k(logits, batch.node_y, k=10, row_valid=batch.node_y_valid)
        mem_state = commit(params, mem_state, batch)
        return (params, mem_state), (jnp.where(has, ndcg, 0.0), has)

    train_step = jax.jit(train_core, donate_argnums=(0,))
    eval_step = jax.jit(eval_core, donate_argnums=(0,))

    state = {"params": params, "opt": opt_state, "mem": mem_state}

    from tgm_tpu.train import DeviceEventStream, scanned_hook_epoch

    epoch_fns = {}

    def run_scanned(dg, train: bool):
        key_ = ("train" if train else "eval", id(dg))
        if key_ not in epoch_fns:
            loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
            stream = DeviceEventStream(loader)
            core = train_core if train else eval_core
            epoch_fns[key_] = (scanned_hook_epoch(stream, hm, "all", dg, core)[0],)
        epoch = epoch_fns[key_][0]
        _, hstates = hm.as_transform("all", dg)
        if train:
            carry = (state["params"], state["opt"], state["mem"])
            carry, hstates, (vals, has) = epoch(carry, hstates)
            state["params"], state["opt"], state["mem"] = carry
        else:
            carry = (state["params"], state["mem"])
            carry, hstates, (vals, has) = epoch(carry, hstates)
            state["params"], state["mem"] = carry
        hm.adopt_states("all", hstates)
        vals, has = np.asarray(vals), np.asarray(has)
        return float(vals[has].mean()) if has.any() else 0.0

    def run(dg, train: bool):
        if not args.eager:
            return run_scanned(dg, train)
        metrics = []
        with hm.activate("all"):
            for batch in DGDataLoader(dg, args.bsize, hook_manager=hm):
                if train:
                    (state["params"], state["opt"], state["mem"]), (loss, has) = train_step(
                        (state["params"], state["opt"], state["mem"]), batch
                    )
                else:
                    (state["params"], state["mem"]), (loss, has) = eval_step(
                        (state["params"], state["mem"]), batch
                    )
                if bool(has):
                    metrics.append(float(loss))
        return float(np.mean(metrics)) if metrics else 0.0

    n_labels = train_dg.num_node_labels
    for epoch in range(args.epochs):
        state["mem"] = memory.init_state()
        t0 = time.perf_counter()
        loss = run(train_dg, train=True)
        dt = time.perf_counter() - t0
        val = run(dgs[1], train=False) if len(dgs) > 1 else 0.0
        print(f"epoch={epoch} loss={loss:.4f} val_ndcg={val:.4f} labels/s={n_labels / dt:.0f}")
        if epoch < args.epochs - 1:
            hm.reset_state()

    test = run(dgs[-1], train=False)
    print(f"test_ndcg={test:.4f}")


if __name__ == "__main__":
    main()
