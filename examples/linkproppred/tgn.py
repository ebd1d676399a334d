"""TGN link prediction.

Parity: /root/reference/examples/linkproppred/tgn.py — TGN memory + staged
message application, attention over recency-sampled neighbors, LinkPredictor
decoder, BCE training, TGB MRR evaluation, per-epoch hook/memory reset.
``--encoder segment`` reproduces the reference example's exact dedup +
segment-softmax subgraph wiring; the default ``rowwise`` encoder is the
textbook TGN formulation (dense per-seed attention, TPU-fast).

TPU-first: the memory is a ``TGNMemoryState`` pytree threaded through one
jitted train step (hook outputs + staging + embedding + loss + flush + message
store in a single XLA program); BPTT truncation is implicit per step.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.hooks import (
    DeduplicationHook,
    HookManager,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
)
from tgm_tpu.nn import LinkPredictor
from tgm_tpu.nn.encoder.tgn import (
    GraphAttentionEmbedding,
    GraphAttentionEmbeddingRowwise,
    TGNMemory,
)
from tgm_tpu.train.programs import build_tgn_hook_cores
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
    p.add_argument(
        "--encoder", type=str, default="rowwise", choices=["rowwise", "segment"],
        help="rowwise: dense per-seed attention (textbook TGN, TPU-fast, no "
        "dedup); segment: the reference example's exact dedup + "
        "segment-softmax subgraph wiring",
    )
    p.add_argument(
        "--eager", action="store_true",
        help="run the hook pipeline per batch from host Python (reference-"
        "style loop) instead of the default scanned hook-pipeline epochs",
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
        edge_x_full=stream.edge_x,
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
            # eid-layout buffers: features come from the PRE-SPLIT table so
            # global edge ids from every split resolve.
            edge_x_full=data.edge_x,
        )
    )
    if args.encoder == "segment":
        hm.register_shared(
            DeduplicationHook(num_nodes, seed_nodes_keys=["neg", "nbr_nids"])
        )

    # --- model -------------------------------------------------------- #
    memory = TGNMemory(
        num_nodes=num_nodes,
        raw_msg_dim=edge_dim,
        memory_dim=args.memory_dim,
        time_dim=args.time_dim,
    )
    enc_cls = (
        GraphAttentionEmbeddingRowwise if args.encoder == "rowwise"
        else GraphAttentionEmbedding
    )
    encoder = enc_cls(
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
    if args.encoder == "rowwise":
        enc_params = encoder.init(
            k2,
            jnp.zeros((4, args.memory_dim)),
            jnp.zeros((4, 3, args.memory_dim)),
            jnp.zeros(4, jnp.int32),
            jnp.zeros((4, 3), jnp.int32),
            jnp.zeros((4, 3, edge_dim)),
            jnp.ones((4, 3), bool),
        )
    else:
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

    train_core, eval_core = build_tgn_hook_cores(
        memory, encoder, decoder, opt, num_nodes, style=args.encoder
    )

    train_step = jax.jit(train_core, donate_argnums=(0,))
    eval_step = jax.jit(eval_core, donate_argnums=(0,))

    flush_all = jax.jit(
        lambda p, s: memory.apply(p["mem"], s, method=TGNMemory.flush_all),
        donate_argnums=(1,),
    )

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
        nonlocal params, opt_state, mem_state, key
        mem_state = memory.init_state()  # reference: memory.reset_state() per epoch
        if not args.eager:
            epoch, hstates = scanned_epoch("train", train_core)
            (params, opt_state, mem_state, key), hstates, losses = epoch(
                (params, opt_state, mem_state, key), hstates
            )
            hm.adopt_states("train", hstates)
            import numpy as _np

            return float(_np.mean(_np.asarray(losses)))
        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total_loss, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                (params, opt_state, mem_state, key), loss = train_step(
                    (params, opt_state, mem_state, key), batch
                )
                total_loss += float(loss)
                nb += 1
        return total_loss / max(nb, 1)

    def run_eval(dg, split):
        nonlocal params, mem_state
        if not args.eager:
            epoch, hstates = scanned_epoch(split, eval_core)
            (params, mem_state), hstates, (s, c) = epoch((params, mem_state), hstates)
            hm.adopt_states(split, hstates)
            return float(jnp.sum(s)) / max(float(jnp.sum(c)), 1.0)
        loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
        s, c = 0.0, 0.0
        with hm.activate(split):
            for batch in loader:
                (params, mem_state), (ds, dc) = eval_step((params, mem_state), batch)
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
