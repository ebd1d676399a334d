"""Measure the torch reference's TGN training throughput on this machine.

bench.py's ``vs_baseline`` needs a *measured* comparator, not a guess. The
reference repo publishes no absolute numbers (BASELINE.md), but the reference
library itself runs on this image's CPU via the PyG-surface stubs in
tools/refbridge.py. This script times:

1. the reference's full TGN training loop — its DGDataLoader + hook DAG
   (RandomNegativeEdgeSamplerHook, RecencyNeighborHook, DeduplicationHook) +
   TGNMemory/GraphAttentionEmbedding/LinkPredictor + Adam — mirroring
   /root/reference/examples/linkproppred/tgn.py:57-120 at bench.py's exact
   shapes (tgbl-wiki-sized stream, bsize 200, dims 100);
2. the reference's hook-only dataloader iteration, mirroring how the
   reference measures itself (/root/reference/test/performance/
   test_iteration.py:64-125, "M events/sec").

Results land in BASELINE_MEASURED.json, which bench.py folds into its output.
Hardware note: the reference targets CUDA; this measurement is CPU (no GPU in
this image), so bench.py reports it as ``vs_reference_cpu_measured`` alongside
the clearly-labeled A100 estimate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(num_nodes: int, num_edges: int, edge_dim: int, bsize: int,
            dims: int = 100, num_nbrs: int = 10, epochs: int = 1) -> dict:
    import torch
    import torch.nn.functional as F

    from bench import build_stream
    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph
    from tgm.data import DGData, DGDataLoader
    from tgm.hooks import (
        DeduplicationHook,
        HookManager,
        RandomNegativeEdgeSamplerHook,
        RecencyNeighborHook,
    )
    from tgm.nn import LinkPredictor, TGNMemory
    from tgm.nn.encoder.tgn import (
        GraphAttentionEmbedding,
        IdentityMessage,
        LastAggregator,
    )

    # Identical stream generator to bench.py (same seed, same shapes).
    ours = build_stream(num_nodes, num_edges, edge_dim)
    data = DGData.from_raw(
        edge_time=torch.from_numpy(np.asarray(ours.time[ours.edge_mask])),
        edge_index=torch.from_numpy(np.asarray(ours.edge_index).astype(np.int64)),
        edge_x=torch.from_numpy(np.asarray(ours.edge_x)),
        time_delta="s",
    )
    dg = DGraph(data, device="cpu")
    torch.manual_seed(0)

    hm = HookManager(keys=["train"])
    lo, hi = int(data.edge_index.min()), int(data.edge_index.max())
    hm.register("train", RandomNegativeEdgeSamplerHook(low=lo, high=hi))
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[num_nbrs],
            num_nodes=num_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )
    hm.register_shared(DeduplicationHook(seed_nodes_keys=["neg", "nbr_nids"]))

    memory = TGNMemory(
        num_nodes, edge_dim, dims, dims,
        message_module=IdentityMessage(edge_dim, dims, dims),
        aggregator_module=LastAggregator(),
    )
    encoder = GraphAttentionEmbedding(
        in_channels=dims, out_channels=dims, msg_dim=edge_dim,
        time_enc=memory.time_enc,
    )
    decoder = LinkPredictor(node_dim=dims, hidden_dim=dims)
    params = list(dict.fromkeys(
        list(memory.parameters()) + list(encoder.parameters()) + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=1e-4)
    loader = DGDataLoader(dg, bsize, hook_manager=hm)

    # --- 1. full train loop (the bench.py comparator) -------------------- #
    def train_epoch():
        memory.train(); encoder.train(); decoder.train()
        memory.reset_state()
        total = 0.0
        for batch in loader:
            opt.zero_grad()
            nbr_nodes = batch.nbr_nids[0].flatten()
            nbr_mask = nbr_nodes != -1
            k = len(nbr_nodes) // (
                len(batch.edge_src) + len(batch.edge_dst) + len(batch.neg)
            )
            src_nodes = torch.cat([
                batch.edge_src.repeat_interleave(k),
                batch.edge_dst.repeat_interleave(k),
                batch.neg.repeat_interleave(k),
            ])
            edge_index = torch.stack([
                batch.global_to_local(src_nodes[nbr_mask]),
                batch.global_to_local(nbr_nodes[nbr_mask]),
            ]).to(torch.int64)
            z, last_update = memory(batch.unique_nids)
            z = encoder(
                z, last_update, edge_index,
                batch.nbr_edge_time[0].flatten()[nbr_mask],
                batch.nbr_edge_x[0].flatten(0, -2).float()[nbr_mask],
            )
            pos = decoder(z[batch.global_to_local(batch.edge_src)],
                          z[batch.global_to_local(batch.edge_dst)])
            neg = decoder(z[batch.global_to_local(batch.edge_src)],
                          z[batch.global_to_local(batch.neg)])
            loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
            loss = loss + F.binary_cross_entropy_with_logits(neg, torch.zeros_like(neg))
            memory.update_state(
                batch.edge_src, batch.edge_dst, batch.edge_time, batch.edge_x.float()
            )
            loss.backward()
            opt.step()
            total += float(loss.detach())
            memory.detach()
        return total

    train_times = []
    for _ in range(epochs):
        hm.reset_state()
        with hm.activate("train"):
            t0 = time.perf_counter()
            train_epoch()
            train_times.append(time.perf_counter() - t0)

    # --- 2. hook-only iteration (reference perf-CI style) ---------------- #
    hm.reset_state()
    with hm.activate("train"):
        t0 = time.perf_counter()
        for _ in loader:
            pass
        iter_time = time.perf_counter() - t0

    return {
        "hardware": "cpu (this image; reference targets CUDA, no GPU here)",
        "num_nodes": num_nodes,
        "num_edges": num_edges,
        "edge_dim": edge_dim,
        "bsize": bsize,
        "dims": dims,
        "num_nbrs": num_nbrs,
        "reference_train_edges_per_sec": num_edges / min(train_times),
        "reference_train_time_s": min(train_times),
        "reference_iteration_edges_per_sec": num_edges / iter_time,
        "reference_iteration_time_s": iter_time,
        "measured_with": "tools/measure_baseline.py (PyG-surface stubs, tools/refbridge.py)",
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--out", type=str, default="BASELINE_MEASURED.json")
    args = p.parse_args()

    if args.smoke:
        out = measure(500, 8_000, 32, args.bsize, epochs=args.epochs)
    else:
        from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES

        out = measure(WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM, args.bsize,
                      epochs=args.epochs)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
