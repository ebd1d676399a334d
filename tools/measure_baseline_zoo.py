"""Measure the torch reference's train throughput for the zoo models.

Extends tools/measure_baseline.py (which covers TGN) to the models that
bench_zoo.py times on TPU: TPNet, CTAN, TNCN, GraphMixer, GCLSTM. Each
function drives the REFERENCE library's own loader + hooks + model + Adam,
mirroring the corresponding /root/reference/examples/linkproppred/*.py train
path at bench_zoo.py's exact shapes (same synthetic wiki-shaped stream, same
hyperparameters), so ``vs_reference_cpu_measured`` compares the same model at
the same workload. Random train negatives stand in for the TGB recipe (the
tgb package is absent in this image); that matches what the reference's own
train loop samples per batch.

Results land in BASELINE_ZOO.json keyed by model name.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_zoo import NODE_DIM  # noqa: E402


def _setup(num_nodes, num_edges, edge_dim, node_dim, seed=0):
    """Reference DGraph over the identical synthetic stream + train-neg hook."""
    import torch

    from bench import build_stream
    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph
    from tgm.data import DGData
    from tgm.hooks import HookManager, RandomNegativeEdgeSamplerHook

    ours = build_stream(num_nodes, num_edges, edge_dim)
    static_x = torch.from_numpy(
        np.random.default_rng(0).normal(size=(num_nodes, node_dim)).astype(np.float32)
    )
    data = DGData.from_raw(
        edge_time=torch.from_numpy(np.asarray(ours.time[ours.edge_mask])),
        edge_index=torch.from_numpy(np.asarray(ours.edge_index).astype(np.int64)),
        edge_x=torch.from_numpy(np.asarray(ours.edge_x)),
        static_node_x=static_x,
        time_delta="s",
    )
    dg = DGraph(data, device="cpu")
    torch.manual_seed(seed)
    hm = HookManager(keys=["train"])
    lo, hi = int(data.edge_index.min()), int(data.edge_index.max())
    hm.register("train", RandomNegativeEdgeSamplerHook(low=lo, high=hi))
    return dg, hm


def _timed_epoch(loader, hm, step) -> float:
    hm.reset_state()
    with hm.activate("train"):
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            step(batch)
            n += len(batch.edge_src)
        dt = time.perf_counter() - t0
    return n / dt


def measure_tpnet(num_nodes, num_edges, edge_dim, bsize) -> float:
    """Reference TPNet train loop (examples/linkproppred/tpnet.py:92-230) at
    bench_zoo shapes: K=20 recency nbrs, time 100, embed 100, RP
    use_matrix=False + enforce_dim=64 (the same scalable-RP configuration
    bench_zoo's TPNet runs)."""
    import torch
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.hooks import RecencyNeighborHook
    from tgm.nn import LinkPredictor, TPNet
    from tgm.nn.encoder.tpnet import RandomProjectionModule

    K, time_dim, embed_dim = 20, 100, 100
    dg, hm = _setup(num_nodes, num_edges, edge_dim, NODE_DIM["tpnet"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[K], num_nodes=num_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )
    rp = RandomProjectionModule(
        num_nodes=num_nodes, num_layer=2, time_decay_weight=1e-6,
        beginning_time=float(dg.start_time), use_matrix=False,
        enforce_dim=min(64, num_nodes), num_edges=num_edges, device="cpu",
    )
    encoder = TPNet(
        node_feat_dim=NODE_DIM["tpnet"], edge_x_dim=edge_dim,
        time_feat_dim=time_dim, output_dim=embed_dim, dropout=0.0,
        num_layers=2, num_neighbors=K, random_projections=rp, device="cpu",
    )
    decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
    params = list(dict.fromkeys(list(encoder.parameters()) + list(decoder.parameters())))
    opt = torch.optim.Adam(params, lr=1e-4)
    static_x = dg.static_node_x

    from tgm.data import DGDataLoader

    loader = DGDataLoader(dg, bsize, hook_manager=hm)

    def step(batch):
        opt.zero_grad()
        nbr_nids = batch.nbr_nids[0]
        nbr_t = batch.nbr_edge_time[0]
        nbr_x = batch.nbr_edge_x[0]
        si = batch.seed_node_nbr_mask["edge_src"]
        di = batch.seed_node_nbr_mask["edge_dst"]
        ni = batch.seed_node_nbr_mask["neg"]
        pos_idx = torch.cat([si, di])
        z_s, z_d = encoder(
            static_x, torch.stack((batch.edge_src, batch.edge_dst), 0),
            batch.edge_time, nbr_nids[pos_idx], nbr_t[pos_idx], nbr_x[pos_idx],
        )
        pos = decoder(z_s, z_d)
        neg_idx = torch.cat([si, ni])
        z_s2, z_n = encoder(
            static_x, torch.stack((batch.edge_src, batch.neg), 0),
            batch.edge_time, nbr_nids[neg_idx], nbr_t[neg_idx], nbr_x[neg_idx],
        )
        neg = decoder(z_s2, z_n)
        rp.update(batch.edge_src, batch.edge_dst, time=batch.edge_time)
        loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
        loss = loss + F.binary_cross_entropy_with_logits(neg, torch.zeros_like(neg))
        loss.backward()
        opt.step()

    rp.reset_random_projections()
    return _timed_epoch(loader, hm, step)


def measure_ctan(num_nodes, num_edges, edge_dim, bsize) -> float:
    """Reference CTAN train loop (examples/linkproppred/ctan.py:59-128) at
    bench_zoo shapes: K=10, dims 100, num_iters=1."""
    import torch
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.data import DGDataLoader
    from tgm.constants import PADDED_NODE_ID
    from tgm.hooks import DeduplicationHook, RecencyNeighborHook
    from tgm.nn import LinkPredictor
    from tgm.nn.encoder import CTAN, CTANMemory, LastAggregator

    K, time_dim, dims = 10, 100, 100
    dg, hm = _setup(num_nodes, num_edges, edge_dim, NODE_DIM["ctan"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[K], num_nodes=num_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )
    hm.register_shared(DeduplicationHook(seed_nodes_keys=["neg", "nbr_nids"]))

    t = np.asarray(dg.edge_time, dtype=np.float64)
    dts = np.diff(t) if len(t) > 1 else np.ones(1)
    memory = CTANMemory(
        num_nodes=num_nodes, memory_dim=dims, aggr_module=LastAggregator(),
        init_time=int(dg.start_time),
    )
    encoder = CTAN(
        node_dim=NODE_DIM["ctan"], edge_dim=edge_dim, time_dim=time_dim,
        memory_dim=dims, num_iters=1, mean_delta_t=float(dts.mean()),
        std_delta_t=float(max(dts.std(), 1e-6)),
    )
    # The reference example's merge_op='sum' raises BadAggregatorProtocolError
    # against the current library (reference code rot; see parity_zoo.py) —
    # default ConcatMerge, same as bench_zoo's CTAN decoder.
    decoder = LinkPredictor(node_dim=dims, hidden_dim=dims)
    params = list(dict.fromkeys(
        list(memory.parameters()) + list(encoder.parameters())
        + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=1e-4)
    static_x = dg.static_node_x
    loader = DGDataLoader(dg, bsize, hook_manager=hm)
    memory.reset_state()

    def step(batch):
        opt.zero_grad()
        nbr_nodes = batch.nbr_nids[0].flatten()
        nbr_mask = nbr_nodes != PADDED_NODE_ID
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
        z = torch.cat([z, static_x[batch.unique_nids]], dim=-1)
        z = encoder(
            z, last_update, edge_index,
            batch.nbr_edge_time[0].flatten()[nbr_mask],
            batch.nbr_edge_x[0].flatten(0, -2).float()[nbr_mask],
        )
        inv_src = batch.global_to_local(batch.edge_src)
        inv_dst = batch.global_to_local(batch.edge_dst)
        pos = decoder(z[inv_src], z[inv_dst])
        neg = decoder(z[inv_src], z[batch.global_to_local(batch.neg)])
        loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
        loss = loss + F.binary_cross_entropy_with_logits(neg, torch.zeros_like(neg))
        memory.update_state(
            batch.edge_src, batch.edge_dst, batch.edge_time,
            z[inv_src], z[inv_dst],
        )
        loss.backward()
        opt.step()
        memory.detach()

    return _timed_epoch(loader, hm, step)


def measure_tncn(num_nodes, num_edges, edge_dim, bsize) -> float:
    """Reference TNCN train loop (examples/linkproppred/tncn.py, inline
    torch.unique dedup + sparse CN decoder) at bench_zoo shapes: K=10,
    dims 100, NCN k=2."""
    import torch
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.data import DGDataLoader
    from tgm.constants import PADDED_NODE_ID
    from tgm.hooks import RecencyNeighborHook
    from tgm.nn import NCNPredictor, TGNMemory
    from tgm.nn.encoder.tgn import (
        GraphAttentionEmbedding,
        IdentityMessage,
        LastAggregator,
    )

    K, time_dim, dims = 10, 100, 100
    dg, hm = _setup(num_nodes, num_edges, edge_dim, NODE_DIM["tncn"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[K], num_nodes=num_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )
    memory = TGNMemory(
        num_nodes, edge_dim, dims, time_dim,
        message_module=IdentityMessage(edge_dim, dims, time_dim),
        aggregator_module=LastAggregator(),
    )
    encoder = GraphAttentionEmbedding(
        in_channels=dims, out_channels=dims, msg_dim=edge_dim,
        time_enc=memory.time_enc,
    )
    decoder = NCNPredictor(in_channels=dims, hidden_dim=dims, out_channels=1, k=2)
    params = list(dict.fromkeys(
        list(memory.parameters()) + list(encoder.parameters())
        + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=1e-4)
    loader = DGDataLoader(dg, bsize, hook_manager=hm)
    memory.reset_state()

    def step(batch):
        opt.zero_grad()
        nbr_nodes = batch.nbr_nids[0].flatten()
        nbr_mask = nbr_nodes != PADDED_NODE_ID
        all_nids = torch.cat(
            [batch.edge_src, batch.edge_dst, batch.neg, nbr_nodes[nbr_mask]]
        )
        unique = torch.unique(all_nids, sorted=True)
        g2l = lambda x: torch.searchsorted(unique, x)
        k = len(nbr_nodes) // (
            len(batch.edge_src) + len(batch.edge_dst) + len(batch.neg)
        )
        src_nodes = torch.cat([
            batch.edge_src.repeat_interleave(k),
            batch.edge_dst.repeat_interleave(k),
            batch.neg.repeat_interleave(k),
        ])
        nbr_edge_index = torch.stack(
            [g2l(src_nodes[nbr_mask]), g2l(nbr_nodes[nbr_mask])]
        )
        z, last_update = memory(unique)
        z = encoder(
            z, last_update, nbr_edge_index.to(torch.int64),
            batch.nbr_edge_time[0].flatten()[nbr_mask],
            batch.nbr_edge_x[0].flatten(0, -2).float()[nbr_mask],
        )
        inv_src, inv_dst, inv_neg = (
            g2l(batch.edge_src), g2l(batch.edge_dst), g2l(batch.neg)
        )
        pos = decoder(
            z, nbr_edge_index, torch.stack([inv_src, inv_dst], 0).long(),
            last_update=last_update, edge_time=batch.edge_time,
        )
        neg = decoder(
            z, nbr_edge_index, torch.stack([inv_src, inv_neg], 0).long(),
            last_update=last_update, edge_time=batch.edge_time,
        )
        loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
        loss = loss + F.binary_cross_entropy_with_logits(neg, torch.zeros_like(neg))
        memory.update_state(
            batch.edge_src, batch.edge_dst, batch.edge_time, batch.edge_x.float()
        )
        loss.backward()
        opt.step()
        memory.detach()

    return _timed_epoch(loader, hm, step)


def measure_graphmixer(num_nodes, num_edges, edge_dim, bsize) -> float:
    """Reference GraphMixer train loop (examples/linkproppred/graphmixer.py:
    100-160 + the example-level time-gap hook at :229-257) at bench_zoo
    shapes: K=20 recency nbrs, time 100, embed 100, time_gap=2000 (the
    reference default slice width)."""
    from dataclasses import replace

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.data import DGDataLoader
    from tgm.constants import PADDED_NODE_ID
    from tgm.hooks import RecencyNeighborHook, StatelessHook
    from tgm.nn import LinkPredictor, MLPMixer, Time2Vec

    K, time_dim, embed_dim, time_gap = 20, 100, 100, 2000
    node_dim = NODE_DIM["graphmixer"]
    dg, hm = _setup(num_nodes, num_edges, edge_dim, node_dim)
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[K], num_nodes=num_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )

    class GraphMixerHook(StatelessHook):
        """Mirror of the reference example's time-gap hook: N(v, t-GAP, t)."""

        requires = {"neg"}
        produces = {"time_gap_nbrs"}

        def __call__(self, dg, batch):
            time_gap_slice = replace(dg._slice)
            time_gap_slice.start_idx = max(dg._slice.end_idx - time_gap, 0)
            time_gap_slice.end_time = int(batch.edge_time.min()) - 1
            tg_src, tg_dst, _ = dg._storage.get_edges(time_gap_slice)
            nbr_index: dict = {}
            for u, v in zip(tg_src.tolist(), tg_dst.tolist()):
                nbr_index.setdefault(u, []).append(v)
                nbr_index.setdefault(v, []).append(u)
            seeds = torch.cat([batch.edge_src, batch.edge_dst, batch.neg])
            batch.time_gap_nbrs = [
                nbr_index.get(nid, []) for nid in seeds.tolist()
            ]
            return batch

    hm.register_shared(GraphMixerHook())

    class RefGraphMixer(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_encoder = Time2Vec(time_dim=time_dim)
            for p_ in self.time_encoder.parameters():
                p_.requires_grad = False
            self.projection_layer = nn.Linear(edge_dim + time_dim, edge_dim)
            self.mlp_mixers = nn.ModuleList([
                MLPMixer(num_tokens=K, num_channels=edge_dim,
                         token_dim_expansion_factor=0.5,
                         channel_dim_expansion_factor=4.0, dropout=0.0)
                for _ in range(2)
            ])
            self.output_layer = nn.Linear(edge_dim + node_dim, embed_dim)

        def forward(self, batch, node_feat):
            edge_feat = batch.nbr_edge_x[0]
            t_enc = self.time_encoder(
                batch.seed_times[0][:, None] - batch.nbr_edge_time[0]
            )
            z_link = self.projection_layer(torch.cat([edge_feat, t_enc], -1))
            for mixer in self.mlp_mixers:
                z_link = mixer(z_link)
            valid = batch.nbr_nids[0] != PADDED_NODE_ID
            z_link = (z_link * valid.unsqueeze(-1)).sum(1) / valid.sum(
                1, keepdim=True
            ).clamp(min=1)
            n, fd = len(batch.time_gap_nbrs), node_feat.shape[1]
            tg_feat = torch.zeros((n, fd))
            for i in range(n):
                if batch.time_gap_nbrs[i]:
                    tg_feat[i] = node_feat[batch.time_gap_nbrs[i]].mean(dim=0)
            seeds = torch.cat([batch.edge_src, batch.edge_dst, batch.neg])
            z_node = tg_feat + node_feat[seeds]
            return self.output_layer(torch.cat([z_link, z_node], 1))

    encoder = RefGraphMixer()
    decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
    params = list(dict.fromkeys(
        list(encoder.parameters()) + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=1e-4)
    static_x = dg.static_node_x
    loader = DGDataLoader(dg, bsize, hook_manager=hm)

    def step(batch):
        opt.zero_grad()
        z = encoder(batch, static_x)
        z_src, z_dst, z_neg = torch.chunk(z, 3)
        pos = decoder(z_src, z_dst)
        neg = decoder(z_src, z_neg)
        loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
        loss = loss + F.binary_cross_entropy_with_logits(neg, torch.zeros_like(neg))
        loss.backward()
        opt.step()

    return _timed_epoch(loader, hm, step)


def measure_gclstm(num_nodes, num_edges, edge_dim, bsize,
                   snapshot_ticks=86_400) -> float:
    """Reference GC-LSTM snapshot train loop (examples/linkproppred/
    gclstm.py:76-121) at bench_zoo shapes: embed 64, daily snapshots over
    the wiki-shaped month-long stream."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from bench import build_stream
    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph
    from tgm.data import DGData, DGDataLoader
    from tgm.hooks import HookManager, RandomNegativeEdgeSamplerHook
    from tgm.nn import GCLSTM, LinkPredictor

    embed_dim, node_dim = 64, NODE_DIM["gclstm"]
    ours = build_stream(num_nodes, num_edges, edge_dim)
    static_x = torch.from_numpy(
        np.random.default_rng(0).normal(size=(num_nodes, node_dim)).astype(np.float32)
    )
    data = DGData.from_raw(
        edge_time=torch.from_numpy(np.asarray(ours.time[ours.edge_mask])),
        edge_index=torch.from_numpy(np.asarray(ours.edge_index).astype(np.int64)),
        edge_x=torch.from_numpy(np.asarray(ours.edge_x)),
        static_node_x=static_x,
        time_delta="s",
    )
    dg = DGraph(data, device="cpu")
    torch.manual_seed(0)
    hm = HookManager(keys=["train"])
    lo, hi = int(data.edge_index.min()), int(data.edge_index.max())
    hm.register("train", RandomNegativeEdgeSamplerHook(low=lo, high=hi))

    # Reference flow: discretize to a coarser granularity string and iterate
    # one snapshot per batch_unit (examples/linkproppred/gclstm.py:184-210).
    # snapshot_ticks=86400 == 'D' (daily), matching bench_zoo's gclstm.
    from tgm import TimeDeltaDG

    gran = {86_400: "D", 3_600: "h", 60: "m"}.get(snapshot_ticks, "D")
    snap_data = data.discretize(gran)
    snapshots = DGraph(snap_data, device="cpu")
    conversion_rate = int(TimeDeltaDG(gran).convert(dg.time_delta))

    class RecurrentGCN(nn.Module):
        def __init__(self):
            super().__init__()
            self.recurrent = GCLSTM(in_channels=node_dim, out_channels=embed_dim, K=1)
            self.linear = nn.Linear(embed_dim, embed_dim)

        def forward(self, batch, node_feat, h=None, c=None):
            edge_index = torch.stack([batch.edge_src, batch.edge_dst], 0)
            h0, c0 = self.recurrent(node_feat, edge_index, None, h, c)
            z = self.linear(F.relu(h0))
            return z, h0, c0

    encoder = RecurrentGCN()
    decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
    params = list(dict.fromkeys(
        list(encoder.parameters()) + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=1e-3)
    loader = DGDataLoader(dg, bsize, hook_manager=hm)
    snap_loader = DGDataLoader(snapshots, batch_unit=gran)

    hm.reset_state()
    with hm.activate("train"):
        t0 = time.perf_counter()
        snap_it = iter(snap_loader)
        sbatch = next(snap_it)
        z, h0, c0 = encoder(sbatch, static_x)
        z, h0, c0 = z.detach(), h0.detach(), c0.detach()
        n = 0
        for batch in loader:
            opt.zero_grad()
            pos = decoder(z[batch.edge_src], z[batch.edge_dst])
            neg = decoder(z[batch.edge_src], z[batch.neg])
            loss = F.binary_cross_entropy_with_logits(pos, torch.ones_like(pos))
            loss = loss + F.binary_cross_entropy_with_logits(
                neg, torch.zeros_like(neg)
            )
            loss.backward()
            opt.step()
            n += len(batch.edge_src)
            while batch.edge_time[-1] > (sbatch.edge_time[-1] + 1) * conversion_rate:
                try:
                    sbatch = next(snap_it)
                    z, h0, c0 = encoder(sbatch, static_x, h0, c0)
                    z, h0, c0 = z.detach(), h0.detach(), c0.detach()
                except StopIteration:
                    break
        dt = time.perf_counter() - t0
    return n / dt


MEASURES = {
    "tpnet": measure_tpnet,
    "ctan": measure_ctan,
    "tncn": measure_tncn,
    "graphmixer": measure_graphmixer,
    "gclstm": measure_gclstm,
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all", choices=["all"] + list(MEASURES))
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--out", type=str, default="BASELINE_ZOO.json")
    args = p.parse_args()

    if args.smoke:
        num_nodes, num_edges, edge_dim = 500, 4_000, 32
    else:
        from bench import WIKI_EDGE_DIM, WIKI_EDGES, WIKI_NODES

        num_nodes, num_edges, edge_dim = WIKI_NODES, WIKI_EDGES, WIKI_EDGE_DIM

    out_path = Path(args.out)
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    for model in (list(MEASURES) if args.model == "all" else [args.model]):
        eps = MEASURES[model](num_nodes, num_edges, edge_dim, args.bsize)
        results[model] = {
            "hardware": "cpu (this image; reference targets CUDA, no GPU here)",
            "num_nodes": num_nodes,
            "num_edges": num_edges,
            "edge_dim": edge_dim,
            "bsize": args.bsize,
            "reference_train_edges_per_sec": round(eps, 1),
            "measured_with": "tools/measure_baseline_zoo.py (PyG-surface stubs)",
        }
        print(json.dumps({model: results[model]}))
        out_path.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
