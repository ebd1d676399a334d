"""Round-4 end-to-end training parity: the last composed pipelines.

Extends tools/parity_zoo.py (TPNet/CTAN/TNCN/GCLSTM) with the five pipelines
the round-3 verdict flagged as per-module-only:

* TGCN   — snapshot GCN-GRU with carried H, MSE loss, decoder-only training
  (z detached) — reference examples/linkproppred/tgcn.py:44-260.
* ROLAND — snapshot 2xGCN with per-layer embedding-update mechanisms and the
  reference's carried-embedding quirks (the FIRST train snapshot's output is
  never written back to last_embeddings; per-epoch zero reset) — reference
  examples/linkproppred/roland.py:55-325, tgm/nn/encoder/roland.py:24-151.
* GCN    — per-snapshot stateless encoder with BatchNorm (train-mode batch
  stats + running-stat updates, eval-mode running stats; torch's
  unbiased-variance running update is reproduced exactly), BCE loss —
  reference examples/linkproppred/gcn.py:50-285.
* GraphMixer — CTDG model composed at example level: MLP-Mixer link encoder
  over recency-neighbor [edge ‖ Δt] sequences (frozen Time2Vec) plus a
  time-gap node encoder (mean of the neighbors appearing in the last
  `time_gap` EVENTS strictly before the batch, weighted by occurrence
  multiplicity) — reference examples/linkproppred/graphmixer.py:72-258.
* TGN nodeprop — the node-property-prediction task path: recency sampling
  seeded by node-label events, TGN memory advanced by ground-truth edges,
  soft-target cross-entropy, NDCG@k eval — reference
  examples/nodeproppred/tgn.py:57-180.

Same protocol as tools/parity_harness.py: identical initial weights copied
from the torch modules, negatives/candidates injected from one shared numpy
RNG, dropout off; lr=0 runs must agree to fp epsilon.

Run ``python tools/parity_zoo2.py`` to produce PARITY_ZOO_r04.json.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Dict

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.parity_harness import (  # noqa: E402
    ParityConfig,
    compare,
    make_splits,
    precompute_negatives,
    reciprocal_ranks,
)
from tools.parity_zoo import add_score_diffs  # noqa: E402


# --------------------------------------------------------------------------- #
# Shared injection hooks
# --------------------------------------------------------------------------- #
def ref_inject_hooks():
    """Reference-protocol hook classes serving precomputed negatives."""
    import torch

    class InjectTrainNeg:
        has_state = True
        requires = frozenset({"edge_time"})
        produces = frozenset({"neg", "neg_time"})

        def __init__(self, neg_list):
            self.neg_list, self.i = neg_list, 0

        def __call__(self, dg, batch):
            neg = self.neg_list[self.i][: len(batch.edge_src)]
            self.i += 1
            batch.neg = torch.from_numpy(neg).to(torch.int64)
            batch.neg_time = batch.edge_time.clone()
            return batch

        def reset_state(self):
            self.i = 0

    class InjectEvalNeg:
        has_state = True
        requires = frozenset({"edge_time"})
        produces = frozenset({"neg", "neg_batch_list", "neg_time"})

        def __init__(self, sets):
            self.sets, self.i = sets, 0

        def __call__(self, dg, batch):
            s = self.sets[self.i]
            self.i += 1
            batch.neg = torch.from_numpy(s["uniq"]).to(torch.int64)
            batch.neg_time = torch.from_numpy(s["neg_time"]).to(torch.int64)
            batch.neg_batch_list = [
                torch.from_numpy(r).to(torch.int64) for r in s["cands"]
            ]
            return batch

        def reset_state(self):
            self.i = 0

    return InjectTrainNeg, InjectEvalNeg


def ours_inject_hooks():
    """tgm_tpu hook classes serving the same negatives (static shapes)."""
    import jax.numpy as jnp

    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.hooks.base import StatefulHook

    class InjectTrainNeg(StatefulHook):
        _cls_requires = {"edge_time"}
        _cls_produces = {"neg", "neg_time"}

        def __init__(self, neg_list):
            super().__init__()
            self.neg_list = [n.astype(np.int32) for n in neg_list]
            self.i = 0

        def __call__(self, dg, batch):
            width = batch.edge_src.shape[0]
            neg = np.full(width, PADDED_NODE_ID, np.int32)
            real = self.neg_list[self.i]
            neg[: len(real)] = real
            self.i += 1
            neg = jnp.asarray(neg)
            if batch.edge_valid is not None:
                neg = jnp.where(batch.edge_valid, neg, PADDED_NODE_ID)
            batch.neg = neg
            batch.neg_time = batch.edge_time
            return batch

        def reset_state(self):
            self.i = 0

    class InjectEvalNeg(StatefulHook):
        _cls_requires = {"edge_time"}
        _cls_produces = {"neg", "neg_batch_list", "neg_time", "neg_valid"}

        def __init__(self, sets, bsize, Q):
            super().__init__()
            self.i, self.cap, self.Q, self.raw = 0, bsize * Q, Q, sets

        def __call__(self, dg, batch):
            s = self.raw[self.i]
            self.i += 1
            width = batch.edge_src.shape[0]
            uniq = np.full(self.cap, PADDED_NODE_ID, np.int32)
            uniq[: len(s["uniq"])] = s["uniq"]
            nt = np.zeros(self.cap, np.int32)
            nt[: len(s["neg_time"])] = s["neg_time"]
            cands = np.full((width, self.Q), PADDED_NODE_ID, np.int32)
            cands[: len(s["cands"])] = s["cands"]
            batch.neg = jnp.asarray(uniq)
            batch.neg_time = jnp.asarray(nt)
            batch.neg_batch_list = jnp.asarray(cands)
            batch.neg_valid = batch.neg_batch_list != PADDED_NODE_ID
            return batch

        def reset_state(self):
            self.i = 0

    return InjectTrainNeg, InjectEvalNeg


# --------------------------------------------------------------------------- #
# Shared snapshot scaffolding
# --------------------------------------------------------------------------- #
def ref_snapshot_env(cfg, splits, negs, static_x, gran):
    """Reference-side data/loaders for the DTDG pipelines. Returns a dict."""
    import torch

    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph, TimeDeltaDG
    from tgm.data import DGData, DGDataLoader
    from tgm.hooks import HookManager

    def data_of(sp):
        return DGData.from_raw(
            edge_time=torch.from_numpy(sp["t"]),
            edge_index=torch.from_numpy(
                np.stack([sp["src"], sp["dst"]], 1).astype(np.int64)
            ),
            edge_x=torch.from_numpy(sp["x"]),
            static_node_x=torch.from_numpy(static_x),
            time_delta="s",
        )

    datas = {k: data_of(splits[k]) for k in ("train", "val", "test")}
    dgs = {k: DGraph(d, device="cpu") for k, d in datas.items()}
    snaps = {k: DGraph(d.discretize(gran), device="cpu") for k, d in datas.items()}
    conversion_rate = int(TimeDeltaDG(gran).convert(dgs["train"].time_delta))

    InjectTrainNeg, InjectEvalNeg = ref_inject_hooks()
    hm = HookManager(keys=["train", "val", "test"])
    hm.register("train", InjectTrainNeg(negs["train"]))
    hm.register("val", InjectEvalNeg(negs["val"]))
    hm.register("test", InjectEvalNeg(negs["test"]))

    loaders = {k: DGDataLoader(dgs[k], cfg.bsize, hook_manager=hm) for k in dgs}
    snap_loaders = {k: DGDataLoader(snaps[k], batch_unit=gran) for k in snaps}
    return {
        "dgs": dgs, "snaps": snaps, "rate": conversion_rate, "hm": hm,
        "loaders": loaders, "snap_loaders": snap_loaders,
    }


def ours_snapshot_env(cfg, splits, negs, static_x, gran):
    """tgm_tpu-side data/hooks + prefetched snapshot plans."""
    import jax.numpy as jnp

    from tgm_tpu import DGDataLoader, DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.hooks import HookManager

    def data_of(sp):
        return DGData.from_raw(
            edge_time=sp["t"],
            edge_index=np.stack([sp["src"], sp["dst"]], 1),
            edge_x=sp["x"],
            static_node_x=static_x,
            time_delta="s",
        )

    datas = {k: data_of(splits[k]) for k in ("train", "val", "test")}
    dgs = {k: DGraph(d) for k, d in datas.items()}

    def snapshot_list(key):
        snap_dg = DGraph(datas[key].discretize(gran))
        out = []
        for b in DGDataLoader(snap_dg, 1, batch_unit=gran,
                              materialize_features=False):
            valid = np.asarray(b.edge_valid)
            t = np.asarray(b.edge_time)
            assert valid.any(), "empty snapshot window"
            out.append({
                "src": jnp.asarray(b.edge_src), "dst": jnp.asarray(b.edge_dst),
                "valid": jnp.asarray(b.edge_valid),
                "last_t": int(t[valid][-1]),
                "n_edges": int(valid.sum()),
            })
        return out

    snap_lists = {k: snapshot_list(k) for k in ("train", "val", "test")}

    InjectTrainNeg, InjectEvalNeg = ours_inject_hooks()
    hm = HookManager(keys=["train", "val", "test"])
    hm.register("train", InjectTrainNeg(negs["train"]))
    hm.register("val", InjectEvalNeg(negs["val"], cfg.bsize, cfg.n_cands))
    hm.register("test", InjectEvalNeg(negs["test"], cfg.bsize, cfg.n_cands))
    return {"dgs": dgs, "snap_lists": snap_lists, "hm": hm}


def ours_advance(snaps_seq, pos_idx, event_last_t, rate, step_fn):
    """Advance snapshots while the event batch has crossed the current
    snapshot's boundary — the reference examples' shared while-loop
    (e.g. /root/reference/examples/linkproppred/tgcn.py:105-114)."""
    while (
        pos_idx[0] < len(snaps_seq)
        and event_last_t > (snaps_seq[pos_idx[0] - 1]["last_t"] + 1) * rate
    ):
        step_fn(snaps_seq[pos_idx[0]])
        pos_idx[0] += 1


# --------------------------------------------------------------------------- #
# TGCN
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class TGCNConfig(ParityConfig):
    node_dim: int = 8
    snapshot_gran: str = "h"


def run_reference_tgcn(cfg: TGCNConfig, splits, negs) -> Dict:
    """Reference TGCN pipeline: GCN-GRU snapshot recurrence with detached z
    (decoder-only training), MSE loss, raw-score eval
    (/root/reference/examples/linkproppred/tgcn.py:44-260)."""
    import copy

    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.nn import TGCN, LinkPredictor

    torch.manual_seed(cfg.seed)
    static_x = np.random.default_rng(cfg.seed + 2).normal(
        size=(cfg.n_nodes, cfg.node_dim)
    ).astype(np.float32)
    env = ref_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, rate = env["hm"], env["rate"]

    class RecurrentGCN(torch_nn.Module):
        """tgcn example :44-70."""

        def __init__(self, node_dim, embed_dim):
            super().__init__()
            self.recurrent = TGCN(in_channels=node_dim, out_channels=embed_dim)
            self.linear = torch_nn.Linear(embed_dim, embed_dim)

        def forward(self, batch, node_feat, h=None):
            edge_index = torch.stack([batch.edge_src, batch.edge_dst], dim=0)
            h_0 = self.recurrent(node_feat, edge_index, None, h)
            z = F.relu(h_0)
            z = self.linear(z)
            return z, h_0

    encoder = RecurrentGCN(cfg.node_dim, cfg.embed_dim)
    decoder = LinkPredictor(cfg.embed_dim)  # reference default hidden_dim=64
    params = list(dict.fromkeys(list(encoder.parameters()) + list(decoder.parameters())))
    opt = torch.optim.Adam(params, lr=cfg.lr)
    init_modules = {"encoder": copy.deepcopy(encoder), "decoder": copy.deepcopy(decoder)}
    sx = torch.from_numpy(static_x)

    def train_epoch(loader, snap_loader):
        encoder.train(); decoder.train()
        losses = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        z, h_0 = encoder(snapshot_batch, sx)
        z, h_0 = z.detach(), h_0.detach()
        for batch in loader:
            opt.zero_grad()
            pos_out = decoder(z[batch.edge_src], z[batch.edge_dst])
            neg_out = decoder(z[batch.edge_src], z[batch.neg])
            loss = F.mse_loss(pos_out, torch.ones_like(pos_out))
            loss = loss + F.mse_loss(neg_out, torch.zeros_like(neg_out))
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    z, h_0 = encoder(snapshot_batch, sx, h_0)
                    z, h_0 = z.detach(), h_0.detach()
                except StopIteration:
                    break
        return losses, z, h_0

    @torch.no_grad()
    def eval_epoch(loader, snap_loader, z, h_0, sink):
        encoder.eval(); decoder.eval()
        rr = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        for batch in loader:
            pos_l, neg_l = [], []
            for idx, neg_batch in enumerate(batch.neg_batch_list):
                query_src = batch.edge_src[idx].repeat(len(neg_batch) + 1)
                query_dst = torch.cat([batch.edge_dst[idx].unsqueeze(0), neg_batch])
                y = decoder(z[query_src], z[query_dst])  # raw scores (no sigmoid)
                pos_l.append(float(y[0]))
                neg_l.append(y[1:].numpy())
            sink.append(np.concatenate([np.array(pos_l), np.stack(neg_l).ravel()]))
            rr.append(reciprocal_ranks(np.array(pos_l), np.stack(neg_l)))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    z, h_0 = encoder(snapshot_batch, sx, h_0)
                except StopIteration:
                    break
        return float(np.mean(np.concatenate(rr))), z, h_0

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    for epoch in range(cfg.epochs):
        with hm.activate("train"):
            ls, z, h_0 = train_epoch(env["loaders"]["train"], env["snap_loaders"]["train"])
            losses.append(ls)
        with hm.activate("val"):
            mrr, z, h_0 = eval_epoch(
                env["loaders"]["val"], env["snap_loaders"]["val"], z, h_0, scores["val"]
            )
            val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            with hm.activate("test"):
                test_mrr, z, h_0 = eval_epoch(
                    env["loaders"]["test"], env["snap_loaders"]["test"], z, h_0,
                    scores["test"],
                )
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": scores, "modules": init_modules, "static_x": static_x,
        "conversion_rate": env["rate"],
    }


def run_ours_tgcn(cfg: TGCNConfig, splits, negs, torch_modules, static_x,
                  rate) -> Dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax import linen as flax_nn

    from tools.refbridge import dense_params, gcn_conv_params, link_predictor_params
    from tgm_tpu import DGDataLoader
    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.nn import LinkPredictor
    from tgm_tpu.nn.encoder.tgcn import TGCN

    env = ours_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, dgs, snap_lists = env["hm"], env["dgs"], env["snap_lists"]

    cell = TGCN(in_channels=cfg.node_dim, out_channels=cfg.embed_dim)
    lin = flax_nn.Dense(cfg.embed_dim)
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=64)

    ref_enc = torch_modules["encoder"]
    rc = ref_enc.recurrent
    cell_params = {
        "params": {
            "conv_u": gcn_conv_params(rc.conv_u),
            "conv_r": gcn_conv_params(rc.conv_r),
            "conv_c": gcn_conv_params(rc.conv_c),
            "linear_u": dense_params(rc.linear_u),
            "linear_r": dense_params(rc.linear_r),
            "linear_c": dense_params(rc.linear_c),
        }
    }
    cell_params = jax.tree_util.tree_map(jnp.asarray, cell_params)
    lin_params = jax.tree_util.tree_map(
        jnp.asarray, {"params": dense_params(ref_enc.linear)}
    )
    dec_params = jax.tree_util.tree_map(
        jnp.asarray, link_predictor_params(torch_modules["decoder"])
    )
    # Reference: z detached before the decoder -> only the decoder trains.
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(dec_params)
    sx = jnp.asarray(static_x)
    N = cfg.n_nodes

    @jax.jit
    def snap_apply(H, src, dst, valid):
        H2 = cell.apply(cell_params, sx, src, dst, None, H, valid)
        z = lin.apply(lin_params, jax.nn.relu(H2))
        return z, H2

    def rows(ids, valid):
        return jnp.where(valid, jnp.clip(ids, 0, N - 1), 0)

    @jax.jit
    def train_step(dp, opt_state, z, src, dst, neg, valid):
        def loss_fn(d):
            zs = z[rows(src, valid)]
            pos = decoder.apply(d, zs, z[rows(dst, valid)])
            ng = decoder.apply(d, zs, z[rows(neg, valid)])
            m = valid.astype(pos.dtype)
            den = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum((pos - 1.0) ** 2 * m) + jnp.sum(ng**2 * m)
            ) / den

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(dp, updates), opt_state, loss

    @jax.jit
    def eval_scores_fn(dp, z, src, dst, cands, valid):
        B, Q = cands.shape
        zs = z[rows(src, valid)]
        pos = decoder.apply(dp, zs, z[rows(dst, valid)])
        cval = cands != PADDED_NODE_ID
        zq = z[rows(cands.reshape(-1), cval.reshape(-1))]
        neg = decoder.apply(
            dp, jnp.repeat(zs[:, None, :], Q, 1).reshape(B * Q, -1), zq
        ).reshape(B, Q)
        return pos, neg  # raw scores, like the reference example

    def train_epoch(dp, ost, sp):
        snaps_seq = snap_lists["train"]
        s0 = snaps_seq[0]
        z, H = snap_apply(None, s0["src"], s0["dst"], s0["valid"])
        state = {"z": z, "H": H}
        pos_idx = [1]
        losses = []
        loader = DGDataLoader(dgs["train"], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            state["z"], state["H"] = snap_apply(state["H"], s["src"], s["dst"], s["valid"])

        with hm.activate("train"):
            for bi, batch in enumerate(loader):
                dp, ost, loss = train_step(
                    dp, ost, state["z"],
                    batch.edge_src, batch.edge_dst, batch.neg, batch.edge_valid,
                )
                losses.append(float(loss))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return dp, ost, losses, state

    def eval_epoch(dp, state, key, sp, sets, sink):
        snaps_seq = snap_lists[key]
        state = dict(state)
        pos_idx = [1]
        rr = []
        loader = DGDataLoader(dgs[key], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            state["z"], state["H"] = snap_apply(state["H"], s["src"], s["dst"], s["valid"])

        with hm.activate(key):
            for bi, batch in enumerate(loader):
                pos, neg = eval_scores_fn(
                    dp, state["z"], batch.edge_src, batch.edge_dst,
                    batch.neg_batch_list, batch.edge_valid,
                )
                n_real = len(sets[bi]["cands"])
                pos = np.asarray(pos)[:n_real]
                neg = np.asarray(neg)[:n_real]
                sink.append(np.concatenate([pos, neg.ravel()]))
                rr.append(reciprocal_ranks(pos, neg))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return float(np.mean(np.concatenate(rr))), state

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    dp, ost = dec_params, opt_state
    for epoch in range(cfg.epochs):
        dp, ost, ls, state = train_epoch(dp, ost, splits["train"])
        losses.append(ls)
        mrr, state = eval_epoch(dp, state, "val", splits["val"], negs["val"], scores["val"])
        val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            test_mrr, state = eval_epoch(
                dp, state, "test", splits["test"], negs["test"], scores["test"]
            )
        else:
            hm.reset_state()
    return {"losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
            "eval_scores": scores}


def run_parity_tgcn(cfg: TGCNConfig) -> Dict:
    splits = make_splits(cfg)
    negs = precompute_negatives(cfg, splits)
    ref = run_reference_tgcn(cfg, splits, negs)
    ours = run_ours_tgcn(cfg, splits, negs, ref["modules"], ref["static_x"],
                         ref["conversion_rate"])
    out = add_score_diffs(compare(ref, ours), ref, ours)
    out["config"] = dataclasses.asdict(cfg)
    return out

# --------------------------------------------------------------------------- #
# ROLAND
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class ROLANDConfig(ParityConfig):
    node_dim: int = 8
    update: str = "learnable"
    snapshot_gran: str = "h"


def run_reference_roland(cfg: ROLANDConfig, splits, negs) -> Dict:
    """Reference ROLAND pipeline: snapshot 2xGCN with embedding-update merges,
    MSE loss, decoder-only training, and the example's carried-embedding
    quirks — the first train snapshot's output is NOT written back to
    last_embeddings, which is reset to zeros at every epoch start
    (/root/reference/examples/linkproppred/roland.py:92-325)."""
    import copy

    import torch
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm.nn import ROLAND, LinkPredictor

    torch.manual_seed(cfg.seed)
    static_x = np.random.default_rng(cfg.seed + 2).normal(
        size=(cfg.n_nodes, cfg.node_dim)
    ).astype(np.float32)
    env = ref_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, rate = env["hm"], env["rate"]

    encoder = ROLAND(cfg.node_dim, cfg.embed_dim, cfg.n_nodes, dropout=0.0,
                     update=cfg.update)
    decoder = LinkPredictor(cfg.embed_dim)  # reference default hidden_dim=64
    params = list(dict.fromkeys(list(encoder.parameters()) + list(decoder.parameters())))
    opt = torch.optim.Adam(params, lr=cfg.lr)
    init_modules = {"encoder": copy.deepcopy(encoder), "decoder": copy.deepcopy(decoder)}
    sx = torch.from_numpy(static_x)

    def enc(snapshot_batch, last_emb, prev_n, cur_n):
        edge_index = torch.stack([snapshot_batch.edge_src, snapshot_batch.edge_dst], 0)
        return encoder(sx, edge_index, last_emb,
                       num_current_edges=cur_n, num_previous_edges=prev_n)

    def train_epoch(loader, snap_loader, last_embeddings):
        encoder.train(); decoder.train()
        losses = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        prev_n, cur_n = None, snapshot_batch.edge_src.numel()
        z = enc(snapshot_batch, last_embeddings, prev_n, cur_n)
        z[0], z[1] = z[0].detach(), z[1].detach()
        for batch in loader:
            opt.zero_grad()
            pos_out = decoder(z[-1][batch.edge_src], z[-1][batch.edge_dst])
            neg_out = decoder(z[-1][batch.edge_src], z[-1][batch.neg])
            loss = F.mse_loss(pos_out, torch.ones_like(pos_out))
            loss = loss + F.mse_loss(neg_out, torch.zeros_like(neg_out))
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    prev_n, cur_n = cur_n, snapshot_batch.edge_src.numel()
                    z = enc(snapshot_batch, last_embeddings, prev_n, cur_n)
                    last_embeddings = z
                    z[0], z[1] = z[0].detach(), z[1].detach()
                except StopIteration:
                    break
        return losses, last_embeddings

    @torch.no_grad()
    def eval_epoch(loader, snap_loader, z, sink):
        encoder.eval(); decoder.eval()
        rr = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        prev_n, cur_n = None, snapshot_batch.edge_src.numel()
        for batch in loader:
            pos_l, neg_l = [], []
            for idx, neg_batch in enumerate(batch.neg_batch_list):
                query_src = batch.edge_src[idx].repeat(len(neg_batch) + 1)
                query_dst = torch.cat([batch.edge_dst[idx].unsqueeze(0), neg_batch])
                y = decoder(z[-1][query_src], z[-1][query_dst])  # raw scores
                pos_l.append(float(y[0]))
                neg_l.append(y[1:].numpy())
            sink.append(np.concatenate([np.array(pos_l), np.stack(neg_l).ravel()]))
            rr.append(reciprocal_ranks(np.array(pos_l), np.stack(neg_l)))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    prev_n, cur_n = cur_n, snapshot_batch.edge_src.numel()
                    z = enc(snapshot_batch, z, prev_n, cur_n)
                except StopIteration:
                    break
        z[0], z[1] = z[0].detach(), z[1].detach()
        return float(np.mean(np.concatenate(rr))), z

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    for epoch in range(cfg.epochs):
        last_embeddings = [
            torch.zeros(cfg.n_nodes, cfg.embed_dim),
            torch.zeros(cfg.n_nodes, cfg.embed_dim),
        ]
        with hm.activate("train"):
            ls, last_embeddings = train_epoch(
                env["loaders"]["train"], env["snap_loaders"]["train"], last_embeddings
            )
            losses.append(ls)
        with hm.activate("val"):
            mrr, last_embeddings = eval_epoch(
                env["loaders"]["val"], env["snap_loaders"]["val"],
                last_embeddings, scores["val"],
            )
            val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            with hm.activate("test"):
                test_mrr, last_embeddings = eval_epoch(
                    env["loaders"]["test"], env["snap_loaders"]["test"],
                    last_embeddings, scores["test"],
                )
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": scores, "modules": init_modules, "static_x": static_x,
        "conversion_rate": env["rate"],
    }


def run_ours_roland(cfg: ROLANDConfig, splits, negs, torch_modules, static_x,
                    rate) -> Dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tools.refbridge import (
        dense_params,
        gcn_conv_params,
        link_predictor_params,
        t2n,
    )
    from tgm_tpu import DGDataLoader
    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.nn import LinkPredictor
    from tgm_tpu.nn.encoder.roland import ROLAND

    env = ours_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, dgs, snap_lists = env["hm"], env["dgs"], env["snap_lists"]

    encoder = ROLAND(input_channel=cfg.node_dim, out_channel=cfg.embed_dim,
                     num_nodes=cfg.n_nodes, dropout=0.0, update=cfg.update)
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=64)

    ref_enc = torch_modules["encoder"]
    p = {
        "conv1": gcn_conv_params(ref_enc.conv1),
        "conv2": gcn_conv_params(ref_enc.conv2),
    }
    if cfg.update == "learnable":
        p["tau"] = t2n(ref_enc.tau)
    elif cfg.update == "gru":
        H = cfg.embed_dim
        for g in (1, 2):
            cell = getattr(ref_enc, f"gru{g}")
            w_ih, w_hh = t2n(cell.weight_ih), t2n(cell.weight_hh)
            b_ih, b_hh = t2n(cell.bias_ih), t2n(cell.bias_hh)
            r, z_, n_ = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
            p[f"gru{g}"] = {
                "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
                "iz": {"kernel": w_ih[z_].T, "bias": b_ih[z_] + b_hh[z_]},
                "in": {"kernel": w_ih[n_].T, "bias": b_ih[n_]},
                "hr": {"kernel": w_hh[r].T},
                "hz": {"kernel": w_hh[z_].T},
                "hn": {"kernel": w_hh[n_].T, "bias": b_hh[n_]},
            }
    elif cfg.update == "mlp":
        p["mlp1"] = dense_params(ref_enc.mlp1)
        p["mlp2"] = dense_params(ref_enc.mlp2)
    enc_params = jax.tree_util.tree_map(jnp.asarray, {"params": p})
    dec_params = jax.tree_util.tree_map(
        jnp.asarray, link_predictor_params(torch_modules["decoder"])
    )
    # Reference: every merge output is detached -> only the decoder trains.
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(dec_params)
    sx = jnp.asarray(static_x)
    N = cfg.n_nodes

    @jax.jit
    def snap_apply(prev0, prev1, src, dst, valid):
        _, embs = encoder.apply(
            enc_params, sx, src, dst, [prev0, prev1], edge_valid=valid
        )
        return embs[0], embs[1]

    def rows(ids, valid):
        return jnp.where(valid, jnp.clip(ids, 0, N - 1), 0)

    @jax.jit
    def train_step(dp, opt_state, z, src, dst, neg, valid):
        def loss_fn(d):
            zs = z[rows(src, valid)]
            pos = decoder.apply(d, zs, z[rows(dst, valid)])
            ng = decoder.apply(d, zs, z[rows(neg, valid)])
            m = valid.astype(pos.dtype)
            den = jnp.maximum(m.sum(), 1.0)
            return (jnp.sum((pos - 1.0) ** 2 * m) + jnp.sum(ng**2 * m)) / den

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(dp, updates), opt_state, loss

    @jax.jit
    def eval_scores_fn(dp, z, src, dst, cands, valid):
        B, Q = cands.shape
        zs = z[rows(src, valid)]
        pos = decoder.apply(dp, zs, z[rows(dst, valid)])
        cval = cands != PADDED_NODE_ID
        zq = z[rows(cands.reshape(-1), cval.reshape(-1))]
        neg = decoder.apply(
            dp, jnp.repeat(zs[:, None, :], Q, 1).reshape(B * Q, -1), zq
        ).reshape(B, Q)
        return pos, neg  # raw scores, like the reference example

    def zeros_pair():
        z0 = jnp.zeros((N, cfg.embed_dim))
        return [z0, z0]

    def train_epoch(dp, ost, sp, last_emb):
        snaps_seq = snap_lists["train"]
        s0 = snaps_seq[0]
        # Reference quirk: the first snapshot's output becomes z but is NOT
        # written back to last_embeddings (roland.py:109-121 vs :149).
        z0, z1 = snap_apply(last_emb[0], last_emb[1], s0["src"], s0["dst"], s0["valid"])
        state = {"z": [z0, z1], "last": list(last_emb)}
        pos_idx = [1]
        losses = []
        loader = DGDataLoader(dgs["train"], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            z0, z1 = snap_apply(state["last"][0], state["last"][1],
                                s["src"], s["dst"], s["valid"])
            state["z"] = [z0, z1]
            state["last"] = [z0, z1]

        with hm.activate("train"):
            for bi, batch in enumerate(loader):
                dp, ost, loss = train_step(
                    dp, ost, state["z"][1],
                    batch.edge_src, batch.edge_dst, batch.neg, batch.edge_valid,
                )
                losses.append(float(loss))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return dp, ost, losses, state["last"]

    def eval_epoch(dp, z_pair, key, sp, sets, sink):
        snaps_seq = snap_lists[key]
        state = {"z": list(z_pair)}
        pos_idx = [1]
        rr = []
        loader = DGDataLoader(dgs[key], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            z0, z1 = snap_apply(state["z"][0], state["z"][1],
                                s["src"], s["dst"], s["valid"])
            state["z"] = [z0, z1]

        with hm.activate(key):
            for bi, batch in enumerate(loader):
                pos, neg = eval_scores_fn(
                    dp, state["z"][1], batch.edge_src, batch.edge_dst,
                    batch.neg_batch_list, batch.edge_valid,
                )
                n_real = len(sets[bi]["cands"])
                pos = np.asarray(pos)[:n_real]
                neg = np.asarray(neg)[:n_real]
                sink.append(np.concatenate([pos, neg.ravel()]))
                rr.append(reciprocal_ranks(pos, neg))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return float(np.mean(np.concatenate(rr))), state["z"]

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    dp, ost = dec_params, opt_state
    for epoch in range(cfg.epochs):
        dp, ost, ls, last_emb = train_epoch(dp, ost, splits["train"], zeros_pair())
        losses.append(ls)
        mrr, z_pair = eval_epoch(dp, last_emb, "val", splits["val"], negs["val"],
                                 scores["val"])
        val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            test_mrr, z_pair = eval_epoch(
                dp, z_pair, "test", splits["test"], negs["test"], scores["test"]
            )
        else:
            hm.reset_state()
    return {"losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
            "eval_scores": scores}


def run_parity_roland(cfg: ROLANDConfig) -> Dict:
    splits = make_splits(cfg)
    negs = precompute_negatives(cfg, splits)
    ref = run_reference_roland(cfg, splits, negs)
    ours = run_ours_roland(cfg, splits, negs, ref["modules"], ref["static_x"],
                           ref["conversion_rate"])
    out = add_score_diffs(compare(ref, ours), ref, ours)
    out["config"] = dataclasses.asdict(cfg)
    return out

# --------------------------------------------------------------------------- #
# GCN (per-snapshot stateless encoder with BatchNorm)
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class GCNConfig(ParityConfig):
    node_dim: int = 8
    num_layers: int = 2
    snapshot_gran: str = "h"


def run_reference_gcn(cfg: GCNConfig, splits, negs) -> Dict:
    """Reference GCN pipeline: per-snapshot GCN+BatchNorm encoder (z detached,
    decoder-only training; BN running stats are the only carried state), BCE
    loss, sigmoid eval scores
    (/root/reference/examples/linkproppred/gcn.py:50-285)."""
    import copy

    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from torch_geometric.nn import GCNConv
    from tgm.nn import LinkPredictor

    torch.manual_seed(cfg.seed)
    static_x = np.random.default_rng(cfg.seed + 2).normal(
        size=(cfg.n_nodes, cfg.node_dim)
    ).astype(np.float32)
    env = ref_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, rate = env["hm"], env["rate"]

    class GCNEncoder(torch_nn.Module):
        """gcn example :50-92 (dropout 0 for parity)."""

        def __init__(self, in_channels, embed_dim, out_channels, num_layers):
            super().__init__()
            self.convs = torch_nn.ModuleList()
            self.bns = torch_nn.ModuleList()
            self.convs.append(GCNConv(in_channels, embed_dim))
            self.bns.append(torch_nn.BatchNorm1d(embed_dim))
            for _ in range(num_layers - 2):
                self.convs.append(GCNConv(embed_dim, embed_dim))
                self.bns.append(torch_nn.BatchNorm1d(embed_dim))
            self.convs.append(GCNConv(embed_dim, out_channels))

        def forward(self, batch, node_feat):
            edge_index = torch.stack([batch.edge_src, batch.edge_dst], dim=0)
            x = node_feat
            for i, conv in enumerate(self.convs[:-1]):
                x = conv(x, edge_index)
                x = self.bns[i](x)
                x = F.relu(x)
            return self.convs[-1](x, edge_index)

    encoder = GCNEncoder(cfg.node_dim, cfg.embed_dim, cfg.embed_dim, cfg.num_layers)
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=cfg.embed_dim)
    params = list(dict.fromkeys(list(encoder.parameters()) + list(decoder.parameters())))
    opt = torch.optim.Adam(params, lr=cfg.lr)
    init_modules = {"encoder": copy.deepcopy(encoder), "decoder": copy.deepcopy(decoder)}
    sx = torch.from_numpy(static_x)

    def train_epoch(loader, snap_loader):
        encoder.train(); decoder.train()
        losses = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        z = encoder(snapshot_batch, sx).detach()
        for batch in loader:
            opt.zero_grad()
            pos_out = decoder(z[batch.edge_src], z[batch.edge_dst])
            neg_out = decoder(z[batch.edge_src], z[batch.neg])
            loss = F.binary_cross_entropy_with_logits(pos_out, torch.ones_like(pos_out))
            loss = loss + F.binary_cross_entropy_with_logits(
                neg_out, torch.zeros_like(neg_out)
            )
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    z = encoder(snapshot_batch, sx).detach()
                except StopIteration:
                    break
        return losses, z

    @torch.no_grad()
    def eval_epoch(loader, snap_loader, z, sink):
        encoder.eval(); decoder.eval()
        rr = []
        snap_it = iter(snap_loader)
        snapshot_batch = next(snap_it)
        for batch in loader:
            pos_l, neg_l = [], []
            for idx, neg_batch in enumerate(batch.neg_batch_list):
                query_src = batch.edge_src[idx].repeat(len(neg_batch) + 1)
                query_dst = torch.cat([batch.edge_dst[idx].unsqueeze(0), neg_batch])
                y = decoder(z[query_src], z[query_dst]).sigmoid()
                pos_l.append(float(y[0]))
                neg_l.append(y[1:].numpy())
            sink.append(np.concatenate([np.array(pos_l), np.stack(neg_l).ravel()]))
            rr.append(reciprocal_ranks(np.array(pos_l), np.stack(neg_l)))
            while batch.edge_time[-1] > (snapshot_batch.edge_time[-1] + 1) * rate:
                try:
                    snapshot_batch = next(snap_it)
                    z = encoder(snapshot_batch, sx)
                except StopIteration:
                    break
        return float(np.mean(np.concatenate(rr))), z

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    for epoch in range(cfg.epochs):
        with hm.activate("train"):
            ls, z = train_epoch(env["loaders"]["train"], env["snap_loaders"]["train"])
            losses.append(ls)
        with hm.activate("val"):
            mrr, z = eval_epoch(
                env["loaders"]["val"], env["snap_loaders"]["val"], z, scores["val"]
            )
            val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            with hm.activate("test"):
                test_mrr, z = eval_epoch(
                    env["loaders"]["test"], env["snap_loaders"]["test"], z,
                    scores["test"],
                )
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": scores, "modules": init_modules, "static_x": static_x,
        "conversion_rate": env["rate"],
    }


def run_ours_gcn(cfg: GCNConfig, splits, negs, torch_modules, static_x,
                 rate) -> Dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tools.refbridge import gcn_conv_params, link_predictor_params, t2n
    from tgm_tpu import DGDataLoader
    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.nn import LinkPredictor
    from tgm_tpu.nn.modules.graph_conv import GCNConv

    env = ours_snapshot_env(cfg, splits, negs, static_x, cfg.snapshot_gran)
    hm, dgs, snap_lists = env["hm"], env["dgs"], env["snap_lists"]

    n_bn = cfg.num_layers - 1
    convs = [GCNConv(cfg.embed_dim) for _ in range(cfg.num_layers)]
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=cfg.embed_dim)

    ref_enc = torch_modules["encoder"]
    conv_params = [
        jax.tree_util.tree_map(jnp.asarray, {"params": gcn_conv_params(c)})
        for c in ref_enc.convs
    ]
    bn_params = [
        {"gamma": jnp.asarray(t2n(b.weight)), "beta": jnp.asarray(t2n(b.bias))}
        for b in ref_enc.bns
    ]
    bn_state0 = [
        {"rm": jnp.asarray(t2n(b.running_mean)), "rv": jnp.asarray(t2n(b.running_var))}
        for b in ref_enc.bns
    ]
    dec_params = jax.tree_util.tree_map(
        jnp.asarray, link_predictor_params(torch_modules["decoder"])
    )
    # Reference: z detached before the decoder -> only the decoder trains
    # (the BN running stats still advance every train-mode snapshot forward).
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(dec_params)
    sx = jnp.asarray(static_x)
    N = cfg.n_nodes
    BN_EPS, BN_MOM = 1e-5, 0.1

    def bn_apply(x, p, s, training):
        """torch.nn.BatchNorm1d semantics: normalize with BIASED batch var,
        update running_var with the UNBIASED batch var (n/(n-1)) — the
        torch/flax discrepancy that makes flax BatchNorm non-parity here."""
        if training:
            mu = x.mean(0)
            var = ((x - mu) ** 2).mean(0)
            xhat = (x - mu) * jax.lax.rsqrt(var + BN_EPS)
            n = x.shape[0]
            s = {
                "rm": (1 - BN_MOM) * s["rm"] + BN_MOM * mu,
                "rv": (1 - BN_MOM) * s["rv"] + BN_MOM * var * (n / (n - 1)),
            }
        else:
            xhat = (x - s["rm"]) * jax.lax.rsqrt(s["rv"] + BN_EPS)
        return p["gamma"] * xhat + p["beta"], s

    def encode(src, dst, valid, bn_state, training):
        x = sx
        new_state = []
        for i in range(cfg.num_layers - 1):
            x = convs[i].apply(conv_params[i], x, src, dst, None, valid)
            x, s = bn_apply(x, bn_params[i], bn_state[i], training)
            new_state.append(s)
            x = jax.nn.relu(x)
        x = convs[-1].apply(conv_params[-1], x, src, dst, None, valid)
        return x, new_state

    snap_train = jax.jit(lambda src, dst, valid, bs: encode(src, dst, valid, bs, True))
    snap_eval = jax.jit(lambda src, dst, valid, bs: encode(src, dst, valid, bs, False))

    def rows(ids, valid):
        return jnp.where(valid, jnp.clip(ids, 0, N - 1), 0)

    @jax.jit
    def train_step(dp, opt_state, z, src, dst, neg, valid):
        def loss_fn(d):
            zs = z[rows(src, valid)]
            pos = decoder.apply(d, zs, z[rows(dst, valid)])
            ng = decoder.apply(d, zs, z[rows(neg, valid)])
            m = valid.astype(pos.dtype)
            den = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(ng, jnp.zeros_like(ng)) * m)
            ) / den

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(dp, updates), opt_state, loss

    @jax.jit
    def eval_scores_fn(dp, z, src, dst, cands, valid):
        B, Q = cands.shape
        zs = z[rows(src, valid)]
        pos = decoder.apply(dp, zs, z[rows(dst, valid)])
        cval = cands != PADDED_NODE_ID
        zq = z[rows(cands.reshape(-1), cval.reshape(-1))]
        neg = decoder.apply(
            dp, jnp.repeat(zs[:, None, :], Q, 1).reshape(B * Q, -1), zq
        ).reshape(B, Q)
        return jax.nn.sigmoid(pos), jax.nn.sigmoid(neg)

    def train_epoch(dp, ost, sp, bn_state):
        snaps_seq = snap_lists["train"]
        s0 = snaps_seq[0]
        z, bn_state = snap_train(s0["src"], s0["dst"], s0["valid"], bn_state)
        state = {"z": z, "bn": bn_state}
        pos_idx = [1]
        losses = []
        loader = DGDataLoader(dgs["train"], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            state["z"], state["bn"] = snap_train(s["src"], s["dst"], s["valid"], state["bn"])

        with hm.activate("train"):
            for bi, batch in enumerate(loader):
                dp, ost, loss = train_step(
                    dp, ost, state["z"],
                    batch.edge_src, batch.edge_dst, batch.neg, batch.edge_valid,
                )
                losses.append(float(loss))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return dp, ost, losses, state

    def eval_epoch(dp, state, key, sp, sets, sink):
        snaps_seq = snap_lists[key]
        state = dict(state)
        pos_idx = [1]
        rr = []
        loader = DGDataLoader(dgs[key], cfg.bsize, hook_manager=hm)
        E = len(sp["t"])

        def step(s):
            state["z"], _ = snap_eval(s["src"], s["dst"], s["valid"], state["bn"])

        with hm.activate(key):
            for bi, batch in enumerate(loader):
                pos, neg = eval_scores_fn(
                    dp, state["z"], batch.edge_src, batch.edge_dst,
                    batch.neg_batch_list, batch.edge_valid,
                )
                n_real = len(sets[bi]["cands"])
                pos = np.asarray(pos)[:n_real]
                neg = np.asarray(neg)[:n_real]
                sink.append(np.concatenate([pos, neg.ravel()]))
                rr.append(reciprocal_ranks(pos, neg))
                last_t = int(sp["t"][min((bi + 1) * cfg.bsize, E) - 1])
                ours_advance(snaps_seq, pos_idx, last_t, rate, step)
        return float(np.mean(np.concatenate(rr))), state

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    dp, ost = dec_params, opt_state
    state = {"z": None, "bn": bn_state0}
    for epoch in range(cfg.epochs):
        dp, ost, ls, state = train_epoch(dp, ost, splits["train"], state["bn"])
        losses.append(ls)
        mrr, state = eval_epoch(dp, state, "val", splits["val"], negs["val"], scores["val"])
        val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            test_mrr, state = eval_epoch(
                dp, state, "test", splits["test"], negs["test"], scores["test"]
            )
        else:
            hm.reset_state()
    return {"losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
            "eval_scores": scores}


def run_parity_gcn(cfg: GCNConfig) -> Dict:
    splits = make_splits(cfg)
    negs = precompute_negatives(cfg, splits)
    ref = run_reference_gcn(cfg, splits, negs)
    ours = run_ours_gcn(cfg, splits, negs, ref["modules"], ref["static_x"],
                        ref["conversion_rate"])
    out = add_score_diffs(compare(ref, ours), ref, ours)
    out["config"] = dataclasses.asdict(cfg)
    return out

# --------------------------------------------------------------------------- #
# GraphMixer
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class GraphMixerConfig(ParityConfig):
    node_dim: int = 8
    n_nbrs: int = 6
    time_gap: int = 50
    token_exp: float = 0.5
    channel_exp: float = 4.0
    mixer_layers: int = 2


def run_reference_graphmixer(cfg: GraphMixerConfig, splits, negs) -> Dict:
    """Reference GraphMixer pipeline (torch CPU): recency-sequence MLP-Mixer
    link encoder (frozen Time2Vec) + time-gap neighbor-mean node encoder
    (/root/reference/examples/linkproppred/graphmixer.py:72-258)."""
    import copy
    from collections import defaultdict
    from dataclasses import replace as dc_replace

    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph
    from tgm.constants import PADDED_NODE_ID as REF_PAD
    from tgm.data import DGData, DGDataLoader
    from tgm.hooks import HookManager, RecencyNeighborHook
    from tgm.nn import LinkPredictor, MLPMixer, Time2Vec

    torch.manual_seed(cfg.seed)
    static_x = np.random.default_rng(cfg.seed + 2).normal(
        size=(cfg.n_nodes, cfg.node_dim)
    ).astype(np.float32)

    def dg_of(sp):
        data = DGData.from_raw(
            edge_time=torch.from_numpy(sp["t"]),
            edge_index=torch.from_numpy(
                np.stack([sp["src"], sp["dst"]], 1).astype(np.int64)
            ),
            edge_x=torch.from_numpy(sp["x"]),
            static_node_x=torch.from_numpy(static_x),
            time_delta="s",
        )
        return DGraph(data, device="cpu")

    dgs = {k: dg_of(splits[k]) for k in ("train", "val", "test")}

    class GraphMixerHook:
        """graphmixer example :229-258 (verbatim semantics)."""

        has_state = False
        requires = frozenset({"neg"})
        produces = frozenset({"time_gap_nbrs"})

        def __init__(self, time_gap):
            self._time_gap = time_gap

        def __call__(self, dg, batch):
            time_gap_slice = dc_replace(dg._slice)
            time_gap_slice.start_idx = max(dg._slice.end_idx - self._time_gap, 0)
            time_gap_slice.end_time = int(batch.edge_time.min()) - 1
            tg_src, tg_dst, _ = dg._storage.get_edges(time_gap_slice)
            nbr_index = defaultdict(list)
            for u, v in zip(tg_src.tolist(), tg_dst.tolist()):
                nbr_index[u].append(v)
                nbr_index[v].append(u)
            seed_nodes = torch.cat([batch.edge_src, batch.edge_dst, batch.neg])
            batch.time_gap_nbrs = [nbr_index.get(n, []) for n in seed_nodes.tolist()]
            return batch

        def reset_state(self):
            pass

    class GraphMixerEncoder(torch_nn.Module):
        """graphmixer example :72-147 (dropout 0 for parity)."""

        def __init__(self):
            super().__init__()
            self.time_encoder = Time2Vec(time_dim=cfg.time_dim)
            for p in self.time_encoder.parameters():
                p.requires_grad = False
            self.projection_layer = torch_nn.Linear(
                cfg.edge_dim + cfg.time_dim, cfg.edge_dim
            )
            self.mlp_mixers = torch_nn.ModuleList(
                [
                    MLPMixer(
                        num_tokens=cfg.n_nbrs, num_channels=cfg.edge_dim,
                        token_dim_expansion_factor=cfg.token_exp,
                        channel_dim_expansion_factor=cfg.channel_exp,
                        dropout=0.0,
                    )
                    for _ in range(cfg.mixer_layers)
                ]
            )
            self.output_layer = torch_nn.Linear(
                cfg.edge_dim + cfg.node_dim, cfg.embed_dim
            )

        def forward(self, batch, node_feat):
            edge_feat = batch.nbr_edge_x[0]
            nbr_time_feat = self.time_encoder(
                batch.seed_times[0][:, None] - batch.nbr_edge_time[0]
            )
            z_link = self.projection_layer(
                torch.cat([edge_feat, nbr_time_feat], dim=-1)
            )
            for mixer in self.mlp_mixers:
                z_link = mixer(z_link)
            valid = batch.nbr_nids[0] != REF_PAD
            z_link = z_link * valid.unsqueeze(-1)
            z_link = z_link.sum(dim=1) / valid.sum(dim=1, keepdim=True).clamp(min=1)

            num_nodes, feat_dim = len(batch.time_gap_nbrs), node_feat.shape[1]
            time_gap_feat = torch.zeros((num_nodes, feat_dim))
            for i in range(num_nodes):
                if batch.time_gap_nbrs[i]:
                    time_gap_feat[i] = node_feat[batch.time_gap_nbrs[i]].mean(dim=0)
            z_node = time_gap_feat + node_feat[
                torch.cat([batch.edge_src, batch.edge_dst, batch.neg])
            ]
            return self.output_layer(torch.cat([z_link, z_node], dim=1))

    InjectTrainNeg, InjectEvalNeg = ref_inject_hooks()
    hm = HookManager(keys=["train", "val", "test"])
    hm.register("train", InjectTrainNeg(negs["train"]))
    hm.register("val", InjectEvalNeg(negs["val"]))
    hm.register("test", InjectEvalNeg(negs["test"]))
    hm.register_shared(GraphMixerHook(cfg.time_gap))
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[cfg.n_nbrs], num_nodes=cfg.n_nodes,
            seed_nodes_keys=["edge_src", "edge_dst", "neg"],
            seed_times_keys=["edge_time", "edge_time", "neg_time"],
        )
    )

    encoder = GraphMixerEncoder()
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=cfg.embed_dim)
    params = list(dict.fromkeys(list(encoder.parameters()) + list(decoder.parameters())))
    opt = torch.optim.Adam(params, lr=cfg.lr)
    init_modules = {"encoder": copy.deepcopy(encoder), "decoder": copy.deepcopy(decoder)}
    sx = torch.from_numpy(static_x)

    def train_epoch(loader):
        encoder.train(); decoder.train()
        losses = []
        for batch in loader:
            opt.zero_grad()
            z = encoder(batch, sx)
            z_src, z_dst, z_neg = torch.chunk(z, 3)
            pos_out = decoder(z_src, z_dst)
            neg_out = decoder(z_src, z_neg)
            loss = F.binary_cross_entropy_with_logits(pos_out, torch.ones_like(pos_out))
            loss = loss + F.binary_cross_entropy_with_logits(
                neg_out, torch.zeros_like(neg_out)
            )
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        return losses

    @torch.no_grad()
    def eval_epoch(loader, sink):
        encoder.eval(); decoder.eval()
        rr = []
        for batch in loader:
            z = encoder(batch, sx)
            id_map = {int(nid): i for i, nid in enumerate(batch.seed_nids[0])}
            pos_l, neg_l = [], []
            for idx, neg_batch in enumerate(batch.neg_batch_list):
                dst_ids = torch.cat([batch.edge_dst[idx].unsqueeze(0), neg_batch])
                src_ids = batch.edge_src[idx].repeat(len(dst_ids))
                src_idx = torch.tensor([id_map[int(n)] for n in src_ids])
                dst_idx = torch.tensor([id_map[int(n)] for n in dst_ids])
                y = decoder(z[src_idx], z[dst_idx]).sigmoid()
                pos_l.append(float(y[0]))
                neg_l.append(y[1:].numpy())
            sink.append(np.concatenate([np.array(pos_l), np.stack(neg_l).ravel()]))
            rr.append(reciprocal_ranks(np.array(pos_l), np.stack(neg_l)))
        return float(np.mean(np.concatenate(rr)))

    loaders = {k: DGDataLoader(dgs[k], cfg.bsize, hook_manager=hm) for k in dgs}
    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    for epoch in range(cfg.epochs):
        with hm.activate("train"):
            losses.append(train_epoch(loaders["train"]))
        with hm.activate("val"):
            val_mrrs.append(eval_epoch(loaders["val"], scores["val"]))
        if epoch == cfg.epochs - 1:
            with hm.activate("test"):
                test_mrr = eval_epoch(loaders["test"], scores["test"])
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": scores, "modules": init_modules, "static_x": static_x,
    }


def run_ours_graphmixer(cfg: GraphMixerConfig, splits, negs, torch_modules,
                        static_x) -> Dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax import linen as flax_nn

    from tools.refbridge import (
        dense_params,
        link_predictor_params,
        mlp_mixer_params,
        time2vec_params,
    )
    from tgm_tpu import DGDataLoader, DGraph
    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.hooks import (
        HookManager,
        RecencyNeighborHook,
        TimeGapNeighborMeanHook,
        candidate_rows,
        seed_lookup,
    )
    from tgm_tpu.nn import LinkPredictor, MLPMixer, Time2Vec

    def data_of(sp):
        return DGData.from_raw(
            edge_time=sp["t"],
            edge_index=np.stack([sp["src"], sp["dst"]], 1),
            edge_x=sp["x"],
            static_node_x=static_x,
            time_delta="s",
        )

    datas = {k: data_of(splits[k]) for k in ("train", "val", "test")}
    dgs = {k: DGraph(d) for k, d in datas.items()}

    InjectTrainNeg, InjectEvalNeg = ours_inject_hooks()
    hm = HookManager(keys=["train", "val", "test"])
    hm.register("train", InjectTrainNeg(negs["train"]))
    hm.register("val", InjectEvalNeg(negs["val"], cfg.bsize, cfg.n_cands))
    hm.register("test", InjectEvalNeg(negs["test"], cfg.bsize, cfg.n_cands))
    # Time-gap hook: one instance per key — the window index space is
    # split-local, exactly like the reference hook running on each split's dg.
    for k in ("train", "val", "test"):
        hm.register(
            k,
            TimeGapNeighborMeanHook(
                splits[k]["src"], splits[k]["dst"], splits[k]["t"], static_x,
                cfg.time_gap, ["edge_src", "edge_dst", "neg"],
            ),
        )
    hm.register_shared(
        RecencyNeighborHook(
            cfg.n_nodes, [cfg.n_nbrs],
            ["edge_src", "edge_dst", "neg"],
            ["edge_time", "edge_time", "neg_time"],
            edge_dim=cfg.edge_dim,
        )
    )

    t2v = Time2Vec(cfg.time_dim)
    proj = flax_nn.Dense(cfg.edge_dim)
    mixers = [
        MLPMixer(
            num_tokens=cfg.n_nbrs, num_channels=cfg.edge_dim,
            token_dim_expansion_factor=cfg.token_exp,
            channel_dim_expansion_factor=cfg.channel_exp, dropout=0.0,
        )
        for _ in range(cfg.mixer_layers)
    ]
    out_lin = flax_nn.Dense(cfg.embed_dim)
    decoder = LinkPredictor(node_dim=cfg.embed_dim, hidden_dim=cfg.embed_dim)

    ref_enc = torch_modules["encoder"]
    params = {
        "t2v": time2vec_params(ref_enc.time_encoder),
        "proj": dense_params(ref_enc.projection_layer),
        "mixers": [mlp_mixer_params(m) for m in ref_enc.mlp_mixers],
        "out": dense_params(ref_enc.output_layer),
        "dec": link_predictor_params(torch_modules["decoder"])["params"],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)
    sx = jnp.asarray(static_x)

    def encode(p, batch):
        ef = batch.nbr_edge_x[0]
        dt = (batch.seed_times[0][:, None] - batch.nbr_edge_time[0]).astype(jnp.float32)
        # Frozen time encoder (reference requires_grad=False).
        t_enc = jax.lax.stop_gradient(t2v.apply({"params": p["t2v"]}, dt))
        h = proj.apply({"params": p["proj"]}, jnp.concatenate([ef, t_enc], -1))
        for mixer, mp in zip(mixers, p["mixers"]):
            h = mixer.apply({"params": mp}, h)
        valid = batch.nbr_nids[0] != PADDED_NODE_ID
        z_link = (h * valid[..., None]).sum(1) / jnp.maximum(
            valid.sum(1, keepdims=True), 1
        )
        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, batch.neg])
        z_node = batch.time_gap_feat + sx[jnp.clip(seeds, 0, cfg.n_nodes - 1)]
        return out_lin.apply(
            {"params": p["out"]}, jnp.concatenate([z_link, z_node], 1)
        )

    @jax.jit
    def train_step(p, ost, batch):
        B = batch.edge_src.shape[0]

        def loss_fn(pp):
            z = encode(pp, batch)
            pos = decoder.apply({"params": pp["dec"]}, z[:B], z[B: 2 * B])
            neg = decoder.apply({"params": pp["dec"]}, z[:B], z[2 * B: 3 * B])
            m = batch.edge_valid.astype(pos.dtype)
            den = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / den

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, ost = opt.update(grads, ost)
        return optax.apply_updates(p, updates), ost, loss

    @jax.jit
    def eval_step(p, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        z = encode(p, batch)
        lut = seed_lookup(batch.seed_nids[0], cfg.n_nodes)
        srows, _ = candidate_rows(lut, batch.edge_src[:, None], z.shape[0])
        drows, _ = candidate_rows(lut, batch.edge_dst[:, None], z.shape[0])
        crows, _ = candidate_rows(lut, batch.neg_batch_list, z.shape[0])
        z_src = z[srows[:, 0]]
        pos = decoder.apply({"params": p["dec"]}, z_src, z[drows[:, 0]])
        neg = decoder.apply(
            {"params": p["dec"]},
            jnp.repeat(z_src[:, None, :], Q, 1).reshape(B * Q, -1),
            z[crows].reshape(B * Q, -1),
        ).reshape(B, Q)
        return jax.nn.sigmoid(pos), jax.nn.sigmoid(neg)

    def train_epoch(p, ost):
        losses = []
        loader = DGDataLoader(dgs["train"], cfg.bsize, hook_manager=hm)
        with hm.activate("train"):
            for batch in loader:
                p, ost, loss = train_step(p, ost, batch)
                losses.append(float(loss))
        return p, ost, losses

    def eval_epoch(p, key, sets, sink):
        rr = []
        loader = DGDataLoader(dgs[key], cfg.bsize, hook_manager=hm)
        with hm.activate(key):
            for bi, batch in enumerate(loader):
                pos, neg = eval_step(p, batch)
                n_real = len(sets[bi]["cands"])
                pos = np.asarray(pos)[:n_real]
                neg = np.asarray(neg)[:n_real]
                sink.append(np.concatenate([pos, neg.ravel()]))
                rr.append(reciprocal_ranks(pos, neg))
        return float(np.mean(np.concatenate(rr)))

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"val": [], "test": []}
    p, ost = params, opt_state
    for epoch in range(cfg.epochs):
        p, ost, ls = train_epoch(p, ost)
        losses.append(ls)
        val_mrrs.append(eval_epoch(p, "val", negs["val"], scores["val"]))
        if epoch == cfg.epochs - 1:
            test_mrr = eval_epoch(p, "test", negs["test"], scores["test"])
        else:
            hm.reset_state()
    return {"losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
            "eval_scores": scores}


def run_parity_graphmixer(cfg: GraphMixerConfig) -> Dict:
    splits = make_splits(cfg)
    negs = precompute_negatives(cfg, splits)
    ref = run_reference_graphmixer(cfg, splits, negs)
    ours = run_ours_graphmixer(cfg, splits, negs, ref["modules"], ref["static_x"])
    out = add_score_diffs(compare(ref, ours), ref, ours)
    out["config"] = dataclasses.asdict(cfg)
    return out

# --------------------------------------------------------------------------- #
# TGN node-property prediction (NDCG)
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class NodePropConfig(ParityConfig):
    n_classes: int = 6
    ndcg_k: int = 3
    label_every: int = 8  # one label event per this many edges (keeps every
    # batch window label-bearing; the reference recency hook SKIPS its buffer
    # update on label-free batches — recency.py:135-163 — a quirk this config
    # deliberately avoids so the parity covers the realistic dense-label path)


def make_splits_nodeprop(cfg: NodePropConfig):
    """Edge splits from make_splits plus interleaved node-label events.

    Every event (edge or label) gets a globally UNIQUE timestamp: the
    reference re-sorts its unified timeline with torch.argsort — UNSTABLE by
    default (/root/reference/tgm/data/dg_data.py:358) — so the order of
    equal-timestamp events is implementation-defined there (our from_raw
    sorts stably). A tied label/edge pair can land on either side of a batch
    boundary on the torch side depending on introsort internals, which is
    unmatchable noise, not semantics. Unique timestamps make the sorted
    order unique, so the comparison tests the pipeline, not torch's sort."""
    splits = make_splits(cfg)
    rng = np.random.default_rng(cfg.seed + 7)
    for sp in splits.values():
        E = len(sp["t"])
        L = max(1, E // cfg.label_every)
        n_ev = E + L
        lo = int(sp["t"][0])
        T = np.sort(
            rng.choice(4 * n_ev, size=n_ev, replace=False)
        ).astype(np.int64) + lo
        stride = n_ev // L
        lbl_pos = np.arange(L) * stride + stride // 2
        is_lbl = np.zeros(n_ev, bool)
        is_lbl[lbl_pos] = True
        sp["t"] = T[~is_lbl]
        sp["y_t"] = T[is_lbl]
        sp["y_nids"] = rng.integers(0, cfg.n_nodes, size=L).astype(np.int64)
        y = rng.random((L, cfg.n_classes)).astype(np.float32)
        sp["y"] = y / y.sum(1, keepdims=True)
    return splits


def ndcg_numpy(y_pred: np.ndarray, y_true: np.ndarray, k: int) -> np.ndarray:
    """Per-row NDCG@k, the TGB nodeprop metric formula
    (tgm_tpu.eval.metrics.ndcg_at_k), numpy — applied identically to both
    sides' raw scores."""
    k = min(k, y_pred.shape[-1])
    disc = 1.0 / np.log2(np.arange(k) + 2.0)
    order = np.argsort(-y_pred, axis=-1, kind="stable")[:, :k]
    dcg = (np.take_along_axis(y_true, order, axis=-1) * disc).sum(-1)
    ideal = -np.sort(-y_true, axis=-1)[:, :k]
    idcg = (ideal * disc).sum(-1)
    return np.where(idcg > 0, dcg / np.maximum(idcg, 1e-12), 0.0)


def run_reference_tgn_nodeprop(cfg: NodePropConfig, splits, negs=None) -> Dict:
    """Reference TGN nodeproppred pipeline: recency hook seeded by node-label
    events, dedup, staged TGN memory + TransformerConv embedding,
    NodePredictor, soft-target cross-entropy, ground-truth memory updates
    AFTER opt.step (/root/reference/examples/nodeproppred/tgn.py:57-180)."""
    import copy

    import torch
    import torch.nn.functional as F

    from tools.refbridge import import_reference

    import_reference()
    from tgm import DGraph
    from tgm.data import DGData, DGDataLoader
    from tgm.hooks import DeduplicationHook, HookManager, RecencyNeighborHook
    from tgm.nn import NodePredictor, TGNMemory
    from tgm.nn.encoder.tgn import (
        GraphAttentionEmbedding,
        IdentityMessage,
        LastAggregator,
    )

    torch.manual_seed(cfg.seed)

    def dg_of(sp):
        data = DGData.from_raw(
            edge_time=torch.from_numpy(sp["t"]),
            edge_index=torch.from_numpy(
                np.stack([sp["src"], sp["dst"]], 1).astype(np.int64)
            ),
            edge_x=torch.from_numpy(sp["x"]),
            node_y_time=torch.from_numpy(sp["y_t"]),
            node_y_nids=torch.from_numpy(sp["y_nids"]),
            node_y=torch.from_numpy(sp["y"]),
            time_delta="s",
        )
        return DGraph(data, device="cpu")

    dgs = {k: dg_of(splits[k]) for k in ("train", "val", "test")}

    hm = HookManager(keys=["train", "val", "test"])
    hm.register_shared(
        RecencyNeighborHook(
            num_nbrs=[cfg.num_nbrs], num_nodes=cfg.n_nodes,
            seed_nodes_keys=["node_y_nids"], seed_times_keys=["node_y_time"],
        )
    )
    hm.register_shared(DeduplicationHook(seed_nodes_keys=["node_y_nids", "nbr_nids"]))

    memory = TGNMemory(
        cfg.n_nodes, cfg.edge_dim, cfg.memory_dim, cfg.time_dim,
        message_module=IdentityMessage(cfg.edge_dim, cfg.memory_dim, cfg.time_dim),
        aggregator_module=LastAggregator(),
    )
    encoder = GraphAttentionEmbedding(
        in_channels=cfg.memory_dim, out_channels=cfg.embed_dim,
        msg_dim=cfg.edge_dim, time_enc=memory.time_enc,
    )
    encoder.conv.dropout = 0.0
    decoder = NodePredictor(in_dim=cfg.embed_dim, out_dim=cfg.n_classes,
                            hidden_dim=cfg.embed_dim)
    params = list(dict.fromkeys(
        list(memory.parameters()) + list(encoder.parameters()) + list(decoder.parameters())
    ))
    opt = torch.optim.Adam(params, lr=cfg.lr)
    init_modules = {
        "memory": copy.deepcopy(memory),
        "encoder": copy.deepcopy(encoder),
        "decoder": copy.deepcopy(decoder),
    }
    PAD = -1

    def predict(batch):
        nbr_nodes = batch.nbr_nids[0].flatten()
        nbr_mask = nbr_nodes != PAD
        num_nbrs = len(nbr_nodes) // len(batch.node_y_nids)
        src_nodes = batch.node_y_nids.repeat_interleave(num_nbrs)
        nbr_edge_index = torch.stack(
            [
                batch.global_to_local(src_nodes[nbr_mask]),
                batch.global_to_local(nbr_nodes[nbr_mask]),
            ]
        ).to(dtype=torch.int64)
        nbr_edge_time = batch.nbr_edge_time[0].flatten()[nbr_mask]
        nbr_edge_x = batch.nbr_edge_x[0].flatten(0, -2).float()[nbr_mask]
        z, last_update = memory(batch.unique_nids)
        z = encoder(z, last_update, nbr_edge_index, nbr_edge_time, nbr_edge_x)
        return decoder(z[batch.global_to_local(batch.node_y_nids)])

    def train_epoch(loader, sink):
        memory.train(); encoder.train(); decoder.train()
        memory.reset_state()
        losses, perf = [], []
        for batch in loader:
            assert batch.node_y is not None, "parity config must keep every batch label-bearing"
            opt.zero_grad()
            y_pred = predict(batch)
            loss = F.cross_entropy(y_pred, batch.node_y)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            sink.append(y_pred.detach().numpy().copy())
            perf.append(ndcg_numpy(y_pred.detach().numpy(), batch.node_y.numpy(), cfg.ndcg_k))
            # Ground-truth memory update AFTER opt.step (nodeprop example
            # :114-119 — note the linkprop example updates BEFORE backward).
            if len(batch.edge_src) > 0:
                memory.update_state(
                    batch.edge_src, batch.edge_dst, batch.edge_time, batch.edge_x.float()
                )
            memory.detach()
        return losses, float(np.mean(np.concatenate(perf)))

    @torch.no_grad()
    def eval_epoch(loader, sink):
        memory.eval(); encoder.eval(); decoder.eval()
        perf = []
        for batch in loader:
            assert batch.node_y is not None
            y_pred = predict(batch)
            sink.append(y_pred.numpy().copy())
            perf.append(ndcg_numpy(y_pred.numpy(), batch.node_y.numpy(), cfg.ndcg_k))
            if len(batch.edge_src) > 0:
                memory.update_state(
                    batch.edge_src, batch.edge_dst, batch.edge_time, batch.edge_x.float()
                )
        return float(np.mean(np.concatenate(perf)))

    loaders = {k: DGDataLoader(dgs[k], cfg.bsize, hook_manager=hm) for k in dgs}
    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"train": [], "val": [], "test": []}
    for epoch in range(cfg.epochs):
        with hm.activate("train"):
            ls, _ = train_epoch(loaders["train"], scores["train"])
            losses.append(ls)
        with hm.activate("val"):
            val_mrrs.append(eval_epoch(loaders["val"], scores["val"]))
        if epoch == cfg.epochs - 1:
            with hm.activate("test"):
                test_mrr = eval_epoch(loaders["test"], scores["test"])
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": {"val": scores["val"], "test": scores["test"]},
        "modules": init_modules,
    }


def run_ours_tgn_nodeprop(cfg: NodePropConfig, splits, torch_modules) -> Dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tools.refbridge import (
        dense_params,
        gru_params,
        node_predictor_params,
        time2vec_params,
    )
    from tgm_tpu import DGDataLoader, DGraph
    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.hooks import (
        DeduplicationHook,
        HookManager,
        RecencyNeighborHook,
        map_to_local,
    )
    from tgm_tpu.nn import NodePredictor
    from tgm_tpu.nn.encoder.tgn import (
        GraphAttentionEmbedding,
        TGNMemory,
        tgn_store_messages,
    )

    def dg_of(sp):
        data = DGData.from_raw(
            edge_time=sp["t"],
            edge_index=np.stack([sp["src"], sp["dst"]], 1),
            edge_x=sp["x"],
            node_y_time=sp["y_t"],
            node_y_nids=sp["y_nids"],
            node_y=sp["y"],
            time_delta="s",
        )
        return DGraph(data)

    dgs = {k: dg_of(splits[k]) for k in ("train", "val", "test")}

    hm = HookManager(keys=["train", "val", "test"])
    hm.register_shared(
        RecencyNeighborHook(
            cfg.n_nodes, [cfg.num_nbrs], ["node_y_nids"], ["node_y_time"],
            edge_dim=cfg.edge_dim,
        )
    )
    hm.register_shared(
        DeduplicationHook(cfg.n_nodes, seed_nodes_keys=["node_y_nids", "nbr_nids"])
    )

    memory = TGNMemory(
        num_nodes=cfg.n_nodes, raw_msg_dim=cfg.edge_dim,
        memory_dim=cfg.memory_dim, time_dim=cfg.time_dim,
    )
    encoder = GraphAttentionEmbedding(
        in_channels=cfg.memory_dim, out_channels=cfg.embed_dim,
        msg_dim=cfg.edge_dim, time_dim=cfg.time_dim, dropout=0.0,
    )
    decoder = NodePredictor(in_dim=cfg.embed_dim, out_dim=cfg.n_classes,
                            hidden_dim=cfg.embed_dim)

    ref_mem = torch_modules["memory"]
    conv = torch_modules["encoder"].conv
    params = {
        "time": time2vec_params(ref_mem.time_enc),
        "gru": gru_params(ref_mem.memory_updater),
        "enc": {
            "lin_query": dense_params(conv.lin_query),
            "lin_key": dense_params(conv.lin_key),
            "lin_value": dense_params(conv.lin_value),
            "lin_edge": dense_params(conv.lin_edge),
            "lin_skip": dense_params(conv.lin_skip),
        },
        "dec": node_predictor_params(torch_modules["decoder"])["params"],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def mem_tree(p):
        return {"params": {"time_enc": p["time"], "gru": p["gru"]}}

    def enc_tree(p):
        return {"params": {"time_enc": p["time"], **p["enc"]}}

    def dec_tree(p):
        return {"params": p["dec"]}

    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    def predict(p, mem_state, batch, training):
        seeds = batch.node_y_nids
        nbrs = batch.nbr_nids[0]
        K = nbrs.shape[1]
        g2l = batch.global_to_local
        src_rep = jnp.repeat(seeds, K)
        nbr_flat = nbrs.reshape(-1)
        e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
        z_mem, last_upd = memory.apply(
            mem_tree(p), mem_state, batch.unique_nids, training,
            method=TGNMemory.stage,
        )
        z = encoder.apply(
            enc_tree(p), z_mem, last_upd,
            map_to_local(g2l, src_rep), map_to_local(g2l, nbr_flat),
            batch.nbr_edge_time[0].reshape(-1),
            batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1),
            e_valid,
        )
        return decoder.apply(dec_tree(p), z[map_to_local(g2l, seeds)])

    def soft_ce(y_pred, y, valid):
        logp = jax.nn.log_softmax(y_pred, axis=-1)
        per_row = -jnp.sum(y * logp, axis=-1)
        w = valid.astype(per_row.dtype)
        return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)

    def commit(p, mem_state, batch, training):
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, cfg.n_nodes
        )
        if training:
            # train-mode update_state: apply pending, then store new msgs
            mem_state = memory.apply(mem_tree(p), mem_state, nodes, method=TGNMemory.flush)
            return tgn_store_messages(
                mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_x, batch.edge_valid,
            )
        mem_state = tgn_store_messages(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_x, batch.edge_valid,
        )
        return memory.apply(mem_tree(p), mem_state, nodes, method=TGNMemory.flush)

    @jax.jit
    def train_step(params, opt_state, mem_state, batch):
        def loss_fn(p):
            y_pred = predict(p, mem_state, batch, training=True)
            return soft_ce(y_pred, batch.node_y, batch.node_y_valid), y_pred

        (loss, y_pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # Reference nodeprop ordering: memory update AFTER opt.step, i.e.
        # the GRU flush runs with the UPDATED parameters.
        mem_state = commit(params, mem_state, batch, training=True)
        return params, opt_state, mem_state, loss, y_pred

    @jax.jit
    def eval_step(params, mem_state, batch):
        y_pred = predict(params, mem_state, batch, training=False)
        mem_state = commit(params, mem_state, batch, training=False)
        return mem_state, y_pred

    flush_all = jax.jit(
        lambda p, s: memory.apply(mem_tree(p), s, method=TGNMemory.flush_all)
    )

    mem_state = memory.init_state()

    def n_real(batch):
        return int(np.asarray(batch.node_y_valid).sum())

    def train_epoch(params, opt_state, mem_state, sink):
        mem_state = memory.init_state()
        losses = []
        loader = DGDataLoader(dgs["train"], cfg.bsize, hook_manager=hm)
        with hm.activate("train"):
            for batch in loader:
                params, opt_state, mem_state, loss, y_pred = train_step(
                    params, opt_state, mem_state, batch
                )
                losses.append(float(loss))
                sink.append(np.asarray(y_pred)[: n_real(batch)])
        return params, opt_state, mem_state, losses

    def eval_epoch(params, mem_state, key, splits_sp, sink):
        perf = []
        loader = DGDataLoader(dgs[key], cfg.bsize, hook_manager=hm)
        with hm.activate(key):
            for batch in loader:
                mem_state, y_pred = eval_step(params, mem_state, batch)
                yp = np.asarray(y_pred)[: n_real(batch)]
                yt = np.asarray(batch.node_y)[: n_real(batch)]
                sink.append(yp)
                perf.append(ndcg_numpy(yp, yt, cfg.ndcg_k))
        return float(np.mean(np.concatenate(perf))), mem_state

    losses, val_mrrs, test_mrr = [], [], float("nan")
    scores = {"train": [], "val": [], "test": []}
    for epoch in range(cfg.epochs):
        params, opt_state, mem_state, ls = train_epoch(
            params, opt_state, mem_state, scores["train"]
        )
        losses.append(ls)
        mem_state = flush_all(params, mem_state)
        mrr, mem_state = eval_epoch(params, mem_state, "val", splits["val"], scores["val"])
        val_mrrs.append(mrr)
        if epoch == cfg.epochs - 1:
            test_mrr, mem_state = eval_epoch(
                params, mem_state, "test", splits["test"], scores["test"]
            )
        else:
            hm.reset_state()
    return {
        "losses": losses, "val_mrr": val_mrrs, "test_mrr": test_mrr,
        "eval_scores": {"val": scores["val"], "test": scores["test"]},
    }


def run_parity_tgn_nodeprop(cfg: NodePropConfig) -> Dict:
    splits = make_splits_nodeprop(cfg)
    ref = run_reference_tgn_nodeprop(cfg, splits)
    ours = run_ours_tgn_nodeprop(cfg, splits, ref["modules"])
    out = add_score_diffs(compare(ref, ours), ref, ours)
    out["metric"] = f"ndcg@{cfg.ndcg_k}"
    out["config"] = dataclasses.asdict(cfg)
    return out


# --------------------------------------------------------------------------- #
def main() -> None:
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--n-edges", type=int, default=4000)
    p.add_argument("--only", type=str, default=None)
    p.add_argument("--out", type=str, default="PARITY_ZOO_r04.json")
    args = p.parse_args()

    tg_cfg = TGCNConfig(epochs=args.epochs, n_edges=args.n_edges,
                        embed_dim=32, time_dim=16)
    ro_cfg = ROLANDConfig(epochs=args.epochs, n_edges=args.n_edges,
                          embed_dim=32, time_dim=16)
    gc_cfg = GCNConfig(epochs=args.epochs, n_edges=args.n_edges,
                       embed_dim=32, time_dim=16)
    gm_cfg = GraphMixerConfig(epochs=args.epochs, n_edges=args.n_edges,
                              embed_dim=32, time_dim=16)
    np_cfg = NodePropConfig(epochs=args.epochs, n_edges=args.n_edges,
                            embed_dim=32, time_dim=16)
    sections = {
        "tgcn": lambda: run_parity_tgcn(tg_cfg),
        "tgcn_lr0": lambda: run_parity_tgcn(dataclasses.replace(tg_cfg, lr=0.0)),
        "roland": lambda: run_parity_roland(ro_cfg),
        "roland_lr0": lambda: run_parity_roland(dataclasses.replace(ro_cfg, lr=0.0)),
        "roland_gru_lr0": lambda: run_parity_roland(
            dataclasses.replace(ro_cfg, lr=0.0, update="gru")
        ),
        "gcn": lambda: run_parity_gcn(gc_cfg),
        "gcn_lr0": lambda: run_parity_gcn(dataclasses.replace(gc_cfg, lr=0.0)),
        "graphmixer": lambda: run_parity_graphmixer(gm_cfg),
        "graphmixer_lr0": lambda: run_parity_graphmixer(
            dataclasses.replace(gm_cfg, lr=0.0)
        ),
        "tgn_nodeprop": lambda: run_parity_tgn_nodeprop(np_cfg),
        "tgn_nodeprop_lr0": lambda: run_parity_tgn_nodeprop(
            dataclasses.replace(np_cfg, lr=0.0)
        ),
    }
    only = set(args.only.split(",")) if args.only else None
    out = {}
    for name, fn in sections.items():
        if only and name not in only:
            continue
        out[name] = fn()
        print(name, json.dumps({k: v for k, v in out[name].items()
                                if k != "config"}, indent=None)[:400])
    for k, v in out.items():
        if k.endswith("_lr0"):
            assert v["loss_max_abs_diff"] < 1e-5, (k, v)
            assert v["val_score_max_abs_diff"] < 1e-4, (k, v)
            assert v["test_score_max_abs_diff"] < 1e-4, (k, v)
            assert v["val_mrr_max_abs_diff"] < 5e-2, (k, v)
            assert v["test_mrr_abs_diff"] < 5e-2, (k, v)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
