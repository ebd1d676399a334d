"""GraphMixer link prediction.

Parity: /root/reference/examples/linkproppred/graphmixer.py:72-258 — the
GraphMixer encoder is composed at example level: a link encoder (MLP-Mixer
over 1-hop recent neighbor [edge ‖ Δt-enc] sequences, frozen Time2Vec,
mask-mean pooling) plus a node encoder (mean of the neighbors appearing in
the last ``time_gap`` EVENTS before the batch, added to the seed's own
features). The time-gap mean is served by ``TimeGapNeighborMeanHook``
(exact reference-GraphMixerHook semantics, proven bit-equal end-to-end by
tools/parity_zoo2.py graphmixer_lr0; earlier rounds approximated it with a
second recency hook, which is a different neighbor set).
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
from flax import linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples._datasets import load_dataset
from tgm_tpu import DGDataLoader, DGraph
from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.eval.metrics import mrr_sum_count
from tgm_tpu.hooks import (
    candidate_rows,
    seed_lookup,
    HookManager,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
    TGBNegativeEdgeSamplerHook,
    TimeGapNeighborMeanHook,
)
from tgm_tpu.nn import LinkPredictor, MLPMixer, Time2Vec
from tgm_tpu.util import seed_everything


class GraphMixerEncoder(nn.Module):
    time_dim: int
    embed_dim: int
    num_tokens: int
    node_dim: int
    edge_dim: int
    num_layers: int = 2
    token_dim_expansion: float = 0.5
    channel_dim_expansion: float = 4.0
    dropout: float = 0.1

    requires = {
        "edge_src", "edge_dst", "nbr_edge_x", "seed_times", "nbr_edge_time",
        "nbr_nids", "time_gap_feat", "neg",
    }

    @nn.compact
    def __call__(self, batch, node_feat, deterministic: bool = True):
        # --- link encoder: mixer over 1-hop neighbor sequences ---------- #
        edge_feat = batch.nbr_edge_x[0]  # (S, K, De)
        dt = (batch.seed_times[0][:, None] - batch.nbr_edge_time[0]).astype(jnp.float32)
        t_enc = jax.lax.stop_gradient(Time2Vec(self.time_dim)(dt))  # frozen
        z_link = nn.Dense(self.edge_dim)(jnp.concatenate([edge_feat, t_enc], axis=-1))
        for _ in range(self.num_layers):
            z_link = MLPMixer(
                num_tokens=self.num_tokens,
                num_channels=self.edge_dim,
                token_dim_expansion_factor=self.token_dim_expansion,
                channel_dim_expansion_factor=self.channel_dim_expansion,
                dropout=self.dropout,
            )(z_link, deterministic)
        valid = batch.nbr_nids[0] != PADDED_NODE_ID
        z_link = (z_link * valid[..., None]).sum(1) / jnp.maximum(
            valid.sum(1, keepdims=True), 1
        )

        # --- node encoder: time-gap neighbor mean + own features -------- #
        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, batch.neg])
        z_node = batch.time_gap_feat + node_feat[jnp.maximum(seeds, 0)]

        return nn.Dense(self.embed_dim)(jnp.concatenate([z_link, z_node], axis=1))


def parse_args():
    p = argparse.ArgumentParser(description="GraphMixer LinkPropPred Example")
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--bsize", type=int, default=200)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--n-nbrs", type=int, default=20)
    p.add_argument("--time-gap", type=int, default=2000,
                   help="GraphMixer time slot size (window of events before "
                   "the batch feeding the node encoder's neighbor mean)")
    p.add_argument("--time-dim", type=int, default=100)
    p.add_argument("--embed-dim", type=int, default=100)
    return p.parse_args()


def main():
    args = parse_args()
    seed_everything(args.seed)

    data, val_cands, test_cands = load_dataset(args.dataset)
    if data.static_node_x is None:
        rng = np.random.default_rng(args.seed)
        data.static_node_x = rng.normal(size=(data.num_nodes, 32)).astype(np.float32)
    num_nodes = data.num_nodes
    node_x = jnp.asarray(data.static_node_x)
    train_data, val_data, test_data = data.split()
    train_dg, val_dg, test_dg = DGraph(train_data), DGraph(val_data), DGraph(test_data)
    edge_dim = train_dg.edge_x_dim or 0

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
    hm.register_shared(
        RecencyNeighborHook(num_nodes, [args.n_nbrs], seed_keys, time_keys, edge_dim=edge_dim)
    )
    # Time-gap mean: one instance per key — the window index space is
    # split-local, like the reference hook running on each split's own dg.
    for key, sdata, sdg in (
        ("train", train_data, train_dg), ("val", val_data, val_dg),
        ("test", test_data, test_dg),
    ):
        s_src, s_dst, s_t = sdg._storage.get_edges(sdg._slice)
        hm.register(
            key,
            TimeGapNeighborMeanHook(
                s_src, s_dst, s_t, node_x, args.time_gap, seed_keys,
                edge_id_base=int(getattr(sdata, "edge_global_offset", 0)),
            ),
        )

    encoder = GraphMixerEncoder(
        time_dim=args.time_dim, embed_dim=args.embed_dim, num_tokens=args.n_nbrs,
        node_dim=node_x.shape[1], edge_dim=edge_dim, dropout=args.dropout,
    )
    decoder = LinkPredictor(node_dim=args.embed_dim, hidden_dim=args.embed_dim)
    opt = optax.adam(args.lr)

    hm.validate_requirement(encoder)

    loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
    with hm.activate("train"):
        b0 = next(iter(loader))
    hm.reset_state()

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    enc_params = encoder.init(k1, b0, node_x)
    dec_params = decoder.init(k2, jnp.zeros((1, args.embed_dim)), jnp.zeros((1, args.embed_dim)))
    params = {"enc": enc_params, "dec": dec_params}
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, opt_state, rng, batch):
        rng, kd = jax.random.split(rng)
        B = batch.edge_src.shape[0]

        def loss_fn(p):
            z = encoder.apply(p["enc"], batch, node_x, deterministic=False, rngs={"dropout": kd})
            pos = decoder.apply(p["dec"], z[:B], z[B : 2 * B])
            neg = decoder.apply(p["dec"], z[:B], z[2 * B : 3 * B])
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * m)
            ) / d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    @jax.jit
    def eval_step(params, batch):
        B = batch.edge_src.shape[0]
        Q = batch.neg_batch_list.shape[1]
        z = encoder.apply(params["enc"], batch, node_x)
        z_src, z_dst = z[:B], z[B : 2 * B]
        # ``neg`` seeds are the unique candidate set; map candidates to rows.
        lut = seed_lookup(batch.seed_nids[0], node_x.shape[0])
        cand_rows_, found = candidate_rows(lut, batch.neg_batch_list, z.shape[0])
        z_neg = z[cand_rows_]
        pos_score = decoder.apply(params["dec"], z_src, z_dst)
        neg_score = decoder.apply(
            params["dec"],
            jnp.repeat(z_src[:, None, :], Q, 1).reshape(B * Q, -1),
            z_neg.reshape(B * Q, -1),
        ).reshape(B, Q)
        return mrr_sum_count(
            pos_score, neg_score,
            neg_valid=(batch.neg_batch_list != PADDED_NODE_ID) & found,
            edge_valid=batch.edge_valid,
        )

    def run_train():
        nonlocal params, opt_state, key
        loader = DGDataLoader(train_dg, args.bsize, hook_manager=hm)
        total, nb = 0.0, 0
        with hm.activate("train"):
            for batch in loader:
                params, opt_state, key, loss = train_step(params, opt_state, key, batch)
                total += float(loss)
                nb += 1
        return total / max(nb, 1)

    def run_eval(dg, split):
        loader = DGDataLoader(dg, args.bsize, hook_manager=hm)
        s, c = 0.0, 0.0
        with hm.activate(split):
            for batch in loader:
                ds, dc = eval_step(params, batch)
                s += float(ds)
                c += float(dc)
        return s / max(c, 1.0)

    n_edges = train_dg.num_edge_events
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = run_train()
        dt = time.perf_counter() - t0
        val_mrr = run_eval(val_dg, "val")
        print(f"epoch={epoch} loss={loss:.4f} val_mrr={val_mrr:.4f} train_edges/s={n_edges / dt:.0f}")
        hm.reset_state()

    with hm.activate("train"):
        for _ in DGDataLoader(train_dg, args.bsize, hook_manager=hm):
            pass
    with hm.activate("val"):
        for _ in DGDataLoader(val_dg, args.bsize, hook_manager=hm):
            pass
    test_mrr = run_eval(test_dg, "test")
    print(f"test_mrr={test_mrr:.4f}")


if __name__ == "__main__":
    main()
