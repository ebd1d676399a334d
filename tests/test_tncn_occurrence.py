"""Occurrence-space TNCN train scoring == the global-space module path.

``tncn_train_scores_occurrence`` (train/tncn_pipeline.py) must reproduce the
bench/example module path — full-table ``TGNMemory.stage(arange(N))`` +
``GraphAttentionEmbedding`` (segment softmax) + ``ncn_adjacency_rows`` +
``NCNPredictor.score_from_rows`` — at fp tolerance (the occurrence path
reassociates the softmax shift and the cn sums, and runs its wide mask
matmuls in bf16/f32-accum per the repo attention precision policy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.nn import NCNPredictor
from tgm_tpu.nn.decoder.ncnpred import ncn_adjacency_rows
from tgm_tpu.nn.encoder.tgn import (
    GraphAttentionEmbedding,
    TGNMemory,
    tgn_store_messages,
)
from tgm_tpu.train.tncn_pipeline import tncn_train_scores_occurrence

N, B, K = 40, 6, 4
MEM_D, EMB_D, TIME_D, EDGE_D = 16, 16, 8, 5


def build(k=2):
    rng = np.random.default_rng(0)
    memory = TGNMemory(num_nodes=N, raw_msg_dim=EDGE_D, memory_dim=MEM_D,
                       time_dim=TIME_D)
    encoder = GraphAttentionEmbedding(
        in_channels=MEM_D, out_channels=EMB_D, msg_dim=EDGE_D,
        time_dim=TIME_D, dropout=0.0,
    )
    decoder = NCNPredictor(in_channels=EMB_D, hidden_dim=EMB_D,
                           out_channels=1, k=k)

    mem_state = memory.init_state()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    e4 = jnp.zeros(4, jnp.int32)
    params = {
        "mem": memory.init(k1, mem_state, jnp.zeros(4, jnp.int32)),
        "enc": encoder.init(
            k2, jnp.zeros((8, MEM_D)), jnp.zeros(8, jnp.int32), e4, e4, e4,
            jnp.zeros((4, EDGE_D)), jnp.ones(4, bool),
        ),
        "dec": decoder.init(
            k3, jnp.zeros((8, EMB_D)), e4, e4, jnp.zeros(2, jnp.int32),
            jnp.zeros(2, jnp.int32), jnp.zeros(8, jnp.int32),
            jnp.zeros(2, jnp.int32),
        ),
    }

    # Populate memory + message stores with a few committed batches so that
    # staging is nontrivial (GRU with real messages for many nodes).
    t0 = 0
    for step in range(4):
        src = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        dst = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        t = jnp.asarray(np.sort(rng.integers(t0, t0 + 50, B)), jnp.int32)
        raw = jnp.asarray(rng.normal(size=(B, EDGE_D)).astype(np.float32))
        valid = jnp.ones(B, bool)
        nodes = jnp.concatenate([src, dst])
        mem_state = memory.apply(params["mem"], mem_state, nodes,
                                 method=TGNMemory.flush)
        mem_state = tgn_store_messages(mem_state, src, dst, t, raw, valid)
        t0 += 50

    # The query batch: seeds [src ‖ dst ‖ neg] with PAD holes, recency-style
    # neighbor lists with PAD slots and duplicate neighbor values.
    src = jnp.asarray(rng.integers(0, N, B), jnp.int32).at[B - 1].set(
        PADDED_NODE_ID
    )
    dst = jnp.asarray(rng.integers(0, N, B), jnp.int32).at[B - 1].set(
        PADDED_NODE_ID
    )
    neg = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    seeds = jnp.concatenate([src, dst, neg])  # (3B,)
    S = seeds.shape[0]
    nbrs = jnp.asarray(rng.integers(0, N, (S, K)), jnp.int32)
    nbrs = nbrs.at[:, K - 1].set(nbrs[:, 0])  # force duplicate values
    nbrs = nbrs.at[2, :].set(PADDED_NODE_ID)  # a seed with no neighbors
    nbr_ok = (nbrs != PADDED_NODE_ID) & (seeds[:, None] != PADDED_NODE_ID)
    nbrs = jnp.where(nbr_ok, nbrs, PADDED_NODE_ID)
    nbr_time = jnp.asarray(rng.integers(0, 200, (S, K)), jnp.int32)
    nbr_msg = jnp.asarray(rng.normal(size=(S, K, EDGE_D)).astype(np.float32))

    batch = dict(src=src, dst=dst, neg=neg, seeds=seeds, nbrs=nbrs,
                 nbr_time=nbr_time, nbr_msg=nbr_msg, nbr_ok=nbr_ok)
    return memory, encoder, decoder, params, mem_state, batch


def module_path_scores(memory, encoder, decoder, params, mem_state, batch):
    """The bench_zoo/bench_tncn global-space module path, verbatim."""
    seeds, nbrs, nbr_ok = batch["seeds"], batch["nbrs"], batch["nbr_ok"]
    S, Kn = nbrs.shape
    z_mem, last_upd = memory.apply(
        params["mem"], mem_state, jnp.arange(N, dtype=jnp.int32),
        method=TGNMemory.stage,
    )
    src_rep = jnp.repeat(seeds, Kn)
    nbr_flat = nbrs.reshape(-1)
    e_valid = nbr_ok.reshape(-1)
    z = encoder.apply(
        params["enc"], z_mem, last_upd, src_rep, nbr_flat,
        batch["nbr_time"].reshape(-1),
        batch["nbr_msg"].reshape(-1, EDGE_D), e_valid,
    )
    rows = ncn_adjacency_rows(seeds, nbrs, nbr_ok, z.shape[0])
    Bq = batch["src"].shape[0]

    def score(rows_i, rows_j, tar_i, tar_j):
        return decoder.apply(
            params["dec"], z, rows_i, rows_j, tar_i, tar_j,
            last_update=last_upd, edge_time=None,
            method=NCNPredictor.score_from_rows,
        )

    pos = score(rows[:Bq], rows[Bq:2 * Bq], batch["src"], batch["dst"])
    neg = score(rows[:Bq], rows[2 * Bq:], batch["src"], batch["neg"])
    return pos, neg


def occurrence_path_scores(memory, encoder, decoder, params, mem_state,
                           batch):
    return tncn_train_scores_occurrence(
        memory, encoder, decoder, params, mem_state,
        batch["seeds"], batch["nbrs"], batch["nbr_time"], batch["nbr_msg"],
        batch["nbr_ok"], batch["src"].shape[0],
    )


def test_scores_match_module_path():
    memory, encoder, decoder, params, mem_state, batch = build()
    pos_m, neg_m = module_path_scores(memory, encoder, decoder, params,
                                      mem_state, batch)
    ok = np.asarray(batch["src"] != PADDED_NODE_ID)
    # Default (f32 masks): tight.
    pos_o, neg_o = occurrence_path_scores(memory, encoder, decoder, params,
                                          mem_state, batch)
    np.testing.assert_allclose(np.asarray(pos_o)[ok], np.asarray(pos_m)[ok],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(neg_o)[ok], np.asarray(neg_m)[ok],
                               rtol=5e-4, atol=5e-4)
    # bf16 mask option: loose forward check only.
    pos_b, neg_b = tncn_train_scores_occurrence(
        memory, encoder, decoder, params, mem_state,
        batch["seeds"], batch["nbrs"], batch["nbr_time"], batch["nbr_msg"],
        batch["nbr_ok"], batch["src"].shape[0], mask_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(np.asarray(pos_b)[ok], np.asarray(pos_m)[ok],
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(neg_b)[ok], np.asarray(neg_m)[ok],
                               rtol=3e-2, atol=3e-2)


def test_k4_scores_match_module_path():
    memory, encoder, decoder, params, mem_state, batch = build(k=4)
    pos_m, neg_m = module_path_scores(memory, encoder, decoder, params,
                                      mem_state, batch)
    pos_o, neg_o = occurrence_path_scores(memory, encoder, decoder, params,
                                          mem_state, batch)
    ok = np.asarray(batch["src"] != PADDED_NODE_ID)
    np.testing.assert_allclose(np.asarray(pos_o)[ok], np.asarray(pos_m)[ok],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(neg_o)[ok], np.asarray(neg_m)[ok],
                               rtol=5e-4, atol=5e-4)


def test_grads_match_module_path():
    memory, encoder, decoder, params, mem_state, batch = build()
    ok = (batch["src"] != PADDED_NODE_ID).astype(jnp.float32)

    def loss_module(p):
        pos, neg = module_path_scores(memory, encoder, decoder, p, mem_state,
                                      batch)
        return jnp.sum((pos - neg) * ok)

    def loss_occ(p):
        pos, neg = occurrence_path_scores(memory, encoder, decoder, p,
                                          mem_state, batch)
        return jnp.sum((pos - neg) * ok)

    lm, gm = jax.value_and_grad(loss_module)(params)
    lo, go = jax.value_and_grad(loss_occ)(params)
    np.testing.assert_allclose(float(lo), float(lm), rtol=1e-4, atol=1e-4)
    flat_m = jax.flatten_util.ravel_pytree(gm)[0]
    flat_o = jax.flatten_util.ravel_pytree(go)[0]
    denom = np.maximum(np.abs(np.asarray(flat_m)), 1e-3)
    rel = np.abs(np.asarray(flat_o - flat_m)) / denom
    assert float(np.max(rel)) < 1e-3, float(np.max(rel))
