"""HookManager.as_transform: the functional pipeline export matches eager
hook execution and runs under jit/scan."""

import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu import DGData, DGDataLoader, DGraph
from tgm_tpu.hooks import HookManager, RandomNegativeEdgeSamplerHook, RecencyNeighborHook
from tgm_tpu.util.seed import seed_everything


def build(seed=5):
    rng = np.random.default_rng(0)
    E = 64
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 200, E)),
        edge_index=rng.integers(0, 12, (E, 2)),
        edge_x=rng.normal(size=(E, 3)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=12))
    hm.register(
        "train",
        RecencyNeighborHook(12, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"], edge_dim=3),
    )
    return dg, hm


def test_transform_matches_eager():
    dg, hm = build()
    seed_everything(42)
    fn, states = hm.as_transform("train", dg)
    batches = list(DGDataLoader(dg, batch_size=16))

    out_t = []
    for b in batches:
        states, ob = fn(states, b)
        out_t.append(np.asarray(ob.nbr_nids[0]))

    # Eager manager path with the same seed.
    dg2, hm2 = build()
    seed_everything(42)
    with hm2.activate("train"):
        out_e = [
            np.asarray(hm2.execute_active_hooks(dg2, b).nbr_nids[0])
            for b in DGDataLoader(dg2, batch_size=16)
        ]
    for a, b in zip(out_t, out_e):
        np.testing.assert_array_equal(a, b)


def test_transform_is_jittable():
    dg, hm = build()
    seed_everything(7)
    fn, states = hm.as_transform("train", dg)
    jfn = jax.jit(fn)
    for b in DGDataLoader(dg, batch_size=16):
        states, ob = jfn(states, b)
    assert ob.has("neg") and ob.has("nbr_nids")
    assert np.isfinite(np.asarray(ob.nbr_edge_x[0])).all()


def test_scanned_eval_epoch_matches_eager_loop():
    """The scanned hook-pipeline epoch must reproduce the eager per-batch loop
    exactly on the deterministic eval path (TGB candidates -> recency -> dedup
    -> TGN eval core with fixed params)."""
    import jax
    import optax

    from tgm_tpu import DGData, DGDataLoader, DGraph
    from tgm_tpu.hooks import (
        DeduplicationHook,
        HookManager,
        RecencyNeighborHook,
        TGBNegativeEdgeSamplerHook,
    )
    from tgm_tpu.nn import LinkPredictor
    from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbedding, TGNMemory
    from tgm_tpu.train import DeviceEdgeStream, scanned_hook_epoch
    from tgm_tpu.train.programs import build_tgn_hook_cores

    rng = np.random.default_rng(0)
    N, E, D, B, Q = 30, 200, 4, 50, 3
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 2000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    cands = rng.integers(0, N, (E, Q))

    def build_hm():
        hm = HookManager(keys=["val"])
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=cands))
        hm.register_shared(
            RecencyNeighborHook(N, [4], ["edge_src", "edge_dst", "neg"],
                                ["edge_time", "edge_time", "neg_time"], edge_dim=D)
        )
        hm.register_shared(DeduplicationHook(N, seed_nodes_keys=["neg", "nbr_nids"]))
        return hm

    memory = TGNMemory(num_nodes=N, raw_msg_dim=D, memory_dim=8, time_dim=6)
    encoder = GraphAttentionEmbedding(in_channels=8, out_channels=8, msg_dim=D,
                                      time_dim=6, dropout=0.0)
    decoder = LinkPredictor(node_dim=8, hidden_dim=8)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    mem_state0 = memory.init_state()
    params = {
        "mem": memory.init(key, mem_state0, jnp.zeros(4, jnp.int32)),
        "enc": encoder.init(
            key, jnp.zeros((8, 8)), jnp.zeros(8, jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32), jnp.zeros((4, D)),
            jnp.ones(4, bool),
        ),
        "dec": decoder.init(key, jnp.zeros((1, 8)), jnp.zeros((1, 8))),
    }
    _, eval_core = build_tgn_hook_cores(memory, encoder, decoder, opt, N)

    # Eager loop — DGDataLoader pads to a multiple of 8; use the same widths
    # for the stream by matching bsize (50 -> padded 56 vs stream 50), so
    # instead use pad_multiple=1 on the loader for identical shapes.
    hm = build_hm()
    loader = DGDataLoader(dg, B, hook_manager=hm, pad_multiple=1)
    s_e, c_e = 0.0, 0.0
    carry = (params, memory.init_state())
    with hm.activate("val"):
        for batch in loader:
            carry, (s, c) = jax.jit(eval_core)(carry, batch)
            s_e += float(s)
            c_e += float(c)

    # Scanned epoch on a fresh hook manager.
    hm2 = build_hm()
    stream = DeviceEdgeStream(dg, B)
    epoch, hstates = scanned_hook_epoch(stream, hm2, "val", dg, eval_core)
    carry2 = (params, memory.init_state())
    carry2, hstates, (s_arr, c_arr) = epoch(carry2, hstates)

    np.testing.assert_allclose(float(jnp.sum(s_arr)), s_e, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(c_arr)), c_e, rtol=1e-6)


def test_repeated_as_transform_reuses_seeded_state():
    """as_transform must cache a freshly-initialized state on the hook:
    init_state forks the global PRNG for negative samplers, so a repeated
    export (e.g. one per epoch) must NOT advance to a different random
    stream than the first — that diverged scanned epochs from eager ones
    at batch 0 (observed in the DyGFormer example)."""
    dg, hm = build()
    seed_everything(3)
    _, s1 = hm.as_transform("train", dg)
    _, s2 = hm.as_transform("train", dg)
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # And the eager path must run from the same state the export saw.
    batches = list(DGDataLoader(dg, batch_size=16))
    fn, states = hm.as_transform("train", dg)
    _, tb = fn(states, batches[0])
    with hm.activate("train"):
        eb = hm.execute_active_hooks(dg, batches[0])
    np.testing.assert_array_equal(np.asarray(tb.neg), np.asarray(eb.neg))
