import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.nn.encoder.tgn import (
    GraphAttentionEmbedding,
    TGNMemory,
    tgn_init_state,
    tgn_store_messages,
)

KEY = jax.random.PRNGKey(0)


def make_memory(N=10, D=8, R=4, T=6):
    mem = TGNMemory(num_nodes=N, raw_msg_dim=R, memory_dim=D, time_dim=T)
    state = mem.init_state()
    params = mem.init(KEY, state, jnp.zeros(4, jnp.int32))
    return mem, state, params


def test_store_keeps_last_message():
    _, state, _ = make_memory()
    # node 0 as src in two events: t=5 then t=9 -> store keeps t=9 (dst=2)
    src = jnp.array([0, 0])
    dst = jnp.array([1, 2])
    t = jnp.array([5, 9])
    raw = jnp.array([[1.0] * 4, [2.0] * 4])
    state = tgn_store_messages(state, src, dst, t, raw, jnp.array([True, True]))
    assert int(state.s_other[0]) == 2
    assert int(state.s_t[0]) == 9
    np.testing.assert_array_equal(np.asarray(state.s_raw[0]), [2.0] * 4)
    # dst-role: node 1 got (src=0)@5; node 2 got (src=0)@9
    assert int(state.d_other[1]) == 0 and int(state.d_t[1]) == 5
    assert int(state.d_other[2]) == 0 and int(state.d_t[2]) == 9


def test_store_tie_prefers_first():
    _, state, _ = make_memory()
    # two events for node 0 at the SAME time: LastAggregator picks the first.
    src = jnp.array([0, 0])
    dst = jnp.array([1, 2])
    t = jnp.array([7, 7])
    raw = jnp.zeros((2, 4))
    state = tgn_store_messages(state, src, dst, t, raw, jnp.array([True, True]))
    assert int(state.s_other[0]) == 1  # first event wins the tie


def test_store_respects_valid_mask():
    _, state, _ = make_memory()
    state = tgn_store_messages(
        state,
        jnp.array([0, 3]),
        jnp.array([1, 4]),
        jnp.array([5, 6]),
        jnp.zeros((2, 4)),
        jnp.array([True, False]),
    )
    assert bool(state.s_valid[0])
    assert not bool(state.s_valid[3])


def test_stage_and_flush_semantics():
    mem, state, params = make_memory()
    state = tgn_store_messages(
        state, jnp.array([0]), jnp.array([1]), jnp.array([5]),
        jnp.ones((1, 4)), jnp.array([True]),
    )
    # Staged memory for node 0 differs from stored (pending message exists).
    z, lu = mem.apply(params, state, jnp.array([0, 5]), method=TGNMemory.stage)
    assert int(lu[0]) == 5
    assert int(lu[1]) == 0  # no messages
    assert not np.allclose(np.asarray(z[0]), np.asarray(state.mem[0]))
    # Stored memory unchanged until flush.
    assert np.allclose(np.asarray(state.mem[0]), 0.0)
    state2 = mem.apply(params, state, jnp.array([0]), method=TGNMemory.flush)
    np.testing.assert_allclose(np.asarray(state2.mem[0]), np.asarray(z[0]), atol=1e-6)
    assert int(state2.last_update[0]) == 5
    # Eval-mode stage reads stored memory directly.
    z_eval, _ = mem.apply(params, state2, jnp.array([0]), False, method=TGNMemory.stage)
    np.testing.assert_allclose(np.asarray(z_eval[0]), np.asarray(state2.mem[0]))


def test_flush_all_clears_stores():
    mem, state, params = make_memory()
    state = tgn_store_messages(
        state, jnp.array([0]), jnp.array([1]), jnp.array([5]),
        jnp.ones((1, 4)), jnp.array([True]),
    )
    state = mem.apply(params, state, method=TGNMemory.flush_all)
    assert not bool(state.s_valid.any())
    assert not bool(state.d_valid.any())
    assert int(state.last_update[0]) == 5


def test_padded_ids_hit_dump_row():
    mem, state, params = make_memory(N=10)
    nids = jnp.array([PADDED_NODE_ID, 0])
    z, lu = mem.apply(params, state, nids, method=TGNMemory.stage)
    assert z.shape == (2, 8)
    state2 = mem.apply(params, state, nids, method=TGNMemory.flush)
    # Dump row must stay zero.
    assert np.allclose(np.asarray(state2.mem[10]), 0.0)


def test_graph_attention_embedding_grad():
    enc = GraphAttentionEmbedding(in_channels=8, out_channels=8, msg_dim=4, time_dim=6, dropout=0.0)
    U, E = 6, 10
    x = jax.random.normal(KEY, (U, 8))
    args = (
        x, jnp.zeros(U, jnp.int32),
        jnp.arange(E, dtype=jnp.int32) % U, (jnp.arange(E, dtype=jnp.int32) + 1) % U,
        jnp.zeros(E, jnp.int32), jnp.ones((E, 4)),
        jnp.array([True] * 7 + [False] * 3),
    )
    params = enc.init(KEY, *args)

    def loss(p, xx):
        out = enc.apply(p, xx, *args[1:])
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1))(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_graph_attention_all_masked_no_nan():
    enc = GraphAttentionEmbedding(in_channels=8, out_channels=8, msg_dim=4, time_dim=6, dropout=0.0)
    U, E = 4, 6
    x = jax.random.normal(KEY, (U, 8))
    args = (
        x, jnp.zeros(U, jnp.int32),
        jnp.zeros(E, jnp.int32), jnp.zeros(E, jnp.int32),
        jnp.zeros(E, jnp.int32), jnp.ones((E, 4)),
        jnp.zeros(E, bool),
    )
    params = enc.init(KEY, *args)

    def loss(p):
        return jnp.sum(enc.apply(p, *args) ** 2)

    val = loss(params)
    g = jax.grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_pipeline_eid_buffer_equivalence():
    """TGNPipeline with the eid recency buffer (features gathered from the
    static edge_x array) must produce identical losses to the feature-buffer
    pipeline — same math, different state layout."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(0)
    N, E, D, B = 40, 330, 6, 64  # last batch partial: exercises padding
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    t = np.sort(rng.integers(0, 5000, E))
    x = rng.normal(size=(E, D)).astype(np.float32)
    data = DGData.from_raw(
        edge_time=t, edge_index=np.stack([src, dst], 1), edge_x=x, time_delta="s"
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)

    losses = {}
    for mode, edge_x_full in (("feats", None), ("eids", stream.edge_x)):
        pipe = TGNPipeline(
            num_nodes=N, edge_dim=D, memory_dim=8, embed_dim=8, time_dim=6,
            num_nbrs=5, lr=1e-3, neg_low=0, neg_high=N, edge_x_full=edge_x_full,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(7))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)
        carry, ls = epoch(carry)
        carry, ls2 = epoch(carry)  # second epoch: buffers warm
        losses[mode] = np.concatenate([np.asarray(ls), np.asarray(ls2)])

    np.testing.assert_allclose(losses["eids"], losses["feats"], rtol=1e-6, atol=1e-6)


def test_tgat_pipeline_eid_buffer_equivalence():
    """TGAT eid-buffer pipeline must match the feature-buffer pipeline."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGATPipeline, jit_scan_epoch

    rng = np.random.default_rng(1)
    N, E, D, B = 30, 200, 4, 48
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 3000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    node_x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    losses = {}
    for mode, exf in (("feats", None), ("eids", stream.edge_x)):
        pipe = TGATPipeline(
            num_nodes=N, edge_dim=D, node_x=node_x, num_nbrs=(4, 3),
            time_dim=8, embed_dim=8, lr=1e-3, neg_low=0, neg_high=N,
            edge_x_full=exf,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(3))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)
        carry, l1 = epoch(carry)
        carry, l2 = epoch(carry)
        losses[mode] = np.concatenate([np.asarray(l1), np.asarray(l2)])
    np.testing.assert_allclose(losses["eids"], losses["feats"], rtol=1e-6, atol=1e-6)


def test_tgat_pipeline_aug_table_equivalence():
    """Side-augmented table mode (2*eid+side payloads; one gather serves
    edge AND neighbor-node features) must match the plain eid pipeline
    bit-exactly, including the PAD-wrap garbage in invalid slots."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGATPipeline, jit_scan_epoch

    rng = np.random.default_rng(11)
    N, E, D, B, Q = 30, 220, 4, 48, 5
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 3000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    node_x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    cands = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))

    out = {}
    for mode, ends in (("plain", None), ("aug", (dg.edge_src, dg.edge_dst))):
        pipe = TGATPipeline(
            num_nodes=N, edge_dim=D, node_x=node_x, num_nbrs=(4, 3),
            time_dim=8, embed_dim=8, lr=1e-3, neg_low=0, neg_high=N,
            edge_x_full=stream.edge_x, edge_ends_full=ends,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(3))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches)
        carry, l1 = epoch(carry)
        carry, l2 = epoch(carry)
        _, (s, c) = pipe.eval_step(carry, stream.batch_at(1), cands)
        out[mode] = (
            np.concatenate([np.asarray(l1), np.asarray(l2)]),
            float(s) / max(float(c), 1.0),
        )
    np.testing.assert_array_equal(out["aug"][0], out["plain"][0])
    assert out["aug"][1] == out["plain"][1]


def test_pipeline_packed_state_equivalence():
    """Packed memory-state layout (fused gathers) must match the unpacked
    layout exactly — train losses and eval MRR."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(5)
    N, E, D, B, Q = 40, 320, 6, 64, 4
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    t = np.sort(rng.integers(0, 5000, E))
    x = rng.normal(size=(E, D)).astype(np.float32)
    data = DGData.from_raw(
        edge_time=t, edge_index=np.stack([src, dst], 1), edge_x=x, time_delta="s"
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    cands = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))

    out = {}
    for packed in (False, True):
        pipe = TGNPipeline(
            num_nodes=N, edge_dim=D, memory_dim=8, embed_dim=8, time_dim=6,
            num_nbrs=5, lr=1e-3, neg_low=0, neg_high=N,
            edge_x_full=stream.edge_x, packed_state=packed,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(7))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches,
                               donate_carry=False)
        carry, l1 = epoch(carry)
        carry, l2 = epoch(carry)
        carry = pipe.flush_all(carry)
        carry, (s, c) = jax.jit(pipe.eval_step)(carry, stream.batch_at(0), cands)
        out[packed] = (np.concatenate([np.asarray(l1), np.asarray(l2)]),
                       float(s), float(c))

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-6, atol=1e-6)
    assert out[True][1] == out[False][1] and out[True][2] == out[False][2]


def test_pipeline_eval_proj_table_equivalence():
    """Pre-projected eval feature table (eval_proj_table / nbr_proj_table)
    must match the raw-gather eval path up to split-sum association: the
    lin_edge dot over [time ‖ msg] becomes two dots summed, so scores agree
    to f32 epsilon and the MRR counts are identical."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(11)
    N, E, D, B, Q = 40, 320, 6, 64, 4
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 5000, E)),
        edge_index=np.stack([rng.integers(0, N, E), rng.integers(0, N, E)], 1),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    cands = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))
    pipe = TGNPipeline(
        num_nodes=N, edge_dim=D, memory_dim=8, embed_dim=8, time_dim=6,
        num_nbrs=5, lr=1e-3, neg_low=0, neg_high=N, edge_x_full=stream.edge_x,
    )
    carry = pipe.init_carry(jax.random.PRNGKey(7))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at,
                           stream.num_batches, donate_carry=False)
    carry, _ = epoch(carry)
    carry = pipe.flush_all(carry)

    out = {}
    for use_proj in (False, True):
        proj = pipe.eval_proj_table(carry.params) if use_proj else None
        c2 = carry
        ss = []
        for i in range(3):  # a few steps so state evolution is covered too
            c2, (s, c) = jax.jit(pipe.eval_step)(
                c2, stream.batch_at(i), cands, nbr_proj_table=proj)
            ss.append((float(s), float(c)))
        out[use_proj] = ss
    for (s0, c0), (s1, c1) in zip(out[False], out[True]):
        assert c0 == c1
        np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-5)


def test_pipeline_eval_mem_bf16_mirror_exact():
    """bf16 memory mirror (eval_mem_bf16 / mem_bf16): neighbor rows feed only
    the bf16 K/V path, which casts them right after the gather — reading a
    bf16 mirror instead must be BIT-identical, including across the per-batch
    mirror refresh of flushed rows."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(13)
    N, E, D, B, Q = 40, 320, 6, 64, 4
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 5000, E)),
        edge_index=np.stack([rng.integers(0, N, E), rng.integers(0, N, E)], 1),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    cands = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))
    pipe = TGNPipeline(
        num_nodes=N, edge_dim=D, memory_dim=8, embed_dim=8, time_dim=6,
        num_nbrs=5, lr=1e-3, neg_low=0, neg_high=N, edge_x_full=stream.edge_x,
        attn_bf16=True,
    )
    carry = pipe.init_carry(jax.random.PRNGKey(7))
    epoch = jit_scan_epoch(pipe.train_step, stream.batch_at,
                           stream.num_batches, donate_carry=False)
    carry, _ = epoch(carry)
    carry = pipe.flush_all(carry)

    c_ref = carry
    ref = []
    for i in range(4):
        c_ref, (s, c) = jax.jit(pipe.eval_step)(c_ref, stream.batch_at(i), cands)
        ref.append((float(s), float(c)))

    c2, mirror = carry, pipe.eval_mem_bf16(carry)
    got = []
    for i in range(4):
        c2, (s, c), mirror = jax.jit(pipe.eval_step)(
            c2, stream.batch_at(i), cands, mem_bf16=mirror)
        got.append((float(s), float(c)))
    assert got == ref
    np.testing.assert_array_equal(
        np.asarray(mirror), np.asarray(c2.mem_state.mem.astype(jnp.bfloat16)))


def test_pipeline_packed_recency_equivalence():
    """Packed (N,K,3) recency buffer must match the separate-buffer eid mode."""
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.train import DeviceEdgeStream, TGNPipeline, jit_scan_epoch

    rng = np.random.default_rng(9)
    N, E, D, B = 40, 330, 6, 64
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 5000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)

    out = {}
    for packed in (False, True):
        pipe = TGNPipeline(
            num_nodes=N, edge_dim=D, memory_dim=8, embed_dim=8, time_dim=6,
            num_nbrs=5, lr=1e-3, neg_low=0, neg_high=N,
            edge_x_full=stream.edge_x, packed_recency=packed,
        )
        carry = pipe.init_carry(jax.random.PRNGKey(7))
        epoch = jit_scan_epoch(pipe.train_step, stream.batch_at, stream.num_batches,
                               donate_carry=False)
        carry, l1 = epoch(carry)
        carry, l2 = epoch(carry)
        out[packed] = np.concatenate([np.asarray(l1), np.asarray(l2)])
    np.testing.assert_allclose(out[True], out[False], rtol=1e-6, atol=1e-6)
