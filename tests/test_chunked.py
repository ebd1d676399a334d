"""Chunked host->device streaming epochs (train/chunked.py).

The chunked stream must serve EXACTLY the batch plan the resident
``DeviceEdgeStream`` serves, and a chunk-streamed training epoch must be
bit-equivalent to the resident scanned epoch — only device residency may
differ. (Reference large-tier scope being replaced:
/root/reference/test/performance/conftest.py:10-17 + host slicing in
array_backend.py:57-68.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tgm_tpu import DGData, DGraph
from tgm_tpu.hooks import (
    HookManager,
    RandomNegativeEdgeSamplerHook,
    RecencyNeighborHook,
)
from tgm_tpu.nn import LinkPredictor
from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbeddingRowwise, TGNMemory
from tgm_tpu.train import (
    ChunkedEdgeStream,
    DeviceEdgeStream,
    chunked_hook_epoch,
    scanned_hook_epoch,
)
from tgm_tpu.util.seed import seed_everything

N, E, D, B = 20, 66, 3, 10  # 7 batches (last one short)


def build_data(seed=0):
    rng = np.random.default_rng(seed)
    return DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 500, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )


def batch_fields(b):
    out = {
        "src": np.asarray(b.edge_src), "dst": np.asarray(b.edge_dst),
        "t": np.asarray(b.edge_time), "valid": np.asarray(b.edge_valid),
        "ids": np.asarray(b.edge_ids),
    }
    if b.has("edge_x"):
        out["x"] = np.asarray(b.edge_x)
    return out


@pytest.mark.parametrize("chunk_batches", [1, 3, 7, 100])
def test_chunked_stream_serves_resident_batch_plan(chunk_batches):
    dg = DGraph(build_data())
    res = DeviceEdgeStream(dg, B)
    ch = ChunkedEdgeStream(dg, B, chunk_batches)
    assert ch.num_batches == res.num_batches
    got = 0
    for k in range(ch.num_chunks):
        chunk = ch.put_chunk(k)
        for i in range(ch._chunk_len(k)):
            a = batch_fields(ch.batch_at(chunk, jnp.int32(i)))
            b = batch_fields(res.batch_at(jnp.int32(got)))
            for f in a:
                np.testing.assert_array_equal(a[f], b[f], err_msg=f"batch {got} field {f}")
            got += 1
    assert got == res.num_batches


def build_hm():
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=N))
    # feats layout (edge_x_full=None): the only recency layout valid when
    # the edge feature table exceeds HBM — buffers carry features by value.
    hm.register_shared(
        RecencyNeighborHook(N, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"], edge_dim=D)
    )
    return hm


def build_model():
    from tgm_tpu.train.programs import build_tgn_hook_cores

    dims = 8
    memory = TGNMemory(num_nodes=N, raw_msg_dim=D, memory_dim=dims, time_dim=dims)
    encoder = GraphAttentionEmbeddingRowwise(
        in_channels=dims, out_channels=dims, msg_dim=D, time_dim=dims, dropout=0.0
    )
    decoder = LinkPredictor(node_dim=dims, hidden_dim=dims)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mem_state = memory.init_state()
    params = {
        "mem": memory.init(k1, mem_state, jnp.zeros(4, jnp.int32)),
        "enc": encoder.init(
            k2, jnp.zeros((4, dims)), jnp.zeros((4, 3, dims)),
            jnp.zeros(4, jnp.int32), jnp.zeros((4, 3), jnp.int32),
            jnp.zeros((4, 3, D)), jnp.ones((4, 3), bool),
        ),
        "dec": decoder.init(k3, jnp.zeros((1, dims)), jnp.zeros((1, dims))),
    }
    opt_state = opt.init(params)
    core, _ = build_tgn_hook_cores(memory, encoder, decoder, opt, N, style="rowwise")
    return core, (params, opt_state, mem_state, k4)


@pytest.mark.parametrize("chunk_batches", [3, 7])
def test_chunked_epoch_bit_matches_resident(chunk_batches):
    data = build_data()
    core, carry0 = build_model()

    seed_everything(11)
    dg = DGraph(data)
    epoch_r, hs_r = scanned_hook_epoch(
        DeviceEdgeStream(dg, B), build_hm(), "train", dg, core, donate=False
    )
    carry_r, hs_r, loss_r = epoch_r(carry0, hs_r)

    seed_everything(11)
    dg2 = DGraph(data)
    ch = ChunkedEdgeStream(dg2, B, chunk_batches)
    epoch_c, hs_c = chunked_hook_epoch(ch, build_hm(), "train", dg2, core,
                                       donate=False)
    carry_c, hs_c, loss_c = epoch_c(carry0, hs_c)

    np.testing.assert_array_equal(np.asarray(loss_r), loss_c)
    for a, b in zip(jax.tree_util.tree_leaves(carry_r),
                    jax.tree_util.tree_leaves(carry_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(hs_r),
                    jax.tree_util.tree_leaves(hs_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_epoch_two_epochs_carry_state():
    """Hook state and model carry thread across epochs like the resident path."""
    data = build_data()
    core, carry0 = build_model()
    seed_everything(11)
    dg = DGraph(data)
    ch = ChunkedEdgeStream(dg, B, 3)
    epoch, hs = chunked_hook_epoch(ch, build_hm(), "train", dg, core, donate=False)
    carry, hs, l1 = epoch(carry0, hs)
    carry, hs, l2 = epoch(carry, hs)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    assert not np.array_equal(l1, l2)  # training progressed


def test_chunked_stream_bf16_transfer():
    """feat_dtype=bfloat16 halves transfer bytes; batches still serve f32."""
    dg = DGraph(build_data())
    ch = ChunkedEdgeStream(dg, B, 3, feat_dtype=jnp.bfloat16)
    res = DeviceEdgeStream(dg, B)
    assert ch.chunk_nbytes < ChunkedEdgeStream(dg, B, 3).chunk_nbytes
    chunk = ch.put_chunk(0)
    b = ch.batch_at(chunk, jnp.int32(0))
    assert b.edge_x.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(b.edge_x), np.asarray(res.batch_at(jnp.int32(0)).edge_x),
        atol=0.02, rtol=0.01,
    )


def test_chunk_nbytes_accounting():
    dg = DGraph(build_data())
    ch = ChunkedEdgeStream(dg, B, 3)
    # 3 batches * 10 edges * (3 int32 + 3 f32 feats) + counts + base
    assert ch.chunk_nbytes == 3 * 10 * (12 + 12) + 3 * 4 + 4
