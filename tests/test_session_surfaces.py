"""Tests for round-2-continuation surfaces: precision policy, DyGFormer
bf16 path, TGAT aug-mode checkpointing, and bench-level helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.util.precision import resolve_bf16, tpu_default_bf16


def test_resolve_bf16_tristate():
    assert resolve_bf16("on") is True
    assert resolve_bf16("off") is False
    assert resolve_bf16(True) is True
    assert resolve_bf16(False) is False
    assert resolve_bf16("auto") == tpu_default_bf16()
    assert resolve_bf16(None) == tpu_default_bf16()
    with pytest.raises(KeyError):
        resolve_bf16("maybe")


def test_tpu_default_bf16_off_on_cpu():
    # Tests run on the forced-CPU backend (conftest).
    assert tpu_default_bf16() is False


def test_dygformer_bf16_close_to_f32():
    """The bf16 matmul path must produce outputs close to f32 (same params)."""
    from tgm_tpu.nn import DyGFormer

    rng = np.random.default_rng(0)
    N, B, K = 30, 6, 7
    outs = {}
    for bf16 in (False, True):
        m = DyGFormer(
            node_feat_dim=3, edge_x_dim=4, time_feat_dim=8,
            channel_embedding_dim=12, output_dim=10, patch_size=1,
            num_layers=2, num_heads=2, dropout=0.0,
            max_input_sequence_length=K + 1, compute_bf16=bf16,
        )
        args = (
            jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, N, B).astype(np.int32)),
            jnp.asarray(rng.integers(0, N, B).astype(np.int32)),
            jnp.asarray(rng.integers(50, 100, B).astype(np.int32)),
            jnp.asarray(rng.integers(0, N, (2 * B, K)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 50, (2 * B, K)).astype(np.int32)),
            jnp.asarray(rng.normal(size=(2 * B, K, 4)).astype(np.float32)),
        )
        rng = np.random.default_rng(0)  # same stream for identical inputs
        params = m.init(jax.random.PRNGKey(1), *args)
        z_src, z_dst = m.apply(params, *args)
        outs[bf16] = (np.asarray(z_src, np.float32), np.asarray(z_dst, np.float32))
    # Params initialize identically (f32 param_dtype both ways).
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.05)
        assert not np.array_equal(a, b)  # bf16 path actually rounds


def test_tgat_aug_carry_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the aug-mode TGATCarry (2*eid+side buffers)."""
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.train import DeviceEdgeStream, TGATPipeline
    from tgm_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    rng = np.random.default_rng(2)
    N, E, D, B = 20, 80, 4, 16
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 500, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, D)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    stream = DeviceEdgeStream(dg, B)
    node_x = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
    pipe = TGATPipeline(
        num_nodes=N, edge_dim=D, node_x=node_x, num_nbrs=(3, 2),
        time_dim=6, embed_dim=6, lr=1e-3, neg_low=0, neg_high=N,
        edge_x_full=stream.edge_x, edge_ends_full=(dg.edge_src, dg.edge_dst),
    )
    carry = pipe.init_carry(jax.random.PRNGKey(0))
    for i in range(3):
        carry, _ = pipe.train_step(carry, stream.batch_at(jnp.asarray(i)))

    path = tmp_path / "ckpt"
    save_checkpoint(str(path), carry)
    restored = restore_checkpoint(str(path), carry)
    for a, b in zip(jax.tree_util.tree_leaves(carry), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues identically from the restored carry.
    c1, l1 = pipe.train_step(carry, stream.batch_at(jnp.asarray(3)))
    c2, l2 = pipe.train_step(restored, stream.batch_at(jnp.asarray(3)))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
