"""Fused DyGFormer transformer-stack kernel: parity with the flax stack.

Interpret-mode (CPU) equivalence of ``transformer_stack_fwd`` against the
``TransformerEncoder`` flax stack it fuses (tgm_tpu/nn/encoder/dygformer.py),
at tiny shapes. The TPU-compiled kernel is measured separately by
tools/dyg_megakernel_spike.py; this pins the math (including the in-kernel
Abramowitz-Stegun exact-gelu, which replaces the un-lowerable erf/erfc).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu.nn.encoder.dygformer import TransformerEncoder
from tgm_tpu.ops.pallas.dyg_transformer import (
    _gelu_exact,
    convert_flax_layer,
    transformer_stack_fwd,
)


def test_gelu_polynomial_matches_exact():
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    got = _gelu_exact(x)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_stack_matches_flax():
    B, S, D, H, L = 8, 16, 32, 2, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))

    layers = [TransformerEncoder(attention_dim=D, num_heads=H, dropout=0.0,
                                 dtype=jnp.bfloat16) for _ in range(L)]
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    params = [m.init(k, x) for m, k in zip(layers, keys)]

    h = x
    for m, p in zip(layers, params):
        h = m.apply(p, h)
    ref = np.asarray(h)

    kernel_layers = [convert_flax_layer(p["params"]) for p in params]
    got = np.asarray(transformer_stack_fwd(
        x, kernel_layers, num_heads=H, block_b=4, interpret=True))

    # bf16 matmuls + (flax) bf16 softmax vs (kernel) f32 softmax: agreement
    # is at bf16 rounding, not bitwise (same bound as the spike tool).
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-9)
    assert err < 5e-2, err


def test_dygformer_pallas_layers_end_to_end():
    """DyGFormer with ``pallas_layers`` == the flax stack path (model-level
    integration used by the bench eval epoch, interpret mode on CPU)."""
    from tgm_tpu.nn import DyGFormer
    from tgm_tpu.nn.encoder.dygformer import dygformer_pallas_layers

    B, K = 4, 6
    enc = DyGFormer(
        node_feat_dim=3, edge_x_dim=5, time_feat_dim=8,
        channel_embedding_dim=8, output_dim=16, patch_size=1,
        max_input_sequence_length=8, dropout=0.0,
    )
    rng = np.random.default_rng(1)
    node_x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, 30, B), jnp.int32)
    dst = jnp.asarray(rng.integers(0, 30, B), jnp.int32)
    t = jnp.asarray(rng.integers(0, 100, B), jnp.int32)
    nbrs = jnp.asarray(rng.integers(0, 30, (2 * B, K)), jnp.int32)
    ntime = jnp.asarray(rng.integers(0, 100, (2 * B, K)), jnp.int32)
    nfeat = jnp.asarray(rng.normal(size=(2 * B, K, 5)).astype(np.float32))

    p = enc.init(jax.random.PRNGKey(0), node_x, src, dst, t, nbrs, ntime,
                 nfeat)
    zs_f, zd_f = enc.apply(p, node_x, src, dst, t, nbrs, ntime, nfeat)
    pl = dygformer_pallas_layers(p, enc.num_layers)
    zs_p, zd_p = enc.apply(p, node_x, src, dst, t, nbrs, ntime, nfeat,
                           pallas_layers=pl)
    for a, b in ((zs_p, zs_f), (zd_p, zd_f)):
        err = np.max(np.abs(np.asarray(a) - np.asarray(b))) / max(
            float(np.max(np.abs(np.asarray(b)))), 1e-9)
        assert err < 5e-2, err
