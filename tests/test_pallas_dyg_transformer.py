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
