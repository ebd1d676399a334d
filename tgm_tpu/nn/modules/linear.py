"""Flattened fused linear projections over feature blocks.

**Measured negative result — not used by the shipped encoders.** The idea:
``Dense(concat([a, b, c]))`` on ``(B, K, d)`` operands looked (in an xprof
trace) like it forced 3-D concat/relayout copies, so ``BlockDense`` flattens
every block to 2-D first, concatenates once in the matmul dtype, and runs ONE
matmul. End-to-end on v5e it did the opposite: the hand-flattened 2-D concat
*forces* the wide ``(B*K, sum d_i)`` buffer to materialize, while XLA's
default lowering of ``Dense(concat(...))`` splits the dot across the concat
operands and never materializes it. Scanned-epoch throughput with BlockDense
in the attention K/V projections: TGAT 77.2k -> 56.4k edges/s (-27%), TGN
190.7k -> ~186.5k. Both encoders were reverted to Dense-over-concat
(modules/attention.py, encoder/tgn.py). Kept as a documented measurement with
its unit test; don't reintroduce without an end-to-end A/B. (A per-block
split variant was also measured, 27% worse than the flattened form.)

Parameter tree matches ``nn.Dense`` (param ``kernel`` of shape
``(sum d_i, features)``, optional ``bias``), so it is checkpoint- and
parity-compatible as a drop-in.

bf16 policy: if any block is bf16, all blocks and the kernel are cast to bf16
with f32 accumulation (``preferred_element_type``) — exactly the rounding
XLA's default TPU matmul applies to f32 operands, so bf16 feature storage
upstream does not change matmul numerics relative to f32 storage on TPU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class BlockDense(nn.Module):
    """Linear layer over a sequence of input blocks (last-dim concat).

    Equivalent to ``nn.Dense(features, use_bias)(jnp.concatenate(parts, -1))``
    with the same parameter shapes/names.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        din = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (din, self.features)
        )
        batch_shape = parts[0].shape[:-1]
        flat = [p.reshape(-1, p.shape[-1]) for p in parts]
        if any(p.dtype == jnp.bfloat16 for p in flat):
            flat = [p.astype(jnp.bfloat16) for p in flat]
            x2 = flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)
            out = lax.dot(
                x2, kernel.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            x2 = flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)
            out = x2 @ kernel
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out.reshape(batch_shape + (self.features,))
