"""MLP-Mixer blocks (GraphMixer / TPNet building blocks).

Parity: reference ``FeedForwardNet``/``MLPMixer``
(/root/reference/tgm/nn/modules/mlp_mixer.py:5-100): token-mix (over the
neighbor/token axis) + channel-mix residual blocks with LayerNorm and GELU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class FeedForwardNet(nn.Module):
    input_dim: int
    dim_expansion_factor: float
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(int(self.dim_expansion_factor * self.input_dim))(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.input_dim)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class MLPMixer(nn.Module):
    num_tokens: int
    num_channels: int
    token_dim_expansion_factor: float = 0.5
    channel_dim_expansion_factor: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, node_x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """node_x: (B, num_tokens, num_channels)."""
        h = nn.LayerNorm(epsilon=1e-5)(jnp.swapaxes(node_x, 1, 2))  # (B, C, T)
        h = FeedForwardNet(self.num_tokens, self.token_dim_expansion_factor, self.dropout)(
            h, deterministic
        )
        z = node_x + jnp.swapaxes(h, 1, 2)

        h = nn.LayerNorm(epsilon=1e-5)(z)
        h = FeedForwardNet(
            self.num_channels, self.channel_dim_expansion_factor, self.dropout
        )(h, deterministic)
        return z + h
