"""Time2Vec time encoding.

Parity: reference ``Time2Vec`` (/root/reference/tgm/nn/modules/time_encoding.py:6-24):
``cos(W·Δt + b)`` with the DyGLib log-spaced init ``w_i = 1 / 10^linspace(0, 9)``
and zero bias; weights are trainable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _log_spaced_init(time_dim: int):
    w = (1 / 10 ** np.linspace(0, 9, time_dim)).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == (1, time_dim), shape
        return jnp.asarray(w).reshape(1, time_dim).astype(dtype)

    return init


class Time2Vec(nn.Module):
    time_dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """t: (...,) -> (..., time_dim)."""
        x = t[..., None].astype(jnp.float32)
        w = self.param("w", _log_spaced_init(self.time_dim), (1, self.time_dim))
        b = self.param("b", nn.initializers.zeros, (self.time_dim,))
        return jnp.cos(x @ w + b)
