"""Embedding merge / pooling aggregators.

Parity: reference aggregators
(/root/reference/tgm/nn/modules/aggregation.py:8-132): ``Aggregator``
protocol, ``ConcatMerge``/``LearnableSumMerge`` (link-level merge),
``MeanEmbdPooling``/``SumEmbdPooling`` (graph-level pooling, mask-aware here
because batches are padded).
"""

from __future__ import annotations

from typing import Any, Optional, Protocol, runtime_checkable

import jax.numpy as jnp
from flax import linen as nn


@runtime_checkable
class Aggregator(Protocol):
    @property
    def out_channels(self) -> int: ...

    def __call__(self, *args: Any, **kwargs: Any) -> Any: ...


class ConcatMerge:
    """Concatenate src/dst embeddings."""

    def __init__(self, dim: int):
        self.dim = dim

    @property
    def out_channels(self) -> int:
        return self.dim * 2

    def __call__(self, z_src: jnp.ndarray, z_dst: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([z_src, z_dst], axis=-1)


class LearnableSumMerge(nn.Module):
    """Sum after per-side linear projections."""

    dim: int

    @property
    def out_channels(self) -> int:
        return self.dim

    @nn.compact
    def __call__(self, z_src: jnp.ndarray, z_dst: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.dim)(z_src) + nn.Dense(self.dim)(z_dst)


class MeanEmbdPooling:
    def __init__(self, dim: int):
        self.dim = dim

    @property
    def out_channels(self) -> int:
        return self.dim

    def __call__(self, z: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if valid is None:
            return jnp.mean(z, axis=0)
        w = valid.astype(z.dtype)[:, None]
        return jnp.sum(z * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


class SumEmbdPooling:
    def __init__(self, dim: int):
        self.dim = dim

    @property
    def out_channels(self) -> int:
        return self.dim

    def __call__(self, z: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if valid is None:
            return jnp.sum(z, axis=0)
        return jnp.sum(z * valid.astype(z.dtype)[:, None], axis=0)
