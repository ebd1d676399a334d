"""Task decoders: link / node / graph prediction heads.

Parity: reference decoders
(/root/reference/tgm/nn/decoder/linkproppred.py:10-60, nodeproppred.py:6-40,
graphproppred.py:10-58): pluggable merge/pooling aggregator followed by an
``nlayers`` ReLU MLP. ``NCNPredictor`` lives in ``ncnpred.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...exceptions import BadAggregatorProtocolError
from ..modules.aggregation import Aggregator, ConcatMerge, MeanEmbdPooling


class _MLP(nn.Module):
    out_dim: int
    nlayers: int
    hidden_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        for _ in range(1, self.nlayers - 1):
            h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.out_dim)(h)


class LinkPredictor(nn.Module):
    """merge(z_src, z_dst) -> MLP -> logits (B,) when out_dim == 1."""

    node_dim: int
    out_dim: int = 1
    nlayers: int = 2
    hidden_dim: int = 64
    merge_op: Optional[Any] = None

    def setup(self) -> None:
        merge = self.merge_op if self.merge_op is not None else ConcatMerge(dim=self.node_dim)
        if not isinstance(merge, Aggregator):
            raise BadAggregatorProtocolError(
                f"Cannot validate {type(merge).__name__}: must implement __call__ "
                "and out_channels"
            )
        self.merge = merge
        self.mlp = _MLP(self.out_dim, self.nlayers, self.hidden_dim)

    def __call__(self, z_src: jnp.ndarray, z_dst: jnp.ndarray) -> jnp.ndarray:
        h = self.merge(z_src, z_dst)
        out = self.mlp(h)
        return out.reshape(-1) if self.out_dim == 1 else out


class NodePredictor(nn.Module):
    in_dim: int
    out_dim: int = 1
    nlayers: int = 2
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, z_node: jnp.ndarray) -> jnp.ndarray:
        return _MLP(self.out_dim, self.nlayers, self.hidden_dim)(z_node)


class GraphPredictor(nn.Module):
    in_dim: int
    out_dim: int = 1
    nlayers: int = 2
    hidden_dim: int = 64
    graph_pooling: Optional[Any] = None

    def setup(self) -> None:
        pooling = (
            self.graph_pooling
            if self.graph_pooling is not None
            else MeanEmbdPooling(dim=self.in_dim)
        )
        if not isinstance(pooling, Aggregator):
            raise BadAggregatorProtocolError(
                f"Cannot validate {type(pooling).__name__}: must implement __call__ "
                "and out_channels"
            )
        self.pooling = pooling
        self.mlp = _MLP(self.out_dim, self.nlayers, self.hidden_dim)

    def __call__(
        self, z_nodes: jnp.ndarray, valid: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.mlp(self.pooling(z_nodes, valid))
