"""Plain multi-layer GCN encoder for snapshot (DTDG) tasks.

Parity: the reference composes GCNConv layers at example level
(/root/reference/examples/linkproppred/gcn.py); provided as a first-class
encoder here.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..modules.graph_conv import GCNConv


class GCN(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        node_x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = node_x
        for i in range(self.num_layers - 1):
            h = GCNConv(self.hidden_dim)(h, edge_src, edge_dst, edge_weight, edge_valid)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return GCNConv(self.out_dim)(h, edge_src, edge_dst, edge_weight, edge_valid)
