"""TGCN: Temporal GCN gated recurrent cell.

Parity: reference ``TGCN`` (/root/reference/tgm/nn/encoder/tgcn.py:8-157,
adapted from pytorch_geometric_temporal): GCNConv per gate, then
Linear([conv(X) ‖ H]) with sigmoid/tanh; H' = U*H + (1-U)*C.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..modules.graph_conv import GCNConv


class TGCN(nn.Module):
    in_channels: int
    out_channels: int
    improved: bool = False
    add_self_loops: bool = True

    def setup(self) -> None:
        mk = lambda: GCNConv(
            self.out_channels, improved=self.improved, add_self_loops=self.add_self_loops
        )
        self.conv_u, self.conv_r, self.conv_c = mk(), mk(), mk()
        self.linear_u = nn.Dense(self.out_channels)
        self.linear_r = nn.Dense(self.out_channels)
        self.linear_c = nn.Dense(self.out_channels)

    def __call__(
        self,
        node_x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        H: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if H is None:
            H = jnp.zeros((node_x.shape[0], self.out_channels), node_x.dtype)
        conv = lambda m: m(node_x, edge_src, edge_dst, edge_weight, edge_valid)
        U = nn.sigmoid(self.linear_u(jnp.concatenate([conv(self.conv_u), H], 1)))
        R = nn.sigmoid(self.linear_r(jnp.concatenate([conv(self.conv_r), H], 1)))
        C = nn.tanh(self.linear_c(jnp.concatenate([conv(self.conv_c), H * R], 1)))
        return U * H + (1 - U) * C
