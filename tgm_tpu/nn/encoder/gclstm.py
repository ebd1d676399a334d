"""GC-LSTM: graph-convolutional LSTM cell.

Parity: reference ``GCLSTM`` (/root/reference/tgm/nn/encoder/gclstm.py:44-227):
per-gate dense input weights (Glorot) + ChebConv over the hidden state,
standard LSTM cell combination.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..modules.graph_conv import ChebConv


class GCLSTM(nn.Module):
    in_channels: int
    out_channels: int
    K: int

    def setup(self) -> None:
        glorot = nn.initializers.glorot_uniform()
        self.W_i = self.param("W_i", glorot, (self.in_channels, self.out_channels))
        self.W_f = self.param("W_f", glorot, (self.in_channels, self.out_channels))
        self.W_c = self.param("W_c", glorot, (self.in_channels, self.out_channels))
        self.W_o = self.param("W_o", glorot, (self.in_channels, self.out_channels))
        zeros = nn.initializers.zeros
        self.b_i = self.param("b_i", zeros, (1, self.out_channels))
        self.b_f = self.param("b_f", zeros, (1, self.out_channels))
        self.b_c = self.param("b_c", zeros, (1, self.out_channels))
        self.b_o = self.param("b_o", zeros, (1, self.out_channels))
        self.conv_i = ChebConv(self.out_channels, self.K)
        self.conv_f = ChebConv(self.out_channels, self.K)
        self.conv_c = ChebConv(self.out_channels, self.K)
        self.conv_o = ChebConv(self.out_channels, self.K)

    def __call__(
        self,
        node_x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        H: Optional[jnp.ndarray] = None,
        C: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = node_x.shape[0]
        if H is None:
            H = jnp.zeros((n, self.out_channels), node_x.dtype)
        if C is None:
            C = jnp.zeros((n, self.out_channels), node_x.dtype)
        conv = lambda m: m(H, edge_src, edge_dst, edge_weight, edge_valid)
        I = nn.sigmoid(node_x @ self.W_i + conv(self.conv_i) + self.b_i)
        F = nn.sigmoid(node_x @ self.W_f + conv(self.conv_f) + self.b_f)
        T = nn.tanh(node_x @ self.W_c + conv(self.conv_c) + self.b_c)
        C = F * C + I * T
        O = nn.sigmoid(node_x @ self.W_o + conv(self.conv_o) + self.b_o)
        H = O * nn.tanh(C)
        return H, C
