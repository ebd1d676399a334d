"""Spectral graph convolutions on COO edge lists (GCNConv / ChebConv).

These replace the PyG C++/CUDA message-passing layers the reference delegates
to (SURVEY.md §2.1: GCNConv, ChebConv): symmetric-normalized SpMM expressed as
gather + segment-sum so XLA fuses it into TPU-friendly dense ops. Edge lists
are padded COO with validity masks (static shapes under jit).

Semantics match PyG:
* ``GCNConv``: A+I self loops (A+2I when ``improved``), D^{-1/2}(A+I)D^{-1/2},
  then X→XW and bias.
* ``ChebConv`` (sym normalization, lambda_max=2): scaled Laplacian
  L̃ = -D^{-1/2} A D^{-1/2}; Chebyshev recurrence Z_k = 2 L̃ Z_{k-1} - Z_{k-2}.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.segment import segment_sum


def _sym_norm_weights(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray],
    edge_valid: Optional[jnp.ndarray],
    num_nodes: int,
    self_loop_weight: float,
) -> tuple:
    """Return (norm_edge_w, deg_inv_sqrt) for D^-1/2 (A [+ cI]) D^-1/2."""
    E = edge_src.shape[0]
    w = jnp.ones(E) if edge_weight is None else edge_weight
    if edge_valid is not None:
        w = jnp.where(edge_valid, w, 0.0)
    # Degree over the edge list's dst (PyG convention; undirected graphs list
    # both directions, so dst-degree is the full degree) plus self loops.
    deg = segment_sum(w, jnp.clip(edge_dst, 0, num_nodes - 1), num_nodes)
    deg = deg + self_loop_weight
    dis = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    norm_w = dis[jnp.clip(edge_src, 0, num_nodes - 1)] * w * dis[jnp.clip(edge_dst, 0, num_nodes - 1)]
    return norm_w, dis


def gcn_propagate(
    x: jnp.ndarray,
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray],
    edge_valid: Optional[jnp.ndarray],
    self_loop_weight: float = 1.0,
) -> jnp.ndarray:
    """D^-1/2 (A + cI) D^-1/2 @ x over masked COO edges."""
    n = x.shape[0]
    norm_w, dis = _sym_norm_weights(
        edge_src, edge_dst, edge_weight, edge_valid, n, self_loop_weight
    )
    src = jnp.clip(edge_src, 0, n - 1)
    dst = jnp.clip(edge_dst, 0, n - 1)
    agg = segment_sum(x[src] * norm_w[:, None], dst, n, edge_valid)
    # Self-loop term: c * d_i^-1 * x_i with the same normalization.
    agg = agg + x * (self_loop_weight * dis * dis)[:, None]
    return agg


class GCNConv(nn.Module):
    out_channels: int
    improved: bool = False
    add_self_loops: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = nn.Dense(self.out_channels, use_bias=False)(x)
        c = (2.0 if self.improved else 1.0) if self.add_self_loops else 0.0
        out = gcn_propagate(h, edge_src, edge_dst, edge_weight, edge_valid, c)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out


def laplacian_propagate(
    x: jnp.ndarray,
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray],
    edge_valid: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """L̃ @ x with L̃ = -D^-1/2 A D^-1/2 (sym normalization, lambda_max=2)."""
    n = x.shape[0]
    norm_w, _ = _sym_norm_weights(edge_src, edge_dst, edge_weight, edge_valid, n, 0.0)
    src = jnp.clip(edge_src, 0, n - 1)
    dst = jnp.clip(edge_dst, 0, n - 1)
    return -segment_sum(x[src] * norm_w[:, None], dst, n, edge_valid)


class ChebConv(nn.Module):
    out_channels: int
    K: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        z_prev2 = x
        out = nn.Dense(self.out_channels, use_bias=False, name="lin_0")(z_prev2)
        if self.K > 1:
            z_prev1 = laplacian_propagate(x, edge_src, edge_dst, edge_weight, edge_valid)
            out = out + nn.Dense(self.out_channels, use_bias=False, name="lin_1")(z_prev1)
            for k in range(2, self.K):
                z_k = (
                    2.0 * laplacian_propagate(z_prev1, edge_src, edge_dst, edge_weight, edge_valid)
                    - z_prev2
                )
                out = out + nn.Dense(self.out_channels, use_bias=False, name=f"lin_{k}")(z_k)
                z_prev2, z_prev1 = z_prev1, z_k
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out
