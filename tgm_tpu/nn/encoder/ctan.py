"""CTAN: non-dissipative temporal graph propagation.

Parity: reference ``CTAN``/``CTANMemory``
(/root/reference/tgm/nn/encoder/ctan.py:11-147): embeddings evolved by an
AntiSymmetricConv (phi = TransformerConv without root weight) over the batch
subgraph with normalized-Δt time encodings in the edge attributes; the memory
is a non-learned embedding store updated by a last-by-time aggregation with
``last_update`` maxima.

AntiSymmetricConv (PyG semantics): x <- x + eps * tanh((W - W^T - gamma I) x
+ phi(x, E) + b), iterated ``num_iters`` times with shared weights.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Set

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.segment import segment_max, segment_softmax, segment_sum
from ..modules.time_encoding import Time2Vec


class _EdgeTransformerConv(nn.Module):
    """TransformerConv without root weight (the phi of AntiSymmetricConv)."""

    out_channels: int
    n_heads: int = 1

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_valid):
        U = x.shape[0]
        H = self.n_heads
        C = self.out_channels // H
        src = jnp.clip(edge_src, 0, U - 1)
        dst = jnp.clip(edge_dst, 0, U - 1)
        e = nn.Dense(self.out_channels, use_bias=False)(edge_attr).reshape(-1, H, C)
        q = nn.Dense(self.out_channels)(x).reshape(U, H, C)
        k = nn.Dense(self.out_channels)(x).reshape(U, H, C)[src] + e
        v = nn.Dense(self.out_channels)(x).reshape(U, H, C)[src] + e
        logits = jnp.sum(q[dst] * k, axis=-1) * (C**-0.5)
        alpha = jnp.stack(
            [segment_softmax(logits[:, h], dst, U, mask=edge_valid) for h in range(H)],
            axis=-1,
        )
        out = segment_sum(alpha[..., None] * v, dst, U, mask=edge_valid)
        return out.reshape(U, self.out_channels)


class CTAN(nn.Module):
    edge_dim: int
    memory_dim: int
    time_dim: int
    node_dim: int
    num_iters: int = 1
    mean_delta_t: float = 0.0
    std_delta_t: float = 1.0
    epsilon: float = 0.1
    gamma: float = 0.1

    requires: Set[str] = frozenset({"unique_nids", "global_to_local"})

    def setup(self) -> None:
        self.time_enc = Time2Vec(self.time_dim)
        self.enc_x = nn.Dense(self.memory_dim)
        self.phi = _EdgeTransformerConv(self.memory_dim)
        self.W = self.param(
            "W", nn.initializers.glorot_uniform(), (self.memory_dim, self.memory_dim)
        )
        self.b = self.param("b", nn.initializers.zeros, (self.memory_dim,))

    def __call__(
        self,
        node_x: jnp.ndarray,  # (U, memory_dim + node_dim) [memory ‖ static feats]
        last_update: jnp.ndarray,  # (U,)
        edge_src_local: jnp.ndarray,
        edge_dst_local: jnp.ndarray,
        t: jnp.ndarray,
        msg: jnp.ndarray,  # (E, edge_dim)
        edge_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        U = node_x.shape[0]
        if edge_valid is None:
            edge_valid = jnp.ones(edge_src_local.shape[0], bool)
        rel_t = jnp.abs(last_update[jnp.clip(edge_src_local, 0, U - 1)] - t)
        rel_t = (rel_t.astype(jnp.float32) - self.mean_delta_t) / self.std_delta_t
        edge_attr = jnp.concatenate([msg, self.time_enc(rel_t)], axis=-1)

        x = self.enc_x(node_x)
        A = self.W - self.W.T - self.gamma * jnp.eye(self.memory_dim)
        for _ in range(self.num_iters):
            conv = self.phi(x, edge_src_local, edge_dst_local, edge_attr, edge_valid)
            x = x + self.epsilon * jnp.tanh(x @ A.T + conv + self.b)
        return jnp.tanh(x)


class CTANMemoryState(NamedTuple):
    memory: jnp.ndarray  # (N+1, memory_dim)
    last_update: jnp.ndarray  # (N+1,)


def ctan_memory_init(
    num_nodes: int, memory_dim: int, init_time: int = 0, row_multiple: int = 1
) -> CTANMemoryState:
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    return CTANMemoryState(
        memory=jnp.zeros((n, memory_dim)),
        last_update=jnp.full((n,), init_time, jnp.int32),
    )


def ctan_memory_update(
    state: CTANMemoryState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    t: jnp.ndarray,
    src_emb: jnp.ndarray,
    dst_emb: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> CTANMemoryState:
    """Last-by-time write of batch embeddings into the memory store
    (reference ctan.py:128-147 with the examples' LastAggregator)."""
    n = state.memory.shape[0] - 1
    if valid is None:
        valid = jnp.ones(src.shape[0], bool)
    nodes = jnp.concatenate([src, dst])
    tt = jnp.concatenate([t, t])
    emb = jnp.concatenate([src_emb, dst_emb], axis=0)
    vv = jnp.concatenate([valid, valid])
    rows = jnp.where(vv, nodes, n)

    tmax = segment_max(tt, rows, n + 1, mask=vv, initial=-1)
    is_max = vv & (tt == tmax[rows])
    idx = jnp.arange(tt.shape[0])
    first = -segment_max(-idx, rows, n + 1, mask=is_max, initial=-jnp.inf)
    winner = is_max & (idx == first[rows].astype(idx.dtype))
    w_rows = jnp.where(winner, rows, n)

    memory = state.memory.at[w_rows].set(
        jnp.where(winner[:, None], jax.lax.stop_gradient(emb), state.memory[w_rows]),
        mode="drop",
    )
    last = state.last_update.at[w_rows].set(
        jnp.where(winner, tt, state.last_update[w_rows]), mode="drop"
    )
    memory = memory.at[n].set(0.0)
    last = last.at[n].set(0)
    return CTANMemoryState(memory=memory, last_update=last)
