"""DyGFormer: patch-based transformer over recent-neighbor sequences.

Parity: reference ``DyGFormer``/``NeighborCooccurrenceEncoder``/
``TransformerEncoder`` (/root/reference/tgm/nn/encoder/dygformer.py:13-444):
seed node prepended to its own neighbor sequence, per-channel (node/edge/time/
co-occurrence) patching + projection, joint src‖dst transformer stack,
mean-pool per side, output projection. The co-occurrence encoder counts each
neighbor's appearances in its own and the paired node's sequences (pairwise
equality masks), zeroed on padding.

TPU note: everything is dense (B, L, d) einsums; the (B, L, L) co-occurrence
masks are batched equality compares on the VPU — no dynamic shapes.
"""

from __future__ import annotations

from typing import Any, Set, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...constants import PADDED_NODE_ID
from ..modules.time_encoding import Time2Vec


class NeighborCooccurrenceEncoder(nn.Module):
    feat_dim: int
    dtype: Any = None  # bf16 compute (params stay f32) when set

    @nn.compact
    def __call__(
        self, src_nbrs: jnp.ndarray, dst_nbrs: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # (B, L, L) pairwise masks.
        cross = src_nbrs[:, None, :] == dst_nbrs[:, :, None]
        src_self = src_nbrs[:, None, :] == src_nbrs[:, :, None]
        dst_self = dst_nbrs[:, None, :] == dst_nbrs[:, :, None]

        src_freq = jnp.stack(
            [src_self.sum(axis=1), cross.sum(axis=1)], axis=2
        ).astype(jnp.float32)
        dst_freq = jnp.stack(
            [dst_self.sum(axis=1), cross.sum(axis=2)], axis=2
        ).astype(jnp.float32)
        src_freq = jnp.where((src_nbrs == PADDED_NODE_ID)[:, :, None], 0.0, src_freq)
        dst_freq = jnp.where((dst_nbrs == PADDED_NODE_ID)[:, :, None], 0.0, dst_freq)

        enc = nn.Sequential(
            [nn.Dense(self.feat_dim, dtype=self.dtype), nn.relu,
             nn.Dense(self.feat_dim, dtype=self.dtype)]
        )
        # Encode each count scalar then sum over the (self, cross) pair axis.
        src_feat = enc(src_freq[..., None]).sum(axis=2)
        dst_feat = enc(dst_freq[..., None]).sum(axis=2)
        return src_feat, dst_feat


class TransformerEncoder(nn.Module):
    attention_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None  # bf16 compute (params stay f32) when set

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # LayerNorms stay f32 (stat stability); matmuls run in ``dtype``.
        h = nn.LayerNorm(epsilon=1e-5)(inputs)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.attention_dim,
            dropout_rate=self.dropout,
            dtype=self.dtype,
        )(h, h, deterministic=deterministic)
        out = inputs + nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=1e-5)(out)
        h = nn.Dense(4 * self.attention_dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(nn.gelu(h, approximate=False), deterministic=deterministic)
        h = nn.Dense(self.attention_dim, dtype=self.dtype)(h)
        return out + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class DyGFormer(nn.Module):
    node_feat_dim: int
    edge_x_dim: int
    time_feat_dim: int
    channel_embedding_dim: int
    output_dim: int = 172
    patch_size: int = 1
    num_layers: int = 2
    num_heads: int = 2
    dropout: float = 0.1
    max_input_sequence_length: int = 512
    num_channels: int = 4
    # bf16 matmul path: channel projections, co-occurrence MLP and the
    # transformer stack compute in bf16 with f32 params and f32 LayerNorms.
    # The DyGFormer step is MXU-compute-bound (profiled at ~57% of the f32
    # matmul peak on v5e at wiki shapes) and v5e bf16 peak is ~4x f32.
    compute_bf16: bool = False

    requires: Set[str] = frozenset({"nbr_nids", "nbr_edge_time", "nbr_edge_x"})

    def setup(self) -> None:
        if self.max_input_sequence_length % self.patch_size != 0:
            raise ValueError("Max sequence length must be a multiple of patch size")
        self.num_patches = self.max_input_sequence_length // self.patch_size
        dt = jnp.bfloat16 if self.compute_bf16 else None
        self.time_encoder = Time2Vec(self.time_feat_dim)
        self.co_occurrence_encoder = NeighborCooccurrenceEncoder(
            self.channel_embedding_dim, dtype=dt
        )
        self.proj_node = nn.Dense(self.channel_embedding_dim, dtype=dt)
        self.proj_edge = nn.Dense(self.channel_embedding_dim, dtype=dt)
        self.proj_time = nn.Dense(self.channel_embedding_dim, dtype=dt)
        self.proj_cooc = nn.Dense(self.channel_embedding_dim, dtype=dt)
        self.transformers = [
            TransformerEncoder(
                attention_dim=self.num_channels * self.channel_embedding_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                dtype=dt,
            )
            for _ in range(self.num_layers)
        ]
        self.output_layer = nn.Dense(self.output_dim)

    def _to_seq_len(self, x: jnp.ndarray, fill=0.0) -> jnp.ndarray:
        """Pad/trim the neighbor axis to max_input_sequence_length."""
        L = self.max_input_sequence_length
        cur = x.shape[1]
        if cur == L:
            return x
        if cur > L:
            return x[:, -L:]
        pad = [(0, 0), (0, L - cur)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad, constant_values=fill)

    def _patches(self, feat: jnp.ndarray) -> jnp.ndarray:
        B, L, D = feat.shape
        return feat.reshape(B, self.num_patches, self.patch_size * D)

    def __call__(
        self,
        node_x: jnp.ndarray,  # (num_nodes, d_N)
        edge_src: jnp.ndarray,  # (B,)
        edge_dst: jnp.ndarray,  # (B,)
        edge_time: jnp.ndarray,  # (B,)
        neighbours: jnp.ndarray,  # (2B, K) [src rows then dst rows]
        neighbours_time: jnp.ndarray,  # (2B, K)
        neighbours_edge_feat: jnp.ndarray,  # (2B, K, d_E)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = edge_src.shape[0]

        def side(seed, nbrs, ntime, nfeat):
            nbrs = jnp.concatenate([seed[:, None], nbrs], axis=1)
            ntime = jnp.concatenate([edge_time[:, None], ntime], axis=1)
            pad = jnp.zeros((B, 1, nfeat.shape[-1]), nfeat.dtype)
            nfeat = jnp.concatenate([pad, nfeat], axis=1)
            return (
                self._to_seq_len(nbrs, PADDED_NODE_ID),
                self._to_seq_len(ntime, 0),
                self._to_seq_len(nfeat),
            )

        s_n, s_t, s_e = side(
            edge_src, neighbours[:B], neighbours_time[:B], neighbours_edge_feat[:B]
        )
        d_n, d_t, d_e = side(
            edge_dst, neighbours[B : 2 * B], neighbours_time[B : 2 * B],
            neighbours_edge_feat[B : 2 * B],
        )

        def node_feats(nbrs):
            f = node_x[jnp.maximum(nbrs, 0)]
            return jnp.where((nbrs == PADDED_NODE_ID)[..., None], 0.0, f)

        s_cooc, d_cooc = self.co_occurrence_encoder(s_n, d_n)

        # Per-side channel projections: batching both sides through one
        # stacked (2B, …) call measured SLOWER on v5e (36.4k vs 45.9k
        # edges/s) — the four doubled concats (incl. the (2B, L, De) feature
        # array) relayout-copy more than the halved dispatch count saves,
        # the same failure mode as the measured-negative pos/neg call fusion
        # (docs/performance.md).
        def time_feats(nbrs, ntime):
            f = self.time_encoder((edge_time[:, None] - ntime).astype(jnp.float32))
            return jnp.where((nbrs == PADDED_NODE_ID)[..., None], 0.0, f)

        def channels(nbrs, ntime, nfeat, cooc):
            return (
                self.proj_node(self._patches(node_feats(nbrs))),
                self.proj_edge(self._patches(nfeat)),
                self.proj_time(self._patches(time_feats(nbrs, ntime))),
                self.proj_cooc(self._patches(cooc)),
            )

        s_ch = channels(s_n, s_t, s_e, s_cooc)
        d_ch = channels(d_n, d_t, d_e, d_cooc)

        P = self.num_patches
        joined = [jnp.concatenate([s, d], axis=1) for s, d in zip(s_ch, d_ch)]
        patches = jnp.stack(joined, axis=2).reshape(
            B, 2 * P, self.num_channels * self.channel_embedding_dim
        )

        for tr in self.transformers:
            patches = tr(patches, deterministic=deterministic)

        src_repr = jnp.mean(patches[:, :P, :], axis=1)
        dst_repr = jnp.mean(patches[:, P:, :], axis=1)
        return self.output_layer(src_repr), self.output_layer(dst_repr)
