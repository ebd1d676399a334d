"""Multi-head temporal attention.

Parity: reference ``TemporalAttention``
(/root/reference/tgm/nn/modules/attention.py:5-128): Q from [node ‖ time],
K/V from [neighbor ‖ edge ‖ time], output dim ``node_dim + time_dim`` padded
to a multiple of ``n_heads``, ``-1e10`` masking for empty neighborhoods,
dropout on attention weights and output, residual + LayerNorm.

TPU note: the whole computation is dense ``(B, K, d)`` einsums — MXU-friendly
with no ragged ops; padded neighbors are masked, not branched on.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class TemporalAttention(nn.Module):
    n_heads: int
    node_dim: int
    edge_dim: int
    time_dim: int
    dropout: float = 0.1
    # bf16 K/V path: cast the three K/V operands (neighbor/edge/time feats) to
    # bf16 before the concat+projection and accumulate the attention dots in
    # f32. On TPU this matches what the MXU already does to f32 matmul inputs
    # (round operands to bf16, accumulate f32), but making it explicit lets
    # XLA keep the whole (B, K, node+edge+time) pipeline in bf16 — profiling
    # showed mixed f32/bf16 concat operands force a per-step bf16 conversion
    # sweep of the full edge-feature table plus a 20 MB relayout copy of the
    # gathered hop-2 features. Default off (CPU parity tests compare f32).
    kv_bf16: bool = False
    # Score-tensor layout: "kmajor" (default) keeps logits (B, H, K) — at
    # H=2, K=10 the mask/softmax chain runs on tensors whose tiled minor
    # dims use ~2% of the VPU lanes. "lanes" computes logits (H, K, B) with
    # the batch/seed axis on the 128-lane axis (measured +57% on the TGN
    # eval epoch for the analogous rowwise-attention restructure, r5).
    # Same math modulo fp reduction order.
    score_layout: str = "kmajor"

    def setup(self) -> None:
        if min(self.n_heads, self.node_dim, self.edge_dim, self.time_dim) <= 0:
            raise ValueError("n_heads, node_dim, edge_dim, time_dim must be > 0")
        out_dim = self.node_dim + self.time_dim
        self.pad_dim = (-out_dim) % self.n_heads
        self.out_dim = out_dim + self.pad_dim
        self.head_dim = self.out_dim // self.n_heads

        self.W_Q = nn.Dense(self.out_dim, use_bias=False)
        # Dense over the 3-D KV concat: XLA splits the dot across the concat
        # operands and never materializes the (B, K, node+edge+time) tensor.
        # The flattened BlockDense variant forced that buffer to materialize
        # and measured a 27% TGAT epoch regression on v5e (77.2k -> 56.4k
        # edges/s) — keep the compiler-friendly form here.
        self.W_KV = nn.Dense(
            self.out_dim * 2,
            use_bias=False,
            dtype=jnp.bfloat16 if self.kv_bf16 else None,
        )
        self.W_O = nn.Dense(self.out_dim)
        self.drop = nn.Dropout(self.dropout)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(
        self,
        node_x: jnp.ndarray,  # (B, node_dim)
        time_feat: jnp.ndarray,  # (B, time_dim)
        edge_feat: "jnp.ndarray | None",  # (B, K, edge_dim)
        nbr_node_feat: "jnp.ndarray | None",  # (B, K, node_dim)
        nbr_time_feat: jnp.ndarray,  # (B, K, time_dim)
        valid_nbr_mask: jnp.ndarray,  # (B, K) bool
        deterministic: bool = True,
        kv_node_edge_feat: "jnp.ndarray | None" = None,  # (B, K, node+edge)
    ) -> jnp.ndarray:
        B, K = valid_nbr_mask.shape
        x = node_x
        if self.pad_dim:
            x = jnp.pad(x, ((0, 0), (0, self.pad_dim)))

        R = jnp.concatenate([x, time_feat], axis=-1)  # (B, out_dim)
        Q = self.W_Q(R)

        if kv_node_edge_feat is not None:
            # Pre-concatenated [nbr_node_feat ‖ edge_feat] (e.g. gathered as
            # one row from a side-augmented feature table); mathematically
            # identical to the two-operand form below.
            if self.kv_bf16:
                kv_node_edge_feat = kv_node_edge_feat.astype(jnp.bfloat16)
                nbr_time_feat = nbr_time_feat.astype(jnp.bfloat16)
            Z = jnp.concatenate([kv_node_edge_feat, nbr_time_feat], axis=-1)
        else:
            if self.kv_bf16:
                nbr_node_feat = nbr_node_feat.astype(jnp.bfloat16)
                edge_feat = edge_feat.astype(jnp.bfloat16)
                nbr_time_feat = nbr_time_feat.astype(jnp.bfloat16)
            Z = jnp.concatenate([nbr_node_feat, edge_feat, nbr_time_feat], axis=-1)
        Z = self.W_KV(Z)  # (B, K, 2*out_dim)
        Kmat = Z[..., : self.out_dim]
        V = Z[..., self.out_dim :]

        q = Q.astype(Z.dtype).reshape(B, self.n_heads, self.head_dim)
        k = Kmat.reshape(B, K, self.n_heads, self.head_dim)
        v = V.reshape(B, K, self.n_heads, self.head_dim)

        # f32 accumulation either way; bf16 operands when kv_bf16 (identical
        # to the MXU's default handling of f32 operands on TPU).
        if self.score_layout == "lanes":
            attn = jnp.einsum(
                "bhd,bkhd->hkb", q, k, preferred_element_type=jnp.float32
            ) * (self.head_dim**-0.5)
            mask_t = valid_nbr_mask.T[None]  # (1, K, B)
            attn = jnp.where(mask_t, attn, -1e10)
            attn = nn.softmax(attn, axis=1)
            attn = self.drop(attn, deterministic=deterministic)
            out = jnp.einsum(
                "hkb,bkhd->bhd",
                attn.astype(Z.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).reshape(B, self.out_dim)
            out = self.W_O(out)
            out = self.drop(out, deterministic=deterministic)
            return self.layer_norm(out + R)
        attn = jnp.einsum(
            "bhd,bkhd->bhk", q, k, preferred_element_type=jnp.float32
        ) * (self.head_dim**-0.5)
        attn = jnp.where(valid_nbr_mask[:, None, :], attn, -1e10)
        attn = nn.softmax(attn, axis=-1)
        attn = self.drop(attn, deterministic=deterministic)

        out = jnp.einsum(
            "bhk,bkhd->bhd",
            attn.astype(Z.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).reshape(B, self.out_dim)
        out = self.W_O(out)
        out = self.drop(out, deterministic=deterministic)
        return self.layer_norm(out + R)
