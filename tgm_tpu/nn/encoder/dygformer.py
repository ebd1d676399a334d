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

Two TPU throughput levers, both OFF by default (defaults preserve the torch
parity surface; ``bench.py --model dygformer`` / the example turn them on):

* ``fused_attn`` — replace flax ``MultiHeadDotProductAttention`` (three
  DenseGeneral dispatches, attention internals in compute dtype) with
  ``FusedSelfAttention``: ONE (D, 3D) QKV matmul and explicit einsum core
  with f32 accumulation + f32 softmax. Same math; different param tree
  (see ``fuse_attention_params`` to convert existing checkpoints).
* ``encode_pairs`` — one forward for BOTH the (src, dst) and (src, neg)
  pairs straight off the stacked (3B, K) hook output: the src channels are
  projected once instead of twice, the transformer runs as one (2B, 2P, D)
  dispatch instead of two (B, 2P, D), and — unlike the measured-negative
  r3 "batched channel projections" (36.4k vs 45.9k edges/s,
  docs/performance.md) — NO raw (·, L, d_E) feature arrays are
  concatenated: the hook's (3B, K, d_E) array feeds the projections in
  place and only projected (B, P, 50) patches are sliced/joined.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Set, Tuple

import jax
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


class FusedSelfAttention(nn.Module):
    """Self-attention with one fused QKV matmul and explicit einsum core.

    Same math as ``nn.MultiHeadDotProductAttention`` (torch
    ``nn.MultiheadAttention`` in the reference, dygformer.py:404-431) but
    shaped for the MXU: q/k/v come out of ONE (D, 3D) projection instead of
    three DenseGenerals, the score/value dots run on ``dtype`` (bf16)
    operands with f32 accumulation, and the softmax stays f32.
    """

    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, S, D = h.shape
        H = self.num_heads
        dh = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(h)  # (B, S, 3D)
        q = qkv[..., :D].reshape(B, S, H, dh)
        k = qkv[..., D : 2 * D].reshape(B, S, H, dh)
        v = qkv[..., 2 * D :].reshape(B, S, H, dh)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        a = jax.nn.softmax(logits, axis=-1)
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd",
            a.astype(qkv.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).reshape(B, S, D)
        return nn.Dense(D, dtype=self.dtype, name="out")(out)


def fuse_attention_params(mha_params: dict) -> dict:
    """Convert a flax ``MultiHeadDotProductAttention`` param subtree to the
    ``FusedSelfAttention`` layout (qkv kernel (D, 3D), out kernel (D, D))."""
    D = mha_params["out"]["kernel"].shape[-1]

    def flat_qkv(p):  # (D, H, dh) -> (D, D)
        return p["kernel"].reshape(D, D), p["bias"].reshape(D)

    qk, qb = flat_qkv(mha_params["query"])
    kk, kb = flat_qkv(mha_params["key"])
    vk, vb = flat_qkv(mha_params["value"])
    return {
        "qkv": {
            "kernel": jnp.concatenate([qk, kk, vk], axis=1),
            "bias": jnp.concatenate([qb, kb, vb]),
        },
        "out": {
            "kernel": mha_params["out"]["kernel"].reshape(D, D),
            "bias": mha_params["out"]["bias"],
        },
    }


class LayerNormBF16(nn.Module):
    """LayerNorm with f32 statistics and a bf16 residual stream.

    The transformer's inter-op tensors are its bandwidth bill: at wiki
    shapes every LN/residual boundary moves a (B, 2P, D) activation, and
    keeping those f32 doubles the traffic of the bf16 matmul path around
    them. Stats (mean/var) still accumulate in f32 — only the stream dtype
    changes.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(jnp.bfloat16)


class TransformerEncoder(nn.Module):
    attention_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None  # bf16 compute (params stay f32) when set
    fused_attn: bool = False
    # bf16 residual stream: LN stats stay f32 but the inter-op activations
    # (the bandwidth bill at these shapes) flow bf16 end to end.
    bf16_stream: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.bf16_stream:
            inputs = inputs.astype(jnp.bfloat16)
            ln = lambda: LayerNormBF16()
        else:
            # LayerNorms stay f32 (stat stability); matmuls run in ``dtype``.
            ln = lambda: nn.LayerNorm(epsilon=1e-5)
        h = ln()(inputs)
        if self.fused_attn:
            attn = FusedSelfAttention(
                dim=self.attention_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                dtype=self.dtype,
            )(h, deterministic=deterministic)
        else:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.attention_dim,
                dropout_rate=self.dropout,
                dtype=self.dtype,
            )(h, h, deterministic=deterministic)
        out = inputs + nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        h = ln()(out)
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
    # One (D, 3D) QKV matmul + explicit einsum attention (see module
    # docstring). Changes the attention param tree; fuse_attention_params
    # converts flax-MHA checkpoints.
    fused_attn: bool = False
    # bf16 residual stream through the transformer stack (LN stats stay
    # f32): halves the inter-op activation traffic, which is the bandwidth
    # bill at wiki shapes. Requires compute_bf16. Changes LN param names
    # (LayerNormBF16_*) and TPU-side numerics at the bf16 rounding level.
    bf16_stream: bool = False

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
                fused_attn=self.fused_attn,
                bf16_stream=self.bf16_stream and self.compute_bf16,
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

    def _side(self, seed, seed_time, nbrs, ntime, nfeat):
        """Prepend the seed to its own sequence and pad to L (reference
        dygformer.py:277-285)."""
        R = seed.shape[0]
        nbrs = jnp.concatenate([seed[:, None], nbrs], axis=1)
        ntime = jnp.concatenate([seed_time[:, None], ntime], axis=1)
        pad = jnp.zeros((R, 1, nfeat.shape[-1]), nfeat.dtype)
        nfeat = jnp.concatenate([pad, nfeat], axis=1)
        return (
            self._to_seq_len(nbrs, PADDED_NODE_ID),
            self._to_seq_len(ntime, 0),
            self._to_seq_len(nfeat),
        )

    def _node_feats(self, node_x, nbrs):
        f = node_x[jnp.maximum(nbrs, 0)]
        return jnp.where((nbrs == PADDED_NODE_ID)[..., None], 0.0, f)

    def _time_feats(self, nbrs, ntime, seed_time):
        f = self.time_encoder((seed_time[:, None] - ntime).astype(jnp.float32))
        return jnp.where((nbrs == PADDED_NODE_ID)[..., None], 0.0, f)

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
        pallas_layers: Optional[Sequence[Dict[str, jnp.ndarray]]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = edge_src.shape[0]

        s_n, s_t, s_e = self._side(
            edge_src, edge_time,
            neighbours[:B], neighbours_time[:B], neighbours_edge_feat[:B],
        )
        d_n, d_t, d_e = self._side(
            edge_dst, edge_time,
            neighbours[B : 2 * B], neighbours_time[B : 2 * B],
            neighbours_edge_feat[B : 2 * B],
        )

        s_cooc, d_cooc = self.co_occurrence_encoder(s_n, d_n)

        # Per-side channel projections: batching both sides through one
        # stacked (2B, …) call measured SLOWER on v5e (36.4k vs 45.9k
        # edges/s) — the four doubled concats (incl. the (2B, L, De) feature
        # array) relayout-copy more than the halved dispatch count saves,
        # the same failure mode as the measured-negative pos/neg call fusion
        # (docs/performance.md). encode_pairs avoids the concats entirely.
        def channels(nbrs, ntime, nfeat, cooc):
            return (
                self.proj_node(self._patches(self._node_feats(node_x, nbrs))),
                self.proj_edge(self._patches(nfeat)),
                self.proj_time(self._patches(self._time_feats(nbrs, ntime, edge_time))),
                self.proj_cooc(self._patches(cooc)),
            )

        s_ch = channels(s_n, s_t, s_e, s_cooc)
        d_ch = channels(d_n, d_t, d_e, d_cooc)

        P = self.num_patches
        joined = [jnp.concatenate([s, d], axis=1) for s, d in zip(s_ch, d_ch)]
        patches = jnp.stack(joined, axis=2).reshape(
            B, 2 * P, self.num_channels * self.channel_embedding_dim
        )

        patches = self._run_stack(patches, deterministic, pallas_layers)

        src_repr = jnp.mean(patches[:, :P, :], axis=1)
        dst_repr = jnp.mean(patches[:, P:, :], axis=1)
        return self.output_layer(src_repr), self.output_layer(dst_repr)

    def _run_stack(self, patches, deterministic, pallas_layers):
        """Transformer stack: flax loop, or the fused Pallas forward kernel
        (ops/pallas/dyg_transformer.py — whole stack in VMEM; measured 1.38x
        vs the XLA stack at (200, 64, 200) on v5e). Forward-only (pallas_call
        has no VJP) — eval paths pass ``pallas_layers`` built once per epoch
        by ``dygformer_pallas_layers``."""
        if pallas_layers is None:
            for tr in self.transformers:
                patches = tr(patches, deterministic=deterministic)
            return patches
        from tgm_tpu.ops.pallas.dyg_transformer import transformer_stack_fwd

        B = patches.shape[0]
        block_b = next(g for g in (8, 4, 2, 1) if B % g == 0)
        out = transformer_stack_fwd(
            patches.astype(jnp.float32), pallas_layers,
            num_heads=self.num_heads, block_b=block_b,
            interpret=jax.default_backend() == "cpu",
        )
        return out.astype(patches.dtype)

    def encode_pairs(
        self,
        node_x: jnp.ndarray,  # (num_nodes, d_N)
        edge_src: jnp.ndarray,  # (B,)
        edge_dst: jnp.ndarray,  # (B,)
        neg: jnp.ndarray,  # (B,)
        edge_time: jnp.ndarray,  # (B,)
        neighbours: jnp.ndarray,  # (3B, K) [src; dst; neg] rows from the hook
        neighbours_time: jnp.ndarray,  # (3B, K)
        neighbours_edge_feat: jnp.ndarray,  # (3B, K, d_E)
        deterministic: bool = True,
        pallas_layers: Optional[Sequence[Dict[str, jnp.ndarray]]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One forward for BOTH training pairs: (src, dst) and (src, neg).

        Mathematically identical to two ``__call__`` invocations (the
        reference example's pos/neg calls — both use the positive edge's
        timestamp for the negative side, /root/reference/examples/
        linkproppred/dygformer.py), but the src node/edge/time channels are
        projected ONCE, the hook's stacked (3B, K[, d_E]) arrays feed the
        projections without any slicing/concat of raw features, and the
        transformer stack runs as a single (2B, 2P, D) dispatch.

        Returns ``(z_src, z_dst, z_src2, z_neg)`` where ``z_src``/``z_src2``
        are the src embeddings from the positive/negative pair (they differ:
        the co-occurrence channel depends on the paired sequence).
        """
        B = edge_src.shape[0]
        seeds = jnp.concatenate([edge_src, edge_dst, neg])
        seed_times = jnp.concatenate([edge_time, edge_time, edge_time])

        seq_n, seq_t, seq_e = self._side(
            seeds, seed_times, neighbours, neighbours_time, neighbours_edge_feat
        )

        # Shared channels over all 3B sequences (src projected once).
        ch_node = self.proj_node(self._patches(self._node_feats(node_x, seq_n)))
        ch_edge = self.proj_edge(self._patches(seq_e))
        ch_time = self.proj_time(
            self._patches(self._time_feats(seq_n, seq_t, seed_times))
        )

        # Pair-dependent co-occurrence channel: left = src (twice),
        # right = [dst; neg]. The inputs are (2B, L) int sequences — cheap.
        s_n = seq_n[:B]
        left_cooc, right_cooc = self.co_occurrence_encoder(
            jnp.concatenate([s_n, s_n]), seq_n[B:]
        )
        left_cooc = self.proj_cooc(self._patches(left_cooc))  # (2B, P, C)
        right_cooc = self.proj_cooc(self._patches(right_cooc))

        # Join per pair: rows [0:B] = positive pair, [B:2B] = negative pair.
        def pair_join(ch):  # (3B, P, C) -> (2B, 2P, C)
            left = jnp.concatenate([ch[:B], ch[:B]])
            return jnp.concatenate([left, ch[B:]], axis=1)

        joined = [
            pair_join(ch_node),
            pair_join(ch_edge),
            pair_join(ch_time),
            jnp.concatenate([left_cooc, right_cooc], axis=1),
        ]
        P = self.num_patches
        patches = jnp.stack(joined, axis=2).reshape(
            2 * B, 2 * P, self.num_channels * self.channel_embedding_dim
        )

        patches = self._run_stack(patches, deterministic, pallas_layers)

        left_repr = jnp.mean(patches[:, :P, :], axis=1)
        right_repr = jnp.mean(patches[:, P:, :], axis=1)
        out = self.output_layer(jnp.concatenate([left_repr, right_repr]))
        z_src, z_src2 = out[:B], out[B : 2 * B]
        z_dst, z_neg = out[2 * B : 3 * B], out[3 * B :]
        return z_src, z_dst, z_src2, z_neg


def dygformer_pallas_layers(enc_params, num_layers: int):
    """Convert a DyGFormer param tree's transformer subtrees to the fused
    Pallas kernel's flat per-layer dicts (ops/pallas/dyg_transformer.py).

    Epoch-invariant at eval (params frozen), so eval paths build this ONCE
    outside the scan and close over it — the same policy as the eval
    closure-constant tables (docs/performance.md). Requires the flax-MHA
    attention layout (``fused_attn=False``) and f32 LayerNorms
    (``bf16_stream=False``); both are the measured-winner defaults.
    """
    from tgm_tpu.ops.pallas.dyg_transformer import convert_flax_layer

    p = enc_params["params"]
    layers = []
    for i in range(num_layers):
        sub = p[f"transformers_{i}"]
        if "MultiHeadDotProductAttention_0" not in sub:
            raise ValueError(
                "pallas stack needs the flax-MHA layout (fused_attn=False, "
                "bf16_stream=False)"
            )
        layers.append(convert_flax_layer(sub))
    return layers
