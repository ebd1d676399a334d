"""TGAT: Temporal Graph Attention Network.

Parity: reference ``TGAT``/``MergeLayer``
(/root/reference/tgm/nn/encoder/tgat.py:11-149): multi-layer temporal
attention over sampled k-hop neighborhoods using the dynamic-programming table
``z[layer][hop]``; each layer applies ``TemporalAttention`` then a
``MergeLayer`` (2-layer MLP merging with the hop's raw features); seeds encode
themselves with a zero time delta.

TPU note: every hop's tensors are fixed-shape (padded with PADDED_NODE_ID and
masked inside the attention), so the whole encoder is one XLA program of dense
(B, K, d) einsums on the MXU.
"""

from __future__ import annotations

from typing import List, Set

import jax.numpy as jnp
from flax import linen as nn

from ...constants import PADDED_NODE_ID
from ..modules.attention import TemporalAttention
from ..modules.time_encoding import Time2Vec


class MergeLayer(nn.Module):
    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim)(jnp.concatenate([x1, x2], axis=-1))
        return nn.Dense(self.output_dim)(nn.relu(h))


class TGAT(nn.Module):
    node_dim: int
    edge_dim: int
    time_dim: int
    embed_dim: int
    num_layers: int
    n_heads: int = 2
    dropout: float = 0.1
    # bf16 K/V attention path (see modules/attention.py:TemporalAttention).
    kv_bf16: bool = False
    # Score-tensor layout (see TemporalAttention.score_layout): "lanes" puts
    # the seed axis on the 128 VPU lanes for the mask/softmax chain.
    score_layout: str = "kmajor"

    # For HookManager.validate_requirement (EncoderModule protocol).
    requires: Set[str] = frozenset(
        {"seed_nids", "seed_times", "nbr_nids", "nbr_edge_x", "nbr_edge_time"}
    )

    def setup(self) -> None:
        self.time_encoder = Time2Vec(time_dim=self.time_dim)
        self.attn = [
            TemporalAttention(
                n_heads=self.n_heads,
                node_dim=self.node_dim if i == 0 else self.embed_dim,
                edge_dim=self.edge_dim,
                time_dim=self.time_dim,
                dropout=self.dropout,
                kv_bf16=self.kv_bf16,
                score_layout=self.score_layout,
            )
            for i in range(self.num_layers)
        ]
        self.merge_layers = [
            MergeLayer(hidden_dim=self.embed_dim, output_dim=self.embed_dim)
            for _ in range(self.num_layers)
        ]

    def __call__(
        self,
        node_x: jnp.ndarray,  # (num_nodes, node_dim)
        seed_nids: List[jnp.ndarray],  # per hop: (S_i,)
        seed_times: List[jnp.ndarray],  # per hop: (S_i,)
        nbr_nids: List[jnp.ndarray],  # per hop: (S_i, K_i)
        nbr_edge_x: List[jnp.ndarray],  # per hop: (S_i, K_i, edge_dim)
        nbr_edge_time: List[jnp.ndarray],  # per hop: (S_i, K_i)
        deterministic: bool = True,
        nbr_kv_x: "List[jnp.ndarray | None] | None" = None,  # per hop: (S_i, K_i, node_dim+edge_dim)
    ) -> jnp.ndarray:
        def feats(ids: jnp.ndarray) -> jnp.ndarray:
            # Torch-style negative indexing: PADDED_NODE_ID (-1) wraps to the
            # last row. Irrelevant when masked, but rows with zero valid
            # neighbors softmax uniformly over these values (reference
            # -1e10-fill behavior), so exact parity needs the same garbage.
            n = node_x.shape[0]
            safe = jnp.clip(jnp.where(ids < 0, ids + n, ids), 0, n - 1)
            return node_x[safe]

        def kv(i):
            return None if nbr_kv_x is None else nbr_kv_x[i]

        # z[j][i]: layer-j embedding of hop-i nodes.
        z: dict = {j: {} for j in range(self.num_layers + 1)}
        z[0][0] = feats(seed_nids[0])
        for i in range(1, self.num_layers + 1):
            if i == self.num_layers and kv(i - 1) is not None:
                # Deepest hop's node features arrive pre-concatenated with
                # the edge features (aug table, [node ‖ edge] — the only
                # consumer is the layer-1 attention K/V below); never gather
                # or slice them standalone.
                z[0][i] = None
            else:
                z[0][i] = feats(nbr_nids[i - 1].reshape(-1))

        for j in range(1, self.num_layers + 1):
            for i in range(self.num_layers - j + 1):
                num_nodes = z[j - 1][i].shape[0]
                num_nbr = nbr_nids[i].shape[-1]
                fused = j == 1 and kv(i) is not None
                out = self.attn[j - 1](
                    node_x=z[j - 1][i],
                    time_feat=self.time_encoder(jnp.zeros(num_nodes)),
                    edge_feat=None if fused else nbr_edge_x[i],
                    nbr_node_feat=(
                        None
                        if fused
                        else z[j - 1][i + 1].reshape(num_nodes, num_nbr, -1)
                    ),
                    nbr_time_feat=self.time_encoder(
                        seed_times[i][:, None] - nbr_edge_time[i]
                    ),
                    valid_nbr_mask=nbr_nids[i] != PADDED_NODE_ID,
                    deterministic=deterministic,
                    kv_node_edge_feat=kv(i) if fused else None,
                )
                z[j][i] = self.merge_layers[j - 1](out, z[0][i])

        return z[self.num_layers][0]
