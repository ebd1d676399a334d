"""ROLAND: snapshot GNN with per-layer embedding-update mechanisms.

Parity: reference ``ROLAND`` (/root/reference/tgm/nn/encoder/roland.py:24-151):
two GCNConv layers with ReLU+dropout; after each layer the embedding is merged
with the previous snapshot's embedding via one of {moving, learnable tau, gru,
mlp, fixed tau}; merged embeddings are detached (no BPTT across snapshots) and
returned as the carried state. Functional: previous embeddings are passed in
and the new pair returned (no hidden module state).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..modules.graph_conv import GCNConv


class ROLAND(nn.Module):
    input_channel: int
    out_channel: int
    num_nodes: int
    dropout: float = 0.0
    update: Optional[str] = "learnable"
    tau0: float = 0.5

    def setup(self) -> None:
        if self.update not in ("moving", "learnable", "gru", "mlp", None):
            raise ValueError(f"Unknown update mechanism: {self.update}")
        self.conv1 = GCNConv(self.out_channel)
        self.conv2 = GCNConv(self.out_channel)
        if self.update == "learnable":
            self.tau = self.param("tau", nn.initializers.zeros, (1,))
        elif self.update == "gru":
            self.gru1 = nn.GRUCell(features=self.out_channel)
            self.gru2 = nn.GRUCell(features=self.out_channel)
        elif self.update == "mlp":
            self.mlp1 = nn.Dense(self.out_channel)
            self.mlp2 = nn.Dense(self.out_channel)
        self.drop = nn.Dropout(self.dropout)

    def init_embeddings(self) -> List[jnp.ndarray]:
        z = jnp.zeros((self.num_nodes, self.out_channel))
        return [z, z]

    def _merge(self, layer: int, h: jnp.ndarray, prev: jnp.ndarray, tau) -> jnp.ndarray:
        if self.update == "gru":
            gru = self.gru1 if layer == 0 else self.gru2
            out, _ = gru(prev, h)
        elif self.update == "mlp":
            mlp = self.mlp1 if layer == 0 else self.mlp2
            out = mlp(jnp.concatenate([h, prev], axis=1))
        else:
            out = tau * prev + (1 - tau) * h
        return jax.lax.stop_gradient(out)

    def __call__(
        self,
        node_x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        previous_embeddings: Optional[List[jnp.ndarray]] = None,
        num_current_edges: Optional[jnp.ndarray] = None,
        num_previous_edges: Optional[jnp.ndarray] = None,
        edge_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Returns (embeddings, [H1, H2]) — embeddings are the 2nd layer output
        BEFORE the merge-detach (reference returns the merged pair and treats
        the last entry as the embeddings)."""
        if previous_embeddings is None:
            previous_embeddings = self.init_embeddings()

        if self.update == "moving" and num_current_edges is not None:
            tau = num_previous_edges / jnp.maximum(
                num_previous_edges + num_current_edges, 1
            )
        elif self.update == "learnable":
            tau = self.tau
        else:
            tau = jnp.asarray(self.tau0)

        h = self.conv1(node_x, edge_src, edge_dst, None, edge_valid)
        h = self.drop(nn.relu(h), deterministic=deterministic)
        h1 = self._merge(0, h, previous_embeddings[0], tau)

        h = self.conv2(h1, edge_src, edge_dst, None, edge_valid)
        h = self.drop(nn.relu(h), deterministic=deterministic)
        h2 = self._merge(1, h, previous_embeddings[1], tau)

        return h2, [h1, h2]
