"""Node appearance tracking.

Parity: reference ``EdgeEventsSeenNodesTrackHook``
(/root/reference/tgm/hooks/node_tracks.py:14-67): track which nodes have
appeared in past edge events; per batch, flag which node-label nodes were
already seen (used by DyGFormer/TPNet nodeproppred examples).

TPU-first: the seen set is a boolean state array ``(N+1,)`` (dump slot for
padded ids); outputs are fixed-shape masks over ``node_y_nids`` rather than
dynamically-sized index lists.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph
from .base import StatefulHook
from .registry import hook


@hook
class EdgeEventsSeenNodesTrackHook(StatefulHook):
    """Produce, per batch, the node-label nodes already seen in edge events."""

    _cls_requires = {"edge_src", "edge_dst"}
    _cls_produces = {"seen_nodes", "batch_nodes_mask"}

    def __init__(self, num_nodes: int, id: Optional[str] = None) -> None:
        super().__init__(id=id)
        if num_nodes < 0:
            raise ValueError("num_nodes must be non-negative")
        self._num_nodes = num_nodes
        self.state: Any = None

    def init_state(self, dg: Optional[DGraph] = None) -> Any:
        return jnp.zeros((self._num_nodes + 1,), dtype=bool)

    def reset_state(self) -> None:
        self.state = None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        seen = state
        n = self._num_nodes

        def rows(ids, valid):
            ok = (ids >= 0) & (ids < n)
            if valid is not None:
                ok &= valid
            return jnp.where(ok, ids, n)

        seen = seen.at[rows(batch.edge_src, batch.edge_valid)].set(True)
        seen = seen.at[rows(batch.edge_dst, batch.edge_valid)].set(True)
        seen = seen.at[n].set(False)

        if batch.node_y_nids is not None:
            ids = batch.node_y_nids
            ok = (ids >= 0) & (ids < n)
            if batch.node_y_valid is not None:
                ok &= batch.node_y_valid
            previously_seen = seen[jnp.where(ok, ids, n)] & ok
            seen_nodes = jnp.where(previously_seen, ids, PADDED_NODE_ID)
        else:
            previously_seen = jnp.zeros((0,), dtype=bool)
            seen_nodes = jnp.zeros((0,), dtype=jnp.int32)

        self.add_batch_attribute(batch, "batch_nodes_mask", previously_seen)
        self.add_batch_attribute(batch, "seen_nodes", seen_nodes)
        return seen, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch
