"""Time-gap neighbor aggregation hook (GraphMixer node encoder).

Parity: reference ``GraphMixerHook``
(/root/reference/examples/linkproppred/graphmixer.py:229-258): for every seed
node it collects the neighbors appearing in the last ``time_gap`` EVENTS
strictly before the batch — window = events with (split-local) index in
``[batch_end_idx - time_gap, batch_end_idx)`` and ``time <= batch.min_time - 1``
— and the GraphMixer encoder means their (static) node features, weighted by
occurrence multiplicity, with zeros for seeds that have no window neighbors
(graphmixer.py:136-141). This hook produces that mean directly.

TPU-first: the reference builds Python ``defaultdict`` neighbor lists per
batch; here the window is a static-width ``dynamic_slice`` of the split's
device-resident edge arrays and the per-seed mean is two ``(S, G)``
equality-mask matmuls against the window endpoints' features — static shapes,
jit/scan-safe, MXU-friendly.

The hook is registered once per key (per split): the window index space is
split-local, exactly like the reference hook running on each split's own
``DGraph``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph
from .base import SeedableHook
from .registry import hook

_INT32_MAX = np.iinfo(np.int32).max


@hook
class TimeGapNeighborMeanHook(SeedableHook):
    """Mean static-node-features of each seed's last-``time_gap``-events
    neighbors (multiplicity-weighted; zero when the window has none).

    Produces ``time_gap_feat`` (S, d) and ``time_gap_count`` (S,) where S is
    the concatenation of the ``seed_nodes_keys`` batch attributes.
    """

    has_state = False
    _cls_requires = {"edge_src", "edge_dst", "edge_time", "edge_ids"}
    _cls_produces = {"time_gap_feat", "time_gap_count"}

    def __init__(
        self,
        edge_src_full: Any,
        edge_dst_full: Any,
        edge_time_full: Any,
        node_x: Any,
        time_gap: int,
        seed_nodes_keys: List[str],
        edge_id_base: int = 0,
        id: Optional[str] = None,
    ) -> None:
        """``edge_*_full`` are the SPLIT's own event arrays (split-local index
        space, like the reference hook's per-split ``dg``); ``edge_id_base``
        is the split's global edge-id offset (``DGData.edge_global_offset``)
        so global ``batch.edge_ids`` can be localized."""
        if time_gap < 1:
            raise ValueError(f"time_gap must be >= 1, got {time_gap}")
        super().__init__(seed_keys=list(seed_nodes_keys))
        G = int(time_gap)
        self._G = G
        self._base = int(edge_id_base)
        src = np.asarray(edge_src_full, np.int32)
        dst = np.asarray(edge_dst_full, np.int32)
        t = np.asarray(edge_time_full, np.int32)
        self._E = E = len(src)
        node_x = jnp.asarray(node_x)
        n = node_x.shape[0]
        # Pad with sentinel rows so any clipped window start in [0, E] slices
        # in bounds; sentinel src/dst = num_nodes never matches a real seed
        # and sentinel time = INT32_MAX fails the `< min_time` filter.
        pad = lambda a, fill: np.concatenate([a, np.full(G, fill, np.int32)])
        self._src = jnp.asarray(pad(src, n))
        self._dst = jnp.asarray(pad(dst, n))
        self._t = jnp.asarray(pad(t, _INT32_MAX))
        self._node_x = node_x

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        G = self._G
        B = batch.edge_src.shape[0]
        valid = (
            batch.edge_valid
            if batch.edge_valid is not None
            else jnp.ones(B, bool)
        )
        # Reference window end = the batch slice's end_idx = start + bsize,
        # UNCLAMPED past the split's last event (graph.slice_events keeps the
        # raw bound; rows past E are simply absent) — the sentinel padding
        # reproduces that. Row 0 is always real, so it anchors the start.
        end = batch.edge_ids[0] - self._base + B
        start = jnp.clip(end - G, 0, self._E)
        win_src = lax.dynamic_slice_in_dim(self._src, start, G)
        win_dst = lax.dynamic_slice_in_dim(self._dst, start, G)
        win_t = lax.dynamic_slice_in_dim(self._t, start, G)
        idx = start + jnp.arange(G, dtype=jnp.int32)
        min_t = jnp.min(jnp.where(valid, batch.edge_time, _INT32_MAX))
        win_valid = (idx < end) & (win_t <= min_t - 1)

        seeds = jnp.concatenate([getattr(batch, k) for k in self.seed_keys])
        # (S, G) occurrence masks: seed==src counts dst as neighbor and vice
        # versa (undirected, per-occurrence — graphmixer.py:249-252).
        m_s = ((seeds[:, None] == win_src[None, :]) & win_valid[None, :]).astype(
            jnp.float32
        )
        m_d = ((seeds[:, None] == win_dst[None, :]) & win_valid[None, :]).astype(
            jnp.float32
        )
        n = self._node_x.shape[0]
        f_dst = self._node_x[jnp.clip(win_dst, 0, n - 1)]
        f_src = self._node_x[jnp.clip(win_src, 0, n - 1)]
        sum_feat = m_s @ f_dst + m_d @ f_src
        count = m_s.sum(axis=1) + m_d.sum(axis=1)
        feat = sum_feat / jnp.maximum(count, 1.0)[:, None]
        self.add_batch_attribute(batch, "time_gap_feat", feat)
        self.add_batch_attribute(batch, "time_gap_count", count)
        return state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        _, batch = self.jit_apply(None, batch)
        return batch


__all__ = ["TimeGapNeighborMeanHook"]
