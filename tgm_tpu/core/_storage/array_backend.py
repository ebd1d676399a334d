"""Array-backed storage engine.

Parity: reference ``DGStorageArrayBackend``
(/root/reference/tgm/core/_storage/backends/array_backend.py:15-321): shares
the ``DGData`` arrays without copying, resolves time slices by binary search
over the globally sorted timeline (with lb/ub memo caches), and serves
uniform temporal neighbor sampling.

TPU-first redesign of the hot paths:

* ``get_nbrs``: the reference scans all edges in Python per batch (quadratic
  per epoch, acknowledged at array_backend.py:129-131). Here we lazily build a
  **temporal CSR** — adjacency sorted by (node, time, event) with row
  pointers — once in O(E log E), then each query is a vectorized
  ``searchsorted`` over a collision-free int64 composite key plus a gather.
  The same CSR arrays are uploaded once to device for the jitted uniform
  sampler hook.
* Sampling keeps reference semantics: if a node has <= k candidate neighbors
  they are all returned left-aligned; otherwise k are drawn uniformly without
  replacement.
"""

from __future__ import annotations

from typing import Dict, Optional, Set, Tuple

import numpy as np

from ...constants import PADDED_NODE_ID
from ...util.logging import _get_logger
from .base import DGSliceTracker, DGStorageBase

logger = _get_logger(__name__)


class DGStorageArrayBackend(DGStorageBase):
    """The default (and only) storage backend: sorted host arrays."""

    def __init__(self, data: "DGData") -> None:
        self._data = data
        self._lb_cache: Dict[Optional[int], int] = {}
        self._ub_cache: Dict[Optional[int], int] = {}
        # Lazily-built temporal CSR, one per directedness flavor.
        self._csr: Dict[bool, Tuple[np.ndarray, ...]] = {}

    # ------------------------------------------------------------------ #
    # Slice resolution
    # ------------------------------------------------------------------ #
    def _bounds(self, slice: DGSliceTracker) -> Tuple[int, int]:
        ts = self._data.time
        if slice.start_time not in self._lb_cache:
            t = ts[0] if slice.start_time is None else slice.start_time
            self._lb_cache[slice.start_time] = int(np.searchsorted(ts, t, side="left"))
        if slice.end_time not in self._ub_cache:
            t = ts[-1] if slice.end_time is None else slice.end_time
            self._ub_cache[slice.end_time] = int(np.searchsorted(ts, t, side="right"))
        lb, ub = self._lb_cache[slice.start_time], self._ub_cache[slice.end_time]
        lo = slice.start_idx or 0
        hi = len(ts) if slice.end_idx is None else slice.end_idx
        clamp = lambda x: max(lo, min(hi, x))
        return clamp(lb), clamp(ub)

    def _edge_sel(self, slice: DGSliceTracker) -> np.ndarray:
        lb, ub = self._bounds(slice)
        em = self._data.edge_mask
        return slice_range(em, lb, ub)

    # ------------------------------------------------------------------ #
    # Queries
    # ------------------------------------------------------------------ #
    def get_start_time(self, slice: DGSliceTracker) -> Optional[int]:
        lb, ub = self._bounds(slice)
        return None if lb >= ub else int(self._data.time[lb])

    def get_end_time(self, slice: DGSliceTracker) -> Optional[int]:
        lb, ub = self._bounds(slice)
        return None if lb >= ub else int(self._data.time[ub - 1])

    def get_nodes(self, slice: DGSliceTracker) -> Set[int]:
        sel = self._edge_sel(slice)
        nodes: Set[int] = set(np.unique(self._data.edge_index[sel]).tolist())
        if self._data.node_x_mask is not None:
            lb, ub = self._bounds(slice)
            nsel = slice_range(self._data.node_x_mask, lb, ub)
            nodes.update(np.unique(self._data.node_x_nids[nsel]).tolist())
        return nodes

    def get_edges(self, slice: DGSliceTracker) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        sel = self._edge_sel(slice)
        edges = self._data.edge_index[sel]
        time = self._data.time[self._data.edge_mask[sel]]
        return edges[:, 0], edges[:, 1], time

    def get_edge_rows(self, slice: DGSliceTracker):
        return self._edge_sel(slice)

    def get_node_events(self, slice: DGSliceTracker) -> Tuple[np.ndarray, np.ndarray]:
        if self._data.node_x_mask is None:
            return np.empty(0, np.int32), np.empty(0, np.int64)
        lb, ub = self._bounds(slice)
        sel = slice_range(self._data.node_x_mask, lb, ub)
        return self._data.node_x_nids[sel], self._data.time[self._data.node_x_mask[sel]]

    def get_node_labels(self, slice: DGSliceTracker) -> Tuple[np.ndarray, np.ndarray]:
        if self._data.node_y_mask is None:
            return np.empty(0, np.int32), np.empty(0, np.int64)
        lb, ub = self._bounds(slice)
        sel = slice_range(self._data.node_y_mask, lb, ub)
        return self._data.node_y_nids[sel], self._data.time[self._data.node_y_mask[sel]]

    def get_num_timestamps(self, slice: DGSliceTracker) -> int:
        lb, ub = self._bounds(slice)
        return len(np.unique(self._data.time[lb:ub]))

    def get_num_events(self, slice: DGSliceTracker) -> int:
        lb, ub = self._bounds(slice)
        return ub - lb

    def get_node_x(self, slice: DGSliceTracker):
        if self._data.node_x_mask is None or self._data.node_x is None:
            return None
        lb, ub = self._bounds(slice)
        sel = slice_range(self._data.node_x_mask, lb, ub)
        return (
            self._data.time[self._data.node_x_mask[sel]],
            self._data.node_x_nids[sel],
            self._data.node_x[sel],
        )

    def get_node_y(self, slice: DGSliceTracker):
        if self._data.node_y_mask is None or self._data.node_y is None:
            return None
        lb, ub = self._bounds(slice)
        sel = slice_range(self._data.node_y_mask, lb, ub)
        return (
            self._data.time[self._data.node_y_mask[sel]],
            self._data.node_y_nids[sel],
            self._data.node_y[sel],
        )

    def get_edge_x(self, slice: DGSliceTracker) -> Optional[np.ndarray]:
        if self._data.edge_x is None:
            return None
        return self._data.edge_x[self._edge_sel(slice)]

    def get_edge_type(self, slice: DGSliceTracker) -> Optional[np.ndarray]:
        if self._data.edge_type is None:
            return None
        return self._data.edge_type[self._edge_sel(slice)]

    def get_static_node_x(self) -> Optional[np.ndarray]:
        return self._data.static_node_x

    def get_node_type(self) -> Optional[np.ndarray]:
        return self._data.node_type

    def get_node_x_dim(self) -> Optional[int]:
        return None if self._data.node_x is None else self._data.node_x.shape[1]

    def get_node_y_dim(self) -> Optional[int]:
        return None if self._data.node_y is None else self._data.node_y.shape[1]

    def get_edge_x_dim(self) -> Optional[int]:
        return None if self._data.edge_x is None else self._data.edge_x.shape[1]

    def get_static_node_x_dim(self) -> Optional[int]:
        return None if self._data.static_node_x is None else self._data.static_node_x.shape[1]

    # ------------------------------------------------------------------ #
    # Temporal CSR + uniform neighbor sampling
    # ------------------------------------------------------------------ #
    def temporal_csr(self, directed: bool) -> Tuple[np.ndarray, ...]:
        """(row_ptr, nbr_nids, nbr_times, nbr_eids, composite_key) sorted by (node, time, eid).

        ``composite_key = node * (max_time + 2) + time`` is collision-free in
        int64 (node, time both < 2^31) and lets slice queries use a single
        vectorized ``searchsorted``.
        """
        if directed not in self._csr:
            d = self._data
            src = d.edge_index[:, 0].astype(np.int64)
            dst = d.edge_index[:, 1].astype(np.int64)
            eid = np.arange(len(src), dtype=np.int64)
            t = d.time[d.edge_mask]
            if directed:
                nodes, nbrs, eids, times = src, dst, eid, t
            else:
                # Interleave the two directions in eid-major order so the
                # stable sort's implicit tiebreak equals edge-id order (the
                # reference emits neighbors in edge order).
                nodes = np.stack([src, dst], axis=1).ravel()
                nbrs = np.stack([dst, src], axis=1).ravel()
                eids = np.repeat(eid, 2)
                times = np.repeat(t, 2)
            # Stable (node, time) sort; original order is the tiebreak. The
            # native parallel radix path kicks in for large graphs.
            from ...native import lexsort2_perm

            order = lexsort2_perm(nodes, times)
            nodes, nbrs, eids, times = nodes[order], nbrs[order], eids[order], times[order]
            num_nodes = self._data.num_nodes
            row_ptr = np.searchsorted(nodes, np.arange(num_nodes + 1, dtype=np.int64))
            key_base = int(d.time.max()) + 2
            composite = nodes * key_base + times
            self._csr[directed] = (
                row_ptr.astype(np.int64),
                nbrs.astype(np.int32),
                times.astype(np.int64),
                eids.astype(np.int64),
                composite,
                np.int64(key_base),
            )
        return self._csr[directed]

    def get_nbrs(
        self,
        seed_nodes: np.ndarray,
        num_nbrs: int,
        slice: DGSliceTracker,
        directed: bool,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        seed_nodes = np.asarray(seed_nodes)
        row_ptr, nbrs, times, eids, composite, key_base = self.temporal_csr(directed)
        B = len(seed_nodes)
        D = self.get_edge_x_dim() or 0

        out_nids = np.full((B, num_nbrs), PADDED_NODE_ID, dtype=np.int32)
        out_times = np.zeros((B, num_nbrs), dtype=np.int64)
        out_feats = np.zeros((B, num_nbrs, D), dtype=np.float32)
        if B == 0:
            return out_nids, out_times, out_feats

        end_time = slice.end_time if slice.end_time is not None else int(self._data.time[-1])
        # The composite key packs (node, time) with base = max_time + 2; an
        # end_time beyond the graph's last event would spill into the next
        # node's key range, so clamp (semantically identical: "no bound").
        end_time = min(end_time, int(key_base) - 1)
        valid_seed = seed_nodes != PADDED_NODE_ID
        safe_seed = np.where(valid_seed, seed_nodes, 0).astype(np.int64)
        lo = row_ptr[safe_seed]
        hi = np.searchsorted(composite, safe_seed * key_base + end_time, side="right")
        cnt = np.where(valid_seed, np.maximum(hi - lo, 0), 0)

        k = np.minimum(cnt, num_nbrs)
        # Left-aligned positions 0..k-1 per seed; oversized rows get a uniform
        # without-replacement draw from their cnt candidates.
        cols = np.arange(num_nbrs)[None, :]
        take = cols < k[:, None]

        # Default: take the first k candidates (matches reference when cnt<=k).
        idx = lo[:, None] + cols
        over = cnt > num_nbrs
        if over.any():
            rng = np.random.default_rng()
            rows = np.nonzero(over)[0]
            for i in rows:  # only oversized seeds; each draw is O(k)
                choice = rng.choice(cnt[i], size=num_nbrs, replace=False)
                choice.sort()
                idx[i] = lo[i] + choice
        idx = np.where(take, np.minimum(idx, len(nbrs) - 1 if len(nbrs) else 0), 0)

        sel_nids = nbrs[idx]
        sel_times = times[idx]
        out_nids = np.where(take, sel_nids, PADDED_NODE_ID).astype(np.int32)
        out_times = np.where(take, sel_times, 0)
        if D:
            sel_feats = self._data.edge_x[eids[idx]]
            out_feats = np.where(take[:, :, None], sel_feats, 0.0).astype(np.float32)
        return out_nids, out_times, out_feats


def slice_range(sorted_idx: np.ndarray, lb: int, ub: int) -> slice:
    """Event masks are sorted, so a [lb, ub) timeline window maps to a
    contiguous range — binary search instead of a full boolean mask."""
    a = int(np.searchsorted(sorted_idx, lb, side="left"))
    b = int(np.searchsorted(sorted_idx, ub, side="left"))
    return slice(a, b)
