"""Device-resident edge stream for fully-scanned epochs.

The reference iterates batches through a host-side DataLoader
(/root/reference/tgm/data/loader.py) with per-batch slicing. On TPU the hot
path wants the whole epoch under one ``lax.scan``: upload the split's edge
arrays once, precompute per-batch window offsets on host, and slice each batch
on device with ``dynamic_slice`` — zero host↔device traffic per step
(SURVEY.md §7.1 "static shapes everywhere" + §7.3 item 6).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph


class DeviceEdgeStream:
    """Uploads a DGraph's edge events once; serves fixed-width batch windows."""

    def __init__(self, dg: DGraph, batch_size: int, include_features: bool = True):
        src, dst, t = dg._storage.get_edges(dg._slice)
        E = len(src)
        self.num_edges = E
        self.batch_size = batch_size
        self.num_batches = max(1, math.ceil(E / batch_size))

        pad = self.num_batches * batch_size - E
        padi = lambda x, fill: np.concatenate([x, np.full(pad, fill, x.dtype)])
        self._src = jnp.asarray(padi(src.astype(np.int32), PADDED_NODE_ID))
        self._dst = jnp.asarray(padi(dst.astype(np.int32), PADDED_NODE_ID))
        self._t = jnp.asarray(padi(t.astype(np.int32), 0))

        self._edge_x: Optional[jnp.ndarray] = None
        self.edge_dim = 0
        if include_features:
            ex = dg._storage.get_edge_x(dg._slice)
            if ex is not None:
                self.edge_dim = ex.shape[1]
                exp = np.concatenate([ex, np.zeros((pad, ex.shape[1]), ex.dtype)])
                self._edge_x = jnp.asarray(exp)

        counts = np.full(self.num_batches, batch_size, np.int32)
        if pad:
            counts[-1] = batch_size - pad
        self._counts = jnp.asarray(counts)

    @property
    def edge_x(self) -> Optional[jnp.ndarray]:
        """The split's full device-resident edge feature array (padded)."""
        return self._edge_x

    def batch_at(self, i: jnp.ndarray) -> DGBatch:
        """Materialize batch ``i`` on device (traceable; ``i`` may be traced)."""
        B = self.batch_size
        start = i * B
        count = self._counts[i]
        valid = jnp.arange(B) < count
        sl = lambda a: lax.dynamic_slice_in_dim(a, start, B)
        batch = DGBatch(
            edge_src=jnp.where(valid, sl(self._src), PADDED_NODE_ID),
            edge_dst=jnp.where(valid, sl(self._dst), PADDED_NODE_ID),
            edge_time=jnp.where(valid, sl(self._t), 0),
            edge_valid=valid,
        )
        # Global edge ids of this window (-1 on padded rows): lets consumers
        # reference rows of split-wide static arrays (e.g. the eid-buffer
        # recency layout gathers features from edge_x by id at query time).
        batch.edge_ids = jnp.where(valid, start + jnp.arange(B, dtype=jnp.int32), -1)
        if self._edge_x is not None:
            batch.edge_x = jnp.where(
                valid[:, None], lax.dynamic_slice_in_dim(self._edge_x, start, B), 0.0
            )
        return batch
