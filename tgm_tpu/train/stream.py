"""Device-resident event streams for fully-scanned epochs.

The reference iterates batches through a host-side DataLoader
(/root/reference/tgm/data/loader.py) with per-batch slicing. On TPU the hot
path wants the whole epoch under one ``lax.scan``: upload the split's event
arrays once, precompute per-batch window offsets on host, and slice each batch
on device with ``dynamic_slice`` — zero host↔device traffic per step
(SURVEY.md §7.1 "static shapes everywhere" + §7.3 item 6).

``DeviceEdgeStream`` serves uniform edge windows (link prediction);
``DeviceEventStream`` is built from a ``DGDataLoader`` plan and additionally
serves node-event / node-label windows (node & graph property prediction,
mirroring the reference's node batches — tgm/data/loader.py:158-170,
examples/nodeproppred/tgn.py:106-112).
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
    """Uploads a DGraph's edge events once; serves fixed-width batch windows.

    ``edge_id_base`` offsets the served ``edge_ids`` so multiple per-split
    streams can share one global edge-feature table (split-local ids indexing
    a different split's table gather the wrong features silently). It defaults
    to the split's recorded position in the pre-split dataset
    (``DGData.edge_global_offset``), so streams over ``data.split()`` results
    automatically emit ids into the FULL dataset's row space — pass the full
    ``edge_x`` as the consumer's feature table.
    """

    def __init__(self, dg: DGraph, batch_size: int, include_features: bool = True,
                 edge_id_base: Optional[int] = None):
        if edge_id_base is None:
            edge_id_base = int(getattr(dg._storage._data, "edge_global_offset", 0))
        self._edge_id_base = edge_id_base
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
        batch.edge_ids = jnp.where(
            valid, self._edge_id_base + start + jnp.arange(B, dtype=jnp.int32), -1
        )
        if self._edge_x is not None:
            batch.edge_x = jnp.where(
                valid[:, None], lax.dynamic_slice_in_dim(self._edge_x, start, B), 0.0
            )
        return batch


class DeviceEventStream:
    """Serve a ``DGDataLoader``'s batch plan fully on device.

    Each ``batch_at(i)`` reproduces what ``materialize`` + static padding
    would yield for batch ``i`` — edge window plus (when present) node-event
    and node-label windows — as one jittable ``dynamic_slice`` bundle, so the
    loader's event- or time-ordered plan can run under ``lax.scan``.
    """

    def __init__(self, loader, include_features: bool = True):
        plan = loader.plan()
        dg = loader.dgraph
        data = dg._storage._data
        self.num_batches = len(plan)
        self._plan = plan

        def pad_to(x, width, fill):
            out = np.full((len(x) + width,) + x.shape[1:], fill, x.dtype)
            out[: len(x)] = x
            return out

        W = plan.pad_edges
        self._We = W
        self._edge_id_base = int(getattr(data, "edge_global_offset", 0))
        src = data.edge_index[:, 0].astype(np.int32)
        dst = data.edge_index[:, 1].astype(np.int32)
        et = data.time[data.edge_mask].astype(np.int32)
        self._src = jnp.asarray(pad_to(src, W, PADDED_NODE_ID))
        self._dst = jnp.asarray(pad_to(dst, W, PADDED_NODE_ID))
        self._t = jnp.asarray(pad_to(et, W, 0))
        self._edge_x = (
            None
            if (data.edge_x is None or not include_features)
            else jnp.asarray(pad_to(data.edge_x, W, 0.0))
        )
        self._e_off = jnp.asarray(plan.edge_offsets.astype(np.int32))
        self._e_cnt = jnp.asarray(plan.edge_counts.astype(np.int32))

        self._nx = None
        if plan.node_x_offsets is not None and data.node_x_nids is not None:
            Wx = plan.pad_node_x
            self._nx = {
                "W": Wx,
                "nids": jnp.asarray(pad_to(data.node_x_nids.astype(np.int32), Wx, PADDED_NODE_ID)),
                "t": jnp.asarray(pad_to(data.time[data.node_x_mask].astype(np.int32), Wx, 0)),
                "x": jnp.asarray(pad_to(data.node_x, Wx, 0.0)),
                "off": jnp.asarray(plan.node_x_offsets.astype(np.int32)),
                "cnt": jnp.asarray(plan.node_x_counts.astype(np.int32)),
            }

        self._ny = None
        if plan.node_y_offsets is not None and data.node_y_nids is not None:
            Wy = plan.pad_node_y
            self._ny = {
                "W": Wy,
                "nids": jnp.asarray(pad_to(data.node_y_nids.astype(np.int32), Wy, PADDED_NODE_ID)),
                "t": jnp.asarray(pad_to(data.time[data.node_y_mask].astype(np.int32), Wy, 0)),
                "y": jnp.asarray(pad_to(data.node_y, Wy, 0.0)),
                "off": jnp.asarray(plan.node_y_offsets.astype(np.int32)),
                "cnt": jnp.asarray(plan.node_y_counts.astype(np.int32)),
            }

    @property
    def edge_x(self) -> Optional[jnp.ndarray]:
        return self._edge_x

    def batch_at(self, i: jnp.ndarray) -> DGBatch:
        W = self._We
        start = self._e_off[i]
        valid = jnp.arange(W) < self._e_cnt[i]
        sl = lambda a: lax.dynamic_slice_in_dim(a, start, W)
        batch = DGBatch(
            edge_src=jnp.where(valid, sl(self._src), PADDED_NODE_ID),
            edge_dst=jnp.where(valid, sl(self._dst), PADDED_NODE_ID),
            edge_time=jnp.where(valid, sl(self._t), 0),
            edge_valid=valid,
        )
        batch.edge_ids = jnp.where(
            valid, self._edge_id_base + start + jnp.arange(W, dtype=jnp.int32), -1
        )
        if self._edge_x is not None:
            batch.edge_x = jnp.where(
                valid[:, None], lax.dynamic_slice_in_dim(self._edge_x, start, W), 0.0
            )
        if self._nx is not None:
            nx = self._nx
            s = nx["off"][i]
            v = jnp.arange(nx["W"]) < nx["cnt"][i]
            slx = lambda a: lax.dynamic_slice_in_dim(a, s, nx["W"])
            batch.node_x_time = jnp.where(v, slx(nx["t"]), 0)
            batch.node_x_nids = jnp.where(v, slx(nx["nids"]), PADDED_NODE_ID)
            batch.node_x = jnp.where(v[:, None], slx(nx["x"]), 0.0)
            batch.node_x_valid = v
        if self._ny is not None:
            ny = self._ny
            s = ny["off"][i]
            v = jnp.arange(ny["W"]) < ny["cnt"][i]
            sly = lambda a: lax.dynamic_slice_in_dim(a, s, ny["W"])
            batch.node_y_time = jnp.where(v, sly(ny["t"]), 0)
            batch.node_y_nids = jnp.where(v, sly(ny["nids"]), PADDED_NODE_ID)
            batch.node_y = jnp.where(v[:, None], sly(ny["y"]), 0.0)
            batch.node_y_valid = v
        return batch
