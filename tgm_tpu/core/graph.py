"""Immutable dynamic-graph view over a storage backend.

Parity: reference ``DGraph`` (/root/reference/tgm/core/graph.py:20-421) —
slicing by event index (``slice_events``) or timestamp (``slice_time``,
end-exclusive), ``materialize()`` into a ``DGBatch``, cached slice properties
(num_nodes = max id in slice + 1, edge/node arrays, feature dims), and
``_from_storage`` views sharing one storage.

TPU-first design: array properties are host numpy (cheap, sliceable);
``materialize`` uploads to device as jnp arrays and supports **padding to a
static width** so the result is jit/scan-compatible. There is no ``.to(device)``
dance — JAX owns placement; ``to()`` is kept as a no-op-ish shim for API
compatibility.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import PADDED_NODE_ID
from ..timedelta import TimeDeltaDG
from ..util.logging import _get_logger, log_latency
from ._storage import DGSliceTracker, DGStorage, DGStorageBase
from .batch import DGBatch

logger = _get_logger(__name__)


def _pad_1d(x: np.ndarray, width: Optional[int], fill) -> Tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    if width is None or width == n:
        return x, np.ones(n, dtype=bool)
    if width < n:
        raise ValueError(f"pad width {width} < actual size {n}")
    out = np.full((width,) + x.shape[1:], fill, dtype=x.dtype)
    out[:n] = x
    valid = np.zeros(width, dtype=bool)
    valid[:n] = True
    return out, valid


class DGraph:
    """A sliceable, immutable view of a temporal graph."""

    def __init__(self, data: "DGData", device: Any = None) -> None:
        from ..data.dg_data import DGData

        if not isinstance(data, DGData):
            raise TypeError(f"DGraph must be initialized with DGData, got {type(data)}")
        self._time_delta = data.time_delta
        self._storage: DGStorageBase = DGStorage(data)
        self._device = device
        self._slice = DGSliceTracker()

    # ------------------------------------------------------------------ #
    # Slicing
    # ------------------------------------------------------------------ #
    def slice_events(self, start_idx: Optional[int] = None, end_idx: Optional[int] = None) -> "DGraph":
        """View restricted to global event indices [start_idx, end_idx)."""
        if start_idx is not None and end_idx is not None and start_idx > end_idx:
            raise ValueError(f"start_idx ({start_idx}) must be <= end_idx ({end_idx})")
        s = self._slice
        new = dataclasses.replace(
            s,
            start_idx=_maybe_max(start_idx, s.start_idx),
            end_idx=_maybe_min(end_idx, s.end_idx),
        )
        return DGraph._from_storage(self._storage, self._time_delta, self._device, new)

    def slice_time(self, start_time: Optional[int] = None, end_time: Optional[int] = None) -> "DGraph":
        """View restricted to timestamps [start_time, end_time)."""
        if start_time is not None and end_time is not None and start_time > end_time:
            raise ValueError(f"start_time ({start_time}) must be <= end_time ({end_time})")
        if end_time is not None:
            end_time -= 1  # storage bounds are inclusive
        s = self._slice
        new = dataclasses.replace(
            s,
            start_time=_maybe_max(start_time, s.start_time),
            end_time=_maybe_min(end_time, s.end_time),
        )
        return DGraph._from_storage(self._storage, self._time_delta, self._device, new)

    # ------------------------------------------------------------------ #
    # Materialization
    # ------------------------------------------------------------------ #
    @log_latency
    def materialize(
        self,
        materialize_features: bool = True,
        pad_edges_to: Optional[int] = None,
        pad_node_x_to: Optional[int] = None,
        pad_node_y_to: Optional[int] = None,
    ) -> DGBatch:
        """Materialize this slice into a device-resident ``DGBatch``.

        With ``pad_*_to`` widths the batch has static shapes (padded slots are
        ``PADDED_NODE_ID`` / 0 with validity masks) and can flow through jit.
        """
        src, dst, time = self._storage.get_edges(self._slice)
        n_real = len(src)
        src, _ = _pad_1d(src, pad_edges_to, PADDED_NODE_ID)
        dst, _ = _pad_1d(dst, pad_edges_to, PADDED_NODE_ID)
        time, edge_valid = _pad_1d(time.astype(np.int32), pad_edges_to, 0)

        batch = DGBatch(
            edge_src=jnp.asarray(src, dtype=jnp.int32),
            edge_dst=jnp.asarray(dst, dtype=jnp.int32),
            edge_time=jnp.asarray(time, dtype=jnp.int32),
            edge_valid=jnp.asarray(edge_valid),
        )
        # Global edge ids (-1 on padding): this slice's rows offset by the
        # split's position in the pre-split dataset, for eid-mode consumers.
        rows = self._storage.get_edge_rows(self._slice)
        if rows is not None:
            base = rows.start + int(
                getattr(self._storage._data, "edge_global_offset", 0)
            )
            ids = np.full(len(src), -1, np.int32)
            ids[:n_real] = base + np.arange(n_real, dtype=np.int32)
            batch.edge_ids = jnp.asarray(ids)

        if materialize_features:
            node_x = self._storage.get_node_x(self._slice)
            if node_x is not None:
                t, nids, feats = node_x
                t, _ = _pad_1d(t.astype(np.int32), pad_node_x_to, 0)
                nids, valid = _pad_1d(nids, pad_node_x_to, PADDED_NODE_ID)
                feats, _ = _pad_1d(feats, pad_node_x_to, 0.0)
                batch.node_x_time = jnp.asarray(t, dtype=jnp.int32)
                batch.node_x_nids = jnp.asarray(nids, dtype=jnp.int32)
                batch.node_x = jnp.asarray(feats)
                batch.node_x_valid = jnp.asarray(valid)

            if self.edge_x_dim is not None:
                ex = self._storage.get_edge_x(self._slice)
                ex, _ = _pad_1d(ex, pad_edges_to, 0.0)
                batch.edge_x = jnp.asarray(ex)

            node_y = self._storage.get_node_y(self._slice)
            if node_y is not None:
                t, nids, labels = node_y
                t, _ = _pad_1d(t.astype(np.int32), pad_node_y_to, 0)
                nids, valid = _pad_1d(nids, pad_node_y_to, PADDED_NODE_ID)
                labels, _ = _pad_1d(labels, pad_node_y_to, 0.0)
                batch.node_y_time = jnp.asarray(t, dtype=jnp.int32)
                batch.node_y_nids = jnp.asarray(nids, dtype=jnp.int32)
                batch.node_y = jnp.asarray(labels)
                batch.node_y_valid = jnp.asarray(valid)

        if self._storage.get_edge_type(self._slice) is not None:
            et = self._storage.get_edge_type(self._slice)
            et, _ = _pad_1d(et, pad_edges_to, 0)
            batch.edge_type = jnp.asarray(et, dtype=jnp.int32)
        return batch

    # ------------------------------------------------------------------ #
    # Properties
    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        return self.num_timestamps

    def __str__(self) -> str:
        return (
            f"DGraph(storage={type(self._storage).__name__}, "
            f"time_delta={self._time_delta}, slice={self._slice})"
        )

    @property
    def device(self) -> Any:
        return self._device

    @property
    def time_delta(self) -> TimeDeltaDG:
        return self._time_delta  # type: ignore[return-value]

    def to(self, device: Any) -> "DGraph":
        """Placement shim: JAX manages devices; returns a view tagged with ``device``."""
        return DGraph._from_storage(self._storage, self._time_delta, device, self._slice)

    @cached_property
    def start_time(self) -> Optional[int]:
        return self._storage.get_start_time(self._slice)

    @cached_property
    def end_time(self) -> Optional[int]:
        return self._storage.get_end_time(self._slice)

    @cached_property
    def num_nodes(self) -> int:
        nodes = self._storage.get_nodes(self._slice)
        return max(nodes) + 1 if nodes else 0

    @cached_property
    def num_node_events(self) -> int:
        return len(self._storage.get_node_events(self._slice)[0])

    @cached_property
    def num_node_labels(self) -> int:
        return len(self._storage.get_node_labels(self._slice)[0])

    @cached_property
    def num_edge_events(self) -> int:
        return len(self._storage.get_edges(self._slice)[0])

    @cached_property
    def num_timestamps(self) -> int:
        return self._storage.get_num_timestamps(self._slice)

    @cached_property
    def num_events(self) -> int:
        return self._storage.get_num_events(self._slice)

    @cached_property
    def _edges(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._storage.get_edges(self._slice)

    @property
    def edge_src(self) -> np.ndarray:
        return self._edges[0]

    @property
    def edge_dst(self) -> np.ndarray:
        return self._edges[1]

    @property
    def edge_time(self) -> np.ndarray:
        return self._edges[2]

    @cached_property
    def edge_x(self) -> Optional[np.ndarray]:
        return self._storage.get_edge_x(self._slice)

    @cached_property
    def edge_type(self) -> Optional[np.ndarray]:
        return self._storage.get_edge_type(self._slice)

    @cached_property
    def _node_events(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._storage.get_node_events(self._slice)

    @property
    def node_x_nids(self) -> np.ndarray:
        return self._node_events[0]

    @property
    def node_x_time(self) -> np.ndarray:
        return self._node_events[1]

    @cached_property
    def node_x(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Dynamic node features in the slice as a (time, nids, feats) COO triplet."""
        return self._storage.get_node_x(self._slice)

    @cached_property
    def _node_labels(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._storage.get_node_labels(self._slice)

    @property
    def node_y_nids(self) -> np.ndarray:
        return self._node_labels[0]

    @property
    def node_y_time(self) -> np.ndarray:
        return self._node_labels[1]

    @cached_property
    def node_y(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Node labels in the slice as a (time, nids, labels) COO triplet."""
        return self._storage.get_node_y(self._slice)

    @cached_property
    def static_node_x(self) -> Optional[np.ndarray]:
        return self._storage.get_static_node_x()

    @cached_property
    def node_type(self) -> Optional[np.ndarray]:
        return self._storage.get_node_type()

    @cached_property
    def static_node_x_dim(self) -> Optional[int]:
        return self._storage.get_static_node_x_dim()

    @cached_property
    def node_x_dim(self) -> Optional[int]:
        return self._storage.get_node_x_dim()

    @cached_property
    def node_y_dim(self) -> Optional[int]:
        return self._storage.get_node_y_dim()

    @cached_property
    def edge_x_dim(self) -> Optional[int]:
        return self._storage.get_edge_x_dim()

    @classmethod
    def _from_storage(
        cls,
        storage: DGStorageBase,
        time_delta: TimeDeltaDG,
        device: Any,
        slice: DGSliceTracker,
    ) -> "DGraph":
        obj = cls.__new__(cls)
        obj._storage = storage
        obj._time_delta = time_delta
        obj._device = device
        obj._slice = slice
        return obj


def _maybe_max(a: Optional[int], b: Optional[int]) -> Optional[int]:
    if a is not None and b is not None:
        return max(a, b)
    return a if b is None else b


def _maybe_min(a: Optional[int], b: Optional[int]) -> Optional[int]:
    if a is not None and b is not None:
        return min(a, b)
    return a if b is None else b
