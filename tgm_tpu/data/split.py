"""Temporal dataset split strategies.

Parity: reference split strategies (/root/reference/tgm/data/split.py:15-294) —
``TemporalSplit`` (absolute boundaries, [start, end) per split),
``TemporalRatioSplit`` (ratios of the time span), ``TGBSplit`` (official
per-split edge-time bounds, inclusive; node labels from ``edge_start - 1``).
Numpy implementation; splits share static features without copies.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import TYPE_CHECKING, Dict, Optional, Tuple

import numpy as np

from ..util.logging import _get_logger

if TYPE_CHECKING:  # pragma: no cover
    from .dg_data import DGData

logger = _get_logger(__name__)


class SplitStrategy(ABC):
    """Base class: defines how a ``DGData`` is divided into temporal subsets."""

    @abstractmethod
    def apply(self, data: "DGData") -> Tuple["DGData", ...]:
        raise NotImplementedError

    def _masked_copy(
        self,
        data: "DGData",
        edge_mask: np.ndarray,
        node_x_mask: Optional[np.ndarray] = None,
        node_y_mask: Optional[np.ndarray] = None,
    ) -> "DGData":
        from .dg_data import DGData

        edge_index = data.edge_index[edge_mask]
        edge_x = None if data.edge_x is None else data.edge_x[edge_mask]
        edge_type = None if data.edge_type is None else data.edge_type[edge_mask]
        edge_time = data.time[data.edge_mask[edge_mask]]

        kwargs = {}
        for prefix, mask in (("node_x", node_x_mask), ("node_y", node_y_mask)):
            nids = getattr(data, f"{prefix}_nids")
            if nids is None:
                continue
            if mask is None:
                mask = np.ones(nids.shape[0], dtype=bool)
            sel_nids = nids[mask]
            if sel_nids.size == 0:
                logger.warning("All %s events masked out; dropping from split", prefix)
                continue
            kwargs[f"{prefix}_nids"] = sel_nids
            kwargs[f"{prefix}_time"] = data.time[getattr(data, f"{prefix}_mask")[mask]]
            feats = getattr(data, prefix)
            if feats is not None:
                kwargs[prefix] = feats[mask]

        out = DGData.from_raw(
            time_delta=data.time_delta,
            edge_time=edge_time,
            edge_index=edge_index,
            edge_x=edge_x,
            static_node_x=data.static_node_x,  # shared, not cloned
            edge_type=edge_type,
            node_type=data.node_type,  # shared, not cloned
            **kwargs,
        )
        # Record where this split's edges live in the parent's row space (all
        # temporal splits select contiguous runs; anything else keeps 0).
        idx = np.flatnonzero(edge_mask)
        if idx.size and int(idx[-1]) - int(idx[0]) + 1 == idx.size:
            out.edge_global_offset = (
                int(getattr(data, "edge_global_offset", 0)) + int(idx[0])
            )
        return out


@dataclass
class TemporalSplit(SplitStrategy):
    """Absolute-time split: train (-inf, val_time), val [val_time, test_time), test [test_time, inf)."""

    val_time: int
    test_time: int

    def __post_init__(self) -> None:
        if not (0 <= self.val_time <= self.test_time):
            raise ValueError(
                f"Expected 0 <= val_time <= test_time, got {self.val_time}, {self.test_time}"
            )

    def apply(self, data: "DGData") -> Tuple["DGData", ...]:
        edge_times = data.edge_time
        node_x_times = data.node_x_time
        node_y_times = data.node_y_time

        ranges = {
            "train": (-np.inf, self.val_time),
            "val": (self.val_time, self.test_time),
            "test": (self.test_time, np.inf),
        }
        splits = []
        for name, (start, end) in ranges.items():
            edge_mask = (edge_times >= start) & (edge_times < end)
            if not edge_mask.any():
                logger.warning("No edges in %s split range [%s, %s)", name, start, end)
                continue
            nxm = None if node_x_times is None else (node_x_times >= start) & (node_x_times < end)
            nym = None if node_y_times is None else (node_y_times >= start) & (node_y_times < end)
            splits.append(self._masked_copy(data, edge_mask, nxm, nym))
        return tuple(splits)


@dataclass
class TemporalRatioSplit(SplitStrategy):
    """Ratio split over the total time span (default 0.7/0.15/0.15)."""

    train_ratio: float = 0.7
    val_ratio: float = 0.15
    test_ratio: float = 0.15

    def __post_init__(self) -> None:
        if min(self.train_ratio, self.val_ratio, self.test_ratio) < 0:
            raise ValueError("Ratios must all be non-negative")
        total = self.train_ratio + self.val_ratio + self.test_ratio
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"Ratios must sum to 1.0, got {total}")

    def apply(self, data: "DGData") -> Tuple["DGData", ...]:
        min_time, max_time = int(data.time[0]), int(data.time[-1])
        span = max_time - min_time + 1
        val_time = min_time + int(span * self.train_ratio)
        test_time = val_time + int(span * self.val_ratio)
        return TemporalSplit(val_time=val_time, test_time=test_time).apply(data)


@dataclass
class TGBSplit(SplitStrategy):
    """Official TGB split with inclusive per-split edge-time bounds."""

    split_bounds: Dict[str, Tuple[int, int]]

    def apply(self, data: "DGData") -> Tuple["DGData", "DGData", "DGData"]:
        edge_times = data.edge_time
        node_y_times = data.node_y_time
        splits = []
        for name in ("train", "val", "test"):
            start, end = self.split_bounds[name]
            edge_mask = (edge_times >= start) & (edge_times <= end)
            node_y_mask = None
            if node_y_times is not None and edge_mask.any():
                # TGB convention: labels attach to the window starting one tick
                # before the split's first edge (reference split.py:276-279).
                node_y_mask = (node_y_times >= (start - 1)) & (node_y_times < end)
            splits.append(self._masked_copy(data, edge_mask, None, node_y_mask))
        return tuple(splits)
