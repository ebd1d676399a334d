"""Device placement hooks.

Parity: reference ``PinMemoryHook``/``DeviceTransferHook``
(/root/reference/tgm/hooks/device.py:17-74). In the JAX runtime batches are
materialized directly onto the accelerator (``DGraph.materialize`` produces
device arrays), so the CUDA-style pin+async-copy pipeline is unnecessary.
These hooks are kept for API compatibility: ``DeviceTransferHook`` performs a
``jax.device_put`` of the batch pytree onto an explicit device (or a sharding),
and ``PinMemoryHook`` is a documented no-op.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax

from ..core.batch import DGBatch
from ..core.graph import DGraph
from .base import StatelessHook
from .registry import hook


@hook
class PinMemoryHook(StatelessHook):
    """No-op under JAX: host buffers are managed by the runtime."""

    _cls_requires: set = set()
    _cls_produces: set = set()

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        return state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        return batch


@hook
class DeviceTransferHook(StatelessHook):
    """Place every array in the batch on ``device`` (a jax.Device or Sharding)."""

    _cls_requires: set = set()
    _cls_produces: set = set()

    def __init__(self, device: Optional[Any] = None, id: Optional[str] = None) -> None:
        super().__init__(id=id)
        self.device = device

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        return state, self._put(batch)

    def _put(self, batch: DGBatch) -> DGBatch:
        if self.device is None:
            return batch
        return jax.device_put(batch, self.device)

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        return self._put(batch)
