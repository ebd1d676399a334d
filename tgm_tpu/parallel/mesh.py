"""Device mesh construction (ICI/DCN aware).

The reference has no distributed backend at all (SURVEY.md §2.2); this module
is the foundation of the new SPMD layer: a named mesh over the available
chips, with helpers for single-process virtual meshes (tests) and multi-host
initialization (pods).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime init (no-op if already initialized or single-host)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; defaults to a 1-D 'data' mesh over all local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    total = int(np.prod(axis_sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def data_model_mesh(data: int, model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh — data-parallel outer, model-parallel inner so
    model collectives ride the fastest ICI links."""
    return make_mesh([data, model], ("data", "model"), devices)
