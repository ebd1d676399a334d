from .batch import DGBatch
from .graph import DGraph
from ._storage import (
    DGSliceTracker,
    DGStorage,
    DGStorageArrayBackend,
    DGStorageBackends,
    DGStorageBase,
    get_dg_storage_backend,
    set_dg_storage_backend,
)

__all__ = [
    "DGBatch",
    "DGraph",
    "DGSliceTracker",
    "DGStorage",
    "DGStorageArrayBackend",
    "DGStorageBackends",
    "DGStorageBase",
    "get_dg_storage_backend",
    "set_dg_storage_backend",
]
