"""tgm_tpu — a TPU-native framework for machine learning on temporal graphs.

Re-designs the capabilities of tgm-team/tgm (temporal graph storage, hook-based
batch enrichment, temporal-GNN encoders/decoders) around JAX/XLA/Pallas:
static-shape padded batches, functional hook state threaded through scans,
device-resident event arrays, and SPMD sharding over TPU meshes.
"""

from .constants import PADDED_NODE_ID
from .core.batch import DGBatch
from .core.graph import DGraph
from .data.dg_data import DGData
from .data.loader import DGDataLoader
from .timedelta import TGB_SEQ_TIME_DELTAS, TGB_TIME_DELTAS, TimeDeltaDG

from . import core, data, eval, hooks, native, nn, ops, parallel, train, util  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "DGBatch",
    "DGData",
    "DGDataLoader",
    "DGraph",
    "PADDED_NODE_ID",
    "TimeDeltaDG",
    "TGB_TIME_DELTAS",
    "TGB_SEQ_TIME_DELTAS",
]
