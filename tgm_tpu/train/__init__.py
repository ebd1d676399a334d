from .checkpoint import CheckpointManager, restore_checkpoint, save_checkpoint
from .chunked import ChunkedEdgeStream, chunked_hook_epoch
from .epoch import jit_scan_epoch, scan_epoch
from .hook_pipeline import scanned_hook_epoch
from .stream import DeviceEdgeStream, DeviceEventStream
from .tgat_pipeline import TGATCarry, TGATPipeline
from .tgn_pipeline import TGNCarry, TGNPipeline
from .tncn_pipeline import tncn_train_scores_occurrence

__all__ = [
    "CheckpointManager",
    "ChunkedEdgeStream",
    "chunked_hook_epoch",
    "DeviceEdgeStream",
    "DeviceEventStream",
    "TGATCarry",
    "TGATPipeline",
    "TGNCarry",
    "TGNPipeline",
    "jit_scan_epoch",
    "restore_checkpoint",
    "save_checkpoint",
    "scan_epoch",
    "scanned_hook_epoch",
    "tncn_train_scores_occurrence",
]
