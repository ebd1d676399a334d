from .epoch import jit_scan_epoch, scan_epoch
from .stream import DeviceEdgeStream
from .tgn_pipeline import TGNCarry, TGNPipeline

__all__ = [
    "DeviceEdgeStream",
    "TGNCarry",
    "TGNPipeline",
    "jit_scan_epoch",
    "scan_epoch",
]
