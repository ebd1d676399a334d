from .segment import (
    coo_spmm,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "coo_spmm",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_sum",
]
