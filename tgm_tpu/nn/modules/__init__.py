from .aggregation import (
    Aggregator,
    ConcatMerge,
    LearnableSumMerge,
    MeanEmbdPooling,
    SumEmbdPooling,
)
from .attention import TemporalAttention
from .edgebank import EdgeBankPredictor
from .mlp_mixer import FeedForwardNet, MLPMixer
from .time_encoding import Time2Vec

__all__ = [
    "Aggregator",
    "ConcatMerge",
    "EdgeBankPredictor",
    "FeedForwardNet",
    "LearnableSumMerge",
    "MLPMixer",
    "MeanEmbdPooling",
    "SumEmbdPooling",
    "TemporalAttention",
    "Time2Vec",
]
