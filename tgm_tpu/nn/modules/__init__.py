from .aggregation import (
    Aggregator,
    ConcatMerge,
    LearnableSumMerge,
    MeanEmbdPooling,
    SumEmbdPooling,
)
from .attention import TemporalAttention
from .edgebank import EdgeBankPredictor
from .graph_conv import ChebConv, GCNConv
from .mlp_mixer import FeedForwardNet, MLPMixer
from .poptrack import PopTrackPredictor
from .t_comem import tCoMemPredictor
from .gru import TorchGRUCell
from .time_encoding import Time2Vec

__all__ = [
    "tCoMemPredictor",
    "PopTrackPredictor",
    "GCNConv",
    "ChebConv",
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
    "TorchGRUCell",
]
