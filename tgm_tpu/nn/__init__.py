from .base import EncoderModule
from . import decoder, encoder, modules
from .decoder import GraphPredictor, LinkPredictor, NodePredictor
from .encoder import GCN, GCLSTM, ROLAND, TGAT, TGCN, TGNMemory
from .modules import (
    Aggregator,
    ConcatMerge,
    EdgeBankPredictor,
    FeedForwardNet,
    LearnableSumMerge,
    MLPMixer,
    MeanEmbdPooling,
    SumEmbdPooling,
    TemporalAttention,
    Time2Vec,
)

__all__ = [
    "Aggregator",
    "ConcatMerge",
    "GCN",
    "GCLSTM",
    "ROLAND",
    "TGCN",
    "TGNMemory",
    "EdgeBankPredictor",
    "EncoderModule",
    "FeedForwardNet",
    "GraphPredictor",
    "LearnableSumMerge",
    "LinkPredictor",
    "MLPMixer",
    "MeanEmbdPooling",
    "NodePredictor",
    "SumEmbdPooling",
    "TGAT",
    "TemporalAttention",
    "Time2Vec",
    "decoder",
    "encoder",
    "modules",
]
