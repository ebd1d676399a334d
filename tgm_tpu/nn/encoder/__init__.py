from .gcn import GCN
from .gclstm import GCLSTM
from .roland import ROLAND
from .tgat import TGAT, MergeLayer
from .tgcn import TGCN
from .tgn import GraphAttentionEmbedding, TGNMemory, TGNMemoryState, tgn_init_state, tgn_store_messages

__all__ = [
    "GCN",
    "GCLSTM",
    "GraphAttentionEmbedding",
    "MergeLayer",
    "ROLAND",
    "TGAT",
    "TGCN",
    "TGNMemory",
    "TGNMemoryState",
    "tgn_init_state",
    "tgn_store_messages",
]
