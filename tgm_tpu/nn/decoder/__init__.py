from .decoders import GraphPredictor, LinkPredictor, NodePredictor

__all__ = ["GraphPredictor", "LinkPredictor", "NodePredictor"]
