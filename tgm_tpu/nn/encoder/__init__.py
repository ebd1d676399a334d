from .tgat import TGAT, MergeLayer

__all__ = ["TGAT", "MergeLayer"]
