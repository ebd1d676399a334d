from .recency_select import recency_window_select

__all__ = ["recency_window_select"]
