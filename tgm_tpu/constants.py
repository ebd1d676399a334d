"""Framework-wide constants.

Parity: mirrors the reference constant surface (/root/reference/tgm/constants.py:1-20)
with TPU-specific additions for static-shape padding.
"""

from typing import Final

# Sentinel id used to pad neighbor lists / invalid node slots.
PADDED_NODE_ID: Final[int] = -1

# Sentinel timestamp written into padded slots (reference uses 0; we keep 0 for
# buffer slots but use -1 for padded *event* slots so that masks can be derived
# from either ids or times).
PADDED_TIME: Final[int] = 0

# Recipe identifiers.
RECIPE_TGB_LINK_PRED: Final[str] = "tgb-link-pred"

# Metric names used by TGB-style evaluation.
METRIC_TGB_LINK_PRED: Final[str] = "mrr"
METRIC_TGB_NODE_PRED: Final[str] = "ndcg"

# Default top-k for NDCG node-property evaluation (TGB convention).
DEFAULT_NDCG_K: Final[int] = 10
