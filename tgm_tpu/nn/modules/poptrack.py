"""PopTrack: destination-popularity baseline.

Parity: reference ``PopTrackPredictor``
(/root/reference/tgm/nn/modules/poptrack.py:7-109): per-node popularity
counters incremented by destination occurrences with multiplicative decay per
update; prediction = popularity of the queried destination (source-agnostic).
Vectorized numpy (eval-only host baseline).
"""

from __future__ import annotations

import numpy as np


class PopTrackPredictor:
    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        ts: np.ndarray,
        num_nodes: int,
        k: int = 50,
        decay: float = 0.9,
    ) -> None:
        if k <= 0:
            raise ValueError("K must be positive")
        if decay <= 0 or decay > 1:
            raise ValueError("Decay must be in (0,1]")
        if num_nodes <= 0:
            raise ValueError("num_nodes must be set to the total number of nodes")
        if k > num_nodes:
            raise ValueError("k must be smaller than num_nodes")
        src, dst, ts = map(np.asarray, (src, dst, ts))
        _check(src, dst, ts)
        self.popularity = np.zeros(num_nodes, dtype=np.float64)
        self.k = k
        self.decay = decay
        self.update(src, dst, ts)

    def update(self, src: np.ndarray, dst: np.ndarray, ts: np.ndarray) -> None:
        src, dst, ts = map(np.asarray, (src, dst, ts))
        _check(src, dst, ts)
        np.add.at(self.popularity, dst, 1.0)
        self.popularity *= self.decay

    def __call__(self, query_src: np.ndarray, query_dst: np.ndarray) -> np.ndarray:
        return self.popularity[np.asarray(query_dst)].astype(np.float32)


def _check(src, dst, ts) -> None:
    if not (len(src) == len(dst) == len(ts)):
        raise ValueError(f"mismatched shapes: {len(src)}, {len(dst)}, {len(ts)}")
    if len(src) == 0:
        raise ValueError("src, dst, ts must be non-empty")
