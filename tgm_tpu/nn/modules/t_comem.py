"""t-CoMem: popularity + co-occurrence memory baseline.

Parity: reference ``tCoMemPredictor``
(/root/reference/tgm/nn/modules/t_comem.py:8-216): per-source ring buffers of
the K most recent destinations/timestamps, global destination popularity, and
pair co-occurrence counts; score = sum over windowed recent neighbors of
exp-decayed sigmoid-popularity, plus ``w * c/(1+c)`` for the queried pair's
co-occurrence count.

The reference updates ring buffers with a Python loop per event; here the
buffer writes are the same vectorized sort + keep-last-K scatter used by the
recency hook. Co-occurrence counts live in a (src,dst)->count dict (host
baseline; bounded by observed pairs).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np


class tCoMemPredictor:
    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        ts: np.ndarray,
        num_nodes: int,
        k: int = 50,
        window_ratio: float = 0.15,
        co_occurrence_weight: float = 0.8,
    ) -> None:
        if not 0 < window_ratio <= 1.0:
            raise ValueError("Window ratio must be in (0, 1]")
        if not 0 < co_occurrence_weight <= 1.0:
            raise ValueError("Co-occurrence weight must be in (0, 1]")
        if k <= 0:
            raise ValueError("K must be positive")
        if num_nodes <= 0:
            raise ValueError("num_nodes must be positive")
        if k > num_nodes:
            raise ValueError("k must be smaller than num_nodes")
        src, dst, ts = map(np.asarray, (src, dst, ts))
        _check(src, dst, ts)

        self._window_ratio = window_ratio
        self._window_start = float(ts.min())
        self._window_end = float(ts.max())
        self._window_size = max(self._window_end - self._window_start, 1.0)

        self.num_nodes = num_nodes
        self.k = k
        self.recent_ts = np.full((num_nodes, k), -np.inf)
        self.recent_dst = np.full((num_nodes, k), -1, dtype=np.int64)
        self.recent_len = np.zeros(num_nodes, dtype=np.int64)
        self.recent_pos = np.zeros(num_nodes, dtype=np.int64)

        self.node_to_co_occurrence: Dict[int, Dict[int, int]] = defaultdict(dict)
        self.popularity = np.zeros(num_nodes)
        self.co_occurrence_weight = co_occurrence_weight

        self.update(src, dst, ts)

    # ------------------------------------------------------------------ #
    def update(self, src: np.ndarray, dst: np.ndarray, ts: np.ndarray) -> None:
        src, dst, ts = map(np.asarray, (src, dst, ts))
        _check(src, dst, ts)
        self._window_end = max(self._window_end, float(ts.max()))
        self._window_start = self._window_end - self._window_size

        # Vectorized ring-buffer writes: stable sort by (src, order), keep the
        # last k per source, scatter at the advancing write positions.
        order = np.lexsort((np.arange(len(src)), src))
        s, d, t = src[order], dst[order], ts[order]
        is_start = np.concatenate([[True], s[1:] != s[:-1]])
        group_start = np.maximum.accumulate(np.where(is_start, np.arange(len(s)), -1))
        pos_in_group = np.arange(len(s)) - group_start
        cnt = np.bincount(s, minlength=self.num_nodes)[s]
        keep = pos_in_group >= (cnt - self.k)
        ks, kd, kt = s[keep], d[keep], t[keep]
        # Reference semantics: every event advances the write cursor, so kept
        # event j (its in-group index) lands at (pos + j) % k and the cursor
        # ends at (pos + cnt) % k.
        w_idx = (self.recent_pos[ks] + pos_in_group[keep]) % self.k
        self.recent_ts[ks, w_idx] = kt
        self.recent_dst[ks, w_idx] = kd
        self.recent_pos = (self.recent_pos + np.bincount(s, minlength=self.num_nodes)) % self.k
        self.recent_len = np.minimum(self.recent_len + np.bincount(s, minlength=self.num_nodes), self.k)

        for s_, d_ in zip(src.tolist(), dst.tolist()):
            self.node_to_co_occurrence[s_][d_] = self.node_to_co_occurrence[s_].get(d_, 0) + 1
            self.node_to_co_occurrence[d_][s_] = self.node_to_co_occurrence[d_].get(s_, 0) + 1

        np.add.at(self.popularity, dst, 1.0)

    # ------------------------------------------------------------------ #
    def __call__(self, query_src: np.ndarray, query_dst: np.ndarray) -> np.ndarray:
        query_src = np.asarray(query_src)
        query_dst = np.asarray(query_dst)
        uniq, inv = np.unique(query_src, return_inverse=True)
        uniq = np.clip(uniq, 0, self.num_nodes - 1)

        ts_mat = self.recent_ts[uniq]
        nbr_mat = self.recent_dst[uniq]
        len_vec = self.recent_len[uniq]
        valid = np.arange(self.k)[None, :] < len_vec[:, None]
        in_window = (ts_mat >= self._window_start) & (ts_mat <= self._window_end)
        mask = valid & in_window

        ts_valid = np.where(mask, ts_mat, -np.inf)
        nbr_valid = np.where(mask, nbr_mat, 0)
        decay = np.exp(-(self._window_end - ts_valid) / self._window_size)
        pop = 1.0 / (1.0 + np.exp(-self.popularity[nbr_valid]))
        base = (np.where(mask, decay * pop, 0.0)).sum(axis=1)
        pred = base[inv]

        co = np.zeros(len(query_src))
        for i, (s_, d_) in enumerate(zip(query_src.tolist(), query_dst.tolist())):
            c = self.node_to_co_occurrence.get(s_, {}).get(d_, 0)
            co[i] = self.co_occurrence_weight * (c / (1 + c))
        return (pred + co).astype(np.float32)

    @property
    def window_start(self) -> float:
        return self._window_start

    @property
    def window_end(self) -> float:
        return self._window_end

    @property
    def window_ratio(self) -> float:
        return self._window_ratio

    @property
    def window_size(self) -> int:
        return int(self._window_end - self._window_start)


def _check(src, dst, ts) -> None:
    if not (len(src) == len(dst) == len(ts)):
        raise ValueError(f"mismatched shapes: {len(src)}, {len(dst)}, {len(ts)}")
    if len(src) == 0:
        raise ValueError("src, dst, ts must be non-empty")
