"""Negative edge samplers.

Parity: reference negative hooks
(/root/reference/tgm/hooks/negatives/sampler.py:15-238,
 /root/reference/tgm/hooks/negatives/tgb_sampler.py:17-309):

* ``RandomNegativeEdgeSamplerHook`` — uniform random destination ids in
  [low, high), ``neg_time = edge_time``.
* ``HistoricalNegativeEdgeSamplerHook`` — per-source uniform draw from that
  source's past destinations, PADDED_NODE_ID + ``valid_neg_mask`` when no
  history exists.
* ``TGBNegativeEdgeSamplerHook`` (+ THG/TKG variants) — pre-generated TGB
  evaluation candidate lists served per batch; ``neg_time`` drawn with a fixed
  seed inside the batch's time range to avoid leakage.

TPU-first redesign:

* Randomness is functional — each sampler's state carries a
  ``jax.random`` key (split per batch), so pipelines stay pure/jittable.
* Historical memory is a **preallocated** (capacity = total events) edge log,
  not an amortized-doubling buffer: static shapes, no recompiles. The
  per-source draw is a Gumbel-max via two ``segment_max`` passes instead of
  dynamic boolean filtering.
* TGB candidates become a padded ``(E_eval, Q)`` device array walked by a
  cursor state; ``neg_batch_list`` is the dense ``(B, Q)`` slice (a jnp array,
  not a Python list) and ``neg`` its flattened view.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph
from ..util.logging import _get_logger
from ..util.seed import fork_key
from .base import StatefulHook
from .registry import hook

logger = _get_logger(__name__)


@hook
class RandomNegativeEdgeSamplerHook(StatefulHook):
    """Uniform random negative destinations for link prediction training.

    Stateful only in the functional-PRNG sense: state is the random key.
    """

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {"neg", "neg_time"}

    def __init__(
        self, low: int, high: int, neg_ratio: float = 1.0, id: Optional[str] = None
    ) -> None:
        super().__init__(id=id)
        if not 0 < neg_ratio <= 1:
            raise ValueError(f"neg_ratio must be in (0, 1], got: {neg_ratio}")
        if not low < high:
            raise ValueError(f"low ({low}) must be strictly less than high ({high})")
        self.low = low
        self.high = high
        self.neg_ratio = neg_ratio
        self.state: Any = None

    def init_state(self, dg: Optional[DGraph] = None) -> Any:
        return fork_key()

    def reset_state(self) -> None:
        self.state = None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        key, sub = jax.random.split(state)
        n = batch.edge_dst.shape[0]
        size = max(1, round(self.neg_ratio * n))
        neg = jax.random.randint(sub, (size,), self.low, self.high, dtype=jnp.int32)
        if batch.edge_valid is not None:
            # Padded rows must not inject live seeds: a real node id on an
            # invalid row would add its neighbors to the batch subgraph and
            # perturb aggregation for valid nodes.
            neg = jnp.where(batch.edge_valid[:size], neg, PADDED_NODE_ID)
        self.add_batch_attribute(batch, "neg", neg)
        self.add_batch_attribute(batch, "neg_time", batch.edge_time[:size])
        if batch.edge_valid is not None:
            self.add_batch_attribute(batch, "neg_valid", batch.edge_valid[:size])
        return key, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch


@hook
class HistoricalNegativeEdgeSamplerHook(StatefulHook):
    """Sample negatives from each source's historical destinations.

    State: ``(key, src_log, dst_log, count)`` with a static capacity equal to
    the graph's total edge-event count — every batch appends its edges, so the
    log never overflows within an epoch and shapes never change.
    """

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {"neg", "neg_time", "valid_neg_mask"}

    def __init__(self, id: Optional[str] = None) -> None:
        super().__init__(id=id)
        self.state: Any = None
        self._num_nodes: Optional[int] = None

    def init_state(self, dg: DGraph) -> Any:
        capacity = int(dg.num_edge_events)
        self._num_nodes = int(dg.num_nodes)
        return (
            fork_key(),
            jnp.full((capacity,), PADDED_NODE_ID, dtype=jnp.int32),
            jnp.full((capacity,), PADDED_NODE_ID, dtype=jnp.int32),
            jnp.zeros((), dtype=jnp.int32),
        )

    def reset_state(self) -> None:
        self.state = None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        key, src_log, dst_log, count = state
        key, sub = jax.random.split(key)
        num_nodes = self._num_nodes
        C = src_log.shape[0]

        # Gumbel-max per source: random weight per logged edge, masked to the
        # filled prefix; two segment_max passes find each node's winning edge.
        w = jax.random.uniform(sub, (C,))
        filled = jnp.arange(C) < count
        seg_ids = jnp.where(filled, src_log, num_nodes)  # overflow bucket for empty
        w_masked = jnp.where(filled, w, -1.0)
        best_w = jax.ops.segment_max(w_masked, seg_ids, num_segments=num_nodes + 1)
        is_best = filled & (w_masked == best_w[seg_ids])
        idx = jnp.arange(C)
        best_idx = jax.ops.segment_max(
            jnp.where(is_best, idx, -1), seg_ids, num_segments=num_nodes + 1
        )

        src = jnp.clip(batch.edge_src, 0, num_nodes - 1)
        has_hist = best_idx[src] >= 0
        neg = jnp.where(has_hist, dst_log[jnp.clip(best_idx[src], 0, C - 1)], PADDED_NODE_ID)
        valid = has_hist
        if batch.edge_valid is not None:
            valid = valid & batch.edge_valid
            neg = jnp.where(batch.edge_valid, neg, PADDED_NODE_ID)

        # Append this batch's (valid) edges to the log at positions count+i.
        B = batch.edge_src.shape[0]
        if batch.edge_valid is not None:
            in_batch_pos = jnp.cumsum(batch.edge_valid.astype(jnp.int32)) - 1
            write_pos = jnp.where(batch.edge_valid, count + in_batch_pos, C)
            n_new = jnp.sum(batch.edge_valid.astype(jnp.int32))
        else:
            write_pos = count + jnp.arange(B)
            n_new = jnp.asarray(B, jnp.int32)
        src_log = src_log.at[jnp.clip(write_pos, 0, C - 1)].set(
            jnp.where(write_pos < C, batch.edge_src, src_log[jnp.clip(write_pos, 0, C - 1)])
        )
        dst_log = dst_log.at[jnp.clip(write_pos, 0, C - 1)].set(
            jnp.where(write_pos < C, batch.edge_dst, dst_log[jnp.clip(write_pos, 0, C - 1)])
        )
        count = jnp.minimum(count + n_new, C)

        self.add_batch_attribute(batch, "neg", neg)
        self.add_batch_attribute(batch, "neg_time", batch.edge_time)
        self.add_batch_attribute(batch, "valid_neg_mask", valid)
        return (key, src_log, dst_log, count), batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch


class _TGBEvalNegativesBase(StatefulHook):
    """Serve pre-generated per-edge negative candidate lists in order.

    The eval split is iterated chronologically, so a cursor into the dense
    ``(E_eval, Q)`` candidate array tracks which rows belong to each batch.
    """

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {"neg", "neg_batch_list", "neg_time", "neg_valid"}
    _dataset_prefix = "tgbl"

    def __init__(
        self,
        dataset_name: Optional[str] = None,
        split_mode: Optional[str] = None,
        candidates: Optional[np.ndarray] = None,
        id: Optional[str] = None,
    ) -> None:
        super().__init__(id=id)
        if candidates is None:
            if dataset_name is None or split_mode is None:
                raise ValueError("Provide either (dataset_name, split_mode) or candidates")
            candidates = self._load_from_tgb(dataset_name, split_mode)
        candidates = np.asarray(candidates)
        if candidates.ndim != 2:
            raise ValueError(f"candidates must be (E_eval, Q), got {candidates.shape}")
        self._candidates = jnp.asarray(candidates.astype(np.int32))
        self.split_mode = split_mode
        self.state: Any = None

    def _load_from_tgb(self, dataset_name: str, split_mode: str) -> np.ndarray:
        if split_mode not in ("val", "test"):
            raise ValueError(f'split_mode must be "val" or "test", got: {split_mode}')
        if not dataset_name.startswith(f"{self._dataset_prefix}-"):
            raise ValueError(
                f"{type(self).__name__} expects {self._dataset_prefix}-* datasets, "
                f"got {dataset_name}"
            )
        try:
            from pathlib import Path

            from tgb.utils.info import DATA_VERSION_DICT, PROJ_DIR
        except ImportError as e:
            raise ImportError(
                f"TGB required for {type(self).__name__}, try `pip install py-tgb`"
            ) from e
        sampler = self._build_sampler(dataset_name)
        root = Path(PROJ_DIR + "datasets") / dataset_name.replace("-", "_")
        v = DATA_VERSION_DICT.get(dataset_name, 1)
        suffix = f"_v{v}" if v > 1 else ""
        fname = root / f"{dataset_name}_{split_mode}_ns{suffix}.pkl"
        sampler.load_eval_set(fname=str(fname), split_mode=split_mode)
        eval_set = sampler.eval_set[split_mode]
        # Flatten the dict of per-edge candidate lists into a padded array in
        # chronological (insertion) order.
        rows = list(eval_set.values())
        q = max(len(r) for r in rows)
        out = np.full((len(rows), q), PADDED_NODE_ID, dtype=np.int64)
        for i, r in enumerate(rows):
            out[i, : len(r)] = np.asarray(r)
        return out

    def _build_sampler(self, dataset_name: str) -> Any:
        from tgb.linkproppred.negative_sampler import NegativeEdgeSampler

        return NegativeEdgeSampler(dataset_name=dataset_name)

    def init_state(self, dg: Optional[DGraph] = None) -> Any:
        return (fork_key(), jnp.zeros((), dtype=jnp.int32))

    def reset_state(self) -> None:
        self.state = None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        key, cursor = state
        key, sub = jax.random.split(key)
        B = batch.edge_src.shape[0]
        E_eval, Q = self._candidates.shape
        # Row-gather instead of a clamped dynamic_slice: a clamp would shift
        # the window backwards on a partial tail batch and re-serve earlier
        # edges' candidates (mis-alignment); out-of-range rows are padded.
        row_idx = cursor + jnp.arange(B, dtype=jnp.int32)
        in_range = row_idx < E_eval
        rows = self._candidates[jnp.clip(row_idx, 0, E_eval - 1)]
        rows = jnp.where(in_range[:, None], rows, PADDED_NODE_ID)
        if batch.edge_valid is not None:
            rows = jnp.where(batch.edge_valid[:, None], rows, PADDED_NODE_ID)
            n_valid = jnp.sum(batch.edge_valid.astype(jnp.int32))
        else:
            n_valid = jnp.asarray(B, jnp.int32)
        neg_valid = rows != PADDED_NODE_ID
        # Reference semantics (tgb_sampler.py:113-129): ``neg`` is the *unique*
        # candidate set — uniqueness matters downstream because duplicate seeds
        # would double edges in the batch subgraph and shift segment-softmax
        # attention weights. Padded to static capacity B*Q with PADDED_NODE_ID
        # (sorted ascending, padding at the end, as torch.unique emits).
        flat = rows.reshape(-1)
        sentinel = jnp.iinfo(jnp.int32).max
        keyed = jnp.where(flat == PADDED_NODE_ID, sentinel, flat)
        uniq = jnp.unique(keyed, size=flat.shape[0], fill_value=sentinel)
        neg = jnp.where(uniq == sentinel, PADDED_NODE_ID, uniq)
        t_lo = jnp.min(jnp.where(batch.edge_valid, batch.edge_time, jnp.iinfo(jnp.int32).max)) if batch.edge_valid is not None else jnp.min(batch.edge_time)
        t_hi = jnp.max(jnp.where(batch.edge_valid, batch.edge_time, 0)) if batch.edge_valid is not None else jnp.max(batch.edge_time)
        # Fake (negative) link times: deterministic draw inside the batch's
        # time range, mirroring the reference's seeded generator heuristic.
        neg_time = jax.random.randint(
            jax.random.PRNGKey(0), (neg.shape[0],), t_lo, t_hi + 1, dtype=jnp.int32
        )
        neg_time = jnp.where(neg != PADDED_NODE_ID, neg_time, 0)
        self.add_batch_attribute(batch, "neg", neg)
        self.add_batch_attribute(batch, "neg_batch_list", rows)
        self.add_batch_attribute(batch, "neg_valid", neg_valid)
        self.add_batch_attribute(batch, "neg_time", neg_time)
        cursor = cursor + n_valid
        return (key, cursor), batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch


@hook
class TGBNegativeEdgeSamplerHook(_TGBEvalNegativesBase):
    """tgbl-* pre-generated negative sets."""

    _dataset_prefix = "tgbl"


@hook
class TGBTHGNegativeEdgeSamplerHook(_TGBEvalNegativesBase):
    """thgl-* heterogeneous pre-generated negative sets (type-constrained)."""

    _dataset_prefix = "thgl"

    def _build_sampler(self, dataset_name: str) -> Any:
        from tgb.linkproppred.thg_negative_sampler import THGNegativeEdgeSampler

        from tgb.linkproppred.dataset import LinkPropPredDataset

        dataset = LinkPropPredDataset(name=dataset_name)
        return THGNegativeEdgeSampler(
            dataset_name=dataset_name,
            first_dst_id=dataset.min_dst_idx,
            last_dst_id=dataset.max_dst_idx,
            node_type=dataset.node_type,
        )


@hook
class TGBTKGNegativeEdgeSamplerHook(_TGBEvalNegativesBase):
    """tkgl-* knowledge-graph pre-generated negative sets (dst-id range)."""

    _dataset_prefix = "tkgl"

    def _build_sampler(self, dataset_name: str) -> Any:
        from tgb.linkproppred.tkg_negative_sampler import TKGNegativeEdgeSampler

        from tgb.linkproppred.dataset import LinkPropPredDataset

        dataset = LinkPropPredDataset(name=dataset_name)
        return TKGNegativeEdgeSampler(
            dataset_name=dataset_name,
            first_dst_id=dataset.min_dst_idx,
            last_dst_id=dataset.max_dst_idx,
            strategy="time-filtered",
        )
