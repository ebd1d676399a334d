"""Evaluation metrics (TGB-compatible).

Parity: metric definitions used by the reference's examples via the TGB
``Evaluator`` (metric ids in /root/reference/tgm/constants.py:15-20;
usage e.g. /root/reference/examples/linkproppred/tgn.py:164-177):

* ``mrr``: TGB link-prediction MRR — rank of the positive among its negative
  candidates using the mean of optimistic (score-strictly-greater) and
  pessimistic (greater-or-equal) ranks, matching TGB's Evaluator bit-for-bit.
* ``ndcg``: NDCG@k for node property prediction (TGB uses k=10).

All functions are pure jnp, mask-aware (padded candidates / padded batch rows
are excluded) and jit/vmap-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..constants import DEFAULT_NDCG_K


def mrr_per_edge(
    pos_score: jnp.ndarray,
    neg_scores: jnp.ndarray,
    neg_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reciprocal rank per positive edge.

    Args:
        pos_score: (B,) score of each positive edge.
        neg_scores: (B, Q) scores of the negative candidates.
        neg_valid: (B, Q) bool mask of real candidates (True = valid).

    Returns:
        (B,) reciprocal ranks, TGB tie handling:
        rank = 0.5 * (#neg > pos) + 0.5 * (#neg >= pos) + 1.
    """
    pos = pos_score[:, None]
    if neg_valid is None:
        gt = (neg_scores > pos).sum(axis=1)
        ge = (neg_scores >= pos).sum(axis=1)
    else:
        gt = ((neg_scores > pos) & neg_valid).sum(axis=1)
        ge = ((neg_scores >= pos) & neg_valid).sum(axis=1)
    rank = 0.5 * (gt + ge) + 1.0
    return 1.0 / rank


def mrr(
    pos_score: jnp.ndarray,
    neg_scores: jnp.ndarray,
    neg_valid: Optional[jnp.ndarray] = None,
    edge_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean reciprocal rank over the valid edges of a batch."""
    rr = mrr_per_edge(pos_score, neg_scores, neg_valid)
    if edge_valid is None:
        return jnp.mean(rr)
    w = edge_valid.astype(rr.dtype)
    return jnp.sum(rr * w) / jnp.maximum(jnp.sum(w), 1.0)


def mrr_sum_count(
    pos_score: jnp.ndarray,
    neg_scores: jnp.ndarray,
    neg_valid: Optional[jnp.ndarray] = None,
    edge_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of reciprocal ranks, count) — accumulate across batches, then divide."""
    rr = mrr_per_edge(pos_score, neg_scores, neg_valid)
    if edge_valid is None:
        return jnp.sum(rr), jnp.asarray(rr.shape[0], rr.dtype)
    w = edge_valid.astype(rr.dtype)
    return jnp.sum(rr * w), jnp.sum(w)


def ndcg_at_k(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    k: int = DEFAULT_NDCG_K,
    row_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NDCG@k averaged over rows (TGB node-property-prediction metric).

    Args:
        scores: (B, C) predicted relevance per class/item.
        labels: (B, C) ground-truth relevance (non-negative).
        k: cutoff.
        row_valid: (B,) mask of real rows.
    """
    k = min(k, scores.shape[-1])
    discounts = 1.0 / jnp.log2(jnp.arange(k) + 2.0)  # (k,)

    order = jnp.argsort(-scores, axis=-1)[:, :k]
    gains = jnp.take_along_axis(labels, order, axis=-1)
    dcg = jnp.sum(gains * discounts[None, :], axis=-1)

    ideal = -jnp.sort(-labels, axis=-1)[:, :k]
    idcg = jnp.sum(ideal * discounts[None, :], axis=-1)
    ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0)
    if row_valid is None:
        return jnp.mean(ndcg)
    w = row_valid.astype(ndcg.dtype)
    return jnp.sum(ndcg * w) / jnp.maximum(jnp.sum(w), 1.0)


def binary_accuracy(
    pos_score: jnp.ndarray,
    neg_score: jnp.ndarray,
    threshold: float = 0.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Accuracy of pos>threshold / neg<=threshold logits (link-pred sanity metric)."""
    correct = (pos_score > threshold).astype(jnp.float32).sum() + (
        neg_score <= threshold
    ).astype(jnp.float32).sum()
    total = pos_score.size + neg_score.size
    if valid is not None:
        correct = ((pos_score > threshold) & valid).sum() + ((neg_score <= threshold) & valid).sum()
        total = 2 * valid.sum()
    return correct / jnp.maximum(total, 1)


def mse(pred: jnp.ndarray, target: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    err = (pred - target) ** 2
    if valid is None:
        return jnp.mean(err)
    w = valid.astype(err.dtype)
    while w.ndim < err.ndim:
        w = w[..., None]
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * (err.size / w.size), 1.0)
