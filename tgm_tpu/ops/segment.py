"""Segment primitives: the SpMM/SDDMM substrate for graph aggregation.

These replace the PyG scatter-gather message-passing kernels the reference
delegates to (SURVEY.md §2.1): ``segment_softmax`` + ``segment_sum`` express
attention-weighted neighborhood aggregation (TransformerConv-style) and plain
GCN/Cheb propagation as dense-gather + segment-reduce, which XLA lowers to
efficient TPU scatter/gather. All take explicit ``num_segments`` (static) and
optional validity masks (padded edges).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if mask is not None:
        shaped = mask.astype(data.dtype)
        while shaped.ndim < data.ndim:
            shaped = shaped[..., None]
        data = data * shaped
        segment_ids = jnp.where(mask, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)[:num_segments]


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    initial: float = -jnp.inf,
) -> jnp.ndarray:
    if mask is not None:
        data = jnp.where(mask, data, initial)
        segment_ids = jnp.where(mask, segment_ids, num_segments)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments + 1)
    return jnp.maximum(out[:num_segments], initial)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask)
    while cnt.ndim < s.ndim:
        cnt = cnt[..., None]
    return s / jnp.maximum(cnt, 1.0)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within segments; masked entries get 0.

    Masked logits are clamped to a large negative *before* the exp so the
    shifted values never overflow — ``exp(big_positive)`` in the forward pass
    poisons the backward pass with inf * 0 = NaN even when masked out after.
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    m = segment_max(logits, segment_ids, num_segments, mask, initial=-1e30)
    shifted = logits - jnp.maximum(m[segment_ids], -1e30)
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    denom = segment_sum(e, segment_ids, num_segments, mask)
    return e / jnp.maximum(denom[segment_ids], 1e-16)


def coo_spmm(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray],
    x: jnp.ndarray,
    num_nodes: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """y[dst] += w * x[src] over COO edges (gather + segment-sum SpMM)."""
    msgs = x[jnp.clip(edge_src, 0, num_nodes - 1)]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return segment_sum(msgs, jnp.clip(edge_dst, 0, num_nodes - 1), num_nodes, mask)
