"""Temporal neighbor sampling hooks.

Parity: reference neighbor hooks
(/root/reference/tgm/hooks/neighbors/recency.py:18-416,
 /root/reference/tgm/hooks/neighbors/uniform.py:16-210):

* ``RecencyNeighborHook`` — per-node circular buffers of the most recent
  neighbors; multi-hop queries return, per hop, the k most recent neighbors
  strictly before each seed's query time; updates keep the last ``B`` events
  per node with deterministic last-write-wins.
* ``NeighborSamplerHook`` — uniform sampling over each seed's full temporal
  neighborhood strictly before the batch.

TPU-first redesign (SURVEY.md §7.1/§7.3 item 1):

* Recency state is a pytree ``(nbr_ids, nbr_times, nbr_feats, write_pos)`` of
  shape ``(N+1, B)`` — row ``N`` is a *dump row*: padded seeds and dropped
  writes target it, so every gather/scatter is static-shape and mask-free.
* The reference's ``unique_consecutive``-based keep-last-B becomes a two-pass
  stable argsort (lexsort by (node, time)) + segment arithmetic — identical
  semantics, fully vectorized, jit/scan-safe.
* The uniform sampler queries the storage's **temporal CSR** (built once,
  uploaded once) with a fixed-iteration vectorized bisection — no per-batch
  O(E) scans. Oversized neighborhoods are subsampled WITHOUT replacement via
  a vectorized Floyd sampler (k unrolled steps of k-wide membership checks),
  matching the reference's np.random.choice(replace=False) distribution
  (/root/reference/tgm/core/_storage/backends/array_backend.py:129-171).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph
from ..util.logging import _get_logger
from ..util.seed import fork_key
from .base import SeedableHook, StatefulHook
from .registry import hook

logger = _get_logger(__name__)


# ---------------------------------------------------------------------- #
# Pure functional core: recency ring buffers
# ---------------------------------------------------------------------- #
def recency_init(
    num_nodes: int, buf_size: int, edge_dim: int, row_multiple: int = 1
) -> Tuple[jnp.ndarray, ...]:
    """State: (>=N+1, B) buffers; the LAST row is the dump row for padded ids.

    ``row_multiple`` rounds the row count up so the node axis divides evenly
    across a device mesh; rows between N and the dump row are never addressed.
    """
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    return (
        jnp.full((n, buf_size), PADDED_NODE_ID, dtype=jnp.int32),
        jnp.zeros((n, buf_size), dtype=jnp.int32),
        jnp.zeros((n, buf_size, edge_dim), dtype=jnp.float32),
        jnp.zeros((n,), dtype=jnp.int32),
    )


# Pallas usage for the recency window select: None = auto (on for TPU
# backends), True/False = forced. The kernel is bit-exact vs the jnp path
# (tests/test_pallas_recency.py) and ~2.6x faster on TPU v5e.
USE_PALLAS_RECENCY: Optional[bool] = None

# Seed count (static at trace time) at/above which the LANE-MAJOR select
# kernel is used instead of the row-major one: the row-major kernel pads the
# buffer axis B (~10) to 128 VPU lanes — 12.8x wasted lanes — and its scoped
# VMEM blows up above block 512, which only bites at eval seed counts
# (2B + B*Q ~ 4400). The lane-major variant puts seeds on the lane axis.
# Bit-equal (tests/test_pallas_recency.py::test_lane_major_matches_row_major).
LANE_SELECT_MIN_SEEDS: int = 1024


def _pallas_enabled() -> bool:
    if USE_PALLAS_RECENCY is not None:
        return USE_PALLAS_RECENCY
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def recency_query(
    state: Tuple[jnp.ndarray, ...],
    seeds: jnp.ndarray,
    seed_times: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return the k most recent neighbors of each seed strictly before its time.

    Mirrors reference recency.py:239-321: unroll each circular buffer so the
    most recent write sits at the right edge, mask by ``time < seed_time``,
    find the rightmost valid slot, then gather the k-window ending there.
    On TPU the fused Pallas window-select kernel handles the selection.
    """
    nbr_ids, nbr_times, nbr_feats, write_pos = state
    N1, B = nbr_ids.shape
    num_nodes = N1 - 1

    seed_ok = (seeds >= 0) & (seeds < num_nodes)
    rows = jnp.where(seed_ok, seeds, num_nodes)  # dump row for invalid seeds

    if _pallas_enabled():
        from ..ops.pallas.recency_select import recency_window_select

        return recency_window_select(
            nbr_ids[rows], nbr_times[rows], nbr_feats[rows],
            write_pos[rows], seed_times, k=k,
        )

    buf_ids = nbr_ids[rows]  # (S, B)
    buf_times = nbr_times[rows]
    wp = write_pos[rows]

    # Unrolled order: oldest ... newest (newest at column B-1).
    cand_idx = (wp[:, None] - jnp.arange(B, 0, -1)[None, :]) % B  # (S, B)
    cand_times = jnp.take_along_axis(buf_times, cand_idx, axis=1)
    cand_ids = jnp.take_along_axis(buf_ids, cand_idx, axis=1)
    tmask = (cand_times < seed_times[:, None]) & (cand_ids != PADDED_NODE_ID)
    tmask &= seed_ok[:, None]

    pos = jnp.arange(B)[None, :]
    last_valid = jnp.where(tmask.any(axis=1), jnp.max(tmask * pos, axis=1), -1)  # (S,)

    offset = jnp.arange(k - 1, -1, -1)[None, :]  # [k-1 .. 0]
    gather_pos = jnp.maximum(last_valid[:, None] - offset, -1)  # (S, k)
    out_idx = jnp.where(
        gather_pos >= 0,
        jnp.take_along_axis(cand_idx, jnp.maximum(gather_pos, 0), axis=1),
        -1,
    )
    valid = out_idx >= 0
    safe = jnp.maximum(out_idx, 0)

    out_nbrs = jnp.where(valid, jnp.take_along_axis(buf_ids, safe, axis=1), PADDED_NODE_ID)
    out_times = jnp.where(valid, jnp.take_along_axis(buf_times, safe, axis=1), 0)
    feats = jnp.take_along_axis(nbr_feats[rows], safe[:, :, None], axis=1)
    out_feats = jnp.where(valid[:, :, None], feats, 0.0)
    return out_nbrs, out_times, out_feats


def _push_plan(
    B: int,
    write_pos: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    directed: bool,
    num_nodes: int,
):
    """Deterministic write plan for a circular-buffer push (mirrors reference
    recency.py:323-399): stable lexicographic sort by (node, time), retain
    only the last ``B`` events per node so each buffer slot is written at
    most once, compute write (row, col) targets and per-node bumps.

    Returns ``(perm, rows, cols, s_nbrs, s_t, bump)`` where ``perm`` indexes
    the (possibly direction-duplicated) event list — apply it to any payload
    concatenated the same way (twice for undirected).
    """
    N1 = num_nodes + 1
    if valid is None:
        valid = jnp.ones(src.shape[0], dtype=bool)

    if directed:
        nodes, nbrs, t, v = src, dst, time, valid
    else:
        nodes = jnp.concatenate([src, dst])
        nbrs = jnp.concatenate([dst, src])
        t = jnp.concatenate([time, time])
        v = jnp.concatenate([valid, valid])

    # Invalid entries route to the dump row and sort to the end.
    nodes = jnp.where(v, nodes, num_nodes)

    # Stable lexsort by (node, time): stable argsort on time, then on node.
    p1 = jnp.argsort(t, stable=True)
    p2 = jnp.argsort(nodes[p1], stable=True)
    perm = p1[p2]
    s_nodes, s_nbrs, s_t = nodes[perm], nbrs[perm], t[perm]

    E = s_nodes.shape[0]
    idx = jnp.arange(E)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s_nodes[1:] != s_nodes[:-1]])
    # Start index of each element's group: running max of start positions.
    group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, -1))
    pos_in_group = idx - group_start
    cnt = jax.ops.segment_sum(jnp.ones_like(s_nodes), s_nodes, num_segments=N1)
    cnt_elem = cnt[s_nodes]
    keep = pos_in_group >= (cnt_elem - B)

    # Rank among kept entries of the same group.
    kept_offset = pos_in_group - jnp.maximum(cnt_elem - B, 0)
    write_idx = (write_pos[s_nodes] + kept_offset) % B

    rows = jnp.where(keep, s_nodes, num_nodes)
    cols = jnp.where(keep, write_idx, 0)
    bump = jax.ops.segment_sum(keep.astype(jnp.int32), s_nodes, num_segments=N1)
    return perm, rows, cols, s_nbrs, s_t, bump


# Dense (sort-free) push plan: None = auto (on for TPU backends), True/False
# = forced. Bit-equivalent to the sort-based plan (tests); on TPU the two
# argsorts + two segment_sum scatters of the sort-based plan dominate the
# push (~290us of a 788us TGN step at wiki shapes) while the dense O(E^2)
# rank matrix is pure VPU work.
USE_DENSE_PUSH: Optional[bool] = None

# Pallas in-place cell scatter for the push's buffer writes: None = auto (on
# for TPU backends), True/False = forced. XLA lowers the (rows, cols) cell
# scatters as ~65ns/element serialized updates (3 x ~26us/step at wiki
# shapes); the kernel applies them inside VMEM with the buffer aliased.
USE_PALLAS_SCATTER: Optional[bool] = None


def _pallas_scatter_enabled() -> bool:
    if USE_PALLAS_SCATTER is not None:
        return USE_PALLAS_SCATTER
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _dense_push_enabled() -> bool:
    if USE_DENSE_PUSH is not None:
        return USE_DENSE_PUSH
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _push_plan_dense(
    B: int,
    write_pos: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    directed: bool,
    num_nodes: int,
):
    """Sort-free write plan, bit-equivalent to :func:`_push_plan`.

    Instead of the stable (node, time) lexsort + segment counts, each event's
    within-node recency rank is computed densely: ``r_e`` = number of events
    of the same node strictly later in (time, position) order — an (E, E)
    compare-and-sum, exactly the trick the Pallas window-select kernel uses
    per buffer row. Events with ``r_e < B`` are kept; write columns follow
    the same (write_pos + offset-from-start) % B layout as the sorted plan,
    so the resulting buffers are identical. Payloads scatter in ORIGINAL
    event order (no permutation is ever materialized).

    Returns ``(rows, cols, nbrs, t, rows_last, wp_last)`` where ``rows_last``
    / ``wp_last`` carry each node's post-push write position (scatter-set at
    the node's final event; exactly one per node).
    """
    if valid is None:
        valid = jnp.ones(src.shape[0], dtype=bool)

    if directed:
        nodes, nbrs, t, v = src, dst, time, valid
    else:
        nodes = jnp.concatenate([src, dst])
        nbrs = jnp.concatenate([dst, src])
        t = jnp.concatenate([time, time])
        v = jnp.concatenate([valid, valid])

    nodes = jnp.where(v, nodes, num_nodes)
    E2 = nodes.shape[0]
    idx = jnp.arange(E2, dtype=jnp.int32)

    same = nodes[:, None] == nodes[None, :]  # (E2, E2)
    # Stable (time, concat-position) order — matches argsort(t, stable).
    later = (t[None, :] > t[:, None]) | (
        (t[None, :] == t[:, None]) & (idx[None, :] > idx[:, None])
    )
    r = jnp.sum(same & later, axis=1)  # strictly-later same-node events
    earlier = jnp.sum(same & ~later, axis=1) - 1  # excludes self
    cnt = earlier + r + 1

    keep = r < B
    kept_offset = jnp.maximum(earlier - jnp.maximum(cnt - B, 0), 0)
    write_idx = (write_pos[nodes] + kept_offset) % B
    rows = jnp.where(keep, nodes, num_nodes)
    cols = jnp.where(keep, write_idx, 0)

    # Post-push write position, set at each node's final (rank-0) event.
    rows_last = jnp.where(r == 0, nodes, num_nodes)
    wp_last = write_pos[nodes] + jnp.minimum(cnt, B)
    return rows, cols, nbrs, t, rows_last, wp_last


def _recency_push(
    nbr_ids: jnp.ndarray,
    nbr_times: jnp.ndarray,
    payload_buf: jnp.ndarray,  # (N1, B[, D]) features or edge ids
    payload_fill,
    write_pos: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    payload: jnp.ndarray,  # (E[, D]) per-event payload
    valid: Optional[jnp.ndarray],
    directed: bool,
) -> Tuple[jnp.ndarray, ...]:
    """Circular-buffer push over separate id/time/payload buffers."""
    N1, B = nbr_ids.shape
    num_nodes = N1 - 1

    if _dense_push_enabled():
        rows, cols, s_nbrs, s_t, rows_last, wp_last = _push_plan_dense(
            B, write_pos, src, dst, time, valid, directed, num_nodes
        )
        s_f = payload if directed else jnp.concatenate([payload, payload])
        write_pos = write_pos.at[rows_last].set(wp_last, mode="drop")
    else:
        perm, rows, cols, s_nbrs, s_t, bump = _push_plan(
            B, write_pos, src, dst, time, valid, directed, num_nodes
        )
        f = payload if directed else jnp.concatenate([payload, payload])
        s_f = f[perm]
        write_pos = write_pos + bump

    # The push plan writes each live (row, col) slot at most once, so the
    # VMEM-resident Pallas kernel (dump-row writes skipped instead of
    # written-then-reset) is exchangeable with the XLA cell scatters.
    if _pallas_scatter_enabled() and payload_buf.ndim == 2:
        from ..ops.pallas.scatter_cells import scatter_cells

        nbr_ids = scatter_cells(nbr_ids, rows, cols, s_nbrs)
        nbr_times = scatter_cells(nbr_times, rows, cols, s_t.astype(jnp.int32))
        payload_buf = scatter_cells(
            payload_buf, rows, cols, s_f.astype(payload_buf.dtype)
        )
    else:
        nbr_ids = nbr_ids.at[rows, cols].set(s_nbrs, mode="drop")
        nbr_times = nbr_times.at[rows, cols].set(s_t.astype(jnp.int32), mode="drop")
        payload_buf = payload_buf.at[rows, cols].set(
            s_f.astype(payload_buf.dtype), mode="drop"
        )
        # Keep the dump row pristine.
        nbr_ids = nbr_ids.at[num_nodes].set(PADDED_NODE_ID)
        nbr_times = nbr_times.at[num_nodes].set(0)
        payload_buf = payload_buf.at[num_nodes].set(payload_fill)
    write_pos = write_pos.at[num_nodes].set(0)
    return nbr_ids, nbr_times, payload_buf, write_pos


def recency_update(
    state: Tuple[jnp.ndarray, ...],
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    valid: Optional[jnp.ndarray],
    directed: bool,
) -> Tuple[jnp.ndarray, ...]:
    """Push a batch of edge events (with feature payloads) into the buffers."""
    nbr_ids, nbr_times, nbr_feats, write_pos = state
    if feats is None:
        feats = jnp.zeros((src.shape[0], nbr_feats.shape[-1]), dtype=jnp.float32)
    return _recency_push(
        nbr_ids, nbr_times, nbr_feats, 0.0, write_pos,
        src, dst, time, feats, valid, directed,
    )


# ---------------------------------------------------------------------- #
# Eid-buffer variant: store edge IDS, gather features from static edge_x.
#
# The feature-buffer layout above carries an (N, B, D) float array through the
# scan; XLA's layout assignment re-copies that whole buffer every step
# (~15% of the TGN epoch at wiki shapes on v5e). Storing the int32 edge id per
# slot instead shrinks the carried state ~170x; features are gathered from the
# split's static edge_x array only for the selected windows.
# ---------------------------------------------------------------------- #
def recency_eid_init(
    num_nodes: int, buf_size: int, row_multiple: int = 1
) -> Tuple[jnp.ndarray, ...]:
    """State: (>=N+1, B) id/time/edge-id buffers + write positions."""
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    return (
        jnp.full((n, buf_size), PADDED_NODE_ID, dtype=jnp.int32),
        jnp.zeros((n, buf_size), dtype=jnp.int32),
        jnp.full((n, buf_size), -1, dtype=jnp.int32),
        jnp.zeros((n,), dtype=jnp.int32),
    )


def recency_eid_query(
    state: Tuple[jnp.ndarray, ...],
    seeds: jnp.ndarray,
    seed_times: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K most recent (nbr_id, time, edge_id) per seed strictly before its time."""
    nbr_ids, nbr_times, nbr_eids, write_pos = state
    N1, B = nbr_ids.shape
    num_nodes = N1 - 1

    seed_ok = (seeds >= 0) & (seeds < num_nodes)
    rows = jnp.where(seed_ok, seeds, num_nodes)

    if _pallas_enabled():
        from ..ops.pallas.recency_select import (
            recency_window_select_eid,
            recency_window_select_eid_lanes,
        )

        sel = (recency_window_select_eid_lanes
               if seeds.shape[0] >= LANE_SELECT_MIN_SEEDS
               else recency_window_select_eid)
        return sel(
            nbr_ids[rows], nbr_times[rows], nbr_eids[rows],
            write_pos[rows], seed_times, k=k,
        )

    buf_ids = nbr_ids[rows]  # (S, B)
    buf_times = nbr_times[rows]
    wp = write_pos[rows]

    cand_idx = (wp[:, None] - jnp.arange(B, 0, -1)[None, :]) % B  # (S, B)
    cand_times = jnp.take_along_axis(buf_times, cand_idx, axis=1)
    cand_ids = jnp.take_along_axis(buf_ids, cand_idx, axis=1)
    tmask = (cand_times < seed_times[:, None]) & (cand_ids != PADDED_NODE_ID)
    tmask &= seed_ok[:, None]

    pos = jnp.arange(B)[None, :]
    last_valid = jnp.where(tmask.any(axis=1), jnp.max(tmask * pos, axis=1), -1)

    offset = jnp.arange(k - 1, -1, -1)[None, :]
    gather_pos = jnp.maximum(last_valid[:, None] - offset, -1)
    out_idx = jnp.where(
        gather_pos >= 0,
        jnp.take_along_axis(cand_idx, jnp.maximum(gather_pos, 0), axis=1),
        -1,
    )
    valid = out_idx >= 0
    safe = jnp.maximum(out_idx, 0)

    out_nbrs = jnp.where(valid, jnp.take_along_axis(buf_ids, safe, axis=1), PADDED_NODE_ID)
    out_times = jnp.where(valid, jnp.take_along_axis(buf_times, safe, axis=1), 0)
    out_eids = jnp.where(valid, jnp.take_along_axis(nbr_eids[rows], safe, axis=1), -1)
    return out_nbrs, out_times, out_eids


def gather_edge_feats(edge_x: Optional[jnp.ndarray], eids: jnp.ndarray) -> jnp.ndarray:
    """Features of selected edges; eid -1 (padding) yields zero rows."""
    if edge_x is None:
        return jnp.zeros(eids.shape + (0,), jnp.float32)
    valid = eids >= 0
    rows = jnp.clip(eids, 0, edge_x.shape[0] - 1)
    return jnp.where(valid[..., None], edge_x[rows], 0.0)


def recency_eid_update(
    state: Tuple[jnp.ndarray, ...],
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    eids: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    directed: bool,
) -> Tuple[jnp.ndarray, ...]:
    """Push a batch of edge events (by edge id) into the circular buffers."""
    nbr_ids, nbr_times, nbr_eids, write_pos = state
    return _recency_push(
        nbr_ids, nbr_times, nbr_eids, -1, write_pos,
        src, dst, time, eids, valid, directed,
    )


# ---------------------------------------------------------------------- #
# Packed eid layout: one (N1, B, 3) int32 buffer [nbr_id, time, eid] — one
# gather per query and one scatter per push instead of three of each. The
# minor (lane) dim is written whole (unlike the column-sliced scatters that
# regressed the packed memory state).
# ---------------------------------------------------------------------- #
def recency_pk_init(
    num_nodes: int, buf_size: int, row_multiple: int = 1
) -> Tuple[jnp.ndarray, ...]:
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    buf = jnp.zeros((n, buf_size, 3), dtype=jnp.int32)
    buf = buf.at[:, :, 0].set(PADDED_NODE_ID).at[:, :, 2].set(-1)
    return (buf, jnp.zeros((n,), dtype=jnp.int32))


_PK_DUMP_FILL = (PADDED_NODE_ID, 0, -1)


def recency_pk_query(
    state: Tuple[jnp.ndarray, ...],
    seeds: jnp.ndarray,
    seed_times: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K most recent (nbr_id, time, edge_id) per seed (packed layout)."""
    buf, write_pos = state
    N1 = buf.shape[0]
    num_nodes = N1 - 1
    seed_ok = (seeds >= 0) & (seeds < num_nodes)
    rows = jnp.where(seed_ok, seeds, num_nodes)
    g = buf[rows]  # (S, B, 3) — single gather
    ids, times, eids = g[:, :, 0], g[:, :, 1], g[:, :, 2]
    wp = write_pos[rows]
    if _pallas_enabled():
        from ..ops.pallas.recency_select import (
            recency_window_select_eid,
            recency_window_select_eid_lanes,
        )

        sel = (recency_window_select_eid_lanes
               if seeds.shape[0] >= LANE_SELECT_MIN_SEEDS
               else recency_window_select_eid)
        return sel(ids, times, eids, wp, seed_times, k=k)
    # jnp fallback: row-local selection (same math as recency_eid_query's).
    B = buf.shape[1]
    cand_idx = (wp[:, None] - jnp.arange(B, 0, -1)[None, :]) % B
    cand_times = jnp.take_along_axis(times, cand_idx, axis=1)
    cand_ids = jnp.take_along_axis(ids, cand_idx, axis=1)
    tmask = (cand_times < seed_times[:, None]) & (cand_ids != PADDED_NODE_ID)
    tmask &= seed_ok[:, None]
    pos = jnp.arange(B)[None, :]
    last_valid = jnp.where(tmask.any(axis=1), jnp.max(tmask * pos, axis=1), -1)
    offset = jnp.arange(k - 1, -1, -1)[None, :]
    gather_pos = jnp.maximum(last_valid[:, None] - offset, -1)
    out_idx = jnp.where(
        gather_pos >= 0,
        jnp.take_along_axis(cand_idx, jnp.maximum(gather_pos, 0), axis=1),
        -1,
    )
    valid = out_idx >= 0
    safe = jnp.maximum(out_idx, 0)
    out_nbrs = jnp.where(valid, jnp.take_along_axis(ids, safe, axis=1), PADDED_NODE_ID)
    out_times = jnp.where(valid, jnp.take_along_axis(times, safe, axis=1), 0)
    out_eids = jnp.where(valid, jnp.take_along_axis(eids, safe, axis=1), -1)
    return out_nbrs, out_times, out_eids


def recency_pk_update(
    state: Tuple[jnp.ndarray, ...],
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    eids: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    directed: bool,
) -> Tuple[jnp.ndarray, ...]:
    """Push a batch of edge events into the packed buffer (single scatter)."""
    buf, write_pos = state
    N1, B, _ = buf.shape
    num_nodes = N1 - 1
    if _dense_push_enabled():
        rows, cols, s_nbrs, s_t, rows_last, wp_last = _push_plan_dense(
            B, write_pos, src, dst, time, valid, directed, num_nodes
        )
        e = eids if directed else jnp.concatenate([eids, eids])
        vals = jnp.stack(
            [s_nbrs, s_t.astype(jnp.int32), e.astype(jnp.int32)], axis=1
        )  # (E2, 3) in original event order (dense plan never permutes)
        write_pos = write_pos.at[rows_last].set(wp_last, mode="drop")
    else:
        perm, rows, cols, s_nbrs, s_t, bump = _push_plan(
            B, write_pos, src, dst, time, valid, directed, num_nodes
        )
        e = eids if directed else jnp.concatenate([eids, eids])
        vals = jnp.stack(
            [s_nbrs, s_t.astype(jnp.int32), e[perm].astype(jnp.int32)], axis=1
        )  # (E2, 3)
        write_pos = write_pos + bump
    buf = buf.at[rows, cols].set(vals, mode="drop")
    buf = buf.at[num_nodes].set(jnp.asarray(_PK_DUMP_FILL, jnp.int32))
    write_pos = write_pos.at[num_nodes].set(0)
    return buf, write_pos


# ---------------------------------------------------------------------- #
# Hooks
# ---------------------------------------------------------------------- #
class _NeighborHookBase(SeedableHook, StatefulHook):
    """Shared multi-hop plumbing: seed collection and per-hop output lists."""

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {
        "seed_nids",
        "seed_times",
        "nbr_nids",
        "nbr_edge_time",
        "nbr_edge_x",
        "seed_node_nbr_mask",
    }

    def __init__(
        self,
        num_nbrs: Sequence[int],
        seed_nodes_keys: List[str],
        seed_times_keys: List[str],
        directed: bool = False,
        id: Optional[str] = None,
    ) -> None:
        if not len(num_nbrs):
            raise ValueError("num_nbrs must be non-empty")
        if not all(isinstance(x, int) and x > 0 for x in num_nbrs):
            raise ValueError("Each value in num_nbrs must be a positive integer")
        if len(seed_nodes_keys) != len(seed_times_keys):
            raise ValueError(
                f"len(seed_nodes_keys) ({len(seed_nodes_keys)}) != "
                f"len(seed_times_keys) ({len(seed_times_keys)})"
            )
        super().__init__(seed_keys=seed_nodes_keys, id=id)
        self._num_nbrs = list(num_nbrs)
        self._directed = directed
        self._seed_nodes_keys = seed_nodes_keys
        self._seed_times_keys = seed_times_keys
        self.state: Any = None

    @property
    def num_nbrs(self) -> List[int]:
        return self._num_nbrs

    def _get_seeds(self, batch: DGBatch) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        seeds, times, mask = [], [], {}
        offset = 0
        for nk, tk in zip(self._seed_nodes_keys, self._seed_times_keys):
            if not batch.has(nk) or not batch.has(tk):
                raise ValueError(f"Missing seed attributes {[nk, tk]} on batch")
            s = getattr(batch, nk)
            t = getattr(batch, tk)
            seeds.append(s)
            times.append(t)
            mask[nk] = jnp.arange(offset, offset + s.shape[0])
            offset += s.shape[0]
        return jnp.concatenate(seeds), jnp.concatenate(times), mask

    def _emit(self, batch, seed_nids, seed_times, nbr_nids, nbr_time, nbr_x, seed_mask):
        self.add_batch_attribute(batch, "seed_nids", seed_nids)
        self.add_batch_attribute(batch, "seed_times", seed_times)
        self.add_batch_attribute(batch, "nbr_nids", nbr_nids)
        self.add_batch_attribute(batch, "nbr_edge_time", nbr_time)
        self.add_batch_attribute(batch, "nbr_edge_x", nbr_x)
        self.add_batch_attribute(batch, "seed_node_nbr_mask", seed_mask)


@hook
class RecencyNeighborHook(_NeighborHookBase):
    """K most-recent temporal neighbors per node, maintained incrementally.

    Two state layouts:

    * default — ring buffers store each event's edge FEATURES by value
      (the reference's layout). Works with any batch source.
    * ``edge_x_full`` given — ring buffers store int32 EDGE IDS and features
      are gathered from this static table at query time. Removes the carried
      (N, K, D) float buffer (XLA re-layout-copies it every scan step —
      profiled at ~15% of a TGN epoch). Batches must carry global
      ``edge_ids`` (our materialize / device streams emit them; the table
      must be the PRE-SPLIT dataset's ``edge_x`` so ids from every split
      resolve — see ``DGData.edge_global_offset``).
    """

    def __init__(
        self,
        num_nodes: int,
        num_nbrs: Sequence[int],
        seed_nodes_keys: List[str],
        seed_times_keys: List[str],
        directed: bool = False,
        edge_dim: Optional[int] = None,
        edge_x_full: Optional[Any] = None,
        packed_buffers: bool = False,
        id: Optional[str] = None,
    ) -> None:
        super().__init__(num_nbrs, seed_nodes_keys, seed_times_keys, directed, id)
        self._num_nodes = num_nodes
        self._max_nbrs = max(self._num_nbrs)
        self._edge_dim = edge_dim
        self._edge_x_full = None if edge_x_full is None else jnp.asarray(edge_x_full)
        # Packed (N, K, 3) [nbr, time, eid] state (eid mode only): one buffer
        # gather per query hop and one scatter per push instead of three of
        # each. Identical buffers (tests); throughput is layout-dependent —
        # measure on the target shapes before enabling.
        self._packed = bool(packed_buffers)
        if self._packed and self._edge_x_full is None:
            raise ValueError("packed_buffers requires edge_x_full (eid mode)")

    def init_state(self, dg: Optional[DGraph] = None) -> Any:
        if self._edge_x_full is not None:
            if self._packed:
                return recency_pk_init(self._num_nodes, self._max_nbrs)
            return recency_eid_init(self._num_nodes, self._max_nbrs)
        if self._edge_dim is None:
            self._edge_dim = (dg.edge_x_dim if dg is not None else 0) or 0
        return recency_init(self._num_nodes, self._max_nbrs, self._edge_dim)

    def reset_state(self) -> None:
        self.state = None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        eid_mode = self._edge_x_full is not None
        if eid_mode and not batch.has("edge_ids"):
            raise ValueError(
                "RecencyNeighborHook(edge_x_full=...) needs batches with "
                "edge_ids (materialized via DGraph.materialize or a device "
                "stream)"
            )
        seeds, times, seed_mask = self._get_seeds(batch)
        hop_seeds, hop_times = [seeds], [times]
        hop_nbrs, hop_nbr_t, hop_nbr_x = [], [], []
        for hop, k in enumerate(self._num_nbrs):
            if hop > 0:
                seeds = hop_nbrs[hop - 1].reshape(-1)
                times = hop_nbr_t[hop - 1].reshape(-1)
                hop_seeds.append(seeds)
                hop_times.append(times)
            if eid_mode:
                q = recency_pk_query if self._packed else recency_eid_query
                nbrs, nts, nes = q(state, seeds, times, k)
                nxs = gather_edge_feats(self._edge_x_full, nes)
            else:
                nbrs, nts, nxs = recency_query(state, seeds, times, k)
            hop_nbrs.append(nbrs)
            hop_nbr_t.append(nts)
            hop_nbr_x.append(nxs)

        if eid_mode:
            u = recency_pk_update if self._packed else recency_eid_update
            state = u(
                state,
                batch.edge_src,
                batch.edge_dst,
                batch.edge_time,
                batch.edge_ids,
                batch.edge_valid,
                self._directed,
            )
        else:
            state = recency_update(
                state,
                batch.edge_src,
                batch.edge_dst,
                batch.edge_time,
                batch.edge_x,
                batch.edge_valid,
                self._directed,
            )
        self._emit(batch, hop_seeds, hop_times, hop_nbrs, hop_nbr_t, hop_nbr_x, seed_mask)
        return state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch


@hook
class NeighborSamplerHook(_NeighborHookBase):
    """Uniform temporal neighbor sampling over the full history before the batch.

    Device-side: queries the storage's temporal CSR with vectorized bisection.
    """

    def __init__(
        self,
        num_nbrs: Sequence[int],
        seed_nodes_keys: List[str],
        seed_times_keys: List[str],
        directed: bool = False,
        id: Optional[str] = None,
    ) -> None:
        super().__init__(num_nbrs, seed_nodes_keys, seed_times_keys, directed, id)
        self._csr: Optional[Tuple[jnp.ndarray, ...]] = None
        self._edge_x: Optional[jnp.ndarray] = None
        self._edge_dim = 0

    def init_state(self, dg: DGraph) -> Any:
        if self._csr is None:
            row_ptr, nbrs, times, eids, _, _ = dg._storage.temporal_csr(self._directed)
            self._csr = (
                jnp.asarray(row_ptr.astype(np.int32)),
                jnp.asarray(nbrs),
                jnp.asarray(times.astype(np.int32)),
                jnp.asarray(eids.astype(np.int32)),
            )
            edge_x = dg._storage._data.edge_x
            self._edge_dim = 0 if edge_x is None else edge_x.shape[1]
            self._edge_x = None if edge_x is None else jnp.asarray(edge_x)
        return fork_key()

    def reset_state(self) -> None:
        self.state = None

    def _query(
        self, key: jnp.ndarray, seeds: jnp.ndarray, end_time: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        row_ptr, nbrs, times, eids = self._csr
        num_nodes = row_ptr.shape[0] - 1
        seed_ok = (seeds >= 0) & (seeds < num_nodes)
        rows = jnp.where(seed_ok, seeds, 0)
        lo = row_ptr[rows]
        hi0 = row_ptr[rows + 1]

        # Vectorized bisection: first index in [lo, hi0) with time > end_time.
        def body(_, carry):
            lo_, hi_ = carry
            mid = (lo_ + hi_) // 2
            go_right = times[jnp.clip(mid, 0, times.shape[0] - 1)] <= end_time
            return jnp.where(go_right, mid + 1, lo_), jnp.where(go_right, hi_, mid)

        lo2, hi2 = jax.lax.fori_loop(0, 32, body, (lo, hi0))
        cnt = jnp.where(seed_ok, jnp.maximum(lo2 - lo, 0), 0)  # candidates per seed

        cols = jnp.arange(k)[None, :]
        take = cols < jnp.minimum(cnt, k)[:, None]
        # Default left-aligned first-k; oversized rows (cnt > k) draw k
        # DISTINCT uniform offsets from their candidate window via Floyd's
        # algorithm: at step i consider prefix size t+1 = cnt-k+i+1, draw
        # r in [0, t]; if r was already chosen, take t instead. Exactly
        # uniform over k-subsets, k^2 work per row, fully vectorized.
        key, sub = jax.random.split(key)
        S = seeds.shape[0]
        rand = jax.random.randint(sub, (S, k), 0, jnp.int32(2**31 - 1))
        chosen = jnp.full((S, k), -1, jnp.int32)
        for i in range(k):
            t = cnt - k + i  # >= 0 whenever cnt > k
            r = rand[:, i] % jnp.maximum(t + 1, 1)
            dup = jnp.any(chosen == r[:, None], axis=1)
            pick = jnp.where(dup, t, r)
            chosen = chosen.at[:, i].set(pick)
        over = (cnt > k)[:, None]
        offs = jnp.where(over, chosen, cols)
        idx = jnp.clip(lo[:, None] + offs, 0, times.shape[0] - 1)

        out_ids = jnp.where(take, nbrs[idx], PADDED_NODE_ID)
        out_t = jnp.where(take, times[idx], 0)
        if self._edge_x is not None:
            out_x = jnp.where(take[:, :, None], self._edge_x[eids[idx]], 0.0)
        else:
            out_x = jnp.zeros((seeds.shape[0], k, 0), dtype=jnp.float32)
        return out_ids, out_t, out_x

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        key = state
        seeds, times, seed_mask = self._get_seeds(batch)
        if batch.edge_valid is not None:
            big = jnp.iinfo(jnp.int32).max
            t_min = jnp.min(jnp.where(batch.edge_valid, batch.edge_time, big))
        else:
            t_min = jnp.min(batch.edge_time)
        end_time = t_min - 1  # strictly before this batch

        hop_seeds, hop_times = [seeds], [times]
        hop_nbrs, hop_nbr_t, hop_nbr_x = [], [], []
        for hop, k in enumerate(self._num_nbrs):
            if hop > 0:
                seeds = hop_nbrs[hop - 1].reshape(-1)
                times = hop_nbr_t[hop - 1].reshape(-1)
                hop_seeds.append(seeds)
                hop_times.append(times)
            key, sub = jax.random.split(key)
            nbrs, nts, nxs = self._query(sub, seeds, end_time, k)
            hop_nbrs.append(nbrs)
            hop_nbr_t.append(nts)
            hop_nbr_x.append(nxs)

        self._emit(batch, hop_seeds, hop_times, hop_nbrs, hop_nbr_t, hop_nbr_x, seed_mask)
        return key, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch
