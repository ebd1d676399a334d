"""Fused recency-window selection kernel (Pallas TPU).

The hot inner step of recency neighbor sampling (SURVEY.md §7.3 item 1):
given each seed's circular buffer row — neighbor ids/times/features and the
row's write position — select the K most recent events strictly before the
seed's query time, oldest→newest, right-aligned, PAD-filled.

The reference (and the jnp fallback in ``tgm_tpu.hooks.neighbors``) does this
with an unroll permutation + masked argmax + windowed ``take_along_axis``
chain — several (S, B[, D]) intermediates through HBM. This kernel fuses the
whole selection into one pass per seed block with a gather-free formulation:

  * age of slot j:       (wp - 1 - j) mod B          (0 = newest)
  * validity:            time < query_time  and  id != PAD
  * recency rank r_j:    #valid slots with smaller age       (B×B compare)
  * selected iff r_j < K, output column K-1-r_j
  * outputs = one-hot(selection)^T @ buffer row    — small MXU matmuls

Grid: contiguous blocks of seeds; Pallas double-buffers the HBM→VMEM block
DMAs. Interpret mode makes the same kernel testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import PADDED_NODE_ID


def _kernel(qt_ref, wp_ref, ids_ref, times_ref, feats_ref,
            out_ids_ref, out_times_ref, out_feats_ref, *, K: int):
    ids = ids_ref[...]  # (SB, B)
    times = times_ref[...]  # (SB, B)
    SB, B = ids.shape

    wp = wp_ref[..., 0]  # (SB,)
    qt = qt_ref[..., 0]  # (SB,)

    slot = jax.lax.broadcasted_iota(jnp.int32, (SB, B), 1)
    age = (wp[:, None] - 1 - slot) % B  # 0 = newest
    valid = (times < qt[:, None]) & (ids != PADDED_NODE_ID)

    # rank[j] = number of valid slots strictly more recent (smaller age).
    more_recent = (age[:, None, :] < age[:, :, None]) & valid[:, None, :]
    rank = jnp.sum(more_recent.astype(jnp.int32), axis=2)  # (SB, B)

    selected = valid & (rank < K)
    # Mosaic can't insert minor dims on 1-bit vectors: do the one-hot algebra
    # in int32 (col==k as i1 is fine; the broadcasts happen on int32).
    col = jnp.where(selected, K - 1 - rank, -1)  # output column, newest at K-1
    kcols = jax.lax.broadcasted_iota(jnp.int32, (SB, B, K), 2)
    onehot_i = (col[:, :, None] == kcols).astype(jnp.int32)  # (SB, B, K)
    oh = onehot_i.astype(jnp.float32)

    picked = jnp.sum(onehot_i, axis=1) > 0  # (SB, K) any writer per column
    # Integer one-hot reduce for ids/times (float matmul would lose precision
    # above 2^24); the MXU matmul is reserved for the feature payload.
    sel_ids = jnp.sum(onehot_i * ids[:, :, None], axis=1)
    sel_times = jnp.sum(onehot_i * times[:, :, None], axis=1)
    out_ids_ref[...] = jnp.where(picked, sel_ids, PADDED_NODE_ID)
    out_times_ref[...] = jnp.where(picked, sel_times, 0)

    feats = feats_ref[...]  # (SB, B, D)
    # Exact one-hot select on the VPU: an MXU einsum would round the copied
    # features through bf16. K is small and static; each step is a masked
    # (SB, B, D) reduce.
    for kk in range(K):
        sel = oh[:, :, kk][:, :, None]  # (SB, B, 1) of exact {0.0, 1.0}
        out_feats_ref[:, kk, :] = jnp.sum(sel * feats, axis=1)


def _kernel_eid(qt_ref, wp_ref, ids_ref, times_ref, eids_ref,
                out_ids_ref, out_times_ref, out_eids_ref, *, K: int):
    """Integer-only window select: ids/times/edge-ids, no feature payload.

    Used by the eid-buffer recency layout where edge features live in the
    static edge_x array and are gathered AFTER selection — this removes the
    (N, B, D) feature buffer from the scan carry entirely (the per-step
    layout copy of that buffer was ~15% of the TGN epoch on v5e).
    """
    ids = ids_ref[...]  # (SB, B)
    times = times_ref[...]
    eids = eids_ref[...]
    SB, B = ids.shape

    wp = wp_ref[..., 0]
    qt = qt_ref[..., 0]

    slot = jax.lax.broadcasted_iota(jnp.int32, (SB, B), 1)
    age = (wp[:, None] - 1 - slot) % B  # 0 = newest
    valid = (times < qt[:, None]) & (ids != PADDED_NODE_ID)

    more_recent = (age[:, None, :] < age[:, :, None]) & valid[:, None, :]
    rank = jnp.sum(more_recent.astype(jnp.int32), axis=2)  # (SB, B)

    selected = valid & (rank < K)
    col = jnp.where(selected, K - 1 - rank, -1)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (SB, B, K), 2)
    onehot_i = (col[:, :, None] == kcols).astype(jnp.int32)  # (SB, B, K)

    picked = jnp.sum(onehot_i, axis=1) > 0  # (SB, K)
    sel_ids = jnp.sum(onehot_i * ids[:, :, None], axis=1)
    sel_times = jnp.sum(onehot_i * times[:, :, None], axis=1)
    sel_eids = jnp.sum(onehot_i * eids[:, :, None], axis=1)
    out_ids_ref[...] = jnp.where(picked, sel_ids, PADDED_NODE_ID)
    out_times_ref[...] = jnp.where(picked, sel_times, 0)
    out_eids_ref[...] = jnp.where(picked, sel_eids, -1)


def _kernel_eid_lanes(qt_ref, wp_ref, ids_ref, times_ref, eids_ref,
                      out_ids_ref, out_times_ref, out_eids_ref, *, K: int):
    """Transposed variant of ``_kernel_eid``: SEEDS on the 128-lane axis.

    The row-major kernel keeps the buffer axis (B≈10) minor, so every
    (SB, B[, K]) intermediate pads B→128 lanes — 12.8x wasted VPU lanes and
    a 16 MB scoped-VMEM blowup above block 512 (measured 91 us/1k rows at
    eval seed counts, pure latency). With seeds minor, the (B, B, S) rank
    compare and (B, K, S) one-hot use every lane; only the B→16 sublane pad
    remains."""
    ids = ids_ref[...]  # (B, SB)
    times = times_ref[...]
    eids = eids_ref[...]
    B, SB = ids.shape

    wp = wp_ref[0, :]  # (SB,)
    qt = qt_ref[0, :]

    slot = jax.lax.broadcasted_iota(jnp.int32, (B, SB), 0)
    age = (wp[None, :] - 1 - slot) % B  # 0 = newest
    valid = (times < qt[None, :]) & (ids != PADDED_NODE_ID)

    # rank[j, s] = #valid slots of seed s strictly more recent than slot j.
    more_recent = (age[None, :, :] < age[:, None, :]) & valid[None, :, :]
    rank = jnp.sum(more_recent.astype(jnp.int32), axis=1)  # (B, SB)

    selected = valid & (rank < K)
    col = jnp.where(selected, K - 1 - rank, -1)  # output row, newest at K-1
    kcols = jax.lax.broadcasted_iota(jnp.int32, (B, K, SB), 1)
    onehot = (col[:, None, :] == kcols).astype(jnp.int32)  # (B, K, SB)

    picked = jnp.sum(onehot, axis=0) > 0  # (K, SB)
    sel_ids = jnp.sum(onehot * ids[:, None, :], axis=0)
    sel_times = jnp.sum(onehot * times[:, None, :], axis=0)
    sel_eids = jnp.sum(onehot * eids[:, None, :], axis=0)
    out_ids_ref[...] = jnp.where(picked, sel_ids, PADDED_NODE_ID)
    out_times_ref[...] = jnp.where(picked, sel_times, 0)
    out_eids_ref[...] = jnp.where(picked, sel_eids, -1)


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def recency_window_select_eid_lanes(
    ids: jnp.ndarray,  # (S, B) int32 buffer rows (pre-gathered per seed)
    times: jnp.ndarray,  # (S, B) int32
    eids: jnp.ndarray,  # (S, B) int32 edge ids
    write_pos: jnp.ndarray,  # (S,) int32
    query_times: jnp.ndarray,  # (S,) int32
    k: int,
    block: int = 2048,
    interpret: bool = False,
):
    """Lane-major window select (same contract as recency_window_select_eid)."""
    S, B = ids.shape
    idsT = ids.T  # (B, S)
    timesT = times.T
    eidsT = eids.T
    if S % block != 0:
        pad = block - S % block
        idsT = jnp.pad(idsT, ((0, 0), (0, pad)), constant_values=PADDED_NODE_ID)
        timesT = jnp.pad(timesT, ((0, 0), (0, pad)))
        eidsT = jnp.pad(eidsT, ((0, 0), (0, pad)), constant_values=-1)
        write_pos = jnp.pad(write_pos, (0, pad))
        query_times = jnp.pad(query_times, (0, pad))
    Sp = idsT.shape[1]
    grid = (Sp // block,)

    col = lambda i: (0, i)
    out = pl.pallas_call(
        functools.partial(_kernel_eid_lanes, K=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, Sp), jnp.int32),
            jax.ShapeDtypeStruct((k, Sp), jnp.int32),
            jax.ShapeDtypeStruct((k, Sp), jnp.int32),
        ],
        interpret=interpret,
    )(query_times[None, :], write_pos[None, :], idsT, timesT, eidsT)
    out_ids, out_times, out_eids = out
    return out_ids[:, :S].T, out_times[:, :S].T, out_eids[:, :S].T


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def recency_window_select_eid(
    ids: jnp.ndarray,  # (S, B) int32 buffer rows (pre-gathered per seed)
    times: jnp.ndarray,  # (S, B) int32
    eids: jnp.ndarray,  # (S, B) int32 edge ids
    write_pos: jnp.ndarray,  # (S,) int32
    query_times: jnp.ndarray,  # (S,) int32
    k: int,
    block: int = 128,
    interpret: bool = False,
):
    """Select each seed's K most recent (id, time, edge-id) before its time."""
    S, B = ids.shape
    if S % block != 0:
        pad = block - S % block
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=PADDED_NODE_ID)
        times = jnp.pad(times, ((0, pad), (0, 0)))
        eids = jnp.pad(eids, ((0, pad), (0, 0)), constant_values=-1)
        write_pos = jnp.pad(write_pos, (0, pad))
        query_times = jnp.pad(query_times, (0, pad))
    Sp = ids.shape[0]
    grid = (Sp // block,)

    row = lambda i: (i, 0)
    out = pl.pallas_call(
        functools.partial(_kernel_eid, K=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, k), jnp.int32),
            jax.ShapeDtypeStruct((Sp, k), jnp.int32),
            jax.ShapeDtypeStruct((Sp, k), jnp.int32),
        ],
        interpret=interpret,
    )(query_times[:, None], write_pos[:, None], ids, times, eids)
    out_ids, out_times, out_eids = out
    return out_ids[:S], out_times[:S], out_eids[:S]


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def recency_window_select(
    ids: jnp.ndarray,  # (S, B) int32 buffer rows (pre-gathered per seed)
    times: jnp.ndarray,  # (S, B) int32
    feats: jnp.ndarray,  # (S, B, D) f32
    write_pos: jnp.ndarray,  # (S,) int32
    query_times: jnp.ndarray,  # (S,) int32
    k: int,
    block: int = 64,
    interpret: bool = False,
):
    """Fused selection of each seed's K most recent events before its time."""
    S, B = ids.shape
    D = feats.shape[-1]
    if S % block != 0:
        pad = block - S % block
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=PADDED_NODE_ID)
        times = jnp.pad(times, ((0, pad), (0, 0)))
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
        write_pos = jnp.pad(write_pos, (0, pad))
        query_times = jnp.pad(query_times, (0, pad))
    Sp = ids.shape[0]
    grid = (Sp // block,)

    row = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, K=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, B, D), row3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k, D), row3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, k), jnp.int32),
            jax.ShapeDtypeStruct((Sp, k), jnp.int32),
            jax.ShapeDtypeStruct((Sp, k, D), jnp.float32),
        ],
        interpret=interpret,
    )(query_times[:, None], write_pos[:, None], ids, times, feats)
    out_ids, out_times, out_feats = out
    return out_ids[:S], out_times[:S], out_feats[:S]
