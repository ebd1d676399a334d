"""Sharding layouts for temporal-GNN training state.

New first-class component (no reference counterpart — SURVEY.md §2.2): the
TPU scaling strategy is

* **DP over the edge stream**: each batch's edge axis is sharded across the
  'data' mesh axis — every chip processes a contiguous slice of the batch.
* **Node-sharded state**: TGN memory rows, recency ring buffers, and message
  stores are sharded by node id across the same axis. Cross-chip
  reads/updates (a chip's edges touching another chip's nodes) lower to XLA
  all-to-all / all-gather collectives inserted by GSPMD — no hand-written
  NCCL-style code.
* **Replicated params/optimizer**: model weights are tiny relative to state;
  gradients all-reduce via psum under jit.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.tgn_pipeline import TGNCarry


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_leading_axis(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Sharding pytree: leading axis of every array split over ``axis``."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def tgn_carry_shardings(mesh: Mesh, carry: TGNCarry, axis: str = "data") -> TGNCarry:
    """Sharding layout for a TGN training carry.

    Memory/recency state rows are node-sharded; params/opt replicated; rng
    replicated.
    """
    return TGNCarry(
        params=replicate_tree(mesh, carry.params),
        opt_state=replicate_tree(mesh, carry.opt_state),
        mem_state=shard_leading_axis(mesh, carry.mem_state, axis),
        rec_state=shard_leading_axis(mesh, carry.rec_state, axis),
        rng=NamedSharding(mesh, P()),
    )


def batch_shardings(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """DP layout: edge axis of every batch array sharded over ``axis``."""
    return shard_leading_axis(mesh, batch, axis)


def tp_param_shardings(mesh: Mesh, params: Any, axis: str = "model") -> Any:
    """Tensor-parallel parameter layout: matrices whose output (last) dim
    divides the ``axis`` size are column-sharded; everything else replicated.

    With batch activations replicated along ``axis``, XLA partitions each
    matmul column-wise and all-gathers activations where consumers need the
    full feature dim — classic Megatron-style TP, derived entirely by GSPMD.
    """
    size = mesh.shape[axis]

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[-1] % size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def tgat_carry_shardings(mesh: Mesh, carry: Any, axis: str = "data") -> Any:
    """Sharding layout for a TGAT training carry (params, opt_state,
    rec_state, rng): recency rows node-sharded, params/opt replicated."""
    from ..train.tgat_pipeline import TGATCarry

    return TGATCarry(
        params=replicate_tree(mesh, carry.params),
        opt_state=replicate_tree(mesh, carry.opt_state),
        rec_state=shard_leading_axis(mesh, carry.rec_state, axis),
        rng=NamedSharding(mesh, P()),
    )


def tgat_carry_shardings_2d(mesh: Mesh, carry: Any) -> Any:
    """DP + TP layout for a TGAT carry on a ('data', 'model') mesh."""
    from ..train.tgat_pipeline import TGATCarry

    return TGATCarry(
        params=tp_param_shardings(mesh, carry.params),
        opt_state=tp_param_shardings(mesh, carry.opt_state),
        rec_state=shard_leading_axis(mesh, carry.rec_state, "data"),
        rng=NamedSharding(mesh, P()),
    )


def tgn_carry_shardings_2d(mesh: Mesh, carry: TGNCarry) -> TGNCarry:
    """DP + TP layout on a ('data', 'model') mesh: node-state rows sharded on
    'data', parameter matrices column-sharded on 'model', optimizer moments
    following the params, rng replicated."""
    return TGNCarry(
        params=tp_param_shardings(mesh, carry.params),
        opt_state=tp_param_shardings(mesh, carry.opt_state),
        mem_state=shard_leading_axis(mesh, carry.mem_state, "data"),
        rec_state=shard_leading_axis(mesh, carry.rec_state, "data"),
        rng=NamedSharding(mesh, P()),
    )
