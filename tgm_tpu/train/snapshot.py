"""Fully-scanned snapshot (DTDG) epochs.

The reference's snapshot examples interleave two host loaders: a discretized
snapshot loader advances the recurrent state while an event loader drives
prediction batches (/root/reference/examples/linkproppred/gclstm.py:187-208).
The interleave order is data-dependent in the eager loop ("advance snapshots
until the last batch's max time is covered") but both loaders' plans are known
on host before the epoch starts — so the merged order is *precomputable*, and
the whole two-loader epoch can run as ONE ``lax.scan`` over a static
(kind, index) schedule with a ``lax.cond`` body. Zero host dispatch per step.

``merged_snapshot_schedule`` replicates the eager interleave exactly (one
snapshot applied up-front, then "advance while t_max > (snap_end+1)*ticks");
``scanned_snapshot_epoch`` compiles the merged program.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def plan_edge_max_times(plan, edge_times: np.ndarray) -> np.ndarray:
    """Per-batch max edge timestamp from a host-side ``BatchPlan``.

    ``edge_times`` is the split's time-sorted edge timestamp array; a batch's
    max time is therefore its window's last row. Batches with zero edge events
    report 0 (matching ``edge_time.max()`` over a zero-padded empty window).
    """
    off = plan.edge_offsets
    cnt = plan.edge_counts
    last = np.clip(off + cnt - 1, 0, max(len(edge_times) - 1, 0))
    out = np.where(cnt > 0, edge_times[last], 0)
    return out.astype(np.int64)


def merged_snapshot_schedule(
    snap_max_times: np.ndarray,
    batch_max_times: np.ndarray,
    conversion: int,
    apply_first: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute the (kind, index) step sequence of the two-loader interleave.

    kind 0 = advance the snapshot recurrence with snapshot batch ``idx``;
    kind 1 = train/eval on event batch ``idx``. Replicates the eager loop:
    the first snapshot is consumed before any event batch, and after each
    event batch snapshots advance while ``t_max > (snap_end + 1) * conversion``
    (``snap_end`` in discretized ticks, ``t_max`` in raw units) until the
    snapshot stream is exhausted.

    ``apply_first=False`` replicates the reference's *eval* loops
    (/root/reference/examples/linkproppred/gclstm.py:137-160): the first
    snapshot batch is consumed as the initial ``snap_end`` marker but NOT run
    through the encoder (the recurrent state arrives from training).
    """
    kinds: list[int] = []
    idxs: list[int] = []
    n_snap = len(snap_max_times)
    si = 0
    snap_end = None
    if n_snap > 0:
        if apply_first:
            kinds.append(0)
            idxs.append(0)
        snap_end = int(snap_max_times[0])
        si = 1
    for b, tmax in enumerate(batch_max_times):
        kinds.append(1)
        idxs.append(b)
        if snap_end is None:
            continue
        while si < n_snap and int(tmax) > (snap_end + 1) * conversion:
            kinds.append(0)
            idxs.append(si)
            snap_end = int(snap_max_times[si])
            si += 1
    return np.asarray(kinds, np.int32), np.asarray(idxs, np.int32)


def scanned_snapshot_epoch(
    kinds: np.ndarray,
    idxs: np.ndarray,
    snap_batch_at: Callable[[jnp.ndarray], Any],
    edge_batch_at: Callable[[jnp.ndarray], Any],
    snapshot_core: Callable[[Any, Any], Any],
    edge_core: Callable[[Any, Any, jnp.ndarray], Tuple[Any, Tuple[jnp.ndarray, jnp.ndarray]]],
    donate_carry: bool = True,
):
    """One jitted XLA program for the merged snapshot epoch.

    ``snapshot_core(carry, snapshot_batch) -> carry`` advances the recurrence
    (it owns where in the carry the embeddings ``z`` live);
    ``edge_core(carry, event_batch, batch_idx) -> (carry, (a, b))`` handles a
    prediction batch and emits a scalar pair — (loss, 1) for training, or
    (mrr_sum, count) for evaluation. Returns ``epoch(carry) -> (carry, a, b)``
    with per-step arrays (0 on snapshot steps); the epoch metric is
    ``sum(a) / sum(b)``.
    """
    kinds_d = jnp.asarray(kinds)
    idxs_d = jnp.asarray(idxs)
    n_steps = int(len(kinds))

    def epoch(carry):
        def body(c, step_i):
            kind = kinds_d[step_i]
            idx = idxs_d[step_i]

            def snap_branch(c):
                return snapshot_core(c, snap_batch_at(idx)), jnp.float32(0.0), jnp.float32(0.0)

            def edge_branch(c):
                c2, (a, b) = edge_core(c, edge_batch_at(idx), idx)
                return c2, a.astype(jnp.float32), b.astype(jnp.float32)

            c, a, b = lax.cond(kind == 0, snap_branch, edge_branch, c)
            return c, (a, b)

        carry, (a, b) = lax.scan(body, carry, jnp.arange(n_steps))
        return carry, a, b

    return jax.jit(epoch, donate_argnums=(0,) if donate_carry else ())
