"""Scanned hook-pipeline epochs: the advertised HookManager API at scan speed.

The hand-fused pipelines (``TGNPipeline``/``TGATPipeline``) run a whole epoch
as one ``lax.scan`` but bypass the hook system. This module gives the *hook
API* the same execution model: ``HookManager.as_transform`` exports the
resolved hook DAG as a pure ``(states, batch) -> (states, batch)`` function,
which is composed with a ``DeviceEdgeStream`` window and a user model step
into a single scanned XLA program per epoch — no host Python between batches.

Reference contract being accelerated: per-batch hook execution inside the
loader loop (/root/reference/tgm/data/loader.py:158-170,
/root/reference/tgm/hooks/hook_manager.py:139-168).

Usage::

    stream = DeviceEdgeStream(train_dg, bsize)
    epoch, hook_states = scanned_hook_epoch(stream, hm, "train", train_dg, step)
    carry, hook_states, losses = epoch(carry, hook_states)
    hm.adopt_states("train", hook_states)   # hand state back to eager hooks
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.graph import DGraph


def scanned_hook_epoch(
    stream: Any,
    hm: Any,
    key: str,
    dg: DGraph,
    step_fn: Callable[[Any, Any], Tuple[Any, Any]],
    donate: bool = True,
    compiler_options: Any = None,
    unroll: int = 1,
):
    """Compile one scanned epoch over ``stream`` with ``key``'s hook pipeline.

    Returns ``(epoch_fn, init_hook_states)`` with
    ``epoch_fn(carry, hook_states) -> (carry, hook_states, outs)`` where
    ``step_fn(carry, hook_enriched_batch) -> (carry, out)`` is the model step.
    Existing hook state (e.g. recency buffers carried from a previous split)
    is reused; hooks without live state are initialized from ``dg``.

    ``compiler_options``: optional dict of XLA per-compile option overrides
    (e.g. TPU memory-space-assignment knobs, which the local CPU-side
    XLA_FLAGS parser would reject).
    """
    hook_fn, init_states = hm.as_transform(key, dg)
    n = stream.num_batches

    def epoch(carry, hook_states):
        def body(c, i):
            carry, hstates = c
            batch = stream.batch_at(i)
            hstates, batch = hook_fn(hstates, batch)
            carry, out = step_fn(carry, batch)
            return (carry, hstates), out

        (carry, hook_states), outs = lax.scan(
            body, (carry, hook_states), jnp.arange(n), unroll=unroll
        )
        return carry, hook_states, outs

    # Donate only the model carry: hook states returned by as_transform can
    # alias the hooks' live ``h.state`` buffers — donating them would leave
    # eager hooks holding deleted arrays if the caller interleaves execution
    # modes or the epoch aborts before adopt_states.
    jit_epoch = jax.jit(epoch, donate_argnums=(0,) if donate else (),
                        compiler_options=compiler_options)
    return jit_epoch, init_states


__all__ = ["scanned_hook_epoch"]
