"""Fully-scanned epoch execution."""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def scan_epoch(
    step_fn: Callable[[Any, Any], Tuple[Any, Any]],
    batch_at: Callable[[jnp.ndarray], Any],
    carry: Any,
    num_batches: int,
    unroll: int = 1,
) -> Tuple[Any, Any]:
    """Run ``num_batches`` steps under one ``lax.scan``.

    ``batch_at(i)`` materializes batch i on device (e.g.
    ``DeviceEdgeStream.batch_at``); the whole epoch compiles to a single XLA
    program with no per-step host dispatch. ``unroll`` > 1 replicates the body
    inside the loop — larger programs/compiles, but latency-bound bodies can
    overlap across iterations.
    """

    def body(c, i):
        return step_fn(c, batch_at(i))

    return lax.scan(body, carry, jnp.arange(num_batches), unroll=unroll)


def jit_scan_epoch(step_fn, batch_at, num_batches, donate_carry: bool = True,
                   unroll: int = 1):
    """Return a jitted ``epoch(carry) -> (carry, outs)``."""

    def epoch(carry):
        return scan_epoch(step_fn, batch_at, carry, num_batches, unroll=unroll)

    return jax.jit(epoch, donate_argnums=(0,) if donate_carry else ())
