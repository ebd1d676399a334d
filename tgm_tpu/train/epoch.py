"""Fully-scanned epoch execution."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class StaticTablesMixin:
    """Expose a pipeline's large read-only arrays for argument-passing jits.

    Subclasses list attribute names in ``_TABLE_ATTRS``; ``tables`` snapshots
    the non-None ones and ``bind_tables`` temporarily rebinds them (to jit
    tracers during tracing) so ``jit_scan_epoch(..., tables=..., bind=...)``
    passes them as program parameters instead of embedded constants."""

    _TABLE_ATTRS: Tuple[str, ...] = ()

    @property
    def tables(self):
        return {
            a: getattr(self, a)
            for a in self._TABLE_ATTRS
            if getattr(self, a) is not None
        }

    @contextmanager
    def bind_tables(self, tbl):
        old = {a: getattr(self, a) for a in tbl}
        try:
            for a, v in tbl.items():
                setattr(self, a, v)
            yield
        finally:
            for a, v in old.items():
                setattr(self, a, v)


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
                   unroll: int = 1, tables: Any = None, bind: Callable = None):
    """Return a jitted ``epoch(carry) -> (carry, outs)``.

    ``tables``/``bind``: large read-only arrays ``step_fn`` closes over (e.g.
    a pipeline's static feature tables). Closed-over ``jax.Array``s are
    EMBEDDED as constants in the lowered program — a couple of 100MB+ tables
    makes the serialized HLO exceed what remote-compile services accept (the
    tgbl-wiki TGAT aug-table epoch lowered to 657MB of stablehlo and died
    with HTTP 413). When given, ``bind(tables)`` must be a context manager
    that temporarily points the closure's attributes at the traced values, so
    the tables enter the program as ordinary parameters instead."""

    if tables is None:
        def epoch(carry):
            return scan_epoch(step_fn, batch_at, carry, num_batches,
                              unroll=unroll)

        return jax.jit(epoch, donate_argnums=(0,) if donate_carry else ())

    def epoch_t(carry, tbl):
        with bind(tbl):
            return scan_epoch(step_fn, batch_at, carry, num_batches,
                              unroll=unroll)

    jitted = jax.jit(epoch_t, donate_argnums=(0,) if donate_carry else ())
    return lambda carry: jitted(carry, tables)
