"""Hook protocol and base classes.

Parity: reference hook protocol (/root/reference/tgm/hooks/base.py:11-103) —
``DGHook`` runtime-checkable protocol (requires/produces/__call__/reset_state/
has_state), ``StatelessHook``/``StatefulHook``/``SeedableHook`` bases,
per-instance ``_id`` suffixing of produced attributes.

TPU-first design: a stateful hook's state is an explicit **jax pytree**, not
hidden torch buffers. Every hook factors into

    ``apply(state, batch) -> (state, batch)``    (pure, jittable)

with ``__call__(dg, batch)`` as the eager convenience wrapper that lazily
initializes state from the graph, invokes the (jitted) pure core, and stores
the new state on the instance. The HookManager composes the pure cores into a
single jitted pipeline per key; ``lax.scan`` epochs thread the same state.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, List, Optional, Protocol, Set, Tuple, runtime_checkable

from ..core.batch import DGBatch
from ..core.graph import DGraph


@runtime_checkable
class DGHook(Protocol):
    """Behaviors executed on each materialized batch during iteration."""

    has_state: bool

    @property
    def requires(self) -> Set[str]: ...

    @property
    def produces(self) -> Set[str]: ...

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch: ...

    def reset_state(self) -> None: ...


class BaseDGHook(ABC):
    """Common machinery: requires/produces resolution and id suffixing."""

    _cls_requires: Set[str] = set()
    _cls_produces: Set[str] = set()

    has_state: bool = False

    def __init__(
        self,
        requires: Optional[Set[str]] = None,
        produces: Optional[Set[str]] = None,
        id: Optional[str] = None,
    ) -> None:
        self._requires: Set[str] = set(requires or set()) | set(self._cls_requires)
        self._produces: Set[str] = set(produces or set()) | set(self._cls_produces)
        self._id = id

    @property
    def requires(self) -> Set[str]:
        return self._requires

    @property
    def produces(self) -> Set[str]:
        if self._id is None:
            return self._produces
        return {f"{p}_{self._id}" for p in self._produces}

    def __repr__(self) -> str:
        name = type(self).__name__
        return f"{name}_{self._id}" if self._id else name

    def add_batch_attribute(self, batch: DGBatch, name: str, value: Any) -> None:
        """Attach ``value`` to the batch (suffixed with the hook id if set)."""
        if self._id:
            name = f"{name}_{self._id}"
        setattr(batch, name, value)

    def get_batch_attribute(self, batch: DGBatch, name: str) -> Any:
        if self._id:
            name = f"{name}_{self._id}"
        return getattr(batch, name)

    @abstractmethod
    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        raise NotImplementedError

    def reset_state(self) -> None:
        pass

    # ------------------------------------------------------------------ #
    # Functional interface (overridden by stateful hooks)
    # ------------------------------------------------------------------ #
    def init_state(self, dg: DGraph) -> Any:
        """Build this hook's initial state pytree from the graph (None if stateless)."""
        return None

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        """Pure transition: ``(state, batch) -> (state, batch')``.

        Default: delegate to the eager ``__call__`` for stateless hooks.
        """
        raise NotImplementedError

    def jit_apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        """``apply`` compiled once per (state, batch) structure.

        Eager per-op dispatch is prohibitively slow on remote TPU runtimes;
        hooks route their ``__call__`` through this so a whole hook transition
        is a single XLA executable.
        """
        import jax

        if not hasattr(self, "_apply_jitted"):
            self._apply_jitted = jax.jit(self.apply)
        return self._apply_jitted(state, batch)


class StatelessHook(BaseDGHook):
    has_state: bool = False


class StatefulHook(BaseDGHook):
    has_state: bool = True


class SeedableHook(BaseDGHook):
    """Hooks that read extra batch attributes named by ``seed_keys``."""

    def __init__(self, *args: Any, seed_keys: Optional[List[str]] = None, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.seed_keys: List[str] = list(seed_keys or [])
        self._requires.update(self.seed_keys)
