"""HookManager: keyed hook sets with dependency-resolved execution.

Parity: reference ``HookManager`` (/root/reference/tgm/hooks/hook_manager.py:38-462)
— keyed + shared hooks, lazy Kahn topological sort over requires/produces with
the implicit negatives-before-neighbor-samplers edge, ``activate`` context
manager, per-key ``reset_state``, and ``validate_requirement`` with fuzzy
(difflib) suggestions against the hook registry.

TPU addition: ``as_transform(key, dg)`` exports the resolved hook pipeline as a
pure function ``(states, batch) -> (states, batch)`` over the hooks' state
pytrees, ready for ``jax.jit`` / ``lax.scan`` epochs; ``collect_states`` /
``load_states`` move hook state in and out for checkpointing.
"""

from __future__ import annotations

import difflib
import time
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Any, Callable, Dict, Iterator, List, Optional, Set, Tuple

from ..core.batch import DGBatch
from ..core.graph import DGraph
from ..exceptions import (
    BadEncoderProtocolError,
    BadHookProtocolError,
    UnresolvableHookDependenciesError,
)
from ..util.logging import _get_logger
from .base import DGHook
from .registry import list_hooks

logger = _get_logger(__name__)

# Attributes always present on a materialized batch (never hook-produced).
CORE_ATTRIBUTE: Set[str] = {
    "edge_src",
    "edge_dst",
    "edge_time",
    "edge_valid",
    "edge_ids",
    "edge_type",
    "node_x_time",
    "node_x_nids",
    "node_y_time",
    "node_y_nids",
    "node_type",
}


class HookManager:
    """Manages shared + key-specific hook sets for batch enrichment."""

    def __init__(self, keys: List[str]) -> None:
        if not len(keys):
            raise ValueError("HookManager keys list must be non-empty")
        self._dirty: Dict[str, bool] = {k: True for k in keys}
        self._key_to_hooks: Dict[str, List[DGHook]] = {k: [] for k in keys}
        self._shared_hooks: List[DGHook] = []
        self._active_key: Optional[str] = None
        self._registered_keys = list(keys)

    @property
    def keys(self) -> List[str]:
        return self._registered_keys

    # ------------------------------------------------------------------ #
    # Registration
    # ------------------------------------------------------------------ #
    def register_shared(self, hook: DGHook) -> None:
        self._ensure_valid_hook(hook)
        self._ensure_no_active_key()
        self._shared_hooks.append(hook)
        for k in self._dirty:
            self._dirty[k] = True

    def register(self, key: str, hook: DGHook) -> None:
        self._ensure_valid_key(key)
        self._ensure_valid_hook(hook)
        self._ensure_no_active_key()
        self._key_to_hooks[key].append(hook)
        self._dirty[key] = True

    # ------------------------------------------------------------------ #
    # Activation / execution
    # ------------------------------------------------------------------ #
    def set_active_hooks(self, key: str) -> None:
        self._ensure_valid_key(key)
        self._active_key = key

    @contextmanager
    def activate(self, key: str) -> Iterator[None]:
        prev = self._active_key
        self.set_active_hooks(key)
        try:
            yield
        finally:
            self._active_key = prev

    @property
    def active_key(self) -> Optional[str]:
        return self._active_key

    def execute_active_hooks(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self._active_key is None:
            raise RuntimeError("No active key set. Use activate() context manager.")
        key = self._active_key
        if self._dirty[key]:
            self.resolve_hooks(key)
        for hook in self._key_to_hooks[key]:
            t0 = time.perf_counter()
            batch = hook(dg, batch)
            logger.debug(
                "%s hook executed in %.4fs", type(hook).__name__, time.perf_counter() - t0
            )
        return batch

    def reset_state(self, key: Optional[str] = None) -> None:
        if key is not None:
            self._ensure_valid_key(key)
        for hook in self._shared_hooks:
            hook.reset_state()
        for k in [key] if key is not None else list(self._key_to_hooks):
            for h in self._key_to_hooks[k]:
                h.reset_state()

    # ------------------------------------------------------------------ #
    # Dependency resolution
    # ------------------------------------------------------------------ #
    def resolve_hooks(self, key: Optional[str] = None) -> None:
        if key is not None:
            self._ensure_valid_key(key)
        for k in [key] if key else list(self._key_to_hooks):
            hooks = self._shared_hooks + [
                h for h in self._key_to_hooks[k] if h not in self._shared_hooks
            ]
            self._key_to_hooks[k] = self._topological_sort_hooks(hooks)
            self._dirty[k] = False

    @staticmethod
    def _topological_sort_hooks(hooks: List[DGHook]) -> List[DGHook]:
        all_produced: Set[str] = set(CORE_ATTRIBUTE)
        for h in hooks:
            all_produced |= h.produces
        missing: Set[str] = set()
        for h in hooks:
            missing |= h.requires - all_produced
        if missing:
            raise UnresolvableHookDependenciesError(
                f"Cannot resolve hook dependencies: required attributes not produced "
                f"by any hook: {missing}"
            )

        adj: Dict[DGHook, List[DGHook]] = defaultdict(list)
        is_neg = lambda h: "neg" in h.produces
        is_nbr = lambda h: any("nbr_nids" in p for p in h.produces)
        for h1 in hooks:
            for h2 in hooks:
                if h1 is h2:
                    continue
                if h1.produces & h2.requires:
                    adj[h1].append(h2)
                # Implicit ordering: negatives before neighbor samplers so
                # neighbor hops cover the negative seeds (reference
                # hook_manager.py:420-430).
                if is_neg(h1) and is_nbr(h2):
                    adj[h1].append(h2)

        indeg: Dict[DGHook, int] = {h: 0 for h in hooks}
        for u, vs in adj.items():
            for v in vs:
                indeg[v] += 1
        queue = deque([h for h in hooks if indeg[h] == 0])
        ordered: List[DGHook] = []
        while queue:
            u = queue.popleft()
            ordered.append(u)
            for v in adj.get(u, []):
                indeg[v] -= 1
                if indeg[v] == 0:
                    queue.append(v)
        if len(ordered) != len(hooks):
            unresolved = [h for h in hooks if h not in ordered]
            produced = set(CORE_ATTRIBUTE)
            for u in ordered:
                produced |= u.produces
            msg = "Cannot resolve hook dependencies:\n"
            for h in unresolved:
                msg += f"\n - {h!r} requires {h.requires - produced} but not produced (or stuck in cycle)"
            raise UnresolvableHookDependenciesError(msg)
        return ordered

    # ------------------------------------------------------------------ #
    # Requirement validation (with fuzzy suggestions)
    # ------------------------------------------------------------------ #
    def validate_requirement(self, module: Any, key: Optional[str] = None) -> None:
        from ..nn.base import EncoderModule

        if not isinstance(module, EncoderModule):
            raise BadEncoderProtocolError(
                f"Cannot validate {type(module).__name__}: must implement "
                "__call__(self, batch, *args, **kwargs) and have a `requires` attribute"
            )
        if key is not None:
            self._ensure_valid_key(key)
        keys = [key] if key else list(self._key_to_hooks)
        for k in keys:
            hooks = self._shared_hooks + [
                h for h in self._key_to_hooks[k] if h not in self._shared_hooks
            ]
            produced = set(CORE_ATTRIBUTE)
            for h in hooks:
                produced |= h.produces
            unresolved = set(module.requires) - produced
            if not unresolved:
                continue
            suggestions = []
            for attr in sorted(unresolved):
                suggestions.append(f"  - {attr!r}: {self._suggest(attr, produced, k)}")
            raise UnresolvableHookDependenciesError(
                f"Cannot resolve the following requirements {unresolved} from any "
                f"hook registered under key {k!r}.\nSuggestions:\n" + "\n".join(suggestions)
            )

    @staticmethod
    def _suggest(attr: str, produced: Set[str], key: str) -> str:
        close = difflib.get_close_matches(attr, produced, n=2, cutoff=0.6)
        if close:
            alts = " or ".join(repr(c) for c in close)
            return (
                f"Do you mean {alts}? If so, update the module requirement with the "
                f"correct name."
            )
        # Scan registered hook classes for the keyword in produces or docs.
        for cls in list_hooks():
            cls_produces = getattr(cls, "_cls_produces", set())
            doc = (cls.__doc__ or "").lower()
            if attr in cls_produces or attr.lower() in doc:
                return (
                    f"Found keyword {attr!r} in {cls.__name__!r}. If this hook produces "
                    f"what you are looking for, register {cls.__name__!r} with key {key!r}."
                )
        return "Can not find any existing hooks that satisfy this requirement."

    # ------------------------------------------------------------------ #
    # Functional export (TPU path)
    # ------------------------------------------------------------------ #
    def as_transform(
        self, key: str, dg: DGraph
    ) -> Tuple[Callable[[List[Any], DGBatch], Tuple[List[Any], DGBatch]], List[Any]]:
        """Export the resolved pipeline for ``key`` as a pure function.

        Returns ``(fn, init_states)`` where ``fn(states, batch)`` applies every
        hook's pure core in topological order. Stateless hooks contribute
        ``None`` state entries. The function is jit/scan-safe as long as every
        registered hook implements ``apply``.
        """
        if self._dirty[key]:
            self.resolve_hooks(key)
        hooks = self._key_to_hooks[key]
        # Reuse live state (e.g. recency buffers carried over from a previous
        # split's iteration) so scanned and eager execution interleave freely.
        # A freshly-initialized state is CACHED on the hook: init_state may
        # fork the global PRNG (negative samplers), so without caching a
        # repeated export — or an eager step after an export — would run from
        # a different random stream than the first export (observed as a
        # batch-0 negatives divergence between scanned and eager epochs).
        def state_of(h: DGHook) -> Any:
            if not h.has_state:
                return None
            live = getattr(h, "state", None)
            if live is not None:
                return live
            s = h.init_state(dg)
            h.state = s
            return s

        states = [state_of(h) for h in hooks]

        def fn(states: List[Any], batch: DGBatch) -> Tuple[List[Any], DGBatch]:
            out_states = []
            for h, s in zip(hooks, states):
                s, batch = h.apply(s, batch)
                out_states.append(s)
            return out_states, batch

        return fn, states

    def adopt_states(self, key: str, states: List[Any]) -> None:
        """Store a scanned epoch's final hook states back on the hook objects
        (aligned with ``as_transform``'s hook order) so subsequent eager
        iteration or checkpointing sees the advanced state."""
        self._ensure_valid_key(key)
        hooks = self._key_to_hooks[key]
        if len(hooks) != len(states):
            raise ValueError(
                f"adopt_states: got {len(states)} states for {len(hooks)} hooks"
            )
        for h, s in zip(hooks, states):
            if h.has_state:
                h.state = s

    def collect_states(self) -> Dict[str, Any]:
        """Gather all stateful hooks' state pytrees (for checkpointing)."""
        out: Dict[str, Any] = {"shared": {}, "keyed": {}}
        for i, h in enumerate(self._shared_hooks):
            if h.has_state:
                out["shared"][f"{i}:{h!r}"] = getattr(h, "state", None)
        for k, hooks in self._key_to_hooks.items():
            out["keyed"][k] = {}
            for i, h in enumerate(hooks):
                if h.has_state and h not in self._shared_hooks:
                    out["keyed"][k][f"{i}:{h!r}"] = getattr(h, "state", None)
        return out

    def load_states(self, states: Dict[str, Any]) -> None:
        for i, h in enumerate(self._shared_hooks):
            name = f"{i}:{h!r}"
            if h.has_state and name in states.get("shared", {}):
                h.state = states["shared"][name]
        for k, hooks in self._key_to_hooks.items():
            keyed = states.get("keyed", {}).get(k, {})
            for i, h in enumerate(hooks):
                name = f"{i}:{h!r}"
                if h.has_state and name in keyed and h not in self._shared_hooks:
                    h.state = keyed[name]

    # ------------------------------------------------------------------ #
    def _ensure_valid_hook(self, hook: Any) -> None:
        if not isinstance(hook, DGHook):
            raise BadHookProtocolError(
                f"Cannot register hook {type(hook).__name__}: must implement "
                "__call__(dg, batch) -> batch, reset_state(), requires and produces."
            )

    def _ensure_no_active_key(self) -> None:
        if self._active_key is not None:
            raise RuntimeError(
                "Cannot register hooks while a key is active. Register hooks "
                "before using `activate`."
            )

    def _ensure_valid_key(self, key: str) -> None:
        if key not in self._key_to_hooks:
            raise KeyError(f"{key} was not a declared key in the hook manager")

    def __str__(self) -> str:
        lines = ["HookManager:", "  Shared hooks:"]
        for h in self._shared_hooks:
            lines.append(f"    - {h!r} (requires={h.requires}, produces={h.produces})")
        lines.append(f"  Active key: {self._active_key}")
        lines.append("  Keyed hooks:")
        for key, hooks in self._key_to_hooks.items():
            lines.append(f"    {key}:")
            for h in hooks:
                lines.append(f"    - {h!r} (requires={h.requires}, produces={h.produces})")
        return "\n".join(lines)
