"""Materialized batch container (a JAX pytree).

Parity: reference ``DGBatch`` (/root/reference/tgm/core/batch.py:12-74) — fixed
edge/node-event/node-label fields plus hook-written dynamic attributes.

TPU-first design: batches are **static-shape** — edge arrays are padded to a
fixed width with ``PADDED_NODE_ID`` and carry an explicit ``edge_valid`` mask
(XLA requires static shapes under jit). Hook-produced attributes live in an
``extras`` dict whose keys are pytree aux-data (static) and values are leaves,
so a ``DGBatch`` flows through ``jax.jit`` / ``lax.scan`` unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_FIXED_FIELDS = (
    "edge_src",
    "edge_dst",
    "edge_time",
    "edge_valid",
    "edge_x",
    "edge_type",
    "node_x_time",
    "node_x_nids",
    "node_x",
    "node_x_valid",
    "node_y_time",
    "node_y_nids",
    "node_y",
    "node_y_valid",
)


@dataclass
class DGBatch:
    """One batch of temporal-graph events.

    ``edge_src/edge_dst/edge_time`` have shape ``(B,)``; padded slots hold
    ``PADDED_NODE_ID`` / 0 and are marked invalid in ``edge_valid``. Hooks add
    attributes transparently (``batch.neg = ...``); they are stored in
    ``extras`` and readable as plain attributes.
    """

    edge_src: jnp.ndarray
    edge_dst: jnp.ndarray
    edge_time: jnp.ndarray
    edge_valid: Optional[jnp.ndarray] = None

    edge_x: Optional[jnp.ndarray] = None
    edge_type: Optional[jnp.ndarray] = None

    node_x_time: Optional[jnp.ndarray] = None
    node_x_nids: Optional[jnp.ndarray] = None
    node_x: Optional[jnp.ndarray] = None
    node_x_valid: Optional[jnp.ndarray] = None

    node_y_time: Optional[jnp.ndarray] = None
    node_y_nids: Optional[jnp.ndarray] = None
    node_y: Optional[jnp.ndarray] = None
    node_y_valid: Optional[jnp.ndarray] = None

    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- dynamic attribute routing ------------------------------------- #
    def __getattr__(self, name: str) -> Any:
        # Only called when normal lookup fails => extras or error.
        extras = object.__getattribute__(self, "__dict__").get("extras")
        if extras is not None and name in extras:
            return extras[name]
        raise AttributeError(f"DGBatch has no attribute {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if name in _FIXED_FIELDS or name == "extras":
            object.__setattr__(self, name, value)
        else:
            self.extras[name] = value

    def __contains__(self, name: str) -> bool:
        return self.has(name)

    def has(self, name: str) -> bool:
        if name in _FIXED_FIELDS:
            return getattr(self, name) is not None
        return name in self.extras

    def replace(self, **changes: Any) -> "DGBatch":
        fixed = {k: v for k, v in changes.items() if k in _FIXED_FIELDS or k == "extras"}
        out = dataclasses.replace(self, **fixed)
        out.extras = dict(out.extras)
        for k, v in changes.items():
            if k not in fixed:
                out.extras[k] = v
        return out

    @property
    def num_valid_edges(self) -> jnp.ndarray:
        if self.edge_valid is None:
            return jnp.asarray(self.edge_src.shape[0])
        return jnp.sum(self.edge_valid)

    def __str__(self) -> str:
        def describe(v: Any) -> str:
            if hasattr(v, "shape"):
                return str(list(v.shape))
            if isinstance(v, (list, tuple)):
                return f"{type(v).__name__}({'|'.join(sorted({describe(e) for e in v}))} x{len(v)})"
            return type(v).__name__

        parts = [
            f"{f}={describe(getattr(self, f))}" for f in _FIXED_FIELDS if getattr(self, f) is not None
        ]
        parts += [f"{k}={describe(v)}" for k, v in self.extras.items()]
        return "DGBatch(" + ", ".join(parts) + ")"

    __repr__ = __str__


def _flatten(b: DGBatch) -> Tuple[Tuple[Any, ...], Any]:
    fixed = tuple(getattr(b, f) for f in _FIXED_FIELDS)
    present = tuple(f is not None for f in fixed)
    keys = tuple(sorted(b.extras))
    children = tuple(v for v in fixed if v is not None) + tuple(b.extras[k] for k in keys)
    return children, (present, keys)


def _unflatten(aux: Any, children: Tuple[Any, ...]) -> DGBatch:
    present, keys = aux
    it = iter(children)
    fixed = {f: (next(it) if p else None) for f, p in zip(_FIXED_FIELDS, present)}
    extras = {k: next(it) for k in keys}
    out = object.__new__(DGBatch)
    for f, v in fixed.items():
        object.__setattr__(out, f, v)
    object.__setattr__(out, "extras", extras)
    return out


jax.tree_util.register_pytree_node(DGBatch, _flatten, _unflatten)
