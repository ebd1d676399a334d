"""Node-id deduplication hook.

Parity: reference ``DeduplicationHook`` (/root/reference/tgm/hooks/dedup.py:17-67)
— collect ids from edge endpoints, seed keys, and every hop of ``nbr_nids``
(PAD-filtered), produce sorted ``unique_nids`` and a global→local id mapping.

TPU-first design: static shapes throughout. ``unique_nids`` has a fixed
capacity (the total id count feeding the union, known at trace time) padded
with ``PADDED_NODE_ID`` at the tail; the mapping is a **dense lookup array**
``global_to_local`` of shape ``(num_nodes + 1,)`` (index with
``g2l[jnp.where(ids >= 0, ids, num_nodes)]``) instead of the reference's
searchsorted closure — closures can't cross jit boundaries, dense gathers can.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..core.graph import DGraph
from .base import SeedableHook, StatelessHook
from .registry import hook

_SENTINEL = jnp.iinfo(jnp.int32).max


@hook
class DeduplicationHook(SeedableHook, StatelessHook):
    """Deduplicate batch node ids into a compact local index space."""

    _cls_requires = {"edge_src", "edge_dst"}
    _cls_produces = {"unique_nids", "num_unique", "global_to_local"}

    def __init__(
        self,
        num_nodes: int,
        seed_nodes_keys: Optional[List[str]] = None,
        id: Optional[str] = None,
    ) -> None:
        super().__init__(seed_keys=seed_nodes_keys, id=id)
        self._num_nodes = num_nodes

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        nids = [batch.edge_src, batch.edge_dst]
        for attr in sorted(self.requires):
            if attr in ("edge_src", "edge_dst"):
                continue
            if not batch.has(attr):
                raise ValueError(f"Missing seed node attribute {attr}")
            value = getattr(batch, attr)
            if "nbr_nids" in attr:
                for hop in value:
                    nids.append(hop.reshape(-1))
            elif value is not None:
                nids.append(value.reshape(-1))

        all_nids = jnp.concatenate(nids)
        # Sort with invalid ids pushed to +inf so the unique prefix stays sorted.
        keyed = jnp.where(
            (all_nids >= 0) & (all_nids < self._num_nodes), all_nids, _SENTINEL
        )
        # Static capacity: the id count feeding the union, but never more
        # than num_nodes+1 — there are at most num_nodes distinct valid ids
        # (+1 slot so the sentinel can't evict one when all are present).
        # Without the cap, candidate-heavy eval batches produce huge padded
        # local spaces (a (B+B+B*Q+nbrs)-sized U made TNCN's dense local
        # adjacency U*U blow past int32 indexing).
        U = min(all_nids.shape[0], self._num_nodes + 1)
        uniq = jnp.unique(keyed, size=U, fill_value=_SENTINEL)
        valid = uniq != _SENTINEL
        num_unique = jnp.sum(valid.astype(jnp.int32))
        unique_nids = jnp.where(valid, uniq, PADDED_NODE_ID).astype(jnp.int32)

        # Dense global->local map; unseen ids (and the PAD slot N) map to -1.
        g2l = jnp.full((self._num_nodes + 1,), -1, dtype=jnp.int32)
        rows = jnp.where(valid, uniq, self._num_nodes)
        g2l = g2l.at[rows].set(jnp.where(valid, jnp.arange(U, dtype=jnp.int32), -1), mode="drop")
        g2l = g2l.at[self._num_nodes].set(-1)

        self.add_batch_attribute(batch, "unique_nids", unique_nids)
        self.add_batch_attribute(batch, "num_unique", num_unique)
        self.add_batch_attribute(batch, "global_to_local", g2l)
        return state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        _, batch = self.jit_apply(None, batch)
        return batch


def map_to_local(g2l: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Convenience: map global ids through the dense dedup table (PAD-safe)."""
    n = g2l.shape[0] - 1
    return g2l[jnp.where((ids >= 0) & (ids < n), ids, n)]


def seed_lookup(seeds: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Dense id -> row table for a seed list; LAST occurrence wins, PAD-safe.

    Mirrors the reference examples' ``{nid: i for i, nid in enumerate(seeds)}``
    dict (later duplicates overwrite — examples/linkproppred/tgat.py:115).
    Use to locate eval candidates' rows: the TGB hook's unique-negative
    section trails the seed list, so each candidate's last occurrence is its
    own row. Unknown ids map to -1.
    """
    S = seeds.shape[0]
    lut = jnp.full((num_nodes + 1,), -1, jnp.int32)
    rows = jnp.where((seeds >= 0) & (seeds < num_nodes), seeds, num_nodes)
    lut = lut.at[rows].max(jnp.arange(S, dtype=jnp.int32), mode="drop")
    return lut.at[num_nodes].set(-1)


def candidate_rows(
    lut: jnp.ndarray, cands: jnp.ndarray, num_rows: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map candidate ids through a :func:`seed_lookup` table.

    Returns ``(rows, found)``: safe row indices (clipped into [0, num_rows))
    and a mask of candidates actually present in the seed list. ALWAYS and
    ``found`` into the scoring validity mask — a candidate missing from the
    seeds (e.g. the neighbor hook was configured without ``"neg"`` in its
    seed keys) would otherwise silently score against row 0's embedding.
    """
    n = lut.shape[0] - 1
    raw = lut[jnp.where((cands >= 0) & (cands < n), cands, n)]
    found = raw >= 0
    return jnp.clip(raw, 0, num_rows - 1), found
