"""Batch- and node-level analytics hooks.

Parity: reference analytics hooks
(/root/reference/tgm/hooks/analytics/batch_analytics.py:13-129,
 /root/reference/tgm/hooks/analytics/node_analytics.py:16-371):
``BatchAnalyticsHook`` (per-batch counts, unique nodes/timestamps, average
degree, repeated events) and ``NodeAnalyticsHook`` (per-tracked-node degree /
activity / new-neighbor / lifetime stats plus batch novelty & density).

TPU-first: the reference keeps Python dict/set state and loops over edges;
here all state is fixed-shape arrays — first/last-seen and appearance counters
are ``(N+1,)`` vectors, and the seen-edge set is a bitmap: EXACT pair-keyed
whenever the (N+1)^2 pair space fits 8 MB (auto; matches the reference's
Python seen-set bit for bit), hashed (Bloom-style, single hash — collisions
undercount new edges) on larger graphs, with the approximation surfaced via
``edge_stats['novelty_is_exact']`` and the bitmap load factor. Everything
stays jit/scan-safe; stats are emitted as dicts of scalars/arrays, like the
reference.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.batch import DGBatch
from ..core.graph import DGraph
from .base import StatefulHook, StatelessHook
from .registry import hook


def _masked_unique_count(x: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    sentinel = jnp.iinfo(jnp.int32).max
    keyed = x if valid is None else jnp.where(valid, x, sentinel)
    u = jnp.unique(keyed, size=x.shape[0], fill_value=sentinel)
    return jnp.sum((u != sentinel).astype(jnp.int32))


@hook
class BatchAnalyticsHook(StatelessHook):
    """Simple per-batch statistics."""

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {
        "num_edge_events",
        "num_node_events",
        "num_unique_timestamps",
        "num_unique_nodes",
        "avg_degree",
        "num_repeated_edge_events",
        "num_repeated_node_events",
    }

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        ev = batch.edge_valid
        n_edges = batch.edge_src.shape[0] if ev is None else jnp.sum(ev.astype(jnp.int32))
        if batch.node_x_nids is not None:
            nv = batch.node_x_valid
            n_nodes_ev = (
                batch.node_x_nids.shape[0] if nv is None else jnp.sum(nv.astype(jnp.int32))
            )
        else:
            n_nodes_ev = jnp.asarray(0)

        ts = [batch.edge_time]
        ts_valid = [ev]
        if batch.node_x_time is not None:
            ts.append(batch.node_x_time)
            ts_valid.append(batch.node_x_valid)
        all_ts = jnp.concatenate(ts)
        all_tv = None
        if any(v is not None for v in ts_valid):
            all_tv = jnp.concatenate(
                [v if v is not None else jnp.ones(t.shape[0], bool) for t, v in zip(ts, ts_valid)]
            )
        n_unique_ts = _masked_unique_count(all_ts, all_tv)

        nids = [batch.edge_src, batch.edge_dst]
        nv_list = [ev, ev]
        if batch.node_x_nids is not None:
            nids.append(batch.node_x_nids)
            nv_list.append(batch.node_x_valid)
        all_nids = jnp.concatenate(nids)
        all_nv = None
        if any(v is not None for v in nv_list):
            all_nv = jnp.concatenate(
                [v if v is not None else jnp.ones(x.shape[0], bool) for x, v in zip(nids, nv_list)]
            )
        n_unique_nodes = _masked_unique_count(all_nids, all_nv)

        avg_degree = jnp.where(
            n_unique_nodes > 0, 2.0 * n_edges / jnp.maximum(n_unique_nodes, 1), 0.0
        )

        # Repeated edge events: sort by (src, dst, time) and count adjacent
        # duplicate triplets (int32-safe; no composite-key overflow).
        key1, key2, key3 = batch.edge_src, batch.edge_dst, batch.edge_time
        order = jnp.lexsort((key3, key2, key1))
        s1, s2, s3 = key1[order], key2[order], key3[order]
        sv = None if ev is None else ev[order]
        dup = (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1]) & (s3[1:] == s3[:-1])
        if sv is not None:
            dup &= sv[1:] & sv[:-1]
        n_repeat_edges = jnp.sum(dup.astype(jnp.int32))

        if batch.node_x_nids is not None:
            nk1, nk2 = batch.node_x_nids, batch.node_x_time
            p1 = jnp.argsort(nk2, stable=True)
            p2 = jnp.argsort(nk1[p1], stable=True)
            no = p1[p2]
            m1, m2 = nk1[no], nk2[no]
            ndup = (m1[1:] == m1[:-1]) & (m2[1:] == m2[:-1])
            if batch.node_x_valid is not None:
                mv = batch.node_x_valid[no]
                ndup &= mv[1:] & mv[:-1]
            n_repeat_nodes = jnp.sum(ndup.astype(jnp.int32))
        else:
            n_repeat_nodes = jnp.asarray(0)

        self.add_batch_attribute(batch, "num_edge_events", n_edges)
        self.add_batch_attribute(batch, "num_node_events", n_nodes_ev)
        self.add_batch_attribute(batch, "num_unique_timestamps", n_unique_ts)
        self.add_batch_attribute(batch, "num_unique_nodes", n_unique_nodes)
        self.add_batch_attribute(batch, "avg_degree", avg_degree)
        self.add_batch_attribute(batch, "num_repeated_edge_events", n_repeat_edges)
        self.add_batch_attribute(batch, "num_repeated_node_events", n_repeat_nodes)
        return state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        _, batch = self.jit_apply(None, batch)
        return batch


@hook
class NodeAnalyticsHook(StatefulHook):
    """Per-tracked-node activity statistics plus batch novelty/density."""

    _cls_requires = {"edge_src", "edge_dst", "edge_time"}
    _cls_produces = {"node_stats", "node_macro_stats", "edge_stats"}

    #: Auto-exact threshold: pair bitmaps up to this many bits switch edge
    #: novelty from hashed-approximate to exact pair keying. The bitmap is
    #: bit-packed into uint32 words, so this is 8 MiB of carried state
    #: (2^26 bits / 8), not 64 MiB of bool (ADVICE r3).
    EXACT_BITMAP_MAX_BITS = 1 << 26

    def __init__(
        self,
        tracked_nodes,
        num_nodes: int,
        edge_hash_bits: int = 20,
        exact_edges: Optional[bool] = None,
        id: Optional[str] = None,
    ) -> None:
        super().__init__(id=id)
        if num_nodes <= 0:
            raise ValueError("num_nodes must be positive")
        self.tracked_nodes = jnp.asarray(np.unique(np.asarray(tracked_nodes)), dtype=jnp.int32)
        self.num_nodes = num_nodes
        # Exact novelty keys the bitmap by the (src, dst) pair id — collision
        # free, matching the reference's Python seen-set exactly — whenever
        # the (num_nodes+1)^2 pair space fits the budget (auto) or the caller
        # forces it; the hashed single-hash bitmap (approximate: collisions
        # undercount new edges) remains the large-graph fallback.
        pair_space = (num_nodes + 1) * (num_nodes + 1)
        if exact_edges is None:
            exact_edges = pair_space <= self.EXACT_BITMAP_MAX_BITS
        if exact_edges and pair_space > jnp.iinfo(jnp.int32).max:
            raise ValueError(
                f"exact_edges needs (num_nodes+1)^2 <= int32 max; got {pair_space}"
            )
        self._exact = bool(exact_edges)
        self._hash_size = pair_space if self._exact else (1 << edge_hash_bits)
        self.state: Any = None

    def init_state(self, dg: Optional[DGraph] = None) -> Any:
        n = self.num_nodes + 1
        # seen_edges is bit-packed: uint32 words, one bit per key — 1/8th the
        # carried-state bytes of a bool bitmap at the same key space.
        return {
            "first_seen": jnp.full((n,), -1, dtype=jnp.int32),
            "last_seen": jnp.full((n,), -1, dtype=jnp.int32),
            "appearances": jnp.zeros((n,), dtype=jnp.int32),
            "seen_edges": jnp.zeros(((self._hash_size + 31) // 32,), dtype=jnp.uint32),
        }

    def reset_state(self) -> None:
        self.state = None

    def _edge_hash(self, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
        if self._exact:
            # Collision-free pair id (validated <= int32 max in __init__).
            return src * jnp.int32(self.num_nodes + 1) + dst
        # Deterministic mix of the pair into the bitmap index space (Knuth
        # multiplicative constants expressed as wrapped int32 literals).
        h = src * jnp.int32(-1640531527) + dst * jnp.int32(40503) + jnp.int32(-2128831035)
        return jnp.abs(h) % self._hash_size

    def apply(self, state: Any, batch: DGBatch) -> Tuple[Any, DGBatch]:
        n = self.num_nodes
        ev = batch.edge_valid
        valid = jnp.ones(batch.edge_src.shape[0], bool) if ev is None else ev
        src = jnp.where(valid, batch.edge_src, n)
        dst = jnp.where(valid, batch.edge_dst, n)
        t = batch.edge_time

        endpoints = jnp.concatenate([src, dst])
        ep_t = jnp.concatenate([t, t])
        ep_valid = jnp.concatenate([valid, valid])

        deg = jnp.zeros((n + 1,), jnp.int32).at[endpoints].add(ep_valid.astype(jnp.int32))

        was_seen = state["first_seen"] >= 0
        first_seen = state["first_seen"]
        fs_batch = jnp.full((n + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
        fs_batch = fs_batch.at[endpoints].min(jnp.where(ep_valid, ep_t, jnp.iinfo(jnp.int32).max))
        appeared = fs_batch < jnp.iinfo(jnp.int32).max
        first_seen = jnp.where(was_seen, first_seen, jnp.where(appeared, fs_batch, -1))
        last_seen = state["last_seen"]
        ls_batch = jnp.full((n + 1,), -1, jnp.int32).at[endpoints].max(jnp.where(ep_valid, ep_t, -1))
        last_seen = jnp.maximum(last_seen, ls_batch)
        appearances = state["appearances"] + appeared.astype(jnp.int32)

        # Edge novelty via the seen-edge bitmap. A pair repeated WITHIN the
        # batch is new once, like the reference's per-edge Python loop that
        # inserts into its seen-set as it scans — count distinct unseen keys
        # (sorted run starts), not per-element bitmap misses.
        keys = self._edge_hash(src, dst)
        sentinel = jnp.iinfo(jnp.int32).max
        k_sorted = jnp.sort(jnp.where(valid, keys, sentinel))
        run_start = jnp.concatenate(
            [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]]
        )
        k_safe = jnp.clip(k_sorted, 0, self._hash_size - 1)
        word_idx = k_safe >> 5
        bit = jnp.uint32(1) << (k_safe & 31).astype(jnp.uint32)
        already_seen = (state["seen_edges"][word_idx] & bit) != 0
        fresh = run_start & (k_sorted != sentinel) & ~already_seen
        new_edge_count = jnp.sum(fresh.astype(jnp.int32))
        # Set the fresh bits with a scatter-ADD: every fresh key is a
        # DISTINCT (run_start), previously-UNSET (~already_seen) bit, so no
        # two added bits collide with each other or with existing state and
        # add == bitwise-or. Out-of-range index drops non-fresh rows.
        n_words = state["seen_edges"].shape[0]
        seen_edges = state["seen_edges"].at[
            jnp.where(fresh, word_idx, n_words)
        ].add(jnp.where(fresh, bit, jnp.uint32(0)), mode="drop")
        n_edges = jnp.sum(valid.astype(jnp.int32))
        edge_novelty = new_edge_count / jnp.maximum(n_edges, 1)

        uniq_nodes = _masked_unique_count(endpoints, ep_valid & (endpoints < n))
        density = n_edges / jnp.maximum(uniq_nodes * (uniq_nodes - 1) / 2, 1)

        # Tracked-node micro stats.
        tn = self.tracked_nodes
        cur_t = jnp.max(jnp.where(valid, t, 0))
        node_stats = {
            "degree": deg[tn],
            "activity": deg[tn],
            "lifetime": jnp.where(first_seen[tn] >= 0, last_seen[tn] - first_seen[tn], 0),
            "time_since_seen": jnp.where(last_seen[tn] >= 0, cur_t - last_seen[tn], -1),
            "appearances": appearances[tn],
        }
        new_in_batch = appeared[tn] & ~was_seen[tn]
        node_macro_stats = {
            "new_node_count": jnp.sum(new_in_batch.astype(jnp.int32)),
            "node_novelty": jnp.sum(new_in_batch.astype(jnp.int32))
            / jnp.maximum(jnp.sum(appeared[tn].astype(jnp.int32)), 1),
        }
        edge_stats = {
            "edge_novelty": edge_novelty,
            "edge_density": density,
            "new_edge_count": new_edge_count,
            # Approximation observability: exact pair keying has no
            # collisions; in hashed mode the bitmap load factor bounds the
            # per-edge undercount probability, so divergence from the
            # reference's exact seen-set is detectable, not silent.
            "novelty_is_exact": jnp.asarray(self._exact),
            "seen_bitmap_load": jnp.sum(
                jax.lax.population_count(seen_edges).astype(jnp.int32)
            )
            / jnp.float32(self._hash_size),
        }

        self.add_batch_attribute(batch, "node_stats", node_stats)
        self.add_batch_attribute(batch, "node_macro_stats", node_macro_stats)
        self.add_batch_attribute(batch, "edge_stats", edge_stats)
        new_state = {
            "first_seen": first_seen.at[n].set(-1),
            "last_seen": last_seen.at[n].set(-1),
            "appearances": appearances.at[n].set(0),
            "seen_edges": seen_edges,
        }
        return new_state, batch

    def __call__(self, dg: DGraph, batch: DGBatch) -> DGBatch:
        if self.state is None:
            self.state = self.init_state(dg)
        self.state, batch = self.jit_apply(self.state, batch)
        return batch
