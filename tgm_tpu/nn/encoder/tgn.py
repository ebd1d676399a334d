"""TGN: Temporal Graph Network memory model.

Parity: reference ``TGNMemory``/``GraphAttentionEmbedding``/aggregators
(/root/reference/tgm/nn/encoder/tgn.py:14-251):

* node memory ``memory[N, d]`` + ``last_update[N]``; per-node message stores
  for the src→dst and dst→src roles holding the most recent batch's events;
* lazy message application: memory forward in train mode returns *staged*
  memory computed from pending messages (``_get_updated_memory``), while
  ``update_state`` applies pending messages for the batch's nodes then
  overwrites their stores; eval mode stores-then-applies immediately
  (reference tgn.py:157-177);
* ``IdentityMessage`` = [mem_src ‖ mem_dst ‖ raw ‖ Time2Vec(Δt)],
  ``LastAggregator`` keeps each node's earliest-positioned max-time message;
* ``GraphAttentionEmbedding`` = TransformerConv(heads=2, dropout=0.1) over
  the batch subgraph with relative-time edge encodings.

TPU-first redesign (SURVEY.md §7.1): the reference's per-node *python dict*
message stores become fixed-slot arrays — one (other, t, raw, valid) slot per
node per role, exact for the default LastAggregator since stores are
overwritten per batch and the aggregator keeps a single message. All state is
a ``TGNMemoryState`` pytree threaded through the train step; BPTT truncation
(reference ``detach``) is implicit: each jitted step treats the carried state
as an input. TransformerConv is realized as gather + segment-softmax over the
padded local edge list (no PyG, no dynamic shapes).
"""

from __future__ import annotations

from typing import NamedTuple, Set, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...constants import PADDED_NODE_ID
from ...ops.segment import segment_max, segment_softmax, segment_sum
from ..modules.time_encoding import Time2Vec


class TGNMemoryState(NamedTuple):
    """All TGN memory/state arrays; row N is the dump row for padded ids."""

    mem: jnp.ndarray  # (N+1, memory_dim)
    last_update: jnp.ndarray  # (N+1,)
    s_other: jnp.ndarray  # (N+1,) src-role store: counterpart node
    s_t: jnp.ndarray  # (N+1,)
    s_raw: jnp.ndarray  # (N+1, raw_msg_dim)
    s_valid: jnp.ndarray  # (N+1,) bool
    d_other: jnp.ndarray
    d_t: jnp.ndarray
    d_raw: jnp.ndarray
    d_valid: jnp.ndarray


def tgn_init_state(
    num_nodes: int, memory_dim: int, raw_msg_dim: int, row_multiple: int = 1
) -> TGNMemoryState:
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    z = jnp.zeros
    return TGNMemoryState(
        mem=z((n, memory_dim)),
        last_update=z((n,), jnp.int32),
        s_other=jnp.full((n,), PADDED_NODE_ID, jnp.int32),
        s_t=z((n,), jnp.int32),
        s_raw=z((n, raw_msg_dim)),
        s_valid=z((n,), bool),
        d_other=jnp.full((n,), PADDED_NODE_ID, jnp.int32),
        d_t=z((n,), jnp.int32),
        d_raw=z((n, raw_msg_dim)),
        d_valid=z((n,), bool),
    )


def tgn_store_messages(
    state: TGNMemoryState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    t: jnp.ndarray,
    raw_msg: jnp.ndarray,
    valid: jnp.ndarray,
) -> TGNMemoryState:
    """Overwrite per-node message stores with this batch's events.

    Keeps, per node and role, the earliest-position message among those with
    the maximum timestamp — exactly what the reference's LastAggregator
    selects from the full per-batch list (tgn.py:43-56 argmax semantics).
    """
    n = state.mem.shape[0] - 1

    def write(owner, other, store_other, store_t, store_raw, store_valid):
        rows = jnp.where(valid, owner, n)
        # Max time per owner in this batch.
        tmax = segment_max(t, rows, n + 1, mask=valid, initial=-1)
        is_max = valid & (t == tmax[rows])
        # Earliest batch position among max-time messages.
        idx = jnp.arange(t.shape[0])
        first = -segment_max(-idx, rows, n + 1, mask=is_max, initial=-jnp.inf)
        winner = is_max & (idx == first[rows].astype(idx.dtype))
        w_rows = jnp.where(winner, rows, n)
        store_other = store_other.at[w_rows].set(
            jnp.where(winner, other, store_other[w_rows]), mode="drop"
        )
        store_t = store_t.at[w_rows].set(jnp.where(winner, t, store_t[w_rows]), mode="drop")
        store_raw = store_raw.at[w_rows].set(
            jnp.where(winner[:, None], raw_msg, store_raw[w_rows]), mode="drop"
        )
        store_valid = store_valid.at[w_rows].set(
            jnp.where(winner, True, store_valid[w_rows]), mode="drop"
        )
        # Dump row stays invalid.
        return (
            store_other.at[n].set(PADDED_NODE_ID),
            store_t.at[n].set(0),
            store_raw.at[n].set(0.0),
            store_valid.at[n].set(False),
        )

    s_other, s_t, s_raw, s_valid = write(
        src, dst, state.s_other, state.s_t, state.s_raw, state.s_valid
    )
    d_other, d_t, d_raw, d_valid = write(
        dst, src, state.d_other, state.d_t, state.d_raw, state.d_valid
    )
    return state._replace(
        s_other=s_other, s_t=s_t, s_raw=s_raw, s_valid=s_valid,
        d_other=d_other, d_t=d_t, d_raw=d_raw, d_valid=d_valid,
    )


class TGNMemory(nn.Module):
    """Learnable part of the TGN memory: Time2Vec + GRU message update."""

    num_nodes: int
    raw_msg_dim: int
    memory_dim: int
    time_dim: int
    aggregator: str = "last"

    # EncoderModule protocol (checked by HookManager.validate_requirement).
    requires: Set[str] = frozenset({"unique_nids", "global_to_local"})

    def setup(self) -> None:
        if self.aggregator != "last":
            raise NotImplementedError(
                "Only the (default) LastAggregator semantics are implemented; "
                "mean aggregation needs multi-slot stores."
            )
        self.time_enc = Time2Vec(time_dim=self.time_dim)
        self.gru = nn.GRUCell(features=self.memory_dim)

    def _staged(
        self, state: TGNMemoryState, nids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compute updated (memory, last_update) rows for ``nids`` from pending messages.

        Mirrors reference ``_get_updated_memory`` (tgn.py:191-216): message =
        [mem[n] ‖ mem[other] ‖ raw ‖ enc(t - last_update[n])], LastAggregator
        across the two role stores (src-role wins ties), GRU applied to every
        row (zero message when no pending events), last_update = max message
        time (0 if none).
        """
        n = state.mem.shape[0] - 1
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)

        def role_msg(other, t, raw, valid):
            o = jnp.clip(other[rows], 0, n)
            dt = t[rows] - state.last_update[rows]
            enc = self.time_enc(dt.astype(jnp.float32))
            msg = jnp.concatenate(
                [state.mem[rows], state.mem[o], raw[rows], enc], axis=-1
            )
            return msg, t[rows], valid[rows]

        msg_s, t_s, v_s = role_msg(state.s_other, state.s_t, state.s_raw, state.s_valid)
        msg_d, t_d, v_d = role_msg(state.d_other, state.d_t, state.d_raw, state.d_valid)

        # LastAggregator over the two candidates; src-role wins ties.
        t_s_eff = jnp.where(v_s, t_s, -1)
        t_d_eff = jnp.where(v_d, t_d, -1)
        use_d = t_d_eff > t_s_eff
        any_valid = v_s | v_d
        agg = jnp.where(use_d[:, None], msg_d, msg_s)
        agg = jnp.where(any_valid[:, None], agg, 0.0)

        new_mem, _ = self.gru(state.mem[rows], agg)
        new_last = jnp.maximum(jnp.maximum(t_s_eff, t_d_eff), 0)
        return new_mem, new_last

    def stage(self, state: TGNMemoryState, nids: jnp.ndarray, training: bool = True):
        """Reference ``forward`` (tgn.py:157-163): staged memory in train mode,
        stored memory in eval mode."""
        n = state.mem.shape[0] - 1
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)
        if training:
            return self._staged(state, nids)
        return state.mem[rows], state.last_update[rows]

    def flush(self, state: TGNMemoryState, nids: jnp.ndarray) -> TGNMemoryState:
        """Apply pending messages for ``nids`` into stored memory (``_update_memory``)."""
        n = state.mem.shape[0] - 1
        new_mem, new_last = self._staged(state, nids)
        new_mem = jax.lax.stop_gradient(new_mem)
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)
        mem = state.mem.at[rows].set(new_mem, mode="drop").at[n].set(0.0)
        last = state.last_update.at[rows].set(new_last, mode="drop").at[n].set(0)
        return state._replace(mem=mem, last_update=last)

    def flush_all(self, state: TGNMemoryState) -> TGNMemoryState:
        """Train→eval transition (tgn.py:245-251): flush every node, clear stores."""
        state = self.flush(state, jnp.arange(self.num_nodes))
        rows = state.mem.shape[0]  # may exceed num_nodes+1 when mesh-padded
        return state._replace(
            s_other=jnp.full((rows,), PADDED_NODE_ID, jnp.int32),
            s_t=jnp.zeros((rows,), jnp.int32),
            s_raw=jnp.zeros_like(state.s_raw),
            s_valid=jnp.zeros((rows,), bool),
            d_other=jnp.full((rows,), PADDED_NODE_ID, jnp.int32),
            d_t=jnp.zeros((rows,), jnp.int32),
            d_raw=jnp.zeros_like(state.d_raw),
            d_valid=jnp.zeros((rows,), bool),
        )

    def __call__(self, state: TGNMemoryState, nids: jnp.ndarray):
        return self.stage(state, nids, training=True)

    def init_state(self) -> TGNMemoryState:
        return tgn_init_state(self.num_nodes, self.memory_dim, self.raw_msg_dim)


class GraphAttentionEmbedding(nn.Module):
    """TransformerConv over the batch subgraph with relative-time edge features.

    Parity: reference GraphAttentionEmbedding (tgn.py:14-40) around PyG's
    TransformerConv (heads=2, out/2 per head, dropout on attention weights,
    root weight, concat heads). Realized as gather + segment-softmax over the
    padded local edge list; aggregation at ``edge_dst_local`` (PyG
    source→target flow with the example's [seed, nbr] stacking).
    """

    in_channels: int
    out_channels: int
    msg_dim: int
    time_dim: int
    n_heads: int = 2
    dropout: float = 0.1

    def setup(self) -> None:
        assert self.out_channels % self.n_heads == 0
        self.head_dim = self.out_channels // self.n_heads
        self.time_enc = Time2Vec(time_dim=self.time_dim)
        self.lin_query = nn.Dense(self.out_channels)
        self.lin_key = nn.Dense(self.out_channels)
        self.lin_value = nn.Dense(self.out_channels)
        self.lin_edge = nn.Dense(self.out_channels, use_bias=False)
        self.lin_skip = nn.Dense(self.out_channels)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,  # (U, in_channels) node (memory) embeddings
        last_update: jnp.ndarray,  # (U,)
        edge_src_local: jnp.ndarray,  # (E,) local source (seed) indices
        edge_dst_local: jnp.ndarray,  # (E,) local target (neighbor) indices
        edge_time: jnp.ndarray,  # (E,)
        edge_msg: jnp.ndarray,  # (E, msg_dim)
        edge_valid: jnp.ndarray,  # (E,) bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        U = x.shape[0]
        H, C = self.n_heads, self.head_dim
        src = jnp.clip(edge_src_local, 0, U - 1)
        dst = jnp.clip(edge_dst_local, 0, U - 1)

        rel_t = last_update[src] - edge_time
        edge_attr = jnp.concatenate(
            [self.time_enc(rel_t.astype(jnp.float32)), edge_msg], axis=-1
        )
        e = self.lin_edge(edge_attr).reshape(-1, H, C)

        q = self.lin_query(x).reshape(U, H, C)
        k = self.lin_key(x).reshape(U, H, C)[src] + e
        v = self.lin_value(x).reshape(U, H, C)[src] + e

        logits = jnp.sum(q[dst] * k, axis=-1) * (C**-0.5)  # (E, H)
        alpha = jnp.stack(
            [
                segment_softmax(logits[:, h], dst, U, mask=edge_valid)
                for h in range(H)
            ],
            axis=-1,
        )  # (E, H)
        alpha = self.drop(alpha, deterministic=deterministic)
        out = segment_sum(alpha[..., None] * v, dst, U, mask=edge_valid)  # (U, H, C)
        return out.reshape(U, self.out_channels) + self.lin_skip(x)


class GraphAttentionEmbeddingRowwise(nn.Module):
    """Dense per-seed attention over each seed's K recent neighbors.

    The standard TGN attention formulation (query = seed memory, keys/values =
    neighbor memory + relative-time/edge features), computed as fully dense
    (S, K) einsums — no segment scatters, no dedup — which is the
    speed-of-light layout on TPU (XLA scatters serialize; dense softmax is
    pure VPU/MXU). Parameter structure matches ``GraphAttentionEmbedding``.

    Used by the scanned training pipeline (``TGNPipeline(rowwise=True)``); the
    segment-based ``GraphAttentionEmbedding`` remains the reference-faithful
    graph-aggregation variant.
    """

    in_channels: int
    out_channels: int
    msg_dim: int
    time_dim: int
    n_heads: int = 2
    dropout: float = 0.1

    def setup(self) -> None:
        assert self.out_channels % self.n_heads == 0
        self.head_dim = self.out_channels // self.n_heads
        self.time_enc = Time2Vec(time_dim=self.time_dim)
        self.lin_query = nn.Dense(self.out_channels)
        self.lin_key = nn.Dense(self.out_channels)
        self.lin_value = nn.Dense(self.out_channels)
        self.lin_edge = nn.Dense(self.out_channels, use_bias=False)
        self.lin_skip = nn.Dense(self.out_channels)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x_seed: jnp.ndarray,  # (S, in_channels) seed memory rows
        x_nbr: jnp.ndarray,  # (S, K, in_channels) neighbor memory rows
        seed_last_update: jnp.ndarray,  # (S,)
        nbr_time: jnp.ndarray,  # (S, K)
        nbr_msg: jnp.ndarray,  # (S, K, msg_dim)
        nbr_valid: jnp.ndarray,  # (S, K) bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        S, K = nbr_valid.shape
        H, C = self.n_heads, self.head_dim
        rel_t = seed_last_update[:, None] - nbr_time
        edge_attr = jnp.concatenate(
            [self.time_enc(rel_t.astype(jnp.float32)), nbr_msg], axis=-1
        )
        e = self.lin_edge(edge_attr).reshape(S, K, H, C)

        q = self.lin_query(x_seed).reshape(S, H, C)
        k = self.lin_key(x_nbr).reshape(S, K, H, C) + e
        v = self.lin_value(x_nbr).reshape(S, K, H, C) + e

        logits = jnp.einsum("shc,skhc->skh", q, k) * (C**-0.5)
        logits = jnp.where(nbr_valid[:, :, None], logits, -1e10)
        alpha = jax.nn.softmax(logits, axis=1)
        alpha = jnp.where(nbr_valid[:, :, None], alpha, 0.0)
        alpha = self.drop(alpha, deterministic=deterministic)
        out = jnp.einsum("skh,skhc->shc", alpha, v).reshape(S, self.out_channels)
        return out + self.lin_skip(x_seed)
