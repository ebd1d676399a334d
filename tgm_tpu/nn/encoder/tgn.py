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

from typing import Any, NamedTuple, Optional, Set, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...constants import PADDED_NODE_ID
from ...ops.segment import segment_max, segment_softmax, segment_sum
from ..modules.gru import TorchGRUCell
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


USE_PALLAS_STORE: Optional[bool] = None


def _store_kernel_enabled(n1: int) -> bool:
    """Auto-TPU gate for the fused 1-D store-scatter kernel (needs the state
    row count padded to a multiple of 128 — ``init_state(row_multiple=128)``)."""
    if n1 % 128:
        return False
    if USE_PALLAS_STORE is not None:
        return USE_PALLAS_STORE
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - no backend at trace time
        return False


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

    def plan(owner):
        rows = jnp.where(valid, owner, n)
        # Max time per owner in this batch.
        tmax = segment_max(t, rows, n + 1, mask=valid, initial=-1)
        is_max = valid & (t == tmax[rows])
        # Earliest batch position among max-time messages.
        idx = jnp.arange(t.shape[0])
        first = -segment_max(-idx, rows, n + 1, mask=is_max, initial=-jnp.inf)
        winner = is_max & (idx == first[rows].astype(idx.dtype))
        return winner, jnp.where(winner, rows, n)

    def write_rest(winner, w_rows, other, store_other, store_t, store_raw,
                   store_valid, ints_in_kernel):
        if not ints_in_kernel:
            store_other = store_other.at[w_rows].set(
                jnp.where(winner, other, store_other[w_rows]), mode="drop"
            ).at[n].set(PADDED_NODE_ID)
            store_t = store_t.at[w_rows].set(
                jnp.where(winner, t, store_t[w_rows]), mode="drop"
            ).at[n].set(0)
        store_raw = store_raw.at[w_rows].set(
            jnp.where(winner[:, None], raw_msg, store_raw[w_rows]), mode="drop"
        ).at[n].set(0.0)
        store_valid = store_valid.at[w_rows].set(
            jnp.where(winner, True, store_valid[w_rows]), mode="drop"
        ).at[n].set(False)
        return store_other, store_t, store_raw, store_valid

    win_s, w_s = plan(src)
    win_d, w_d = plan(dst)
    use_kernel = _store_kernel_enabled(state.mem.shape[0])
    if use_kernel:
        # Fused RMW of the four int32 1-D stores (ops/pallas/scatter_cells.py)
        # — four XLA element scatters serialized at ~65 ns/element become one
        # whole-buffer VMEM round trip. The dump row (n) is a skip target in
        # the kernel, so no reset write is needed.
        from ...ops.pallas.scatter_cells import tgn_store_scatter_1d

        s_other, s_t, d_other, d_t = tgn_store_scatter_1d(
            state.s_other, state.s_t, state.d_other, state.d_t,
            w_s, dst, t, w_d, src, t, last_live_row=n - 1,
        )
    else:
        s_other, s_t = state.s_other, state.s_t
        d_other, d_t = state.d_other, state.d_t
    s_other, s_t, s_raw, s_valid = write_rest(
        win_s, w_s, dst, s_other, s_t, state.s_raw, state.s_valid, use_kernel
    )
    d_other, d_t, d_raw, d_valid = write_rest(
        win_d, w_d, src, d_other, d_t, state.d_raw, state.d_valid, use_kernel
    )
    return state._replace(
        s_other=s_other, s_t=s_t, s_raw=s_raw, s_valid=s_valid,
        d_other=d_other, d_t=d_t, d_raw=d_raw, d_valid=d_valid,
    )


class TGNPackedState(NamedTuple):
    """Gather-fused layout of ``TGNMemoryState``.

    TPU gathers cost ~per-row regardless of width, and the unpacked layout
    needs ~12 separate row gathers per staging (profiled at ~44us each at
    wiki shapes — a third of the TGN step). Packing the scalar fields into
    one int32 matrix and both roles' raw messages into one float matrix cuts
    staging to 5 gathers (meta, mem, raws, mem[s_other], mem[d_other]).

    meta columns: [last_update, s_other, s_t, s_valid, d_other, d_t, d_valid, 0]
    raws columns: [s_raw (R) ‖ d_raw (R)]
    """

    mem: jnp.ndarray  # (N1, M) f32
    raws: jnp.ndarray  # (N1, 2R) f32
    meta: jnp.ndarray  # (N1, 8) i32


def tgn_pack_state(s: TGNMemoryState) -> TGNPackedState:
    meta = jnp.stack(
        [
            s.last_update,
            s.s_other, s.s_t, s.s_valid.astype(jnp.int32),
            s.d_other, s.d_t, s.d_valid.astype(jnp.int32),
            jnp.zeros_like(s.last_update),
        ],
        axis=1,
    )
    return TGNPackedState(
        mem=s.mem, raws=jnp.concatenate([s.s_raw, s.d_raw], axis=1), meta=meta
    )


def tgn_unpack_state(p: TGNPackedState) -> TGNMemoryState:
    R = p.raws.shape[1] // 2
    m = p.meta
    return TGNMemoryState(
        mem=p.mem, last_update=m[:, 0],
        s_other=m[:, 1], s_t=m[:, 2], s_raw=p.raws[:, :R], s_valid=m[:, 3].astype(bool),
        d_other=m[:, 4], d_t=m[:, 5], d_raw=p.raws[:, R:], d_valid=m[:, 6].astype(bool),
    )


def tgn_store_messages_packed(
    state: TGNPackedState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    t: jnp.ndarray,
    raw_msg: jnp.ndarray,
    valid: jnp.ndarray,
) -> TGNPackedState:
    """Packed-layout equivalent of :func:`tgn_store_messages` (same winner
    selection; one meta scatter + one raws scatter per role)."""
    n = state.mem.shape[0] - 1
    R = state.raws.shape[1] // 2
    meta, raws = state.meta, state.raws

    def winners(owner):
        rows = jnp.where(valid, owner, n)
        tmax = segment_max(t, rows, n + 1, mask=valid, initial=-1)
        is_max = valid & (t == tmax[rows])
        idx = jnp.arange(t.shape[0])
        first = -segment_max(-idx, rows, n + 1, mask=is_max, initial=-jnp.inf)
        winner = is_max & (idx == first[rows].astype(idx.dtype))
        return jnp.where(winner, rows, n), winner

    for owner, other, mcol, rcol in ((src, dst, 1, 0), (dst, src, 4, R)):
        w_rows, winner = winners(owner)
        new_cols = jnp.stack(
            [other, t, jnp.ones_like(t)], axis=1
        )  # [other, t, valid]
        old = meta[w_rows, mcol : mcol + 3]
        meta = meta.at[w_rows, mcol : mcol + 3].set(
            jnp.where(winner[:, None], new_cols, old), mode="drop"
        )
        old_raw = raws[w_rows, rcol : rcol + R]
        raws = raws.at[w_rows, rcol : rcol + R].set(
            jnp.where(winner[:, None], raw_msg, old_raw), mode="drop"
        )
    # Dump row stays invalid.
    meta = meta.at[n].set(
        jnp.asarray([0, PADDED_NODE_ID, 0, 0, PADDED_NODE_ID, 0, 0, 0], jnp.int32)
    )
    raws = raws.at[n].set(0.0)
    return TGNPackedState(mem=state.mem, raws=raws, meta=meta)


class TGNMeanMemoryState(NamedTuple):
    """Mean-aggregator state: multi-slot message ring buffers per role.

    Each role keeps up to ``mean_slots`` of a node's messages from the most
    recent batch that touched it (``*_stamp`` vs ``*_latest`` identifies that
    batch; older entries are ignored at read time, replicating the reference's
    per-batch store overwrite). Exact when a node has <= mean_slots messages
    per role per batch, truncated (keep-last) otherwise.
    """

    mem: jnp.ndarray  # (N+1, memory_dim)
    last_update: jnp.ndarray  # (N+1,)
    s_other: jnp.ndarray  # (N+1, K)
    s_t: jnp.ndarray  # (N+1, K)
    s_raw: jnp.ndarray  # (N+1, K, raw_msg_dim)
    s_stamp: jnp.ndarray  # (N+1, K) batch counter per slot (0 = empty)
    s_wp: jnp.ndarray  # (N+1,)
    s_latest: jnp.ndarray  # (N+1,)
    d_other: jnp.ndarray
    d_t: jnp.ndarray
    d_raw: jnp.ndarray
    d_stamp: jnp.ndarray
    d_wp: jnp.ndarray
    d_latest: jnp.ndarray
    counter: jnp.ndarray  # () global batch counter
    overflow: jnp.ndarray  # () cumulative messages dropped by slot truncation


def tgn_mean_init_state(
    num_nodes: int, memory_dim: int, raw_msg_dim: int, mean_slots: int = 8,
    row_multiple: int = 1,
) -> TGNMeanMemoryState:
    n = num_nodes + 1
    if row_multiple > 1:
        n = -(-n // row_multiple) * row_multiple
    z = jnp.zeros
    role = lambda: (
        jnp.full((n, mean_slots), PADDED_NODE_ID, jnp.int32),
        z((n, mean_slots), jnp.int32),
        z((n, mean_slots, raw_msg_dim)),
        z((n, mean_slots), jnp.int32),
        z((n,), jnp.int32),
        z((n,), jnp.int32),
    )
    s = role()
    d = role()
    return TGNMeanMemoryState(
        mem=z((n, memory_dim)), last_update=z((n,), jnp.int32),
        s_other=s[0], s_t=s[1], s_raw=s[2], s_stamp=s[3], s_wp=s[4], s_latest=s[5],
        d_other=d[0], d_t=d[1], d_raw=d[2], d_stamp=d[3], d_wp=d[4], d_latest=d[5],
        counter=z((), jnp.int32), overflow=z((), jnp.int32),
    )


def tgn_mean_store_messages(
    state: TGNMeanMemoryState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    t: jnp.ndarray,
    raw_msg: jnp.ndarray,
    valid: jnp.ndarray,
) -> TGNMeanMemoryState:
    """Write this batch's events into the per-role ring buffers with a fresh
    batch stamp (keep-last-K per node; the stamp implements the reference's
    per-batch store overwrite lazily)."""
    n = state.mem.shape[0] - 1
    counter = state.counter + 1
    E = src.shape[0]

    def write(owner, other, o_buf, t_buf, r_buf, st_buf, wp, latest):
        K = o_buf.shape[1]
        rows_in = jnp.where(valid, owner, n)
        # Stable (node, time) order; keep the last K per node (recency logic).
        p1 = jnp.argsort(t, stable=True)
        p2 = jnp.argsort(rows_in[p1], stable=True)
        perm = p1[p2]
        s_nodes = rows_in[perm]
        s_other = other[perm]
        s_t = t[perm]
        s_raw = raw_msg[perm]
        idx = jnp.arange(E)
        is_start = jnp.concatenate([jnp.ones((1,), bool), s_nodes[1:] != s_nodes[:-1]])
        group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, -1))
        pos = idx - group_start
        cnt = jax.ops.segment_sum(jnp.ones_like(s_nodes), s_nodes, num_segments=n + 2)
        cnt_elem = cnt[s_nodes]
        keep = (pos >= cnt_elem - K) & (s_nodes < n)
        dropped = jnp.sum(((pos < cnt_elem - K) & (s_nodes < n)).astype(jnp.int32))
        offset = pos - jnp.maximum(cnt_elem - K, 0)
        w_rows = jnp.where(keep, s_nodes, n)
        w_cols = jnp.where(keep, (wp[jnp.clip(s_nodes, 0, n)] + offset) % K, 0)
        o_buf = o_buf.at[w_rows, w_cols].set(
            jnp.where(keep, s_other, o_buf[w_rows, w_cols]), mode="drop"
        ).at[n].set(PADDED_NODE_ID)
        t_buf = t_buf.at[w_rows, w_cols].set(
            jnp.where(keep, s_t, t_buf[w_rows, w_cols]), mode="drop"
        ).at[n].set(0)
        r_buf = r_buf.at[w_rows, w_cols].set(
            jnp.where(keep[:, None], s_raw, r_buf[w_rows, w_cols]), mode="drop"
        ).at[n].set(0.0)
        st_buf = st_buf.at[w_rows, w_cols].set(
            jnp.where(keep, counter, st_buf[w_rows, w_cols]), mode="drop"
        ).at[n].set(0)
        bump = jax.ops.segment_sum(keep.astype(jnp.int32), w_rows, num_segments=n + 2)[: n + 1]
        wp = ((wp + bump) % K).at[n].set(0)
        touched = bump > 0
        latest = jnp.where(touched, counter, latest).at[n].set(0)
        return o_buf, t_buf, r_buf, st_buf, wp, latest, dropped

    s = write(src, dst, state.s_other, state.s_t, state.s_raw, state.s_stamp,
              state.s_wp, state.s_latest)
    d = write(dst, src, state.d_other, state.d_t, state.d_raw, state.d_stamp,
              state.d_wp, state.d_latest)
    return state._replace(
        s_other=s[0], s_t=s[1], s_raw=s[2], s_stamp=s[3], s_wp=s[4], s_latest=s[5],
        d_other=d[0], d_t=d[1], d_raw=d[2], d_stamp=d[3], d_wp=d[4], d_latest=d[5],
        counter=counter,
        # Truncation detectability (the mean aggregator is exact only up to
        # mean_slots messages/node/role/batch): callers can fetch
        # ``state.overflow`` and warn instead of silently diverging from the
        # reference's unbounded per-batch mean.
        overflow=state.overflow + s[6] + d[6],
    )


class TGNMemory(nn.Module):
    """Learnable part of the TGN memory: Time2Vec + GRU message update.

    ``aggregator='last'`` (default, exact single-slot stores) or ``'mean'``
    (multi-slot stores averaging the most recent batch's messages per node —
    exact up to ``mean_slots`` messages per node per role per batch).
    """

    num_nodes: int
    raw_msg_dim: int
    memory_dim: int
    time_dim: int
    aggregator: str = "last"
    mean_slots: int = 8

    # EncoderModule protocol (checked by HookManager.validate_requirement).
    requires: Set[str] = frozenset({"unique_nids", "global_to_local"})

    def setup(self) -> None:
        if self.aggregator not in ("last", "mean"):
            raise ValueError(f"Unknown aggregator {self.aggregator!r}")
        self.time_enc = Time2Vec(time_dim=self.time_dim)
        # Torch-layout GRU (separate input/hidden biases): required for exact
        # Adam-trajectory parity with the reference (see modules/gru.py).
        self.gru = TorchGRUCell(features=self.memory_dim)

    def _staged_mean(self, state: TGNMeanMemoryState, nids: jnp.ndarray):
        """Mean over the latest batch's stored messages per node (both roles)."""
        n = state.mem.shape[0] - 1
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)

        def role(other, t, raw, stamp, latest):
            o = jnp.clip(other[rows], 0, n)  # (S, K)
            tt = t[rows]
            alive = (stamp[rows] == latest[rows][:, None]) & (latest[rows] > 0)[:, None]
            alive &= other[rows] != PADDED_NODE_ID
            dt = tt - state.last_update[rows][:, None]
            enc = self.time_enc(dt.astype(jnp.float32))  # (S, K, T)
            msg = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        state.mem[rows][:, None, :], o.shape + (self.memory_dim,)
                    ),
                    state.mem[o],
                    raw[rows],
                    enc,
                ],
                axis=-1,
            )  # (S, K, M)
            w = alive.astype(msg.dtype)
            return (msg * w[..., None]).sum(1), w.sum(1), jnp.where(alive, tt, 0).max(1)

        sum_s, cnt_s, tmax_s = role(state.s_other, state.s_t, state.s_raw,
                                    state.s_stamp, state.s_latest)
        sum_d, cnt_d, tmax_d = role(state.d_other, state.d_t, state.d_raw,
                                    state.d_stamp, state.d_latest)
        total = cnt_s + cnt_d
        aggr = (sum_s + sum_d) / jnp.maximum(total, 1.0)[:, None]
        new_mem, _ = self.gru(state.mem[rows], aggr)
        new_last = jnp.maximum(tmax_s, tmax_d).astype(jnp.int32)
        return new_mem, new_last

    def _staged(
        self, state, nids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compute updated (memory, last_update) rows for ``nids`` from pending messages.

        Mirrors reference ``_get_updated_memory`` (tgn.py:191-216): message =
        [mem[n] ‖ mem[other] ‖ raw ‖ enc(t - last_update[n])], LastAggregator
        across the two role stores (src-role wins ties), GRU applied to every
        row (zero message when no pending events), last_update = max message
        time (0 if none).
        """
        if self.aggregator == "mean":
            return self._staged_mean(state, nids)
        n = state.mem.shape[0] - 1
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)

        # TPU gathers cost ~per-row regardless of width, so the narrow scalar
        # fields are stacked into one (N, 7) int32 matrix each step (a ~260KB
        # pass at wiki shapes) and fetched with ONE gather instead of six.
        # The LastAggregator winner (src-role wins ties) is decided from this
        # meta BEFORE any wide work, so the counterpart-memory gather, the
        # Time2Vec encoding and the message concat all run on S rows instead
        # of 2S — bit-identical to building both role messages and selecting
        # (per-row where commutes with the row-wise gather/encode/concat).
        meta = jnp.stack(
            [
                state.last_update,
                state.s_other, state.s_t, state.s_valid.astype(jnp.int32),
                state.d_other, state.d_t, state.d_valid.astype(jnp.int32),
            ],
            axis=1,
        )[rows]  # (S, 7)
        last_upd = meta[:, 0]
        s_t, v_s = meta[:, 2], meta[:, 3].astype(bool)
        d_t, v_d = meta[:, 5], meta[:, 6].astype(bool)
        t_s_eff = jnp.where(v_s, s_t, -1)
        t_d_eff = jnp.where(v_d, d_t, -1)
        use_d = t_d_eff > t_s_eff
        any_valid = v_s | v_d

        other_w = jnp.where(use_d, meta[:, 4], meta[:, 1])
        t_w = jnp.where(use_d, d_t, s_t)
        mem_rows = state.mem[rows]
        mem_other = state.mem[jnp.clip(other_w, 0, n)]  # (S, M) winner only
        raw_w = jnp.where(use_d[:, None], state.d_raw[rows], state.s_raw[rows])
        enc = self.time_enc((t_w - last_upd).astype(jnp.float32))  # (S, T)

        agg = jnp.concatenate([mem_rows, mem_other, raw_w, enc], axis=-1)
        agg = jnp.where(any_valid[:, None], agg, 0.0)

        new_mem, _ = self.gru(mem_rows, agg)
        new_last = jnp.maximum(jnp.maximum(t_s_eff, t_d_eff), 0)
        return new_mem, new_last

    def _staged_packed(self, state: TGNPackedState, nids: jnp.ndarray):
        """Packed-layout twin of ``_staged`` — identical math, 5 gathers."""
        n = state.mem.shape[0] - 1
        R = state.raws.shape[1] // 2
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)

        meta = state.meta[rows]  # (S, 8) one gather for all scalar fields
        mem_rows = state.mem[rows]
        raw_rows = state.raws[rows]
        last_upd = meta[:, 0]
        s_t, s_valid = meta[:, 2], meta[:, 3].astype(bool)
        d_t, d_valid = meta[:, 5], meta[:, 6].astype(bool)

        # Winner-first (see _staged): decide the LastAggregator winner from
        # meta, then gather/encode only that role's row — bit-identical.
        t_s_eff = jnp.where(s_valid, s_t, -1)
        t_d_eff = jnp.where(d_valid, d_t, -1)
        use_d = t_d_eff > t_s_eff
        any_valid = s_valid | d_valid

        other_w = jnp.where(use_d, meta[:, 4], meta[:, 1])
        t_w = jnp.where(use_d, d_t, s_t)
        mem_other = state.mem[jnp.clip(other_w, 0, n)]
        raw_w = jnp.where(use_d[:, None], raw_rows[:, R:], raw_rows[:, :R])
        enc = self.time_enc((t_w - last_upd).astype(jnp.float32))

        agg = jnp.concatenate([mem_rows, mem_other, raw_w, enc], axis=-1)
        agg = jnp.where(any_valid[:, None], agg, 0.0)

        new_mem, _ = self.gru(mem_rows, agg)
        new_last = jnp.maximum(jnp.maximum(t_s_eff, t_d_eff), 0)
        return new_mem, new_last

    def stage_packed(self, state: TGNPackedState, nids: jnp.ndarray, training: bool = True):
        n = state.mem.shape[0] - 1
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)
        if training:
            return self._staged_packed(state, nids)
        return state.mem[rows], state.meta[rows, 0]

    def flush_packed(self, state: TGNPackedState, nids: jnp.ndarray) -> TGNPackedState:
        n = state.mem.shape[0] - 1
        new_mem, new_last = self._staged_packed(state, nids)
        new_mem = jax.lax.stop_gradient(new_mem)
        rows = jnp.where((nids >= 0) & (nids < n), nids, n)
        mem = state.mem.at[rows].set(new_mem, mode="drop").at[n].set(0.0)
        meta = state.meta.at[rows, 0].set(new_last, mode="drop").at[n, 0].set(0)
        return state._replace(mem=mem, meta=meta)

    def flush_all_packed(self, state: TGNPackedState) -> TGNPackedState:
        """Packed train->eval transition: flush every node, clear stores."""
        state = self.flush_packed(state, jnp.arange(self.num_nodes))
        meta = state.meta
        cleared = jnp.zeros_like(meta[:, 1:])
        cleared = cleared.at[:, 0].set(PADDED_NODE_ID)  # s_other
        cleared = cleared.at[:, 3].set(PADDED_NODE_ID)  # d_other
        return state._replace(
            meta=meta.at[:, 1:].set(cleared), raws=jnp.zeros_like(state.raws)
        )

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

    def flush_all(self, state):
        """Train→eval transition (tgn.py:245-251): flush every node, clear stores."""
        state = self.flush(state, jnp.arange(self.num_nodes))
        if self.aggregator == "mean":
            # A zero 'latest' stamp marks every slot stale (= store reset).
            return state._replace(
                s_latest=jnp.zeros_like(state.s_latest),
                d_latest=jnp.zeros_like(state.d_latest),
            )
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

    def __call__(self, state, nids: jnp.ndarray):
        if isinstance(state, TGNPackedState):
            return self.stage_packed(state, nids, training=True)
        return self.stage(state, nids, training=True)

    def init_state(self, row_multiple: int = 1):
        if self.aggregator == "mean":
            return tgn_mean_init_state(
                self.num_nodes, self.memory_dim, self.raw_msg_dim,
                self.mean_slots, row_multiple,
            )
        return tgn_init_state(
            self.num_nodes, self.memory_dim, self.raw_msg_dim, row_multiple
        )

    def store(self, state, src, dst, t, raw_msg, valid):
        """Aggregator-dispatched message-store write (pure, param-free)."""
        if self.aggregator == "mean":
            return tgn_mean_store_messages(state, src, dst, t, raw_msg, valid)
        return tgn_store_messages(state, src, dst, t, raw_msg, valid)


def tgn_commit_staged(state, nodes, st_mem, st_last):
    """Write pre-computed staged (memory, last_update) rows into stored state.

    Flush-equivalent commit for callers that already ran the staging GRU on
    ``nodes`` in their forward (the staged value is a per-row function of the
    pre-store state, so re-using it is bit-identical to ``flush``). Handles
    both the unpacked and packed layouts; invalid/padded ids must already be
    mapped to a dead row by the caller (flush convention)."""
    st_mem = jax.lax.stop_gradient(st_mem)
    st_last = jax.lax.stop_gradient(st_last)
    n = state.mem.shape[0] - 1
    rows = jnp.where((nodes >= 0) & (nodes < n), nodes, n)
    mem = state.mem.at[rows].set(
        st_mem.astype(state.mem.dtype), mode="drop"
    ).at[n].set(0.0)
    if isinstance(state, TGNPackedState):
        meta = state.meta.at[rows, 0].set(st_last, mode="drop").at[n, 0].set(0)
        return state._replace(mem=mem, meta=meta)
    last = state.last_update.at[rows].set(st_last, mode="drop").at[n].set(0)
    return state._replace(mem=mem, last_update=last)


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


def rowwise_project_edge_feats(
    enc_params: Any,
    edge_x_full: jnp.ndarray,  # (E, msg_dim) static split feature table
    time_dim: int,
    kv_bf16: bool,
) -> jnp.ndarray:
    """Loop-invariant message half of the rowwise lin_edge projection.

    ``edge_x_full @ lin_edge.kernel[time_dim:]`` — valid whenever the
    encoder params are frozen across the epoch (eval). The per-batch
    feature gather then fetches ``out_channels``-wide projected rows
    instead of ``msg_dim``-wide raw ones, and the per-batch message
    projection matmul disappears (see ``nbr_msg_proj``). Zero rows project
    to zero (no bias), so the gather's PAD handling is unchanged.
    """
    kern = enc_params["params"]["lin_edge"]["kernel"]
    kvdt = jnp.bfloat16 if kv_bf16 else kern.dtype
    return jnp.dot(edge_x_full.astype(kvdt), kern[time_dim:].astype(kvdt))


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
    # bf16 K/V pipeline with f32-accumulated dots — numerically what the TPU
    # MXU does to f32 operands anyway; keeps the gathered neighbor tensors in
    # bf16 end-to-end (see modules/attention.py:TemporalAttention.kv_bf16).
    kv_bf16: bool = False
    # Score-tensor layout. "lanesv" (default): the "lanes" score chain —
    # logits (H, K, S) with seeds on the 128-lane axis (same philosophy as
    # the lane-major recency select kernel), softmax reducing over the
    # sublane-tiled K axis — PLUS a lane-major value contraction (v
    # pre-transposed to (H, K, C, S) so the alpha·v product never exists
    # K-major). "kmajor": logits (S, K, H) — K/H are the tiled dims,
    # 20/1024 tile-slot utilization at H=2, K=10; its softmax/mask fusions
    # were ~27% of the r5 eval epoch. Same math modulo fp reduction order;
    # measured same-session on v5e (r5): lanes vs kmajor train 272.0k vs
    # 253.6k (+7.3%), eval 143.9k vs 91.8k (+56.8%); lanesv vs lanes eval
    # 147.3k vs 144.0k (+2.3%), train +0.6%.
    score_layout: str = "lanesv"

    def setup(self) -> None:
        assert self.out_channels % self.n_heads == 0
        self.head_dim = self.out_channels // self.n_heads
        self.time_enc = Time2Vec(time_dim=self.time_dim)
        self.lin_query = nn.Dense(self.out_channels)
        # Dense over the 3-D concat: XLA splits the dot across concat operands
        # without materializing the wide (S, K, time+msg) tensor. The flattened
        # BlockDense form forced that buffer to materialize and measured a 27%
        # TGAT-epoch regression on v5e (see modules/attention.py) — keep the
        # compiler-friendly form.
        kvdt = jnp.bfloat16 if self.kv_bf16 else None
        self.lin_key = nn.Dense(self.out_channels, dtype=kvdt)
        self.lin_value = nn.Dense(self.out_channels, dtype=kvdt)
        self.lin_edge = nn.Dense(self.out_channels, use_bias=False, dtype=kvdt)
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
        nbr_msg_proj: Optional[jnp.ndarray] = None,  # (S, K, out) msg @ W_m
    ) -> jnp.ndarray:
        S, K = nbr_valid.shape
        H, C = self.n_heads, self.head_dim
        rel_t = seed_last_update[:, None] - nbr_time
        time_feat = self.time_enc(rel_t.astype(jnp.float32))
        if self.kv_bf16:
            time_feat = time_feat.astype(jnp.bfloat16)
            nbr_msg = nbr_msg.astype(jnp.bfloat16)
            x_nbr = x_nbr.astype(jnp.bfloat16)
        # K/V projections run 2-D over flattened (S*K, ·) operands: the 3-D
        # (S, K, D) dots made XLA relayout the gathered tensors to an
        # S-minor layout first (profiled ~95 us/eval-batch of {2,1,0}->
        # {0,2,1} copies on the (4400, 10, 172/100) inputs); the flatten is
        # a free bitcast on the gather's natural row-major layout and the
        # 2-D dot needs no relayout. Same math, same accumulation dims.
        if nbr_msg_proj is not None:
            # Pre-projected message half of the lin_edge dot (eval-only:
            # params are frozen, so edge_x_full @ W_m is computed ONCE per
            # epoch by project_edge_feats and the per-batch gather fetches
            # out_channels-wide projected rows instead of msg_dim-wide raw
            # ones). The time half uses the SAME lin_edge kernel slice, so
            # e differs from the fused dot only by split-sum association.
            kern = self.lin_edge.variables["params"]["kernel"]
            T = time_feat.shape[-1]
            kvdt = jnp.bfloat16 if self.kv_bf16 else kern.dtype
            e_t = jnp.dot(time_feat.reshape(S * K, -1),
                          kern[:T].astype(kvdt))
            e = (e_t + nbr_msg_proj.reshape(S * K, -1).astype(kvdt)
                 ).reshape(S, K, H, C)
        else:
            edge_attr = jnp.concatenate(
                [time_feat.reshape(S * K, -1), nbr_msg.reshape(S * K, -1)],
                axis=-1,
            )
            e = self.lin_edge(edge_attr).reshape(S, K, H, C)

        q = self.lin_query(x_seed).reshape(S, H, C)
        xn2 = x_nbr.reshape(S * K, -1)
        k = self.lin_key(xn2).reshape(S, K, H, C) + e
        v = self.lin_value(xn2).reshape(S, K, H, C) + e

        # f32 accumulation either way; bf16 operands when kv_bf16 (identical
        # to the MXU's default handling of f32 operands on TPU).
        if self.score_layout in ("lanes", "lanesv"):
            # Seeds-on-lanes score chain: every (mask / softmax / rescale)
            # elementwise op runs on (H, K, S) tensors whose minor axis is
            # the big S, not the tiny H.
            logits = jnp.einsum(
                "shc,skhc->hks", q.astype(k.dtype), k,
                preferred_element_type=jnp.float32,
            ) * (C**-0.5)
            mask_t = nbr_valid.T[None]  # (1, K, S)
            logits = jnp.where(mask_t, logits, -1e10)
            alpha = jax.nn.softmax(logits, axis=1)
            alpha = jnp.where(mask_t, alpha, 0.0)
            alpha = self.drop(alpha, deterministic=deterministic)
            if self.score_layout == "lanesv":
                # Lane-major VALUE contraction too: the hook-DAG program's
                # XLA fusion materializes the alpha*v product at the
                # K-major (S, K, H, C) layout (the 6.7% hook-vs-fused gap,
                # docs/performance.md); pre-transposing v keeps S on the
                # lanes through the k-reduction so no K-major intermediate
                # exists to materialize. Same math, fp-level reduction
                # grouping.
                v_l = jnp.einsum("skhc->hkcs", v)
                out = jnp.einsum(
                    "hks,hkcs->hcs", alpha.astype(v.dtype), v_l,
                    preferred_element_type=jnp.float32,
                )
                out = out.transpose(2, 0, 1).reshape(S, self.out_channels)
                return out + self.lin_skip(x_seed)
            out = jnp.einsum(
                "hks,skhc->shc", alpha.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).reshape(S, self.out_channels)
            return out + self.lin_skip(x_seed)
        logits = jnp.einsum(
            "shc,skhc->skh", q.astype(k.dtype), k,
            preferred_element_type=jnp.float32,
        ) * (C**-0.5)
        logits = jnp.where(nbr_valid[:, :, None], logits, -1e10)
        alpha = jax.nn.softmax(logits, axis=1)
        alpha = jnp.where(nbr_valid[:, :, None], alpha, 0.0)
        alpha = self.drop(alpha, deterministic=deterministic)
        out = jnp.einsum(
            "skh,skhc->shc", alpha.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(S, self.out_channels)
        return out + self.lin_skip(x_seed)
