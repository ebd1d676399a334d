"""Self-contained TGN training pipeline for scanned / sharded execution.

Composes the full per-batch program — random negative sampling, recency
neighbor query/update, dedup, TGN memory staging, TransformerConv embedding,
BCE loss, optimizer update, memory commit — into one pure
``train_step(carry, batch) -> (carry, loss)`` suitable for ``lax.scan`` epochs
and for ``jax.jit`` sharding over a device mesh (bench.py and
``__graft_entry__.dryrun_multichip`` both build on this).

Semantics match examples/linkproppred/tgn.py (which mirrors the reference
example /root/reference/examples/linkproppred/tgn.py); this module trades the
hook-manager indirection for a hand-fused pipeline.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..constants import PADDED_NODE_ID
from ..core.batch import DGBatch
from ..hooks.neighbors import (
    gather_edge_feats,
    recency_eid_init,
    recency_eid_query,
    recency_eid_update,
    recency_init,
    recency_pk_init,
    recency_pk_query,
    recency_pk_update,
    recency_query,
    recency_update,
)
from ..nn.decoder import LinkPredictor
from .epoch import StaticTablesMixin
from ..nn.encoder.tgn import (
    GraphAttentionEmbedding,
    GraphAttentionEmbeddingRowwise,
    TGNMemory,
    tgn_commit_staged,
    tgn_init_state,
    tgn_pack_state,
    tgn_store_messages,
    tgn_store_messages_packed,
)

_SENTINEL = jnp.iinfo(jnp.int32).max


def default_feat_bf16() -> bool:
    """Auto policy for bf16 feature-table storage: OFF (measured neutral).

    XLA's default TPU matmul already rounds f32 operands to bf16 on the MXU,
    so bf16 tables don't change matmul numerics there — the hope was halved
    HBM traffic on the per-step feature gathers. Measured on v5e at wiki
    shapes: TGN 258.4k (f32) vs 257.8k (bf16) edges/s — neutral; TGAT 77.3k
    vs 75.2k — a 2.7% LOSS (the f32 time-encoding concat forces a bf16->f32
    convert of the gathered features). Default is therefore f32; pass
    ``feat_bf16=True`` to halve the table's HBM *footprint* when capacity
    (not speed) is the constraint."""
    return False


class TGNCarry(NamedTuple):
    params: Any
    opt_state: Any
    mem_state: Any
    rec_state: Any
    rng: jnp.ndarray


class TGNPipeline(StaticTablesMixin):
    """Build once per (graph, hyperparams); step functions are pure."""

    _TABLE_ATTRS = ("edge_x_full",)

    def __init__(
        self,
        num_nodes: int,
        edge_dim: int,
        memory_dim: int = 100,
        embed_dim: int = 100,
        time_dim: int = 100,
        num_nbrs: int = 10,
        lr: float = 1e-4,
        neg_low: int = 0,
        neg_high: int = 1,
        dropout: float = 0.0,
        state_row_multiple: int = 1,
        rowwise: bool = True,
        edge_x_full: Any = None,
        packed_state: bool = False,
        dedup_staging: bool = False,
        packed_recency: bool = False,
        feat_bf16: Optional[bool] = None,
        attn_bf16: Optional[bool] = None,
        attn_score_layout: str = "lanesv",
    ) -> None:
        self.num_nodes = num_nodes
        self.state_row_multiple = state_row_multiple
        # eid-buffer recency: carry int32 edge ids in the ring buffers and
        # gather features from this split-wide static array at query time —
        # removes the (N, K, D) feature buffer (and its per-step layout copy)
        # from the scan carry. Requires batches with ``edge_ids``
        # (DeviceEdgeStream provides them).
        if feat_bf16 is None:
            feat_bf16 = default_feat_bf16()
        self.feat_bf16 = feat_bf16
        # Resolve the tri-state attention flag ONCE and use the resolved bool
        # for BOTH the encoder's kv_bf16 and the feature-table dtype: gating
        # the table cast on the unresolved flag while passing the raw None to
        # the encoder left the r3 default config with a bf16 table feeding an
        # f32 K/V path — a per-step bf16->f32 convert sweep and no longer
        # bit-identical (ADVICE r3, medium).
        from ..util.precision import resolve_bf16

        attn_bf16 = resolve_bf16(attn_bf16)
        if edge_x_full is not None and feat_bf16:
            edge_x_full = jnp.asarray(edge_x_full, jnp.bfloat16)
        elif edge_x_full is not None and rowwise and attn_bf16:
            # The recency-gathered features feed ONLY the bf16 K/V
            # attention path (raw messages come from the stream's own
            # edge_x), so bf16(gather(x)) == gather(bf16(x)) bit-exactly
            # — storing the table bf16 halves the dominant eval gather
            # (44000 rows/batch at Q=20, profiled 38% of the eval step)
            # with identical outputs.
            edge_x_full = jnp.asarray(edge_x_full, jnp.bfloat16)
        self.edge_x_full = edge_x_full
        # Packed memory-state layout (measured NEGATIVE on v5e — default off):
        # packing cut the staging gathers from ~12 to 5 but the column-sliced
        # scatters in store/flush compiled to whole-array copies; wiki-shape
        # bench dropped 186k -> 59k edges/s. Kept because it is bit-equivalent
        # (tests) and other backends/shapes may prefer it.
        self.packed_state = packed_state
        # Stage each unique row once (seeds+neighbors carry ~30% duplicates at
        # wiki shapes) at the cost of one sort + an inverse gather per step.
        # NOTE: this deliberately violates the CLAUDE.md "jnp.unique only off
        # the hot path" invariant — it is an opt-in, benchmarked trade (the
        # sort can pay for itself when staging dominates); keep it off unless
        # a measurement on the target shapes says otherwise.
        self.dedup_staging = dedup_staging
        # Packed eid recency: one (N, K, 3) int32 buffer [nbr, time, eid] —
        # one gather/scatter per step instead of three (requires eid mode).
        self.packed_recency = packed_recency
        # rowwise=True uses the dense per-seed attention (no segment scatters,
        # no dedup) — the TPU speed-of-light layout; rowwise=False keeps the
        # reference example's dedup + segment-softmax subgraph aggregation.
        self.rowwise = rowwise
        self.edge_dim = edge_dim
        self.num_nbrs = num_nbrs
        self.neg_low = neg_low
        self.neg_high = max(neg_high, neg_low + 1)
        self.memory = TGNMemory(
            num_nodes=num_nodes,
            raw_msg_dim=edge_dim,
            memory_dim=memory_dim,
            time_dim=time_dim,
        )
        # bf16 K/V attention measured NEUTRAL for TGN *train* on v5e (257.7k
        # vs 258.4k edges/s — the train step is staging-bound), but the bf16
        # feature table it enables is +41% on the gather-dominated eval step,
        # so auto resolves to ON for TPU (CPU stays f32 for torch parity).
        self.attn_bf16 = attn_bf16
        enc_cls = GraphAttentionEmbeddingRowwise if rowwise else GraphAttentionEmbedding
        enc_kwargs = ({"kv_bf16": self.attn_bf16,
                       "score_layout": attn_score_layout}
                      if rowwise else {})
        self.encoder = enc_cls(
            in_channels=memory_dim,
            out_channels=embed_dim,
            msg_dim=edge_dim,
            time_dim=time_dim,
            dropout=dropout,
            **enc_kwargs,
        )
        self.decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
        self.opt = optax.adam(lr)
        self.embed_dim = embed_dim
        self.memory_dim = memory_dim
        self.time_dim = time_dim

    # ------------------------------------------------------------------ #
    def init_carry(self, rng: jnp.ndarray) -> TGNCarry:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        mem_state = tgn_init_state(
            self.num_nodes, self.memory_dim, self.edge_dim, self.state_row_multiple
        )
        if self.packed_state:
            mem_state = tgn_pack_state(mem_state)
        if self.edge_x_full is not None:
            if self.packed_recency:
                rec_state = recency_pk_init(
                    self.num_nodes, self.num_nbrs, self.state_row_multiple
                )
            else:
                rec_state = recency_eid_init(
                    self.num_nodes, self.num_nbrs, self.state_row_multiple
                )
        else:
            rec_state = recency_init(
                self.num_nodes, self.num_nbrs, self.edge_dim, self.state_row_multiple
            )
        mem_params = self.memory.init(k1, mem_state, jnp.zeros(4, jnp.int32))
        if self.rowwise:
            enc_params = self.encoder.init(
                k2,
                jnp.zeros((4, self.memory_dim)),
                jnp.zeros((4, 3, self.memory_dim)),
                jnp.zeros(4, jnp.int32),
                jnp.zeros((4, 3), jnp.int32),
                jnp.zeros((4, 3, self.edge_dim)),
                jnp.ones((4, 3), bool),
            )
        else:
            enc_params = self.encoder.init(
                k2,
                jnp.zeros((8, self.memory_dim)),
                jnp.zeros(8, jnp.int32),
                jnp.zeros(4, jnp.int32),
                jnp.zeros(4, jnp.int32),
                jnp.zeros(4, jnp.int32),
                jnp.zeros((4, self.edge_dim)),
                jnp.ones(4, bool),
            )
        dec_params = self.decoder.init(
            k3, jnp.zeros((1, self.embed_dim)), jnp.zeros((1, self.embed_dim))
        )
        params = {"mem": mem_params, "enc": enc_params, "dec": dec_params}
        return TGNCarry(params, self.opt.init(params), mem_state, rec_state, k4)

    # ------------------------------------------------------------------ #
    def _forward(
        self, params, mem_state, rec_state, batch: DGBatch, neg, neg_time,
        return_staged: bool = False,
    ):
        """Sample neighbors, stage memory, embed, score pos/neg.

        With ``return_staged`` (rowwise path), additionally return the staged
        (memory, last_update) rows for the first 2B seeds (src ‖ dst) — the
        exact values the post-step memory flush would recompute for the same
        ``mem_state`` (reference ``_update_memory`` = ``_get_updated_memory``
        on the batch nodes), letting ``train_step`` commit them directly."""
        B = batch.edge_src.shape[0]
        K = self.num_nbrs
        n = self.num_nodes

        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, neg])
        seed_t = jnp.concatenate([batch.edge_time, batch.edge_time, neg_time])
        if self.edge_x_full is not None:
            q = recency_pk_query if self.packed_recency else recency_eid_query
            nbr_ids, nbr_t, nbr_e = q(rec_state, seeds, seed_t, K)
            nbr_x = gather_edge_feats(self.edge_x_full, nbr_e)
        else:
            nbr_ids, nbr_t, nbr_x = recency_query(rec_state, seeds, seed_t, K)

        if self.rowwise:
            S = seeds.shape[0]
            rows = jnp.concatenate([seeds, nbr_ids.reshape(-1)])
            stage_method = (
                TGNMemory.stage_packed if self.packed_state else TGNMemory.stage
            )
            if self.dedup_staging:
                keyed = jnp.where((rows >= 0) & (rows < n), rows, n)
                uniq, inv = jnp.unique(
                    keyed, size=rows.shape[0], fill_value=n, return_inverse=True
                )
                z_u, lu_u = self.memory.apply(
                    params["mem"], mem_state, uniq, method=stage_method
                )
                z_mem, last_upd = z_u[inv], lu_u[inv]
            else:
                z_mem, last_upd = self.memory.apply(
                    params["mem"], mem_state, rows, method=stage_method
                )
            z = self.encoder.apply(
                params["enc"],
                z_mem[:S],
                z_mem[S:].reshape(S, K, self.memory_dim),
                last_upd[:S],
                nbr_t,
                nbr_x,
                nbr_ids != PADDED_NODE_ID,
            )
            z_src, z_dst, z_neg = z[:B], z[B : 2 * B], z[2 * B : 3 * B]
            pos = self.decoder.apply(params["dec"], z_src, z_dst)
            negs = self.decoder.apply(params["dec"], z_src, z_neg)
            if return_staged:
                return pos, negs, (z_mem[: 2 * B], last_upd[: 2 * B])
            return pos, negs

        # Dedup into a fixed-width local index space.
        all_ids = jnp.concatenate([seeds, nbr_ids.reshape(-1)])
        keyed = jnp.where((all_ids >= 0) & (all_ids < n), all_ids, _SENTINEL)
        uniq = jnp.unique(keyed, size=all_ids.shape[0], fill_value=_SENTINEL)
        u_valid = uniq != _SENTINEL
        unique_nids = jnp.where(u_valid, uniq, PADDED_NODE_ID)
        U = unique_nids.shape[0]
        g2l = jnp.full((n + 1,), U - 1, jnp.int32)
        g2l = g2l.at[jnp.where(u_valid, uniq, n)].set(
            jnp.arange(U, dtype=jnp.int32), mode="drop"
        )
        to_local = lambda ids: g2l[jnp.where((ids >= 0) & (ids < n), ids, n)]

        z_mem, last_upd = self.memory.apply(
            params["mem"], mem_state, unique_nids,
            method=TGNMemory.stage_packed if self.packed_state else TGNMemory.stage,
        )

        src_rep = jnp.repeat(seeds, K)
        nbr_flat = nbr_ids.reshape(-1)
        e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
        z = self.encoder.apply(
            params["enc"],
            z_mem,
            last_upd,
            to_local(src_rep),
            to_local(nbr_flat),
            nbr_t.reshape(-1),
            nbr_x.reshape(nbr_flat.shape[0], -1),
            e_valid,
        )
        z_src = z[to_local(batch.edge_src)]
        z_dst = z[to_local(batch.edge_dst)]
        z_neg = z[to_local(neg)]
        pos = self.decoder.apply(params["dec"], z_src, z_dst)
        negs = self.decoder.apply(
            params["dec"],
            jnp.repeat(z_src, neg.shape[0] // B, axis=0) if neg.shape[0] != B else z_src,
            z_neg,
        )
        return pos, negs

    def _raw_msg(self, batch: DGBatch) -> jnp.ndarray:
        if batch.edge_x is not None:
            return batch.edge_x
        return jnp.zeros((batch.edge_src.shape[0], 0), jnp.float32)

    # ------------------------------------------------------------------ #
    def train_step(self, carry: TGNCarry, batch: DGBatch) -> Tuple[TGNCarry, jnp.ndarray]:
        params, opt_state, mem_state, rec_state, rng = carry
        rng, k_neg = jax.random.split(rng)
        B = batch.edge_src.shape[0]
        neg = jax.random.randint(k_neg, (B,), self.neg_low, self.neg_high, dtype=jnp.int32)
        if batch.edge_valid is not None:
            # Padded rows must not inject live seeds into the batch subgraph.
            neg = jnp.where(batch.edge_valid, neg, PADDED_NODE_ID)
        neg_time = batch.edge_time

        def loss_fn(p):
            out = self._forward(
                p, mem_state, rec_state, batch, neg, neg_time,
                return_staged=self.rowwise,
            )
            pos, negs = out[0], out[1]
            m = batch.edge_valid.astype(pos.dtype)
            denom = jnp.maximum(jnp.sum(m), 1.0)
            l_pos = jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m) / denom
            l_neg = jnp.sum(optax.sigmoid_binary_cross_entropy(negs, jnp.zeros_like(negs)) * m) / denom
            return l_pos + l_neg, (out[2] if self.rowwise else None)

        (loss, staged), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # State commit (reference order: before the optimizer step).
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, self.num_nodes
        )
        if self.rowwise:
            # The flush for this batch's nodes equals the staged rows the
            # forward already computed for seeds[:2B] = src ‖ dst (identical
            # per-row function of the pre-store mem_state) — commit them
            # directly instead of re-running the staging GRU.
            mem_state = tgn_commit_staged(mem_state, nodes, *staged)
        else:
            mem_state = self.memory.apply(
                params["mem"], mem_state, nodes,
                method=TGNMemory.flush_packed if self.packed_state else TGNMemory.flush,
            )
        store = tgn_store_messages_packed if self.packed_state else tgn_store_messages
        mem_state = store(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            self._raw_msg(batch), batch.edge_valid,
        )
        if self.edge_x_full is not None:
            u = recency_pk_update if self.packed_recency else recency_eid_update
            rec_state = u(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_ids, batch.edge_valid, directed=False,
            )
        else:
            rec_state = recency_update(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_x, batch.edge_valid, directed=False,
            )

        # Per-leaf adam; a fused flat-vector variant measured ~3% slower on
        # v5e (the ravel/unravel copies outweigh the op-count savings).
        updates, opt_state = self.opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return TGNCarry(params, opt_state, mem_state, rec_state, rng), loss

    # ------------------------------------------------------------------ #
    def eval_step(
        self,
        carry: TGNCarry,
        batch: DGBatch,
        cands: jnp.ndarray,  # (B, Q) negative candidate dst ids
        cand_times: Optional[jnp.ndarray] = None,  # (B, Q); default edge_time
        nbr_proj_table: Optional[jnp.ndarray] = None,  # (E, embed) eval_proj_table
        mem_bf16: Optional[jnp.ndarray] = None,  # (N+1, M) bf16 memory mirror
    ) -> Tuple[TGNCarry, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Scanned evaluation: score each edge against its candidate list and
        advance state with reference eval-mode ordering (store messages, then
        apply; no parameter update). Returns (carry, (mrr_sum, mrr_count)).

        Rowwise-path only (each seed row is independent, so the B*Q candidate
        seeds batch into one dense forward). Reference contract:
        /root/reference/examples/linkproppred/tgn.py:125-184.
        """
        assert self.rowwise, "eval_step requires the rowwise pipeline"
        params, opt_state, mem_state, rec_state, rng = carry
        B, Q = cands.shape
        K = self.num_nbrs
        if cand_times is None:
            cand_times = jnp.broadcast_to(batch.edge_time[:, None], (B, Q))
        cand_flat = cands.reshape(-1)
        cand_valid = cand_flat != PADDED_NODE_ID

        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, cand_flat])
        seed_t = jnp.concatenate(
            [batch.edge_time, batch.edge_time, cand_times.reshape(-1)]
        )
        nbr_proj = None
        if self.edge_x_full is not None:
            q = recency_pk_query if self.packed_recency else recency_eid_query
            nbr_ids, nbr_t, nbr_e = q(rec_state, seeds, seed_t, K)
            if nbr_proj_table is not None:
                # Pre-projected table (eval_proj_table): gather embed-wide
                # projected rows; the encoder skips its message projection.
                nbr_proj = gather_edge_feats(nbr_proj_table, nbr_e)
                nbr_x = nbr_proj
            else:
                nbr_x = gather_edge_feats(self.edge_x_full, nbr_e)
        else:
            nbr_ids, nbr_t, nbr_x = recency_query(rec_state, seeds, seed_t, K)

        S = seeds.shape[0]
        # Eval mode: stored memory, no staging (reference tgn.py:157-163).
        # Only the SEED rows' last_update feeds the encoder, and the
        # narrow-int gather is per-element-serialized on TPU (profiled at
        # 321 us/batch for all S+S*K rows vs ~30 us for seeds only) — gather
        # memory for every row but last_update for seeds alone.
        if mem_bf16 is not None:
            # bf16 memory mirror: the S*K neighbor rows feed ONLY the bf16
            # K/V path, which casts them to bf16 right after the gather —
            # gathering from a bf16 mirror is bit-identical at half the
            # gather bytes. Seeds stay f32 (they feed lin_query/lin_skip).
            z_mem, _ = self.memory.apply(
                params["mem"], mem_state, seeds, False,
                method=TGNMemory.stage_packed if self.packed_state else TGNMemory.stage,
            )
            n = mem_bf16.shape[0] - 1
            nbr_flat = nbr_ids.reshape(-1)
            nbr_rows = jnp.where((nbr_flat >= 0) & (nbr_flat < n), nbr_flat, n)
            x_nbr = mem_bf16[nbr_rows].reshape(S, K, self.memory_dim)
            x_seed = z_mem
        else:
            rows = jnp.concatenate([seeds, nbr_ids.reshape(-1)])
            z_mem, _ = self.memory.apply(
                params["mem"], mem_state, rows, False,
                method=TGNMemory.stage_packed if self.packed_state else TGNMemory.stage,
            )
            x_seed = z_mem[:S]
            x_nbr = z_mem[S:].reshape(S, K, self.memory_dim)
        seed_rows = jnp.where(
            (seeds >= 0) & (seeds < self.num_nodes), seeds, self.num_nodes
        )
        if self.packed_state:
            last_upd_seeds = mem_state.meta[seed_rows, 0]
        else:
            last_upd_seeds = mem_state.last_update[seed_rows]
        z = self.encoder.apply(
            params["enc"],
            x_seed,
            x_nbr,
            last_upd_seeds,
            nbr_t,
            nbr_x,
            nbr_ids != PADDED_NODE_ID,
            nbr_msg_proj=nbr_proj,
        )
        z_src, z_dst, z_cand = z[:B], z[B : 2 * B], z[2 * B :]
        pos = self.decoder.apply(params["dec"], z_src, z_dst)
        negs = self.decoder.apply(
            params["dec"],
            jnp.repeat(z_src[:, None, :], Q, axis=1).reshape(B * Q, -1),
            z_cand,
        ).reshape(B, Q)

        from ..eval.metrics import mrr_sum_count

        s, c = mrr_sum_count(
            pos, negs,
            neg_valid=cand_valid.reshape(B, Q),
            edge_valid=batch.edge_valid,
        )

        # Eval-mode commit: store messages, then apply them (tgn.py:165-177).
        store = tgn_store_messages_packed if self.packed_state else tgn_store_messages
        mem_state = store(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            self._raw_msg(batch), batch.edge_valid,
        )
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, self.num_nodes
        )
        mem_state = self.memory.apply(
            params["mem"], mem_state, nodes,
            method=TGNMemory.flush_packed if self.packed_state else TGNMemory.flush,
        )
        if self.edge_x_full is not None:
            u = recency_pk_update if self.packed_recency else recency_eid_update
            rec_state = u(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_ids, batch.edge_valid, directed=False,
            )
        else:
            rec_state = recency_update(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_x, batch.edge_valid, directed=False,
            )
        out_carry = TGNCarry(params, opt_state, mem_state, rec_state, rng)
        if mem_bf16 is not None:
            # Refresh the mirror's flushed rows (<= 2B per batch): gather the
            # just-written f32 rows and scatter their bf16 casts. The dump
            # row stays 0 (flush writes 0 there).
            touched = jnp.where(
                (nodes >= 0) & (nodes < self.num_nodes), nodes, self.num_nodes
            )
            mem_bf16 = mem_bf16.at[touched].set(
                mem_state.mem[touched].astype(jnp.bfloat16), mode="drop"
            )
            return out_carry, (s, c), mem_bf16
        return out_carry, (s, c)

    def eval_mem_bf16(self, carry: TGNCarry) -> jnp.ndarray:
        """Initial bf16 mirror of the (flushed) memory table for an eval
        epoch (see ``eval_step``'s ``mem_bf16``). Only valid with the bf16
        K/V attention path, where the neighbor rows are cast to bf16 anyway."""
        assert self.attn_bf16 and not self.packed_state
        return carry.mem_state.mem.astype(jnp.bfloat16)

    def eval_advance_state(self, carry: TGNCarry, batch: DGBatch) -> TGNCarry:
        """Advance ONLY the carried state (memory commit + recency buffers)
        exactly as :meth:`eval_step` does, skipping candidate scoring.

        This is the sequential spine of the pipelined temporal-parallel eval
        schedule (parallel/temporal.py ``pipelined_eval_epoch``): state
        evolution is param-reading but score-independent, so span d+1 can
        start scoring as soon as this cheap chain reaches its boundary while
        span d's expensive (B·Q)-candidate scoring is still in flight.
        Bit-identical to the state produced by eval_step
        (tests/test_temporal_parallel.py::test_pipelined_eval_exact).
        """
        params, opt_state, mem_state, rec_state, rng = carry
        store = tgn_store_messages_packed if self.packed_state else tgn_store_messages
        mem_state = store(
            mem_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            self._raw_msg(batch), batch.edge_valid,
        )
        nodes = jnp.concatenate([batch.edge_src, batch.edge_dst])
        nodes = jnp.where(
            jnp.concatenate([batch.edge_valid, batch.edge_valid]), nodes, self.num_nodes
        )
        mem_state = self.memory.apply(
            params["mem"], mem_state, nodes,
            method=TGNMemory.flush_packed if self.packed_state else TGNMemory.flush,
        )
        if self.edge_x_full is not None:
            u = recency_pk_update if self.packed_recency else recency_eid_update
            rec_state = u(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_ids, batch.edge_valid, directed=False,
            )
        else:
            rec_state = recency_update(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_x, batch.edge_valid, directed=False,
            )
        return TGNCarry(params, opt_state, mem_state, rec_state, rng)

    def eval_proj_table(self, params: Any) -> jnp.ndarray:
        """Pre-project the static feature table for the eval epoch.

        Eval params are frozen, so ``edge_x_full @ lin_edge.kernel[T:]`` is
        loop-invariant: compute it once per epoch (one (E, msg)·(msg, embed)
        matmul) and pass it to :meth:`eval_step` as ``nbr_proj_table`` — the
        per-batch 44k-row feature gather then moves embed-wide projected rows
        and the per-batch message projection disappears. Differs from the
        fused dot only by split-sum association (the time and message halves
        accumulate separately)."""
        assert self.rowwise and self.edge_x_full is not None
        from ..nn.encoder.tgn import rowwise_project_edge_feats

        return rowwise_project_edge_feats(
            params["enc"], self.edge_x_full, self.time_dim, self.attn_bf16
        )

    def flush_all(self, carry: TGNCarry) -> TGNCarry:
        """Train -> eval transition (flush pending messages, clear stores)."""
        mem_state = self.memory.apply(
            carry.params["mem"], carry.mem_state,
            method=TGNMemory.flush_all_packed if self.packed_state else TGNMemory.flush_all,
        )
        return carry._replace(mem_state=mem_state)

    # ------------------------------------------------------------------ #
    def forward_only(self, carry: TGNCarry, batch: DGBatch) -> jnp.ndarray:
        """Jittable forward scoring (used by the compile-check entry point)."""
        params = carry.params
        B = batch.edge_src.shape[0]
        neg = jnp.flip(batch.edge_dst)
        pos, negs = self._forward(
            params, carry.mem_state, carry.rec_state, batch, neg, batch.edge_time
        )
        return jnp.stack([pos, negs])
