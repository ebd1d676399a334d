"""Self-contained TGAT training pipeline for scanned execution.

TGAT's scan body is stateless apart from the recency buffers and PRNG key:
random negatives → multi-hop recency query → temporal attention encoder →
BCE → adam, as one pure ``train_step(carry, batch)``; semantics follow
examples/linkproppred/tgat.py (which mirrors the reference example).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.batch import DGBatch
from ..constants import PADDED_NODE_ID
from ..hooks.neighbors import (
    gather_edge_feats,
    recency_eid_init,
    recency_eid_query,
    recency_eid_update,
    recency_init,
    recency_query,
    recency_update,
)
from ..nn.decoder import LinkPredictor
from ..nn.encoder.tgat import TGAT
from .epoch import StaticTablesMixin
from ..util.precision import tpu_default_bf16


def default_attn_bf16() -> bool:
    """Auto policy for the bf16 K/V attention path: ON for TPU backends
    (see tgm_tpu.util.precision; measured +19% TGAT on v5e at wiki shapes,
    numerics equivalent to the MXU's default f32-operand rounding)."""
    return tpu_default_bf16()


class TGATCarry(NamedTuple):
    params: Any
    opt_state: Any
    rec_state: Any
    rng: jnp.ndarray


def build_aug_table(
    edge_x: jnp.ndarray,  # (E, D) static edge features
    node_x: jnp.ndarray,  # (N, d) static node features
    edge_src: jnp.ndarray,  # (E,) endpoints aligned with edge_x rows
    edge_dst: jnp.ndarray,
) -> jnp.ndarray:
    """Side-augmented feature table: row ``2e+side`` = [node_x[v] ‖ edge_x[e]]
    where ``v`` is edge e's src (side 0) or dst (side 1) endpoint.

    Recency buffers then carry ``2*eid + side`` (side = which endpoint is the
    stored NEIGHBOR) so one row gather fetches both the neighbor's node
    features and the edge features. TPU gathers cost ~per-row regardless of
    width; at wiki shapes the separate hop-2 node-feature gather (60k
    rows/step) was 396us/step — ~19% of the TGAT epoch.

    The [node ‖ edge] order matches ``TemporalAttention``'s K/V concat
    ([nbr_node_feat ‖ edge_feat ‖ time_feat]) so the gathered rows feed the
    projection PRE-CONCATENATED, with no post-gather slicing: a first cut
    that split the row back into (node, edge) parts forced XLA into
    layout-copy churn on the odd-width minor dim (~2.3ms/step of relayouts
    at wiki shapes, a 2.2x regression)."""
    E = edge_x.shape[0]
    # Static tables may be padded past the real edge count (DeviceEdgeStream
    # rounds up); padded rows are never read through a valid payload.
    def fit(v):
        v = jnp.asarray(v)[:E]
        return jnp.pad(v, (0, E - v.shape[0]))

    edge_src, edge_dst = fit(edge_src), fit(edge_dst)
    a = jnp.concatenate([node_x[edge_src], edge_x], axis=1)
    b = jnp.concatenate([node_x[edge_dst], edge_x], axis=1)
    return jnp.stack([a, b], axis=1).reshape(2 * E, -1)


class TGATPipeline(StaticTablesMixin):
    _TABLE_ATTRS = ("node_x", "edge_x_full", "aug_x")

    def __init__(
        self,
        num_nodes: int,
        edge_dim: int,
        node_x: jnp.ndarray,
        num_nbrs: Sequence[int] = (10, 10),
        time_dim: int = 100,
        embed_dim: int = 100,
        n_heads: int = 2,
        lr: float = 1e-4,
        neg_low: int = 0,
        neg_high: int = 1,
        state_row_multiple: int = 1,
        edge_x_full: Any = None,
        edge_ends_full: Any = None,
        feat_bf16: "bool | None" = None,
        attn_bf16: "bool | None" = None,
        attn_score_layout: str = "kmajor",
    ) -> None:
        from .tgn_pipeline import default_feat_bf16

        self.num_nodes = num_nodes
        self.edge_dim = edge_dim
        if feat_bf16 is None:
            feat_bf16 = default_feat_bf16()
        self.feat_bf16 = feat_bf16
        if feat_bf16:
            node_x = jnp.asarray(node_x, jnp.bfloat16)
            if edge_x_full is not None:
                edge_x_full = jnp.asarray(edge_x_full, jnp.bfloat16)
        self.node_x = node_x
        self.num_nbrs = list(num_nbrs)
        self.neg_low = neg_low
        self.neg_high = max(neg_high, neg_low + 1)
        self.state_row_multiple = state_row_multiple
        # eid-buffer recency (see tgn_pipeline.py): carry edge ids, gather
        # features from this static array at query time.
        self.edge_x_full = edge_x_full
        # Side-augmented table (see build_aug_table): buffers carry 2*eid+side
        # and one gather serves edge AND neighbor-node features per slot.
        self.aug_x = None
        if edge_x_full is not None and edge_ends_full is not None:
            s_full, d_full = edge_ends_full
            self.aug_x = build_aug_table(
                edge_x_full, node_x, jnp.asarray(s_full), jnp.asarray(d_full)
            )
        if attn_bf16 is None:
            attn_bf16 = default_attn_bf16()
        self.attn_bf16 = attn_bf16
        if attn_bf16:
            # Every consumer of the static tables is on the bf16 K/V path, so
            # store them pre-rounded: XLA would otherwise hoist the same cast
            # into a runtime copy, and bf16 table gathers measured ~2x faster
            # per row than f32 on v5e.
            if self.edge_x_full is not None:
                self.edge_x_full = jnp.asarray(self.edge_x_full, jnp.bfloat16)
            if self.aug_x is not None:
                self.aug_x = jnp.asarray(self.aug_x, jnp.bfloat16)
        self.encoder = TGAT(
            node_dim=node_x.shape[1],
            edge_dim=edge_dim,
            time_dim=time_dim,
            embed_dim=embed_dim,
            num_layers=len(self.num_nbrs),
            n_heads=n_heads,
            dropout=0.0,
            kv_bf16=attn_bf16,
            score_layout=attn_score_layout,
        )
        self.decoder = LinkPredictor(node_dim=embed_dim, hidden_dim=embed_dim)
        self.opt = optax.adam(lr)
        self.embed_dim = embed_dim

    def _hops(self, rec_state, seeds, seed_t):
        """Multi-hop recency expansion (hop i+1 seeds = hop i neighbors).

        Returns ``(hops, nbr_kv_x)`` where ``hops`` is the TGAT argument
        tuple (seed_nids, seed_times, nbr_nids, nbr_edge_x, nbr_edge_time)
        and ``nbr_kv_x`` is the per-hop pre-concatenated [node ‖ edge] K/V
        features in aug-table mode (None otherwise).

        Aug mode fuses the deepest hop's neighbor-node and edge feature
        gathers into ONE row gather from the side-augmented table, consumed
        unsliced by the layer-1 attention. Shallower hops keep separate
        gathers: their standalone node/edge parts feed upper layers (Q inputs,
        merge skips, layer>=2 edge features), and slicing the fused row back
        apart is a measured layout-copy regression (see build_aug_table)."""
        last = len(self.num_nbrs) - 1
        hop_seeds, hop_times = [seeds], [seed_t]
        hop_nbrs, hop_nbr_t, hop_nbr_x = [], [], []
        hop_kv = [None] * len(self.num_nbrs) if self.aug_x is not None else None
        for hop, k in enumerate(self.num_nbrs):
            if hop > 0:
                seeds = hop_nbrs[hop - 1].reshape(-1)
                seed_t = hop_nbr_t[hop - 1].reshape(-1)
                hop_seeds.append(seeds)
                hop_times.append(seed_t)
            if self.aug_x is not None:
                nbrs, nts, pay = recency_eid_query(rec_state, seeds, seed_t, k)
                if hop == last:
                    af = gather_edge_feats(self.aug_x, pay)
                    # Invalid slots must carry [node_x[-1] ‖ 0] (the torch
                    # PAD-wrap node garbage + zero edge feats the plain path
                    # produces) for exact parity.
                    fill = jnp.concatenate(
                        [
                            self.node_x[-1],
                            jnp.zeros((self.edge_dim,), self.node_x.dtype),
                        ]
                    ).astype(af.dtype)
                    hop_kv[hop] = jnp.where((pay >= 0)[..., None], af, fill)
                    nxs = jnp.zeros(nbrs.shape + (self.edge_dim,), af.dtype)
                else:
                    eids = jnp.where(pay >= 0, pay >> 1, -1)
                    nxs = gather_edge_feats(self.edge_x_full, eids)
            elif self.edge_x_full is not None:
                nbrs, nts, nes = recency_eid_query(rec_state, seeds, seed_t, k)
                nxs = gather_edge_feats(self.edge_x_full, nes)
            else:
                nbrs, nts, nxs = recency_query(rec_state, seeds, seed_t, k)
            hop_nbrs.append(nbrs)
            hop_nbr_t.append(nts)
            hop_nbr_x.append(nxs)
        return (hop_seeds, hop_times, hop_nbrs, hop_nbr_x, hop_nbr_t), hop_kv

    def _push(self, rec_state, batch: DGBatch):
        """Advance the recency buffers with this batch's events."""
        if self.aug_x is not None:
            # Directed push of both orientations with side-augmented payload
            # ids (2*eid + side, side = which endpoint is the neighbor) —
            # identical write plan to the undirected push of (src, dst, eid).
            src2 = jnp.concatenate([batch.edge_src, batch.edge_dst])
            dst2 = jnp.concatenate([batch.edge_dst, batch.edge_src])
            t2 = jnp.concatenate([batch.edge_time, batch.edge_time])
            pay2 = jnp.concatenate(
                [batch.edge_ids * 2 + 1, batch.edge_ids * 2]
            )
            v2 = (
                None
                if batch.edge_valid is None
                else jnp.concatenate([batch.edge_valid, batch.edge_valid])
            )
            return recency_eid_update(
                rec_state, src2, dst2, t2, pay2, v2, directed=True
            )
        if self.edge_x_full is not None:
            return recency_eid_update(
                rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
                batch.edge_ids, batch.edge_valid, directed=False,
            )
        return recency_update(
            rec_state, batch.edge_src, batch.edge_dst, batch.edge_time,
            batch.edge_x, batch.edge_valid, directed=False,
        )

    def init_carry(self, rng: jnp.ndarray) -> TGATCarry:
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.edge_x_full is not None:
            rec_state = recency_eid_init(
                self.num_nodes, max(self.num_nbrs), self.state_row_multiple
            )
        else:
            rec_state = recency_init(
                self.num_nodes, max(self.num_nbrs), self.edge_dim,
                self.state_row_multiple,
            )
        B0 = 4
        seeds = jnp.zeros(3 * B0, jnp.int32)
        st = jnp.zeros(3 * B0, jnp.int32)
        hops, nnx = self._hops(rec_state, seeds, st)
        enc_params = self.encoder.init(k1, self.node_x, *hops, nbr_kv_x=nnx)
        dec_params = self.decoder.init(
            k2, jnp.zeros((1, self.embed_dim)), jnp.zeros((1, self.embed_dim))
        )
        params = {"enc": enc_params, "dec": dec_params}
        return TGATCarry(params, self.opt.init(params), rec_state, k3)

    def train_step(self, carry: TGATCarry, batch: DGBatch) -> Tuple[TGATCarry, jnp.ndarray]:
        params, opt_state, rec_state, rng = carry
        rng, k_neg = jax.random.split(rng)
        B = batch.edge_src.shape[0]
        neg = jax.random.randint(k_neg, (B,), self.neg_low, self.neg_high, dtype=jnp.int32)
        if batch.edge_valid is not None:
            neg = jnp.where(batch.edge_valid, neg, PADDED_NODE_ID)
        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, neg])
        seed_t = jnp.concatenate([batch.edge_time] * 3)
        hops, nnx = self._hops(rec_state, seeds, seed_t)

        def loss_fn(p):
            z = self.encoder.apply(p["enc"], self.node_x, *hops, nbr_kv_x=nnx)
            pos = self.decoder.apply(p["dec"], z[:B], z[B : 2 * B])
            negs = self.decoder.apply(p["dec"], z[:B], z[2 * B : 3 * B])
            m = batch.edge_valid.astype(pos.dtype)
            d = jnp.maximum(m.sum(), 1.0)
            return (
                jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * m)
                + jnp.sum(optax.sigmoid_binary_cross_entropy(negs, jnp.zeros_like(negs)) * m)
            ) / d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        rec_state = self._push(rec_state, batch)
        updates, opt_state = self.opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return TGATCarry(params, opt_state, rec_state, rng), loss

    def eval_step(self, carry: TGATCarry, batch: DGBatch, cands: jnp.ndarray,
                  cand_times=None):
        """Scanned candidate-list evaluation: score each edge against its
        (B, Q) candidates, advance the recency state, return
        (carry, (mrr_sum, mrr_count)). Mirrors the reference TGAT example's
        eval (examples/linkproppred/tgat.py:95-133)."""
        from ..constants import PADDED_NODE_ID as _PAD
        from ..eval.metrics import mrr_sum_count

        params, opt_state, rec_state, rng = carry
        B, Q = cands.shape
        if cand_times is None:
            cand_times = jnp.broadcast_to(batch.edge_time[:, None], (B, Q))
        cand_flat = cands.reshape(-1)
        seeds = jnp.concatenate([batch.edge_src, batch.edge_dst, cand_flat])
        seed_t = jnp.concatenate(
            [batch.edge_time, batch.edge_time, cand_times.reshape(-1)]
        )
        hops, nnx = self._hops(rec_state, seeds, seed_t)
        z = self.encoder.apply(params["enc"], self.node_x, *hops, nbr_kv_x=nnx)
        pos = self.decoder.apply(params["dec"], z[:B], z[B : 2 * B])
        negs = self.decoder.apply(
            params["dec"],
            jnp.repeat(z[:B][:, None, :], Q, axis=1).reshape(B * Q, -1),
            z[2 * B :],
        ).reshape(B, Q)
        s, c = mrr_sum_count(
            pos, negs, neg_valid=cands != _PAD, edge_valid=batch.edge_valid
        )
        rec_state = self._push(rec_state, batch)
        return TGATCarry(params, opt_state, rec_state, rng), (s, c)
