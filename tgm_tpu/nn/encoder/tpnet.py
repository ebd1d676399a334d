"""TPNet: temporal-walk-matrix random projections + MLP-Mixer encoder.

Parity: reference ``RandomProjectionModule``/``TPNet``
(/root/reference/tgm/nn/encoder/tpnet.py:11-408): maintained decayed
random-projection matrices ``P_0..P_L`` (P_0 fixed: identity for
``use_matrix`` or N(0, 1/sqrt(dim)) otherwise), per-batch exponential time
decay + scatter-add propagation, pairwise features = inner products of the
stacked projections (optionally log-scaled), MLP; the encoder projects
[node ‖ time ‖ edge ‖ RP] neighbor features through MLP-Mixer blocks and
mean-pools. Log-scaled Δt (tpnet.py:359).

TPU-first: projection state is an explicit ``(L+1, N_pad, dim)`` array + a
``now_time`` scalar threaded through the step (the reference mutates
nn.Parameters in place); backup/reload for val/test resets
(tpnet.py:229-258) is plain pytree copy.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Set, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...constants import PADDED_NODE_ID
from ..modules.mlp_mixer import MLPMixer
from ..modules.time_encoding import Time2Vec


class RandomProjectionState(NamedTuple):
    projections: jnp.ndarray  # (L+1, N+1, dim); layer 0 is the fixed base
    now_time: jnp.ndarray  # scalar f32


def rp_init_state(
    num_nodes: int,
    num_layer: int,
    dim: int,
    beginning_time: float,
    use_matrix: bool,
    rng: jax.Array,
) -> RandomProjectionState:
    n = num_nodes + 1
    if use_matrix:
        base = jnp.eye(n, dim)
    else:
        base = jax.random.normal(rng, (n, dim)) / math.sqrt(dim)
    rest = jnp.zeros((num_layer, n, dim))
    return RandomProjectionState(
        projections=jnp.concatenate([base[None], rest], axis=0),
        now_time=jnp.asarray(beginning_time, jnp.float32),
    )


def rp_update(
    state: RandomProjectionState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    time: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    time_decay_weight: float,
) -> RandomProjectionState:
    """Decay all walk matrices to the batch's latest time, then propagate.

    Mirrors reference tpnet.py:153-194 (scatter_add propagation from layer
    i-1 into layer i, descending so each layer uses pre-update lower layers).
    """
    proj = state.projections
    L = proj.shape[0] - 1
    n = proj.shape[1] - 1
    if valid is None:
        valid = jnp.ones(src.shape[0], bool)
    t_f = time.astype(jnp.float32)
    next_time = jnp.max(jnp.where(valid, t_f, -jnp.inf))
    next_time = jnp.maximum(next_time, state.now_time)

    w = jnp.exp(-time_decay_weight * (next_time - t_f)) * valid
    decay = jnp.exp(-time_decay_weight * (next_time - state.now_time))
    scales = jnp.concatenate(
        [jnp.ones(1), decay ** jnp.arange(1, L + 1, dtype=jnp.float32)]
    )
    proj = proj * scales[:, None, None]

    s_rows = jnp.where(valid, src, n)
    d_rows = jnp.where(valid, dst, n)
    new_layers = [proj[0]]
    for i in range(L, 0, -1):
        layer = proj[i]
        layer = layer.at[s_rows].add(proj[i - 1][d_rows] * w[:, None], mode="drop")
        layer = layer.at[d_rows].add(proj[i - 1][s_rows] * w[:, None], mode="drop")
        layer = layer.at[n].set(0.0)
        new_layers.insert(1, layer)  # keep ascending order [0, 1, ..., L]
    proj = jnp.stack(new_layers, axis=0)
    return RandomProjectionState(projections=proj, now_time=next_time)


class RandomProjectionModule(nn.Module):
    """Pairwise random-projection features (learnable MLP on inner products)."""

    num_nodes: int
    num_layer: int
    time_decay_weight: float
    beginning_time: float = 0.0
    use_matrix: bool = True
    scale_random_projection: bool = True
    enforce_dim: Optional[int] = None
    num_edges: Optional[int] = None
    dim_factor: Optional[int] = None
    concat_src_dst: bool = True
    # Bug-compatibility for end-to-end parity: the reference's (N, dim)
    # matrices index padded ids (-1) at row N-1 via torch negative indexing
    # (tpnet.py:204-209), i.e. padded neighbors read a REAL node's
    # projections. Default (False) routes them to the zero dump row.
    reference_pad_bias: bool = False
    # Pairwise-feature layout. "rows" (default): einsum("bld,bmd->blm") —
    # at TPNet-eval row counts (160,000 pairs/batch) the (B, 6, 6) output's
    # tiny minor dims profile at ~34% of the eval epoch (two ~2.0 ms
    # einsums + two 0.87 ms relayout copies, r5). "lanes": the pair axis
    # rides the 128 VPU lanes — einsum("lbd,mbd->lmb") -> (36, B) -> log1p
    # in lane layout -> ONE transpose -> the same row MLP (identical
    # params). "factored_lanes" additionally computes the nbr·nbr and
    # seed·seed diagonal 3x3 blocks per NODE (one (L+1, N, d) self-einsum)
    # and gathers them, leaving only the 3x3 cross block per pair. All
    # fp-level equal (tests/test_advanced_encoders.py).
    pair_layout: str = "rows"

    @property
    def dim(self) -> int:
        if not self.use_matrix:
            if self.enforce_dim is not None:
                return self.enforce_dim
            if self.num_edges is not None and self.dim_factor is not None:
                return min(int(math.log(self.num_edges * 2)) * self.dim_factor, self.num_nodes)
            raise ValueError("need enforce_dim or (num_edges, dim_factor) when use_matrix=False")
        return self.num_nodes + 1

    @property
    def out_dim(self) -> int:
        k = (2 * self.num_layer + 2) if self.concat_src_dst else (self.num_layer + 1)
        return k * k if self.concat_src_dst else (self.num_layer + 1) ** 2

    def init_state(self, rng: jax.Array) -> RandomProjectionState:
        return rp_init_state(
            self.num_nodes, self.num_layer, self.dim, self.beginning_time,
            self.use_matrix, rng,
        )

    def update(self, state, src, dst, time, valid=None) -> RandomProjectionState:
        return rp_update(state, src, dst, time, valid, self.time_decay_weight)

    @staticmethod
    def backup_random_projections(state: RandomProjectionState) -> RandomProjectionState:
        return jax.tree_util.tree_map(lambda x: x, state)

    @staticmethod
    def reload_random_projections(state: RandomProjectionState) -> RandomProjectionState:
        return state

    @nn.compact
    def __call__(
        self, state: RandomProjectionState, src: jnp.ndarray, dst: jnp.ndarray
    ) -> jnp.ndarray:
        n = self.num_nodes
        invalid_row = n - 1 if self.reference_pad_bias else n
        rows = lambda ids: jnp.where((ids >= 0) & (ids < n), ids, invalid_row)
        if self.pair_layout != "rows" and self.concat_src_dst:
            # Lane-major pair features: keep the big pair axis minor so every
            # elementwise op in the chain has full lane utilization; one
            # (B, F²) transpose at the end feeds the unchanged row MLP.
            a = state.projections[:, rows(src)]  # (L+1, B, dim)
            b = state.projections[:, rows(dst)]
            L1 = a.shape[0]
            if self.pair_layout == "factored_lanes":
                selfb = jnp.einsum("lnd,mnd->lmn", state.projections,
                                   state.projections)  # (L+1, L+1, N+1)
                aa = selfb[:, :, rows(src)]  # (L+1, L+1, B)
                bb = selfb[:, :, rows(dst)]
                cross = jnp.einsum("lbd,mbd->lmb", a, b)
                top = jnp.concatenate([aa, cross], axis=1)
                bot = jnp.concatenate([jnp.swapaxes(cross, 0, 1), bb], axis=1)
                feat = jnp.concatenate([top, bot], axis=0)  # (2L1, 2L1, B)
            else:  # "lanes"
                rp = jnp.concatenate([a, b], axis=0)  # (2L+2, B, dim)
                feat = jnp.einsum("lbd,mbd->lmb", rp, rp)
            feat = feat.reshape(4 * L1 * L1, src.shape[0])
            if self.scale_random_projection:
                feat = jnp.log(jnp.maximum(feat, 0.0) + 1.0)
            feat = feat.T  # one (B, F²) relayout instead of per-op copies
        else:
            src_rp = state.projections[:, rows(src)]  # (L+1, B, dim)
            dst_rp = state.projections[:, rows(dst)]
            src_rp = jnp.moveaxis(src_rp, 0, 1)  # (B, L+1, dim)
            dst_rp = jnp.moveaxis(dst_rp, 0, 1)
            if self.concat_src_dst:
                rp = jnp.concatenate([src_rp, dst_rp], axis=1)  # (B, 2L+2, dim)
                feat = jnp.einsum("bld,bmd->blm", rp, rp).reshape(src.shape[0], -1)
            else:
                feat = jnp.einsum("bld,bmd->blm", src_rp, dst_rp).reshape(src.shape[0], -1)
            if self.scale_random_projection:
                feat = jnp.log(jnp.maximum(feat, 0.0) + 1.0)
        h = nn.Dense(self.out_dim * 4)(feat)
        return nn.Dense(self.out_dim)(nn.relu(h))


class TPNet(nn.Module):
    """Neighbor-sequence encoder with random-projection pairwise features."""

    node_feat_dim: int
    edge_x_dim: int
    time_feat_dim: int
    output_dim: int
    num_neighbors: int
    num_layers: int = 2
    dropout: float = 0.1
    random_projections: Optional[RandomProjectionModule] = None
    # Bug-compatibility for end-to-end parity: the reference's masked_fill
    # result is DISCARDED (tpnet.py:404), so padded rows leak projection-
    # layer bias (and pad-biased RP features) into the mixer mean. Default
    # (False) zeroes them as clearly intended.
    reference_pad_bias: bool = False

    requires: Set[str] = frozenset({"nbr_nids", "nbr_edge_time", "nbr_edge_x"})

    def setup(self) -> None:
        self.time_encoder = Time2Vec(self.time_feat_dim)
        self.proj_hidden = nn.Dense(self.output_dim * 2)
        self.proj_out = nn.Dense(self.output_dim)
        self.mlp_mixers = [
            MLPMixer(
                num_tokens=self.num_neighbors,
                num_channels=self.output_dim,
                token_dim_expansion_factor=0.5,
                channel_dim_expansion_factor=4.0,
                dropout=self.dropout,
            )
            for _ in range(self.num_layers)
        ]

    def __call__(
        self,
        node_x: jnp.ndarray,
        edge_src: jnp.ndarray,
        edge_dst: jnp.ndarray,
        edge_time: jnp.ndarray,
        neighbours: jnp.ndarray,  # (2B, K)
        neighbours_time: jnp.ndarray,
        neighbours_edge_feat: jnp.ndarray,
        rp_state: Optional[RandomProjectionState] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = edge_src.shape[0]
        K = self.num_neighbors
        pad = (neighbours == PADDED_NODE_ID)[..., None]

        nbr_feat = jnp.where(pad, 0.0, node_x[jnp.maximum(neighbours, 0)])
        seed_t = jnp.concatenate([edge_time, edge_time])  # (2B,)
        dt = jnp.log((seed_t[:, None] - neighbours_time).astype(jnp.float32) + 1.0)
        t_feat = jnp.where(pad, 0.0, self.time_encoder(dt))

        parts = [nbr_feat, t_feat, neighbours_edge_feat]
        if self.random_projections is not None:
            assert rp_state is not None, "rp_state required when random_projections set"
            # Reference wiring (tpnet.py:365-384): every neighbor (on either
            # side) is paired with BOTH endpoints of its edge —
            # [rp(nbr, src_seed) ‖ rp(nbr, dst_seed)].
            nbr_flat = neighbours.reshape(-1)  # (2B*K,)
            src2 = jnp.repeat(jnp.concatenate([edge_src, edge_src]), K)
            dst2 = jnp.repeat(jnp.concatenate([edge_dst, edge_dst]), K)
            f_src = self.random_projections(rp_state, nbr_flat, src2)
            f_dst = self.random_projections(rp_state, nbr_flat, dst2)
            rp_feat = jnp.concatenate([f_src, f_dst], axis=1).reshape(2 * B, K, -1)
            parts.append(rp_feat)

        h = jnp.concatenate(parts, axis=2)
        h = self.proj_out(nn.relu(self.proj_hidden(h)))
        # Documented divergence: the reference's masked_fill (tpnet.py:404) is
        # non-in-place with its result discarded, so padded rows leak biased
        # embeddings into the mean there; we zero them as clearly intended
        # (reference_pad_bias=True reproduces the reference for parity runs).
        if not self.reference_pad_bias:
            h = jnp.where(pad, 0.0, h)
        for mixer in self.mlp_mixers:
            h = mixer(h, deterministic=deterministic)
        emb = jnp.mean(h, axis=1)
        return emb[:B], emb[B:]
