"""TNCN fused occurrence-space train scoring — no full-table staging, no scatters.

The r5 TNCN train profile (docs/performance.md "The zoo eval tail, profiled")
shows the global-space module path's cost is a wall of whole-table work: the
per-batch ``TGNMemory.stage(arange(N))`` builds messages and runs the GRU for
all N=9,228 nodes (f32 (9228,100/172/300) copies + (9227,80) gate slices) and
the ``GraphAttentionEmbedding`` segment-softmax scatters add ~23% — yet the
decoder only ever consumes the z table as ``z[seeds]`` and ``cn @ z``
(k∈{2,4} ``score_from_rows``), and every node with nonzero ``cn`` weight is a
subgraph node (a seed or a recency neighbor of one).

This module computes the SAME pos/neg scores entirely in *occurrence space* —
the static-shape list ``occ = [seeds(S) ‖ nbr_flat(S·K)]`` — with these
identities (fp-tolerance equal to the module path; exact in real arithmetic):

* ``stage`` is row-wise, so staging the 6,600 occurrence rows (duplicates and
  all) equals gathering from the staged full table — no (N, ·) copies, and
  the scan's mem/raws carries are only ever *gathered*, never whole-sliced.
* attention aggregates at neighbor VALUES (PyG source→target flow,
  reference /root/reference/examples/linkproppred/tncn.py:95-119); its two
  consumers collapse without any per-node table:
  - ``(cn @ attn)[b] = Σ_u cn[b,u]·Σ_{r': nbr_flat[r']=u} (αv)[r']
    = Σ_{r'} cn[b, nbr_flat[r']]·(αv)[r'] = (cnO[:, S:] @ αv)[b]``
    because occurrence column ``S + r'`` IS node ``nbr_flat[r']``.
  - ``attn[seed_s] = Σ_{r'} [nbr_flat[r'] = seed_s]·(αv)[r']`` — one small
    (S, S·K) equality-mask matmul.
* the softmax denominators are per-VALUE sums, computed as a fused
  (S·K, S·K, H) equality reduce (compare-mul-add, no materialized one-hot,
  no scatter); the max-shift uses the global valid max, which softmax is
  invariant to (segment_softmax subtracts per-segment maxima — same result
  up to fp rounding, tgm_tpu/ops/segment.py:62-82).
* ``(cn @ lin_skip(staged))[b] = Σ_{u distinct} cn[b,u]·y[u]`` becomes a
  first-occurrence-masked occurrence sum ``(cnO ⊙ first) @ y_occ`` — the
  first-occurrence mask is a triangular fused equality reduce, not a sort.
* adjacency rows are built directly at occurrence COLUMNS
  (``rowsO[s, r] = A[seed_s, occ_r]``) by the same equality-mask matmuls as
  ``ncn_adjacency_rows`` (ncnpred.py:41-98) — and the query endpoints need no
  gather at all: with seeds stacked ``[src(B) ‖ dst(B) ‖ neg(B)]``, the tar
  rows of z are occurrence rows ``b``, ``B+b``, ``2B+b`` by construction.

Everything is gathers-from-state (not differentiated — no backward scatters),
dense equality-mask matmuls (backward = transposed matmuls) and fused
reduces. Backward contains no scatter of any kind.

Scope: training scores for k ∈ {2, 4}, ``cn_time_decay=False``, deterministic
attention (the bench configuration and the example defaults). Eval keeps the
table path: the equality reduces scale as (S·K)² and the eval seed count
(S=4,400) makes them larger than the staging they replace, while eval staging
(``training=False``) is a plain memory read to begin with.

Parity references: NCNPredictor scoring
(/root/reference/tgm/nn/decoder/ncnpred.py:174-303), TGN staged memory
(/root/reference/tgm/nn/encoder/tgn.py:186-216).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from tgm_tpu.nn.encoder.tgn import TGNMemory


def tncn_train_scores_occurrence(
    memory: TGNMemory,
    encoder: Any,  # GraphAttentionEmbedding (module instance, for bind)
    decoder: Any,  # NCNPredictor with k == 2, cn_time_decay=False
    params: Dict[str, Any],  # {"mem", "enc", "dec"} param pytrees
    mem_state: Any,
    seeds: jnp.ndarray,  # (S,) raw node ids: [src(B) ‖ dst(B) ‖ neg(B)]
    nbrs: jnp.ndarray,  # (S, K) raw neighbor ids (PAD-padded)
    nbr_time: jnp.ndarray,  # (S, K) edge times
    nbr_msg: jnp.ndarray,  # (S, K, msg_dim) edge features
    nbr_ok: jnp.ndarray,  # (S, K) bool — valid (seed, nbr) edge
    batch_size: int,
    mask_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (pos_scores (B,), neg_scores (B,)) for the TNCN train step."""
    if decoder.k not in (2, 4):
        raise ValueError("occurrence path supports k in {2, 4}")
    if decoder.cn_time_decay:
        raise ValueError("occurrence path supports cn_time_decay=False")

    S, K = nbrs.shape
    B = batch_size
    E = S * K
    num_nodes = memory.num_nodes
    nbr_flat = nbrs.reshape(E)
    e_valid = nbr_ok.reshape(E)

    # ---- stage the occurrence rows (row-wise; duplicates are free) ------- #
    occ_ids = jnp.concatenate([seeds, nbr_flat])  # (S + E,)
    staged_occ, last_occ = memory.apply(
        params["mem"], mem_state, occ_ids, method=TGNMemory.stage
    )  # (S+E, M), (S+E,)
    x_seed, x_nbr = staged_occ[:S], staged_occ[S:]

    enc = encoder.bind(params["enc"])
    H = enc.n_heads
    C = enc.head_dim

    # ---- edge features / projections (occurrence space) ------------------ #
    # rel_t = staged_last_update[src] - edge_time, src = the seed of the slot.
    rel_t = jnp.repeat(last_occ[:S], K) - nbr_time.reshape(E)
    edge_attr = jnp.concatenate(
        [enc.time_enc(rel_t.astype(jnp.float32)),
         nbr_msg.reshape(E, -1)], axis=-1
    )
    e = enc.lin_edge(edge_attr).reshape(E, H, C)

    # Affine-then-gather == gather-then-affine: project the S seed rows once
    # and repeat, instead of projecting the full table and gathering.
    k_e = jnp.repeat(enc.lin_key(x_seed).reshape(S, H, C), K, axis=0) + e
    v_e = jnp.repeat(enc.lin_value(x_seed).reshape(S, H, C), K, axis=0) + e
    q_e = enc.lin_query(x_nbr).reshape(E, H, C)

    logits = jnp.sum(q_e * k_e, axis=-1) * (C ** -0.5)  # (E, H)
    logits = jnp.where(e_valid[:, None], logits, -1e30)
    # Global valid max instead of per-value max: softmax is shift-invariant
    # per segment, and the global max still bounds every exp ≤ 1.
    m = jnp.max(logits, axis=0)  # (H,)
    p = jnp.exp(logits - jnp.maximum(m, -1e30)[None, :])
    p = jnp.where(e_valid[:, None], p, 0.0)

    # Per-value denominators: fused equality reduce (no one-hot materialized,
    # no scatter). denom_at_edge[r'] = Σ_{r''} [nbr_flat[r''] == nbr_flat[r']
    # (both valid)] p[r''].
    same = (
        (nbr_flat[None, :] == nbr_flat[:, None])
        & e_valid[None, :]
        & e_valid[:, None]
    )
    denom = jnp.sum(jnp.where(same[:, :, None], p[None, :, :], 0.0), axis=1)
    alpha = p / jnp.maximum(denom, 1e-16)  # (E, H)

    av = (alpha[:, :, None] * v_e).reshape(E, H * C)  # (E, D)

    # ---- z at the seed rows (tar gathers are positional) ----------------- #
    # attn[seed_s] — small equality-mask matmul. mask_dtype defaults to f32:
    # these matmuls are tiny (≤1 GFLOP/batch — ~60 µs even on the 4x-slower
    # f32 MXU path) and bf16 here costs up to 26% relative error on small
    # grad leaves at test shapes (cancellation through the softmax), vs
    # ≤4e-5 in f32 (tests/test_tncn_occurrence.py).
    m_sn = (
        (seeds[:, None] == nbr_flat[None, :]) & e_valid[None, :]
        & _valid_ids(seeds, num_nodes)[:, None]
    ).astype(mask_dtype)
    attn_seed = jnp.matmul(m_sn, av.astype(mask_dtype),
                           preferred_element_type=jnp.float32)
    z_seed = enc.lin_skip(x_seed) + attn_seed  # (S, D)

    # ---- adjacency rows at occurrence COLUMNS ---------------------------- #
    rows_o = _adjacency_rows_at_occ(seeds, nbrs, nbr_ok, occ_ids, num_nodes)

    # ---- first-occurrence mask (triangular fused reduce, no sort) -------- #
    idx = jnp.arange(S + E, dtype=jnp.int32)
    dup_before = jnp.any(
        (occ_ids[:, None] == occ_ids[None, :]) & (idx[None, :] < idx[:, None]),
        axis=1,
    )
    first = (~dup_before) & _valid_ids(occ_ids, num_nodes)  # (S+E,)

    # ---- decoder (k ∈ {2, 4}) -------------------------------------------- #
    y_occ = enc.lin_skip(staged_occ)  # (S+E, D)

    fmask = first.astype(mask_dtype)[None, :]
    y16 = y_occ.astype(mask_dtype)
    av16 = av.astype(mask_dtype)

    def cn_emb(cn):
        """Consume ANY occurrence-column cn map: distinct-node skip part +
        occurrence-sum attention part (the two z-consumer identities)."""
        cn16 = cn.astype(mask_dtype)
        skip_part = jnp.matmul(cn16 * fmask, y16,
                               preferred_element_type=jnp.float32)
        attn_part = jnp.matmul(cn16[:, S:], av16,
                               preferred_element_type=jnp.float32)
        return skip_part + attn_part

    ri = rows_o[:B]
    rj_pos, rj_neg = rows_o[B:2 * B], rows_o[2 * B:3 * B]
    if decoder.k == 2:
        embs_pos = [cn_emb(ri * rj_pos)]
        embs_neg = [cn_emb(ri * rj_neg)]
    else:  # k == 4: [cn_01, cn_10, cn_11] blocks (ncnpred.py:260-269);
        # row0 in occurrence columns is the tar node's one-hot.
        def onehot_occ(tar_nodes):  # (B, S+E)
            return (
                (occ_ids[None, :] == tar_nodes[:, None])
                & _valid_ids(tar_nodes, num_nodes)[:, None]
            ).astype(jnp.float32)

        r0_i = onehot_occ(seeds[:B])
        r0_j_pos = onehot_occ(seeds[B:2 * B])
        r0_j_neg = onehot_occ(seeds[2 * B:3 * B])
        embs_pos = [cn_emb(r0_i * rj_pos), cn_emb(ri * r0_j_pos),
                    cn_emb(ri * rj_pos)]
        embs_neg = [cn_emb(r0_i * rj_neg), cn_emb(ri * r0_j_neg),
                    cn_emb(ri * rj_neg)]

    dec = decoder.bind(params["dec"])
    zi, zj_pos, zj_neg = z_seed[:B], z_seed[B:2 * B], z_seed[2 * B:3 * B]

    def score(zj, embs):
        xs = jnp.concatenate([zi * zj] + embs, axis=-1)
        return dec.xsmlp(xs).reshape(-1)

    return score(zj_pos, embs_pos), score(zj_neg, embs_neg)


def _valid_ids(ids: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    return (ids >= 0) & (ids < num_nodes)


def _adjacency_rows_at_occ(
    seeds: jnp.ndarray,  # (S,)
    nbrs: jnp.ndarray,  # (S, K)
    nbr_ok: jnp.ndarray,  # (S, K)
    occ_ids: jnp.ndarray,  # (S + S*K,) = [seeds ‖ nbr_flat]
    num_nodes: int,
) -> jnp.ndarray:
    """``A[seed_s, occ_r]`` — ``ncn_adjacency_rows`` restricted to occurrence
    columns (same equality-mask matmul construction, ncnpred.py:41-98; exact
    small-integer counts in f32 via bf16 operands)."""
    S, K = nbrs.shape
    w = (nbr_ok & _valid_ids(seeds, num_nodes)[:, None]).astype(jnp.bfloat16)

    # part1O[s, r] = Σ_k w[s, k] · [nbr[s, k] == occ_r]
    part1 = jnp.sum(
        (nbrs[:, :, None] == occ_ids[None, None, :]) * w[:, :, None], axis=1
    )  # (S, S+E) fused compare-reduce
    s_eq = (seeds[:, None] == seeds[None, :]).astype(jnp.bfloat16)
    rows = jnp.matmul(s_eq, part1.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    # gamma[s, r'] = Σ_k w[r', k] · [nbr[r', k] == seed_s]
    gamma = jnp.sum(
        (nbrs[None, :, :] == seeds[:, None, None]) * w[None, :, :], axis=2
    )  # (S, S)
    onehot_seed_o = (seeds[:, None] == occ_ids[None, :]).astype(jnp.bfloat16)
    rows = rows + jnp.matmul(gamma.astype(jnp.bfloat16), onehot_seed_o,
                             preferred_element_type=jnp.float32)
    valid_seed = _valid_ids(seeds, num_nodes)
    valid_col = _valid_ids(occ_ids, num_nodes)
    return jnp.where(valid_seed[:, None] & valid_col[None, :], rows, 0.0)


__all__ = ["tncn_train_scores_occurrence"]
