import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgm_tpu.constants import PADDED_NODE_ID
from tgm_tpu.nn import CTAN, DyGFormer, NCNPredictor, RandomProjectionModule, TPNet
from tgm_tpu.nn.encoder.ctan import ctan_memory_init, ctan_memory_update
from tgm_tpu.nn.encoder.tpnet import rp_init_state, rp_update

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------------ #
# DyGFormer
# ------------------------------------------------------------------ #
def _dyg_inputs(B=3, K=7, node_dim=5, edge_dim=4, num_nodes=12):
    rng = np.random.default_rng(0)
    node_x = jnp.asarray(rng.normal(size=(num_nodes, node_dim)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, num_nodes, B), jnp.int32)
    dst = jnp.asarray(rng.integers(0, num_nodes, B), jnp.int32)
    t = jnp.asarray(np.sort(rng.integers(50, 100, B)), jnp.int32)
    nbrs = rng.integers(0, num_nodes, (2 * B, K))
    nbrs[rng.random((2 * B, K)) < 0.3] = PADDED_NODE_ID
    nbrs = jnp.asarray(nbrs, jnp.int32)
    nt = jnp.asarray(rng.integers(0, 50, (2 * B, K)), jnp.int32)
    nx = jnp.asarray(rng.normal(size=(2 * B, K, edge_dim)).astype(np.float32))
    return node_x, src, dst, t, nbrs, nt, nx


def test_dygformer_forward():
    m = DyGFormer(
        node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, channel_embedding_dim=16,
        output_dim=20, patch_size=2, num_layers=2, max_input_sequence_length=8,
        dropout=0.0,
    )
    args = _dyg_inputs()
    params = m.init(KEY, *args)
    zs, zd = m.apply(params, *args)
    assert zs.shape == (3, 20) and zd.shape == (3, 20)
    assert np.isfinite(np.asarray(zs)).all()


def test_dygformer_cooccurrence_counts():
    from tgm_tpu.nn.encoder.dygformer import NeighborCooccurrenceEncoder

    enc = NeighborCooccurrenceEncoder(feat_dim=4)
    src_nbrs = jnp.array([[1, 2, 2, PADDED_NODE_ID]])
    dst_nbrs = jnp.array([[2, 3, PADDED_NODE_ID, PADDED_NODE_ID]])
    params = enc.init(KEY, src_nbrs, dst_nbrs)
    # internal count check: neighbor 2 appears twice in src list, once in dst
    cross = np.asarray(src_nbrs[:, None, :] == dst_nbrs[:, :, None])
    assert cross.sum(1)[0, 1] == 1  # src's "2" occurs once in dst list
    out_s, out_d = enc.apply(params, src_nbrs, dst_nbrs)
    assert out_s.shape == (1, 4, 4)[0:1] + (4, 4)  # (B, L, feat)


def test_dygformer_seq_trim_and_pad():
    # K+1 > max_len -> trim; K+1 < max_len -> pad
    m = DyGFormer(
        node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, channel_embedding_dim=8,
        output_dim=10, patch_size=1, num_layers=1, max_input_sequence_length=4,
        dropout=0.0,
    )
    args = _dyg_inputs(K=7)
    params = m.init(KEY, *args)
    zs, _ = m.apply(params, *args)
    assert zs.shape == (3, 10)


def test_dygformer_encode_pairs_matches_two_calls():
    """encode_pairs == the two separate (src,dst)/(src,neg) __call__s."""
    m = DyGFormer(
        node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, channel_embedding_dim=16,
        output_dim=20, patch_size=2, num_layers=2, max_input_sequence_length=8,
        dropout=0.0,
    )
    B, K = 3, 7
    node_x, src, dst, t, nbrs2, nt2, nx2 = _dyg_inputs(B=B, K=K)
    rng = np.random.default_rng(7)
    neg = jnp.asarray(rng.integers(0, node_x.shape[0], B), jnp.int32)
    nbrs_n = rng.integers(0, node_x.shape[0], (B, K))
    nbrs_n[rng.random((B, K)) < 0.3] = PADDED_NODE_ID
    nbrs3 = jnp.concatenate([nbrs2, jnp.asarray(nbrs_n, jnp.int32)])
    nt3 = jnp.concatenate([nt2, jnp.asarray(rng.integers(0, 50, (B, K)), jnp.int32)])
    nx3 = jnp.concatenate(
        [nx2, jnp.asarray(rng.normal(size=(B, K, 4)).astype(np.float32))]
    )

    params = m.init(KEY, node_x, src, dst, t, nbrs2, nt2, nx2)
    zs, zd = m.apply(params, node_x, src, dst, t, nbrs3[: 2 * B], nt3[: 2 * B],
                     nx3[: 2 * B])
    zs2, zn = m.apply(
        params, node_x, src, neg, t,
        jnp.concatenate([nbrs3[:B], nbrs3[2 * B :]]),
        jnp.concatenate([nt3[:B], nt3[2 * B :]]),
        jnp.concatenate([nx3[:B], nx3[2 * B :]]),
    )
    fs, fd, fs2, fn = m.apply(
        params, node_x, src, dst, neg, t, nbrs3, nt3, nx3,
        method=DyGFormer.encode_pairs,
    )
    np.testing.assert_allclose(np.asarray(fs), np.asarray(zs), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(zd), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs2), np.asarray(zs2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fn), np.asarray(zn), rtol=2e-5, atol=2e-5)


def test_dygformer_bf16_stream_close_to_f32():
    """bf16 residual stream stays within bf16 rounding of the f32 stream."""
    kw = dict(
        node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, channel_embedding_dim=16,
        output_dim=20, patch_size=2, num_layers=2, max_input_sequence_length=8,
        dropout=0.0, compute_bf16=True,
    )
    m = DyGFormer(**kw)
    mb = DyGFormer(**kw, bf16_stream=True)
    args = _dyg_inputs()
    params = m.init(KEY, *args)
    zs, _ = m.apply(params, *args)
    pb = mb.init(KEY, *args)
    # LN param values are identical inits (ones/zeros); trees differ by name.
    bzs, _ = mb.apply(pb, *args)
    np.testing.assert_allclose(np.asarray(bzs), np.asarray(zs), rtol=0.08,
                               atol=0.08)
    assert np.isfinite(np.asarray(bzs)).all()


def test_dygformer_fused_attention_matches_flax_mha():
    """fused_attn with converted params == the flax-MHA transformer."""
    from tgm_tpu.nn.encoder.dygformer import fuse_attention_params

    kw = dict(
        node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, channel_embedding_dim=16,
        output_dim=20, patch_size=2, num_layers=2, max_input_sequence_length=8,
        dropout=0.0,
    )
    m = DyGFormer(**kw)
    mf = DyGFormer(**kw, fused_attn=True)
    args = _dyg_inputs()
    params = m.init(KEY, *args)
    zs, zd = m.apply(params, *args)

    fused = jax.tree_util.tree_map(lambda x: x, params)  # deep-ish copy
    import flax

    p = flax.core.unfreeze(fused)["params"]
    for tr_name in [k for k in p if k.startswith("transformers_")]:
        tr = p[tr_name]
        mha_name = [k for k in tr if "MultiHeadDotProductAttention" in k][0]
        tr["FusedSelfAttention_0"] = fuse_attention_params(tr.pop(mha_name))
    fused = {"params": p}

    fzs, fzd = mf.apply(fused, *args)
    np.testing.assert_allclose(np.asarray(fzs), np.asarray(zs), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fzd), np.asarray(zd), rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------------ #
# TPNet random projections
# ------------------------------------------------------------------ #
def test_rp_update_decay_and_propagation():
    state = rp_init_state(num_nodes=4, num_layer=2, dim=5, beginning_time=0.0,
                          use_matrix=True, rng=KEY)
    assert state.projections.shape == (3, 5, 5)
    src = jnp.array([0]); dst = jnp.array([1]); t = jnp.array([10])
    s2 = rp_update(state, src, dst, t, None, time_decay_weight=0.01)
    assert float(s2.now_time) == 10.0
    # layer1 row0 gets P0[dst]=e1 (weight exp(0)=1)
    np.testing.assert_allclose(np.asarray(s2.projections[1, 0]), np.eye(5)[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.projections[1, 1]), np.eye(5)[0], atol=1e-6)
    # base layer unchanged
    np.testing.assert_allclose(np.asarray(s2.projections[0]), np.asarray(state.projections[0]))


def test_rp_update_respects_valid_mask():
    state = rp_init_state(4, 1, 5, 0.0, True, KEY)
    src = jnp.array([0, 2]); dst = jnp.array([1, 3]); t = jnp.array([5, 5])
    s2 = rp_update(state, src, dst, t, jnp.array([True, False]), 0.0)
    assert np.allclose(np.asarray(s2.projections[1, 2]), 0.0)
    assert not np.allclose(np.asarray(s2.projections[1, 0]), 0.0)


def test_rp_module_pairwise_features():
    rp = RandomProjectionModule(num_nodes=6, num_layer=1, time_decay_weight=0.01)
    state = rp.init_state(KEY)
    params = rp.init(KEY, state, jnp.array([0, 1]), jnp.array([1, 2]))
    out = rp.apply(params, state, jnp.array([0, 1]), jnp.array([1, 2]))
    assert out.shape == (2, rp.out_dim)


@pytest.mark.parametrize("layout", ["lanes", "factored_lanes"])
def test_rp_pair_layout_matches_rows(layout):
    """pair_layout 'lanes'/'factored_lanes' == the default 'rows' features
    at fp level (same params; only the einsum/layout order differs).
    Covers PAD ids and a non-trivially updated state."""
    kw = dict(num_nodes=9, num_layer=2, time_decay_weight=0.01,
              use_matrix=False, enforce_dim=8)
    base = RandomProjectionModule(**kw)
    state = base.init_state(KEY)
    # Advance the state so projections are not the init pattern.
    state = rp_update(state, jnp.array([0, 3, 5]), jnp.array([1, 4, 8]),
                      jnp.array([2, 5, 9]), None, 0.01)
    src = jnp.array([0, 3, -1, 8], jnp.int32)
    dst = jnp.array([1, -1, 2, 5], jnp.int32)
    params = base.init(KEY, state, src, dst)
    ref = base.apply(params, state, src, dst)
    var = RandomProjectionModule(**kw, pair_layout=layout)
    got = var.apply(params, state, src, dst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tpnet_forward():
    rp = RandomProjectionModule(num_nodes=12, num_layer=1, time_decay_weight=0.01)
    rp_state = rp.init_state(KEY)
    m = TPNet(node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, output_dim=16,
              num_neighbors=7, num_layers=1, dropout=0.0, random_projections=rp)
    node_x, src, dst, t, nbrs, nt, nx = _dyg_inputs()
    params = m.init(KEY, node_x, src, dst, t, nbrs, nt, nx, rp_state)
    zs, zd = m.apply(params, node_x, src, dst, t, nbrs, nt, nx, rp_state)
    assert zs.shape == (3, 16) and zd.shape == (3, 16)
    assert np.isfinite(np.asarray(zs)).all()


def test_tpnet_without_rp():
    m = TPNet(node_feat_dim=5, edge_x_dim=4, time_feat_dim=8, output_dim=16,
              num_neighbors=7, num_layers=1, dropout=0.0)
    node_x, src, dst, t, nbrs, nt, nx = _dyg_inputs()
    params = m.init(KEY, node_x, src, dst, t, nbrs, nt, nx)
    zs, _ = m.apply(params, node_x, src, dst, t, nbrs, nt, nx)
    assert zs.shape == (3, 16)


# ------------------------------------------------------------------ #
# CTAN
# ------------------------------------------------------------------ #
def test_ctan_forward_and_memory():
    U, E, D = 6, 10, 8
    m = CTAN(edge_dim=4, memory_dim=D, time_dim=6, node_dim=3, num_iters=2)
    x = jax.random.normal(KEY, (U, D + 3))
    args = (
        x, jnp.zeros(U, jnp.int32),
        jnp.arange(E, dtype=jnp.int32) % U, (jnp.arange(E, dtype=jnp.int32) + 1) % U,
        jnp.zeros(E, jnp.int32), jnp.ones((E, 4)), jnp.ones(E, bool),
    )
    params = m.init(KEY, *args)
    z = m.apply(params, *args)
    assert z.shape == (U, D)
    assert np.abs(np.asarray(z)).max() <= 1.0  # tanh output

    state = ctan_memory_init(num_nodes=6, memory_dim=D)
    src = jnp.array([0, 0]); dst = jnp.array([1, 2]); t = jnp.array([3, 7])
    s_emb = jnp.ones((2, D)); d_emb = 2 * jnp.ones((2, D))
    state = ctan_memory_update(state, src, dst, t, s_emb, d_emb)
    assert int(state.last_update[0]) == 7
    np.testing.assert_allclose(np.asarray(state.memory[2]), 2.0)  # dst of t=7 event


def test_ctan_global_space_matches_dedup():
    """CTAN over the global-node-id space (bench_zoo --ctan-space global)
    is BIT-identical per node to the dedup local space: node rows, segment
    groups, and per-row Dense projections are all id-space-independent."""
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.data.loader import DGDataLoader
    from tgm_tpu.hooks import (
        DeduplicationHook,
        HookManager,
        RandomNegativeEdgeSamplerHook,
        RecencyNeighborHook,
        map_to_local,
    )

    rng = np.random.default_rng(3)
    E, N, D, ED = 240, 40, 8, 4
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 1000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        edge_x=rng.normal(size=(E, ED)).astype(np.float32),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=N))
    hm.register_shared(
        RecencyNeighborHook(N, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"],
                            edge_dim=ED, edge_x_full=data.edge_x)
    )
    hm.register_shared(DeduplicationHook(N, seed_nodes_keys=["neg", "nbr_nids"]))
    loader = DGDataLoader(dg, 60, hook_manager=hm)
    with hm.activate("train"):
        batches = list(loader)
    batch = batches[2]
    node_x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(N + 1, D)).astype(np.float32))
    last = jnp.asarray(rng.integers(0, 100, N + 1), jnp.int32)
    m = CTAN(edge_dim=ED, memory_dim=D, time_dim=6, node_dim=3, num_iters=1,
             mean_delta_t=1.0, std_delta_t=1.0)

    seeds = batch.seed_nids[0]
    nbrs = batch.nbr_nids[0]
    Kn = nbrs.shape[1]
    src_rep = jnp.repeat(seeds, Kn)
    nbr_flat = nbrs.reshape(-1)
    e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
    e_t = batch.nbr_edge_time[0].reshape(-1)
    e_x = batch.nbr_edge_x[0].reshape(nbr_flat.shape[0], -1)

    g2l = batch.global_to_local
    uids = batch.unique_nids
    rows = jnp.where(uids >= 0, uids, N)
    x_local = jnp.concatenate(
        [mem[rows], node_x[jnp.maximum(uids, 0)] * (uids >= 0)[:, None]], 1)
    x_global = jnp.concatenate([mem[:N], node_x], 1)
    params = m.init(KEY, x_global, last[:N], src_rep, nbr_flat, e_t, e_x,
                    e_valid)
    z_local = m.apply(params, x_local, last[rows],
                      map_to_local(g2l, src_rep), map_to_local(g2l, nbr_flat),
                      e_t, e_x, e_valid)
    z_global = m.apply(params, x_global, last[:N], src_rep, nbr_flat,
                       e_t, e_x, e_valid)
    uq = np.asarray(uids)
    sel = (uq >= 0) & (uq < N)
    np.testing.assert_array_equal(np.asarray(z_local)[sel],
                                  np.asarray(z_global)[uq[sel]])


# ------------------------------------------------------------------ #
# NCN predictor
# ------------------------------------------------------------------ #
def _ncn_setup(k):
    U, E, D, B = 8, 12, 6, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    es = jnp.asarray(rng.integers(0, U, E), jnp.int32)
    ed = jnp.asarray(rng.integers(0, U, E), jnp.int32)
    ti = jnp.asarray(rng.integers(0, U, B), jnp.int32)
    tj = jnp.asarray(rng.integers(0, U, B), jnp.int32)
    m = NCNPredictor(in_channels=D, hidden_dim=16, out_channels=1, k=k)
    params = m.init(KEY, x, es, ed, ti, tj)
    return m, params, (x, es, ed, ti, tj)


@pytest.mark.parametrize("k", [2, 4, 8])
def test_ncn_predictor(k):
    m, params, args = _ncn_setup(k)
    out = m.apply(params, *args)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()


def test_ncn_common_neighbor_signal():
    # Graph: 0-2, 1-2 => querying (0,1) has common neighbor 2; (0,3) has none.
    D = 3
    x = jnp.eye(4, D)
    es = jnp.array([0, 1], jnp.int32)
    ed = jnp.array([2, 2], jnp.int32)
    m = NCNPredictor(in_channels=D, hidden_dim=8, out_channels=1, k=2)
    params = m.init(KEY, x, es, ed, jnp.array([0]), jnp.array([1]))
    from tgm_tpu.nn.decoder.ncnpred import _dense_adj

    A = _dense_adj(es, ed, 4, None)
    cn = np.asarray(A[0] * A[1])
    assert cn[2] == 1.0 and cn.sum() == 1.0


def _ncn_subgraph_setup(S=9, K=4, U=14, D=5, seed=3):
    """Structured (seed, nbr) subgraph like the TNCN hook path feeds."""
    rng = np.random.default_rng(seed)
    seeds = rng.integers(0, U, S).astype(np.int32)
    nbrs = rng.integers(0, U, (S, K)).astype(np.int32)
    valid = rng.random((S, K)) < 0.8
    x = rng.normal(size=(U, D)).astype(np.float32)
    # Edge list form (what _dense_adj consumes).
    es = np.repeat(seeds, K)
    ed = nbrs.reshape(-1)
    ev = valid.reshape(-1)
    return (jnp.asarray(seeds), jnp.asarray(nbrs), jnp.asarray(valid),
            jnp.asarray(x), jnp.asarray(es), jnp.asarray(ed), jnp.asarray(ev))


def test_ncn_rows_match_dense_adj():
    """ncn_adjacency_rows == slicing the scatter-built dense adjacency,
    bit-exact (all intermediates are exact small-int counts in f32)."""
    from tgm_tpu.nn.decoder.ncnpred import _dense_adj, ncn_adjacency_rows

    seeds, nbrs, valid, x, es, ed, ev = _ncn_subgraph_setup()
    U = x.shape[0]
    A = _dense_adj(es, ed, U, ev)
    rows = ncn_adjacency_rows(seeds, nbrs, valid, U)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(A[seeds]))


def test_ncn_rows_duplicate_seed_consolidation():
    """A node seeded in two rows gets BOTH rows' edges in each of its rows."""
    from tgm_tpu.nn.decoder.ncnpred import _dense_adj, ncn_adjacency_rows

    seeds = jnp.array([5, 5, 2], jnp.int32)  # node 5 seeded twice
    nbrs = jnp.array([[1, 2], [3, 1], [5, 0]], jnp.int32)
    valid = jnp.ones((3, 2), bool)
    U = 6
    es = jnp.repeat(seeds, 2)
    ed = nbrs.reshape(-1)
    A = _dense_adj(es, ed, U, None)
    rows = ncn_adjacency_rows(seeds, nbrs, valid, U)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(A[seeds]))
    # both duplicate rows carry the union: nbrs {1, 2, 3} + nbr-side edge 2->5
    assert np.asarray(rows)[0, 1] == 2.0  # node 1 twice (rows 0 and 1)
    assert np.asarray(rows)[0, 2] == 2.0  # node 2 via row 0 + seed-2's nbr 5


def test_ncn_rows_blocked_matches_plain():
    """ncn_adjacency_rows_blocked == ncn_adjacency_rows bit-exactly when the
    [unique_from:] suffix is pairwise-unique — the eval seed layout
    [src(B) ‖ dst(B) ‖ unique candidates], incl. head/tail cross duplicates
    and PAD rows in both blocks."""
    from tgm_tpu.nn.decoder.ncnpred import (
        ncn_adjacency_rows,
        ncn_adjacency_rows_blocked,
    )

    rng = np.random.default_rng(7)
    U, K, B = 20, 3, 4
    # Head: src+dst with duplicates (incl. one PAD). Tail: unique candidate
    # set, overlapping the head, PAD-padded.
    head = np.array([5, 9, 5, -1, 9, 2, 11, 3], np.int32)  # 2B rows
    tail = np.array([1, 2, 5, 7, 12, 15, -1, -1], np.int32)  # unique + PADs
    seeds = jnp.asarray(np.concatenate([head, tail]))
    S = seeds.shape[0]
    nbrs = jnp.asarray(rng.integers(0, U, (S, K)).astype(np.int32))
    valid = jnp.asarray(rng.random((S, K)) < 0.8)
    ref = ncn_adjacency_rows(seeds, nbrs, valid, U)
    got = ncn_adjacency_rows_blocked(seeds, nbrs, valid, U,
                                     unique_from=len(head))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("k", [2, 4])
def test_ncn_score_from_rows_matches_call(k):
    """score_from_rows(precomputed rows) == __call__(dense adjacency)."""
    from tgm_tpu.nn.decoder.ncnpred import ncn_adjacency_rows

    seeds, nbrs, valid, x, es, ed, ev = _ncn_subgraph_setup()
    U, D = x.shape
    S = seeds.shape[0]
    B = 3
    m = NCNPredictor(in_channels=D, hidden_dim=16, out_channels=1, k=k)
    # queries: seed rows 0..B-1 vs rows B..2B-1 (their local node ids)
    ti, tj = seeds[:B], seeds[B : 2 * B]
    params = m.init(KEY, x, es, ed, ti, tj)
    ref = m.apply(params, x, es, ed, ti, tj, edge_valid=ev)
    rows = ncn_adjacency_rows(seeds, nbrs, valid, U)
    fast = m.apply(
        params, x, rows[:B], rows[B : 2 * B], ti, tj,
        method=NCNPredictor.score_from_rows,
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_ncn_rows_wiring_on_hook_batch():
    """On a REAL hook-produced batch (recency + dedup + random negatives),
    the seed-row wiring (queries = seed rows [0:B], [B:2B], [2B:3B]) scores
    exactly like the dense-adjacency path with g2l-local queries."""
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.data.loader import DGDataLoader
    from tgm_tpu.hooks import (
        DeduplicationHook,
        HookManager,
        RandomNegativeEdgeSamplerHook,
        RecencyNeighborHook,
        map_to_local,
    )
    from tgm_tpu.nn.decoder.ncnpred import ncn_adjacency_rows

    rng = np.random.default_rng(0)
    E, N, D = 240, 40, 6
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 1000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=N))
    hm.register_shared(
        RecencyNeighborHook(N, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"])
    )
    hm.register_shared(DeduplicationHook(N, seed_nodes_keys=["neg", "nbr_nids"]))
    loader = DGDataLoader(dg, 60, hook_manager=hm)
    with hm.activate("train"):
        batches = list(loader)
    batch = batches[2]  # warm buffers
    B = batch.edge_src.shape[0]
    g2l = batch.global_to_local

    z = jnp.asarray(rng.normal(size=(batch.unique_nids.shape[0], D))
                    .astype(np.float32))
    m = NCNPredictor(in_channels=D, hidden_dim=8, out_channels=1, k=2)

    seeds = batch.seed_nids[0]
    nbrs = batch.nbr_nids[0]
    Kn = nbrs.shape[1]
    src_rep = jnp.repeat(seeds, Kn)
    nbr_flat = nbrs.reshape(-1)
    e_valid = (nbr_flat != PADDED_NODE_ID) & (src_rep != PADDED_NODE_ID)
    e_src = map_to_local(g2l, src_rep)
    e_dst = map_to_local(g2l, nbr_flat)
    ti = map_to_local(g2l, batch.edge_src)
    tj = map_to_local(g2l, batch.neg)
    params = m.init(KEY, z, e_src, e_dst, ti, tj)
    ref = m.apply(params, z, e_src, e_dst, ti, tj, edge_valid=e_valid)

    seeds_l = map_to_local(g2l, seeds)
    nbrs_l = map_to_local(g2l, nbrs)
    nbr_ok = (nbrs != PADDED_NODE_ID) & (seeds[:, None] != PADDED_NODE_ID)
    rows = ncn_adjacency_rows(seeds_l, nbrs_l, nbr_ok, z.shape[0])
    fast = m.apply(params, z, rows[:B], rows[2 * B :], ti, tj,
                   method=NCNPredictor.score_from_rows)
    ev = np.asarray(batch.edge_valid)
    np.testing.assert_array_equal(np.asarray(fast)[ev], np.asarray(ref)[ev])


def test_tncn_global_space_matches_dedup():
    """Global-node-id local space (bench_zoo --tncn-space global) scores
    equal to the DeduplicationHook local space up to f32 summation order:
    the adjacency-row mass lands on the same nodes, cn @ x sums the same
    nonzero terms, and interleaved zero columns change only association."""
    from tgm_tpu.core.graph import DGraph
    from tgm_tpu.data.dg_data import DGData
    from tgm_tpu.data.loader import DGDataLoader
    from tgm_tpu.hooks import (
        DeduplicationHook,
        HookManager,
        RandomNegativeEdgeSamplerHook,
        RecencyNeighborHook,
        map_to_local,
    )
    from tgm_tpu.nn.decoder.ncnpred import ncn_adjacency_rows

    rng = np.random.default_rng(1)
    E, N, D = 240, 40, 6
    data = DGData.from_raw(
        edge_time=np.sort(rng.integers(0, 1000, E)),
        edge_index=rng.integers(0, N, (E, 2)),
        time_delta="s",
    )
    dg = DGraph(data)
    hm = HookManager(keys=["train"])
    hm.register("train", RandomNegativeEdgeSamplerHook(low=0, high=N))
    hm.register_shared(
        RecencyNeighborHook(N, [4], ["edge_src", "edge_dst", "neg"],
                            ["edge_time", "edge_time", "neg_time"])
    )
    hm.register_shared(DeduplicationHook(N, seed_nodes_keys=["neg", "nbr_nids"]))
    loader = DGDataLoader(dg, 60, hook_manager=hm)
    with hm.activate("train"):
        batches = list(loader)
    m = NCNPredictor(in_channels=D, hidden_dim=8, out_channels=1, k=2)
    x_global = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    params = None
    for batch in batches[2:5]:  # warm buffers
        B = batch.edge_src.shape[0]
        g2l = batch.global_to_local
        uniq = np.asarray(batch.unique_nids)
        x_local = jnp.where(
            ((batch.unique_nids >= 0) & (batch.unique_nids < N))[:, None],
            x_global[jnp.clip(batch.unique_nids, 0, N - 1)], 0.0)
        seeds = batch.seed_nids[0]
        nbrs = batch.nbr_nids[0]
        nbr_ok = (nbrs != PADDED_NODE_ID) & (seeds[:, None] != PADDED_NODE_ID)

        def score(x, loc, num_local):
            rows = ncn_adjacency_rows(loc(seeds), loc(nbrs), nbr_ok, num_local)
            nonlocal params
            if params is None:
                e4 = jnp.zeros(4, jnp.int32)
                params = m.init(KEY, x, e4, e4,
                                loc(batch.edge_src), loc(batch.neg))
            return m.apply(params, x, rows[:B], rows[2 * B:],
                           loc(batch.edge_src), loc(batch.neg),
                           method=NCNPredictor.score_from_rows)

        s_dedup = score(x_local, lambda ids: map_to_local(g2l, ids),
                        int(batch.unique_nids.shape[0]))
        s_global = score(x_global, lambda ids: ids, N)
        ev = np.asarray(batch.edge_valid)
        np.testing.assert_allclose(np.asarray(s_global)[ev],
                                   np.asarray(s_dedup)[ev],
                                   rtol=1e-5, atol=1e-5)


def test_ncn_invalid_k():
    with pytest.raises(ValueError):
        m = NCNPredictor(in_channels=4, hidden_dim=8, out_channels=1, k=3)
        m.init(KEY, jnp.ones((4, 4)), jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
               jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
