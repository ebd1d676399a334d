"""Reference-parity tests for the second half of the model zoo.

DyGFormer, TPNet, TNCN and CTAN contain the subtlest reimplementation details
(patching, co-occurrence counts, random-projection decay, walk corrections,
antisymmetric propagation). Each test instantiates the torch reference module
(/root/reference/tgm/nn/...), copies its weights into our flax module via
tools/refbridge, and asserts allclose on the outputs for random padded inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    from tools.refbridge import import_reference

    return import_reference()


def test_dygformer_forward_parity(ref):
    import jax.numpy as jnp

    from tgm.nn.encoder.dygformer import DyGFormer as RefDyG

    from tools.refbridge import dygformer_params
    from tgm_tpu.nn.encoder.dygformer import DyGFormer

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, B, K = 30, 6, 7
    NF, EF, TF, CH, OUT = 5, 4, 8, 12, 10
    L = K + 1  # seed prepended; max_input_sequence_length must match
    H = 2

    ref_m = RefDyG(
        node_feat_dim=NF, edge_x_dim=EF, time_feat_dim=TF,
        channel_embedding_dim=CH, output_dim=OUT, patch_size=2,
        num_layers=2, num_heads=H, dropout=0.0,
        max_input_sequence_length=L, device="cpu",
    ).eval()

    node_x = rng.normal(size=(N, NF)).astype(np.float32)
    src = rng.integers(0, N, B)
    dst = rng.integers(0, N, B)
    t = rng.integers(50, 100, B).astype(np.int64)
    nbrs = rng.integers(0, N, (2 * B, K)).astype(np.int64)
    # Random right-side padding (recency layout: PADs on the left in ours,
    # but the reference takes the array as given — keep identical layouts).
    pad_mask = rng.random((2 * B, K)) < 0.3
    nbrs[pad_mask] = -1
    nt = rng.integers(0, 50, (2 * B, K)).astype(np.int64)
    nt[pad_mask] = 0
    nx = rng.normal(size=(2 * B, K, EF)).astype(np.float32)
    nx[pad_mask] = 0.0

    with torch.no_grad():
        z_src_ref, z_dst_ref = ref_m(
            torch.from_numpy(node_x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
            torch.from_numpy(t),
            torch.from_numpy(nbrs),
            torch.from_numpy(nt),
            torch.from_numpy(nx),
        )

    ours = DyGFormer(
        node_feat_dim=NF, edge_x_dim=EF, time_feat_dim=TF,
        channel_embedding_dim=CH, output_dim=OUT, patch_size=2,
        num_layers=2, num_heads=H, dropout=0.0, max_input_sequence_length=L,
    )
    params = dygformer_params(ref_m, num_heads=H)
    z_src, z_dst = ours.apply(
        params,
        jnp.asarray(node_x),
        jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(nbrs.astype(np.int32)),
        jnp.asarray(nt.astype(np.int32)),
        jnp.asarray(nx),
    )
    np.testing.assert_allclose(np.asarray(z_src), z_src_ref.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_dst), z_dst_ref.numpy(), rtol=2e-4, atol=1e-5)


def test_tpnet_forward_parity(ref):
    """Stream updates through both RandomProjectionModules, then compare the
    full TPNet forward (valid neighbors only: the reference's pad handling is
    a documented artifact — masked_fill discarded + negative-index gathers)."""
    import jax
    import jax.numpy as jnp

    from tgm.nn.encoder.tpnet import (
        RandomProjectionModule as RefRP,
        TPNet as RefTPNet,
    )

    from tools.refbridge import tpnet_params
    from tgm_tpu.nn.encoder.tpnet import RandomProjectionModule, TPNet

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, B, K, L = 20, 4, 3, 2
    NF, EF, TF, OUT = 5, 4, 6, 8
    decay = 3e-3

    ref_rp = RefRP(num_nodes=N, num_layer=L, time_decay_weight=decay,
                   beginning_time=0.0, use_matrix=True, device="cpu")
    ref_m = RefTPNet(
        node_feat_dim=NF, edge_x_dim=EF, time_feat_dim=TF, output_dim=OUT,
        num_neighbors=K, num_layers=2, dropout=0.0,
        random_projections=ref_rp, device="cpu",
    ).eval()

    our_rp = RandomProjectionModule(
        num_nodes=N, num_layer=L, time_decay_weight=decay,
        beginning_time=0.0, use_matrix=True,
    )
    ours = TPNet(
        node_feat_dim=NF, edge_x_dim=EF, time_feat_dim=TF, output_dim=OUT,
        num_neighbors=K, num_layers=2, dropout=0.0, random_projections=our_rp,
    )
    params = tpnet_params(ref_m)
    rp_state = our_rp.init_state(jax.random.PRNGKey(0))

    # Stream a few update batches through both projection modules.
    t_cur = 1
    for _ in range(3):
        s = rng.integers(0, N, 6).astype(np.int64)
        d = rng.integers(0, N, 6).astype(np.int64)
        t = np.sort(rng.integers(t_cur, t_cur + 40, 6)).astype(np.int64)
        t_cur = int(t.max()) + 1
        ref_rp.update(torch.from_numpy(s), torch.from_numpy(d), torch.from_numpy(t))
        rp_state = our_rp.update(
            rp_state, jnp.asarray(s, jnp.int32), jnp.asarray(d, jnp.int32),
            jnp.asarray(t, jnp.int32),
        )

    for i in range(L + 1):
        np.testing.assert_allclose(
            np.asarray(rp_state.projections[i][:N, :N]),
            ref_rp.random_projections[i].detach().numpy(),
            atol=1e-5, err_msg=f"projection layer {i}",
        )

    node_x = rng.normal(size=(N, NF)).astype(np.float32)
    src = rng.integers(0, N, B)
    dst = rng.integers(0, N, B)
    t = rng.integers(t_cur, t_cur + 10, B).astype(np.int64)
    nbrs = rng.integers(0, N, (2 * B, K)).astype(np.int64)  # fully valid
    nt = rng.integers(0, t_cur, (2 * B, K)).astype(np.int64)
    nx = rng.normal(size=(2 * B, K, EF)).astype(np.float32)

    with torch.no_grad():
        z_src_ref, z_dst_ref = ref_m(
            torch.from_numpy(node_x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
            torch.from_numpy(t),
            torch.from_numpy(nbrs),
            torch.from_numpy(nt),
            torch.from_numpy(nx),
        )

    z_src, z_dst = ours.apply(
        params,
        jnp.asarray(node_x),
        jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(nbrs.astype(np.int32)),
        jnp.asarray(nt.astype(np.int32)),
        jnp.asarray(nx),
        rp_state=rp_state,
    )
    np.testing.assert_allclose(np.asarray(z_src), z_src_ref.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_dst), z_dst_ref.numpy(), rtol=2e-4, atol=2e-5)


def test_ctan_forward_parity(ref):
    """AntiSymmetricConv(TransformerConv phi) propagation vs the reference
    (tgm/nn/encoder/ctan.py:28-79; PyG AntiSymmetricConv via the functional
    stub in tools/refbridge.py)."""
    import jax.numpy as jnp

    from tgm.nn.encoder import CTAN as RefCTAN

    from tools.refbridge import ctan_params
    from tgm_tpu.nn.encoder.ctan import CTAN

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    U, E, ED, MD, TD, ND = 10, 18, 4, 8, 6, 3

    ref_m = RefCTAN(edge_dim=ED, memory_dim=MD, time_dim=TD, node_dim=ND,
                    num_iters=2, mean_delta_t=5.0, std_delta_t=2.0,
                    epsilon=0.2, gamma=0.15).eval()
    ours = CTAN(edge_dim=ED, memory_dim=MD, time_dim=TD, node_dim=ND,
                num_iters=2, mean_delta_t=5.0, std_delta_t=2.0,
                epsilon=0.2, gamma=0.15)

    node_x = rng.normal(size=(U, MD + ND)).astype(np.float32)
    last_update = rng.integers(0, 60, U).astype(np.int64)
    es = rng.integers(0, U, E)
    ed = rng.integers(0, U, E)
    t = rng.integers(0, 60, E).astype(np.int64)
    msg = rng.normal(size=(E, ED)).astype(np.float32)

    with torch.no_grad():
        z_ref = ref_m(
            torch.from_numpy(node_x),
            torch.from_numpy(last_update),
            torch.from_numpy(np.stack([es, ed]).astype(np.int64)),
            torch.from_numpy(t),
            torch.from_numpy(msg),
        ).numpy()

    params = ctan_params(ref_m)
    z = ours.apply(
        params, jnp.asarray(node_x), jnp.asarray(last_update.astype(np.int32)),
        jnp.asarray(es.astype(np.int32)), jnp.asarray(ed.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)), jnp.asarray(msg),
    )
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=2e-4, atol=2e-5)


def test_ctan_memory_stream_parity(ref):
    import jax.numpy as jnp

    from tgm.nn.encoder import CTANMemory as RefMem, LastAggregator

    from tgm_tpu.nn.encoder.ctan import ctan_memory_init, ctan_memory_update

    torch.manual_seed(4)
    rng = np.random.default_rng(4)
    N, MD = 12, 5
    ref_mem = RefMem(N, MD, aggr_module=LastAggregator(), init_time=0)
    state = ctan_memory_init(N, MD, init_time=0)

    t_cur = 1
    for step in range(4):
        B = 6
        src = rng.integers(0, N, B).astype(np.int64)
        dst = (src + 1 + rng.integers(0, N - 1, B)).astype(np.int64) % N
        t = np.arange(t_cur, t_cur + B).astype(np.int64)  # distinct times
        t_cur += B
        se = rng.normal(size=(B, MD)).astype(np.float32)
        de = rng.normal(size=(B, MD)).astype(np.float32)
        ref_mem.update_state(
            torch.from_numpy(src), torch.from_numpy(dst), torch.from_numpy(t),
            torch.from_numpy(se), torch.from_numpy(de),
        )
        state = ctan_memory_update(
            state, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
            jnp.asarray(t, jnp.int32), jnp.asarray(se), jnp.asarray(de),
        )
        np.testing.assert_allclose(
            np.asarray(state.memory[:N]), ref_mem.memory.numpy(), atol=1e-6,
            err_msg=f"memory step {step}",
        )
        np.testing.assert_array_equal(
            np.asarray(state.last_update[:N]), ref_mem.last_update.numpy()
        )


def test_tgcn_snapshot_recurrence_parity(ref):
    """Snapshot model parity: TGCN (GCNConv-gated GRU cell,
    tgm/nn/encoder/tgcn.py:8-157) with the hidden state carried across
    several weighted snapshots."""
    import jax.numpy as jnp

    from tgm.nn.encoder import TGCN as RefTGCN

    from tools.refbridge import dense_params, gcn_conv_params
    from tgm_tpu.nn.encoder.tgcn import TGCN

    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    N, E, IN, OUT = 9, 14, 4, 6

    ref_m = RefTGCN(in_channels=IN, out_channels=OUT).eval()
    ours = TGCN(in_channels=IN, out_channels=OUT)
    params = {
        "params": {
            "conv_u": gcn_conv_params(ref_m.conv_u),
            "conv_r": gcn_conv_params(ref_m.conv_r),
            "conv_c": gcn_conv_params(ref_m.conv_c),
            "linear_u": dense_params(ref_m.linear_u),
            "linear_r": dense_params(ref_m.linear_r),
            "linear_c": dense_params(ref_m.linear_c),
        }
    }

    H_ref, H = None, None
    for step in range(3):
        x = rng.normal(size=(N, IN)).astype(np.float32)
        es = rng.integers(0, N, E)
        ed = rng.integers(0, N, E)
        w = rng.random(E).astype(np.float32) + 0.5
        with torch.no_grad():
            H_ref = ref_m(
                torch.from_numpy(x),
                torch.from_numpy(np.stack([es, ed]).astype(np.int64)),
                torch.from_numpy(w),
                H_ref,
            )
        H = ours.apply(
            params, jnp.asarray(x), jnp.asarray(es.astype(np.int32)),
            jnp.asarray(ed.astype(np.int32)), jnp.asarray(w), H,
        )
        np.testing.assert_allclose(
            np.asarray(H), H_ref.numpy(), rtol=2e-5, atol=2e-6,
            err_msg=f"snapshot {step}",
        )


def test_gclstm_snapshot_recurrence_parity(ref):
    """GC-LSTM parity: ChebConv(K=3)-gated LSTM cell
    (tgm/nn/encoder/gclstm.py:40-227) over several snapshots with carried
    (H, C) state. Symmetric self-loop-free edge lists (PyG's ChebConv
    removes self loops before normalizing)."""
    import jax.numpy as jnp

    from tgm.nn.encoder import GCLSTM as RefGCLSTM

    from tools.refbridge import cheb_conv_params, t2n
    from tgm_tpu.nn.encoder.gclstm import GCLSTM

    torch.manual_seed(6)
    rng = np.random.default_rng(6)
    N, E, IN, OUT, K = 10, 12, 4, 6, 3

    ref_m = RefGCLSTM(in_channels=IN, out_channels=OUT, K=K).eval()
    ours = GCLSTM(in_channels=IN, out_channels=OUT, K=K)
    params = {
        "params": {
            **{f"W_{g}": t2n(getattr(ref_m, f"W_{g}")) for g in "ifco"},
            **{f"b_{g}": t2n(getattr(ref_m, f"b_{g}")) for g in "ifco"},
            **{
                f"conv_{g}": cheb_conv_params(getattr(ref_m, f"conv_{g}"))
                for g in "ifco"
            },
        }
    }

    H_ref = C_ref = H = C = None
    for step in range(3):
        x = rng.normal(size=(N, IN)).astype(np.float32)
        a = rng.integers(0, N, E)
        b = (a + 1 + rng.integers(0, N - 1, E)) % N  # no self loops
        es = np.concatenate([a, b])  # symmetric listing
        ed = np.concatenate([b, a])
        w = np.concatenate([rng.random(E)] * 2).astype(np.float32) + 0.5
        with torch.no_grad():
            H_ref, C_ref = ref_m(
                torch.from_numpy(x),
                torch.from_numpy(np.stack([es, ed]).astype(np.int64)),
                torch.from_numpy(w),
                H_ref, C_ref,
            )
        H, C = ours.apply(
            params, jnp.asarray(x), jnp.asarray(es.astype(np.int32)),
            jnp.asarray(ed.astype(np.int32)), jnp.asarray(w), H, C,
        )
        np.testing.assert_allclose(
            np.asarray(H), H_ref.numpy(), rtol=3e-5, atol=3e-6,
            err_msg=f"H snapshot {step}",
        )
        np.testing.assert_allclose(
            np.asarray(C), C_ref.numpy(), rtol=3e-5, atol=3e-6,
            err_msg=f"C snapshot {step}",
        )


@pytest.mark.parametrize("update", ["learnable", "gru", "mlp", "moving"])
def test_roland_snapshot_recurrence_parity(ref, update):
    """ROLAND parity (tgm/nn/encoder/roland.py:24-151) across the embedding
    update mechanisms, with previous embeddings carried over snapshots."""
    import jax.numpy as jnp

    from tgm.nn.encoder import ROLAND as RefROLAND

    from tools.refbridge import dense_params, gcn_conv_params, t2n
    from tgm_tpu.nn.encoder.roland import ROLAND

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    N, E, IN, OUT = 9, 14, 4, 6

    ref_m = RefROLAND(input_channel=IN, out_channel=OUT, num_nodes=N,
                      dropout=0.0, update=update).eval()
    ours = ROLAND(input_channel=IN, out_channel=OUT, num_nodes=N,
                  dropout=0.0, update=update)

    p = {
        "conv1": gcn_conv_params(ref_m.conv1),
        "conv2": gcn_conv_params(ref_m.conv2),
    }
    if update == "learnable":
        p["tau"] = t2n(ref_m.tau)
    elif update == "gru":
        for g in (1, 2):
            cell = getattr(ref_m, f"gru{g}")
            H = OUT
            w_ih, w_hh = t2n(cell.weight_ih), t2n(cell.weight_hh)
            b_ih, b_hh = t2n(cell.bias_ih), t2n(cell.bias_hh)
            r, z, n = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
            p[f"gru{g}"] = {
                "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
                "iz": {"kernel": w_ih[z].T, "bias": b_ih[z] + b_hh[z]},
                "in": {"kernel": w_ih[n].T, "bias": b_ih[n]},
                "hr": {"kernel": w_hh[r].T},
                "hz": {"kernel": w_hh[z].T},
                "hn": {"kernel": w_hh[n].T, "bias": b_hh[n]},
            }
    elif update == "mlp":
        p["mlp1"] = dense_params(ref_m.mlp1)
        p["mlp2"] = dense_params(ref_m.mlp2)
    params = {"params": p}

    prev_ref = None
    prev = None
    n_prev_edges = 7
    for step in range(3):
        x = rng.normal(size=(N, IN)).astype(np.float32)
        es = rng.integers(0, N, E)
        ed = rng.integers(0, N, E)
        with torch.no_grad():
            out_ref = ref_m(
                torch.from_numpy(x),
                torch.from_numpy(np.stack([es, ed]).astype(np.int64)),
                previous_embeddings=prev_ref,
                num_current_edges=E,
                num_previous_edges=n_prev_edges,
            )
        prev_ref = [out_ref[0].clone(), out_ref[1].clone()]

        _, embs = ours.apply(
            params, jnp.asarray(x), jnp.asarray(es.astype(np.int32)),
            jnp.asarray(ed.astype(np.int32)), prev,
            num_current_edges=jnp.asarray(float(E)),
            num_previous_edges=jnp.asarray(float(n_prev_edges)),
        )
        prev = embs
        for li in range(2):
            np.testing.assert_allclose(
                np.asarray(embs[li]), out_ref[li].numpy(), rtol=3e-5, atol=3e-6,
                err_msg=f"{update} layer {li} snapshot {step}",
            )


@pytest.mark.parametrize("k", [2, 4, 8])
@pytest.mark.parametrize("decay", [False, True])
def test_tncn_predictor_parity(ref, k, decay):
    """Dense-CN formulation vs the reference's sparse one, incl. the k=8 walk
    corrections (reference tgm/nn/decoder/ncnpred.py:174-303)."""
    import jax
    import jax.numpy as jnp

    from tgm.nn.decoder.ncnpred import NCNPredictor as RefNCN

    from tools.refbridge import dense_params
    from tgm_tpu.nn.decoder.ncnpred import NCNPredictor

    torch.manual_seed(k)
    rng = np.random.default_rng(k)
    U, E, B, D = 12, 20, 5, 4

    ref_m = RefNCN(in_channels=D, hidden_dim=6, out_channels=1, k=k,
                   cn_time_decay=decay).eval()
    ours = NCNPredictor(in_channels=D, hidden_dim=6, out_channels=1, k=k,
                        cn_time_decay=decay)

    x = rng.normal(size=(U, D)).astype(np.float32)
    es = rng.integers(0, U, E)
    ed = rng.integers(0, U, E)
    # A few duplicate edges to exercise multiplicity coalescing.
    es[:3], ed[:3] = es[3:6], ed[3:6]
    # Distinct query nodes per side: the reference's _sparse_sliding zeroes
    # all but the last duplicate row (mapping[rows]=arange overwrite,
    # ncnpred.py:40-46) — a defect we deliberately do not reproduce.
    ti = rng.permutation(U)[:B]
    tj = rng.permutation(U)[:B]
    last_update = rng.integers(0, 100, U).astype(np.int64)
    pos_t = rng.integers(100, 200, B).astype(np.int64)

    with torch.no_grad():
        out_ref = ref_m(
            torch.from_numpy(x),
            torch.from_numpy(np.stack([es, ed]).astype(np.int64)),
            torch.from_numpy(np.stack([ti, tj]).astype(np.int64)),
            last_update=torch.from_numpy(last_update) if decay else None,
            edge_time=torch.from_numpy(pos_t) if decay else None,
        ).numpy()

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(es.astype(np.int32)),
        jnp.asarray(ed.astype(np.int32)), jnp.asarray(ti.astype(np.int32)),
        jnp.asarray(tj.astype(np.int32)),
        last_update=jnp.asarray(last_update.astype(np.int32)) if decay else None,
        edge_time=jnp.asarray(pos_t.astype(np.int32)) if decay else None,
    )
    params = {
        "params": {
            "xsmlp": {
                "layers_0": dense_params(ref_m.xsmlp[0]),
                "layers_2": dense_params(ref_m.xsmlp[2]),
            }
        }
    }
    out = ours.apply(
        params, jnp.asarray(x), jnp.asarray(es.astype(np.int32)),
        jnp.asarray(ed.astype(np.int32)), jnp.asarray(ti.astype(np.int32)),
        jnp.asarray(tj.astype(np.int32)),
        last_update=jnp.asarray(last_update.astype(np.int32)) if decay else None,
        edge_time=jnp.asarray(pos_t.astype(np.int32)) if decay else None,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-5)


def test_batch_analytics_hook_parity(ref):
    """Vectorized batch analytics vs the reference's dict/unique-based hook
    (tgm/hooks/analytics/batch_analytics.py:13-129) on identical batches with
    node events, repeated edges, and repeated node events."""
    import torch as _torch

    from tgm import DGraph as RefDGraph
    from tgm.data import DGData as RefDGData
    from tgm.hooks import BatchAnalyticsHook as RefHook

    from tgm_tpu import DGData, DGraph
    from tgm_tpu.hooks import BatchAnalyticsHook

    rng = np.random.default_rng(8)
    E, NX, N = 20, 8, 12
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    t_all = np.sort(rng.integers(0, 40, E + NX))
    te, tn = t_all[:E], t_all[E:]
    # Force repeated edge triples and node events.
    src[3], dst[3], te[3] = src[2], dst[2], te[2]
    nids = rng.integers(0, N, NX)
    nids[5] = nids[4]
    tn[5] = tn[4]
    nx = rng.normal(size=(NX, 2)).astype(np.float32)

    ref_data = RefDGData.from_raw(
        edge_time=_torch.from_numpy(te.astype(np.int64)),
        edge_index=_torch.from_numpy(np.stack([src, dst], 1).astype(np.int64)),
        node_x_time=_torch.from_numpy(tn.astype(np.int64)),
        node_x_nids=_torch.from_numpy(nids.astype(np.int64)),
        node_x=_torch.from_numpy(nx),
        time_delta="s",
    )
    ref_dg = RefDGraph(ref_data, device="cpu")
    ref_batch = ref_dg.materialize()
    ref_batch = RefHook()(ref_dg, ref_batch)

    data = DGData.from_raw(
        edge_time=te, edge_index=np.stack([src, dst], 1),
        node_x_time=tn, node_x_nids=nids, node_x=nx, time_delta="s",
    )
    dg = DGraph(data)
    batch = dg.materialize()
    batch = BatchAnalyticsHook()(dg, batch)

    for attr in (
        "num_edge_events", "num_node_events", "num_unique_timestamps",
        "num_unique_nodes", "num_repeated_edge_events", "num_repeated_node_events",
    ):
        assert int(getattr(batch, attr)) == int(getattr(ref_batch, attr)), attr
    np.testing.assert_allclose(
        float(batch.avg_degree), float(ref_batch.avg_degree), rtol=1e-6
    )
