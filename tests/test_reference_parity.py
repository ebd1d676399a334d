"""Numerical parity against the actual reference implementation (torch CPU).

The reference (/root/reference) is importable once torch_geometric — unused
at runtime by the components tested here — is stubbed. Weights are copied
torch→flax and outputs compared on identical inputs; the recency hook is
driven as a black-box state machine on the same event stream.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------- #
# torch_geometric stubs (imported by reference modules, unused at runtime
# for everything exercised here)
# --------------------------------------------------------------------- #
def _stub_pyg():
    """Delegates to tools.refbridge (functional TransformerConv + scatter)."""
    from tools.refbridge import stub_pyg

    stub_pyg()


@pytest.fixture(scope="module")
def ref():
    _stub_pyg()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import tgm  # noqa: F401

    return sys.modules["tgm"]


def t2n(x):
    return x.detach().cpu().numpy()


# --------------------------------------------------------------------- #
# Time2Vec
# --------------------------------------------------------------------- #
def test_time2vec_parity(ref):
    import jax
    import jax.numpy as jnp

    from tgm.nn.modules import Time2Vec as RefTime2Vec

    from tgm_tpu.nn import Time2Vec

    D = 8
    ref_m = RefTime2Vec(time_dim=D)
    ours = Time2Vec(time_dim=D)
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros(3))
    # Same (default) init: log-spaced weights, zero bias.
    np.testing.assert_allclose(
        np.asarray(params["params"]["w"]).reshape(-1),
        t2n(ref_m.w.weight).reshape(-1), rtol=1e-6,
    )
    t = np.array([0.0, 1.5, 100.0, 12345.0], dtype=np.float32)
    want = t2n(ref_m(torch.from_numpy(t)))
    got = np.asarray(ours.apply(params, jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------------------------------------------------------- #
# TemporalAttention
# --------------------------------------------------------------------- #
def _copy_linear(flax_params, torch_linear, has_bias=True):
    out = {"kernel": t2n(torch_linear.weight).T}
    if has_bias and torch_linear.bias is not None:
        out["bias"] = t2n(torch_linear.bias)
    return out


def test_temporal_attention_parity(ref):
    import jax
    import jax.numpy as jnp

    from tgm.nn.modules import TemporalAttention as RefAttn

    from tgm_tpu.nn import TemporalAttention

    torch.manual_seed(0)
    B, K, nd, ed, td, H = 5, 4, 6, 3, 5, 2
    ref_m = RefAttn(n_heads=H, node_dim=nd, edge_dim=ed, time_dim=td, dropout=0.0).eval()
    ours = TemporalAttention(n_heads=H, node_dim=nd, edge_dim=ed, time_dim=td, dropout=0.0)

    rng = np.random.default_rng(0)
    args_np = (
        rng.normal(size=(B, nd)).astype(np.float32),
        rng.normal(size=(B, td)).astype(np.float32),
        rng.normal(size=(B, K, ed)).astype(np.float32),
        rng.normal(size=(B, K, nd)).astype(np.float32),
        rng.normal(size=(B, K, td)).astype(np.float32),
        rng.random((B, K)) > 0.3,
    )
    params = ours.init(jax.random.PRNGKey(0), *[jnp.asarray(a) for a in args_np])
    p = {"params": dict(params["params"])}
    p["params"]["W_Q"] = _copy_linear(None, ref_m.W_Q, has_bias=False)
    p["params"]["W_KV"] = _copy_linear(None, ref_m.W_KV, has_bias=False)
    p["params"]["W_O"] = _copy_linear(None, ref_m.W_O)
    p["params"]["layer_norm"] = {
        "scale": t2n(ref_m.layer_norm.weight),
        "bias": t2n(ref_m.layer_norm.bias),
    }

    want = t2n(
        ref_m(
            torch.from_numpy(args_np[0]),
            torch.from_numpy(args_np[1]),
            torch.from_numpy(args_np[2]),
            torch.from_numpy(args_np[3]),
            torch.from_numpy(args_np[4]),
            torch.from_numpy(args_np[5]),
        )
    )
    got = np.asarray(ours.apply(p, *[jnp.asarray(a) for a in args_np]))
    np.testing.assert_allclose(got, want, atol=2e-5)


# --------------------------------------------------------------------- #
# MLPMixer
# --------------------------------------------------------------------- #
def test_mlp_mixer_parity(ref):
    import jax
    import jax.numpy as jnp

    from tgm.nn.modules import MLPMixer as RefMixer

    from tgm_tpu.nn import MLPMixer

    torch.manual_seed(0)
    T, C = 6, 10
    ref_m = RefMixer(num_tokens=T, num_channels=C, dropout=0.0).eval()
    ours = MLPMixer(num_tokens=T, num_channels=C, dropout=0.0)
    x = np.random.default_rng(0).normal(size=(3, T, C)).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    p = {"params": dict(params["params"])}
    p["params"]["LayerNorm_0"] = {
        "scale": t2n(ref_m.token_norm.weight), "bias": t2n(ref_m.token_norm.bias)
    }
    p["params"]["LayerNorm_1"] = {
        "scale": t2n(ref_m.channel_norm.weight), "bias": t2n(ref_m.channel_norm.bias)
    }
    p["params"]["FeedForwardNet_0"] = {
        "Dense_0": _copy_linear(None, ref_m.token_feedforward.ffn[0]),
        "Dense_1": _copy_linear(None, ref_m.token_feedforward.ffn[3]),
    }
    p["params"]["FeedForwardNet_1"] = {
        "Dense_0": _copy_linear(None, ref_m.channel_feedforward.ffn[0]),
        "Dense_1": _copy_linear(None, ref_m.channel_feedforward.ffn[3]),
    }
    want = t2n(ref_m(torch.from_numpy(x)))
    got = np.asarray(ours.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


# --------------------------------------------------------------------- #
# TGAT (full multi-hop forward)
# --------------------------------------------------------------------- #
def test_tgat_forward_parity(ref):
    import jax
    import jax.numpy as jnp

    from tgm.nn import TGAT as RefTGAT

    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.nn import TGAT

    torch.manual_seed(0)
    nd, ed, td, emb, L, H = 6, 3, 5, 8, 2, 2
    ref_m = RefTGAT(node_dim=nd, edge_dim=ed, time_dim=td, embed_dim=emb,
                    num_layers=L, n_heads=H, dropout=0.0).eval()
    ours = TGAT(node_dim=nd, edge_dim=ed, time_dim=td, embed_dim=emb,
                num_layers=L, n_heads=H, dropout=0.0)

    rng = np.random.default_rng(0)
    N, S, K = 12, 5, 3
    node_x = rng.normal(size=(N, nd)).astype(np.float32)
    seed_nids, seed_times, nbr_nids, nbr_x, nbr_t = [], [], [], [], []
    s = S
    for hop in range(L):
        seed_nids.append(rng.integers(0, N, s).astype(np.int64))
        seed_times.append(rng.integers(50, 100, s).astype(np.int64))
        ids = rng.integers(0, N, (s, K)).astype(np.int64)
        ids[rng.random((s, K)) < 0.3] = PADDED_NODE_ID
        nbr_nids.append(ids)
        nbr_x.append(rng.normal(size=(s, K, ed)).astype(np.float32))
        nbr_t.append(rng.integers(0, 50, (s, K)).astype(np.int64))
        s *= K

    args_j = (
        jnp.asarray(node_x),
        [jnp.asarray(a, jnp.int32) for a in seed_nids],
        [jnp.asarray(a, jnp.int32) for a in seed_times],
        [jnp.asarray(a, jnp.int32) for a in nbr_nids],
        [jnp.asarray(a) for a in nbr_x],
        [jnp.asarray(a, jnp.int32) for a in nbr_t],
    )
    params = ours.init(jax.random.PRNGKey(0), *args_j)
    p = {"params": dict(params["params"])}
    # Time encoder + per-layer attention and merge weights.
    p["params"]["time_encoder"] = {
        "w": t2n(ref_m.time_encoder.w.weight).T, "b": t2n(ref_m.time_encoder.w.bias)
    }
    for i in range(L):
        p["params"][f"attn_{i}"] = {
            "W_Q": _copy_linear(None, ref_m.attn[i].W_Q, has_bias=False),
            "W_KV": _copy_linear(None, ref_m.attn[i].W_KV, has_bias=False),
            "W_O": _copy_linear(None, ref_m.attn[i].W_O),
            "layer_norm": {
                "scale": t2n(ref_m.attn[i].layer_norm.weight),
                "bias": t2n(ref_m.attn[i].layer_norm.bias),
            },
        }
        p["params"][f"merge_layers_{i}"] = {
            "Dense_0": _copy_linear(None, ref_m.merge_layers[i].fc1),
            "Dense_1": _copy_linear(None, ref_m.merge_layers[i].fc2),
        }

    want = t2n(
        ref_m(
            torch.from_numpy(node_x),
            [torch.from_numpy(a) for a in seed_nids],
            [torch.from_numpy(a) for a in seed_times],
            [torch.from_numpy(a) for a in nbr_nids],
            [torch.from_numpy(a) for a in nbr_x],
            [torch.from_numpy(a) for a in nbr_t],
        )
    )
    got = np.asarray(ours.apply(p, *args_j))
    np.testing.assert_allclose(got, want, atol=5e-5)


# --------------------------------------------------------------------- #
# RecencyNeighborHook: state-machine parity on the same event stream
# --------------------------------------------------------------------- #
def test_recency_hook_stream_parity(ref):
    import jax.numpy as jnp

    from tgm.core import DGraph as RefDGraph
    from tgm.data import DGData as RefDGData
    from tgm.hooks import RecencyNeighborHook as RefHook

    from tgm_tpu.constants import PADDED_NODE_ID
    from tgm_tpu.hooks.neighbors import recency_init, recency_query, recency_update

    rng = np.random.default_rng(7)
    N, E, D, K = 15, 120, 3, 4
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    t = np.sort(rng.integers(0, 400, E)).astype(np.int64)
    x = rng.normal(size=(E, D)).astype(np.float32)

    ref_data = RefDGData.from_raw(
        edge_time=torch.from_numpy(t),
        edge_index=torch.from_numpy(np.stack([src, dst], 1)),
        edge_x=torch.from_numpy(x),
    )
    ref_dg = RefDGraph(ref_data)
    ref_hook = RefHook(
        num_nodes=N, num_nbrs=[K],
        seed_nodes_keys=["edge_src", "edge_dst"],
        seed_times_keys=["edge_time", "edge_time"],
    )

    state = recency_init(N, K, D)

    bs = 20
    for lo in range(0, E, bs):
        hi = lo + bs
        ref_batch = ref_dg.slice_events(lo, hi).materialize()
        ref_out = ref_hook(ref_dg, ref_batch)
        want_ids = t2n(ref_out.nbr_nids[0])
        want_t = t2n(ref_out.nbr_edge_time[0])
        want_x = t2n(ref_out.nbr_edge_x[0])

        seeds = jnp.asarray(np.concatenate([src[lo:hi], dst[lo:hi]]), jnp.int32)
        times = jnp.asarray(np.concatenate([t[lo:hi], t[lo:hi]]), jnp.int32)
        got_ids, got_t, got_x = recency_query(state, seeds, times, K)
        state = recency_update(
            state,
            jnp.asarray(src[lo:hi], jnp.int32),
            jnp.asarray(dst[lo:hi], jnp.int32),
            jnp.asarray(t[lo:hi], jnp.int32),
            jnp.asarray(x[lo:hi]),
            None,
            directed=False,
        )

        np.testing.assert_array_equal(np.asarray(got_ids), want_ids)
        np.testing.assert_array_equal(np.asarray(got_t), want_t)
        np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-6)


# --------------------------------------------------------------------- #
# EdgeBank behavioral parity on a random stream
# --------------------------------------------------------------------- #
def test_edgebank_parity(ref):
    from tgm.nn.modules import EdgeBankPredictor as RefEB

    from tgm_tpu.nn import EdgeBankPredictor

    rng = np.random.default_rng(3)
    E, N = 300, 25
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    t = np.sort(rng.integers(0, 1000, E))

    for mode, ratio in [("unlimited", 0.15), ("fixed", 0.4)]:
        ref_eb = RefEB(
            torch.from_numpy(src[:150]), torch.from_numpy(dst[:150]),
            torch.from_numpy(t[:150]), memory_mode=mode, window_ratio=ratio,
        )
        ours = EdgeBankPredictor(src[:150], dst[:150], t[:150],
                                 memory_mode=mode, window_ratio=ratio)
        for lo in range(150, E, 50):
            hi = lo + 50
            q_src, q_dst = src[lo:hi], dst[lo:hi]
            want = t2n(ref_eb(torch.from_numpy(q_src), torch.from_numpy(q_dst)))
            got = ours(q_src, q_dst)
            np.testing.assert_allclose(got, want.astype(np.float32))
            ref_eb.update(torch.from_numpy(q_src), torch.from_numpy(q_dst), torch.from_numpy(t[lo:hi]))
            ours.update(q_src, q_dst, t[lo:hi])
