"""Validate the torch reference bridge (tools/refbridge.py).

The functional TransformerConv stub must reproduce the semantics our JAX
GraphAttentionEmbedding implements (both follow PyG's TransformerConv as used
by /root/reference/tgm/nn/encoder/tgn.py:14-40), and the weight-copy helpers
must map torch modules onto our flax param trees exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    from tools.refbridge import import_reference

    return import_reference()


def test_graph_attention_embedding_parity(ref):
    import jax
    import jax.numpy as jnp

    from tgm.nn.encoder.tgn import GraphAttentionEmbedding as RefGAE

    from tools.refbridge import graph_attn_params, time2vec_params
    from tgm_tpu.nn.encoder.tgn import GraphAttentionEmbedding

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    U, E, MEM, OUT, MSG, T = 17, 60, 12, 8, 5, 6

    class _TimeEnc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.time_dim = T
            self.w = torch.nn.Linear(1, T)

        def forward(self, t):
            return (self.w(t.view(-1, 1))).cos()

    ref_enc = RefGAE(in_channels=MEM, out_channels=OUT, msg_dim=MSG, time_enc=_TimeEnc())
    ref_enc.conv.dropout = 0.0
    ref_enc.eval()

    x = rng.normal(size=(U, MEM)).astype(np.float32)
    last_update = rng.integers(0, 50, size=U).astype(np.int64)
    src = rng.integers(0, U, size=E)
    dst = rng.integers(0, U, size=E)
    t = rng.integers(0, 50, size=E).astype(np.int64)
    msg = rng.normal(size=(E, MSG)).astype(np.float32)

    with torch.no_grad():
        z_ref = ref_enc(
            torch.from_numpy(x),
            torch.from_numpy(last_update),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
            torch.from_numpy(t),
            torch.from_numpy(msg),
        ).numpy()

    ours = GraphAttentionEmbedding(
        in_channels=MEM, out_channels=OUT, msg_dim=MSG, time_dim=T, dropout=0.0
    )
    params = graph_attn_params(ref_enc)
    z = ours.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(last_update.astype(np.int32)),
        jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)),
        jnp.asarray(t.astype(np.int32)),
        jnp.asarray(msg),
        jnp.ones(E, bool),
    )
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=2e-5, atol=2e-5)


def test_link_predictor_copy(ref):
    import jax.numpy as jnp

    from tgm.nn import LinkPredictor as RefDec

    from tools.refbridge import link_predictor_params
    from tgm_tpu.nn.decoder import LinkPredictor

    torch.manual_seed(1)
    D = 10
    ref_dec = RefDec(node_dim=D, hidden_dim=16).eval()
    ours = LinkPredictor(node_dim=D, hidden_dim=16)
    params = link_predictor_params(ref_dec)

    rng = np.random.default_rng(1)
    a = rng.normal(size=(7, D)).astype(np.float32)
    b = rng.normal(size=(7, D)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_dec(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    out = ours.apply(params, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-6)
