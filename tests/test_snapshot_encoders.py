import jax
import jax.numpy as jnp
import numpy as np

from tgm_tpu.nn import GCN, GCLSTM, ROLAND, TGCN
from tgm_tpu.nn.modules.graph_conv import ChebConv, GCNConv, gcn_propagate

KEY = jax.random.PRNGKey(0)


def ring_graph(n=6):
    src = jnp.arange(n, dtype=jnp.int32)
    dst = (src + 1) % n
    # undirected: both directions
    return jnp.concatenate([src, dst]), jnp.concatenate([dst, src])


def test_gcn_propagate_matches_dense():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    out = gcn_propagate(x, es, ed, None, None, self_loop_weight=1.0)

    # Dense oracle: D^-1/2 (A + I) D^-1/2 x
    A = np.zeros((n, n))
    for s, d in zip(np.asarray(es), np.asarray(ed)):
        A[d, s] += 1.0
    A += np.eye(n)
    deg = A.sum(axis=1)
    Dm = np.diag(deg**-0.5)
    expect = Dm @ A @ Dm @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_gcn_propagate_masked_edges():
    n = 4
    es = jnp.array([0, 1, 2, 3], dtype=jnp.int32)
    ed = jnp.array([1, 0, 3, 2], dtype=jnp.int32)
    x = jax.random.normal(KEY, (n, 3))
    mask = jnp.array([True, True, False, False])
    out = gcn_propagate(x, es, ed, None, mask)
    # nodes 2,3 see only self-loops
    A = np.zeros((n, n))
    A[1, 0] = A[0, 1] = 1.0
    A += np.eye(n)
    deg = A.sum(1)
    Dm = np.diag(deg**-0.5)
    expect = Dm @ A @ Dm @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_gcnconv_and_chebconv_shapes():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    conv = GCNConv(out_channels=8)
    p = conv.init(KEY, x, es, ed)
    assert conv.apply(p, x, es, ed).shape == (n, 8)

    cheb = ChebConv(out_channels=8, K=3)
    p = cheb.init(KEY, x, es, ed)
    out = cheb.apply(p, x, es, ed)
    assert out.shape == (n, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_tgcn_recurrence():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    cell = TGCN(in_channels=4, out_channels=8)
    p = cell.init(KEY, x, es, ed)
    h1 = cell.apply(p, x, es, ed)
    assert h1.shape == (n, 8)
    h2 = cell.apply(p, x, es, ed, None, h1)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_gclstm_recurrence():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    cell = GCLSTM(in_channels=4, out_channels=8, K=2)
    p = cell.init(KEY, x, es, ed)
    h, c = cell.apply(p, x, es, ed)
    assert h.shape == (n, 8) and c.shape == (n, 8)
    h2, c2 = cell.apply(p, x, es, ed, None, h, c)
    assert np.isfinite(np.asarray(h2)).all()
    assert not np.allclose(np.asarray(h), np.asarray(h2))


def test_roland_update_mechanisms():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    for update in ("moving", "learnable", "gru", "mlp", None):
        m = ROLAND(input_channel=4, out_channel=8, num_nodes=n, update=update)
        variables = m.init(KEY, x, es, ed)
        z, embs = m.apply(
            variables, x, es, ed,
            num_current_edges=jnp.asarray(6.0), num_previous_edges=jnp.asarray(3.0),
        )
        assert z.shape == (n, 8)
        assert len(embs) == 2
        # carried embeddings feed the next snapshot
        z2, _ = m.apply(
            variables, x, es, ed, previous_embeddings=embs,
            num_current_edges=jnp.asarray(6.0), num_previous_edges=jnp.asarray(3.0),
        )
        assert np.isfinite(np.asarray(z2)).all()


def test_gcn_encoder():
    n = 6
    es, ed = ring_graph(n)
    x = jax.random.normal(KEY, (n, 4))
    m = GCN(hidden_dim=8, out_dim=5, num_layers=3, dropout=0.0)
    p = m.init(KEY, x, es, ed)
    assert m.apply(p, x, es, ed).shape == (n, 5)
