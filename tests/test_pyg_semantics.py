"""Pin the PyG-surface stubs AND the JAX convs to PyG's *documented* formulas.

torch_geometric is not installed in this image, so the reference-parity suite
runs against functional stubs (tools/refbridge.py). If a stub mis-modeled real
PyG, both sides would agree and the error would be invisible (VERDICT r2,
"what's missing" #5). These tests close that hole with a third, independent
derivation: every expected value is computed in plain numpy with dense
matrices / Python loops transcribing the equations from the PyG documentation
(cited per test), not by calling either implementation's COO/segment helpers.
Both the torch stub and the tgm_tpu JAX module must match the derivation.

Documented semantics pinned here:
* GCNConv (Kipf & Welling; PyG docs `torch_geometric.nn.conv.GCNConv`):
  X' = D̂^{-1/2} (A + cI) D̂^{-1/2} X Θ + b, c = 1 (2 if improved), D̂ the
  in-degree of A + cI (PyG's gcn_norm reduces edge_weight over `col`).
* ChebConv (Defferrard et al.; PyG docs `torch_geometric.nn.conv.ChebConv`,
  normalization="sym", λ_max = 2): L̂ = 2L/λ_max − I = −D^{-1/2} A D^{-1/2}
  (no self loops); Z_0 = X, Z_1 = L̂X, Z_k = 2 L̂ Z_{k−1} − Z_{k−2};
  X' = Σ_k Z_k Θ_k + b.
* TransformerConv (Shi et al. 2021, "Masked Label Prediction"; PyG docs
  `torch_geometric.nn.conv.TransformerConv`): with edge features, the edge
  projection W_e e_ij is added to BOTH the key and the value;
  α_ij = softmax_j( (W_q x_i)ᵀ (W_k x_j + W_e e_ij) / √d ) over j ∈ N(i);
  x'_i = W_skip x_i + b_skip + Σ_j α_ij (W_v x_j + W_e e_ij)  (β-gate off).
* AntiSymmetricConv (Gravina et al. 2023; PyG docs
  `torch_geometric.nn.conv.AntiSymmetricConv`):
  x ← x + ε · tanh((W − Wᵀ − γI) x + Φ(x, E) + b), `num_iters` times with
  shared weights.

Used by the reference via tgm/nn/encoder/{tgn,tgcn,gclstm,ctan}.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------------- #
# numpy derivations straight from the documented equations
# --------------------------------------------------------------------------- #
def np_gcn(x, src, dst, W, bias, n, improved=False, edge_weight=None):
    """Dense D̂^{-1/2}(A + cI)D̂^{-1/2} X W + b; D̂ = in-degree of A + cI."""
    c = 2.0 if improved else 1.0
    A = np.zeros((n, n))
    w = np.ones(len(src)) if edge_weight is None else edge_weight
    for s, d, ww in zip(src, dst, w):
        A[d, s] += ww  # row = target: A[i, j] carries edge j -> i
    A = A + c * np.eye(n)
    deg = A.sum(axis=1)  # in-degree (PyG gcn_norm reduces over col)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    return np.diag(dis) @ A @ np.diag(dis) @ x @ W + bias


def np_cheb(x, src, dst, Ws, bias, n):
    """Σ_k Z_k Θ_k with L̂ = −D^{-1/2} A D^{-1/2} (sym, λ_max=2, no loops)."""
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[d, s] += 1.0
    deg = A.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    L_hat = -(np.diag(dis) @ A @ np.diag(dis))
    zs = [x]
    if len(Ws) > 1:
        zs.append(L_hat @ x)
    for _ in range(2, len(Ws)):
        zs.append(2.0 * L_hat @ zs[-1] - zs[-2])
    return sum(z @ W for z, W in zip(zs, Ws)) + bias


def np_transformer_conv(
    x, src, dst, edge_attr, Wq, bq, Wk, bk, Wv, bv, We, Wskip, bskip, heads, C
):
    """Loop-based Shi et al. attention: per-target softmax over incoming
    edges; W_e e added to key AND value; concat heads; + W_skip x + b."""
    n = x.shape[0]
    q = (x @ Wq + bq).reshape(n, heads, C)
    k = (x @ Wk + bk).reshape(n, heads, C)
    v = (x @ Wv + bv).reshape(n, heads, C)
    e = (edge_attr @ We).reshape(len(src), heads, C)
    out = np.zeros((n, heads, C))
    for i in range(n):
        eids = [idx for idx, d in enumerate(dst) if d == i]
        if not eids:
            continue
        for h in range(heads):
            logits = np.array(
                [q[i, h] @ (k[src[idx], h] + e[idx, h]) for idx in eids]
            ) / np.sqrt(C)
            a = np.exp(logits - logits.max())
            a = a / a.sum()
            out[i, h] = sum(
                ai * (v[src[idx], h] + e[idx, h]) for ai, idx in zip(a, eids)
            )
    out = out.reshape(n, heads * C)
    if Wskip is not None:
        out = out + x @ Wskip + bskip
    return out


def np_antisymmetric(x, W, bias, gamma, eps, num_iters, phi_fn):
    """x ← x + ε tanh((W − Wᵀ − γI) x + Φ(x) + b), iterated."""
    M = W - W.T - gamma * np.eye(W.shape[0])
    for _ in range(num_iters):
        x = x + eps * np.tanh(x @ M.T + phi_fn(x) + bias)
    return x


# --------------------------------------------------------------------------- #
# GCNConv
# --------------------------------------------------------------------------- #
def test_gcnconv_literal_hand_values():
    """3-node chain 0→1→2, x=[1,2,3], W=I, b=0 (arithmetic done on paper):
    with self loops deg=[1,2,2]; out0 = 1/1 = 1;
    out1 = 1·(1·2)^{-1/2} + 2·(1/2) = 1/√2 + 1;
    out2 = 2·(2·2)^{-1/2} + 3·(1/2) = 1 + 1.5 = 2.5."""
    from tools.refbridge import GCNConv as StubGCN

    expected = np.array([[1.0], [1.0 + 2 ** -0.5], [2.5]])

    stub = StubGCN(1, 1)
    with torch.no_grad():
        stub.lin.weight.copy_(torch.eye(1))
        stub.bias.zero_()
        got = stub(
            torch.tensor([[1.0], [2.0], [3.0]]),
            torch.tensor([[0, 1], [1, 2]]),
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    import jax.numpy as jnp

    from tgm_tpu.nn.modules.graph_conv import GCNConv

    ours = GCNConv(out_channels=1)
    params = {
        "params": {"Dense_0": {"kernel": np.eye(1, dtype=np.float32)},
                   "bias": np.zeros(1, np.float32)}
    }
    got_j = ours.apply(
        params, jnp.array([[1.0], [2.0], [3.0]]),
        jnp.array([0, 1]), jnp.array([1, 2]),
    )
    np.testing.assert_allclose(np.asarray(got_j), expected, rtol=1e-6)


@pytest.mark.parametrize("improved", [False, True])
def test_gcnconv_doc_formula(improved):
    rng = np.random.default_rng(3)
    n, e, din, dout = 6, 10, 4, 3
    x = rng.normal(size=(n, din)).astype(np.float32)
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    W = rng.normal(size=(din, dout)).astype(np.float32)
    b = rng.normal(size=dout).astype(np.float32)
    ew = rng.uniform(0.5, 1.5, size=e).astype(np.float32)
    expected = np_gcn(x, src, dst, W, b, n, improved, edge_weight=ew)

    from tools.refbridge import GCNConv as StubGCN

    stub = StubGCN(din, dout, improved=improved)
    with torch.no_grad():
        stub.lin.weight.copy_(torch.from_numpy(W.T))
        stub.bias.copy_(torch.from_numpy(b))
        got = stub(
            torch.from_numpy(x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
            torch.from_numpy(ew),
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    import jax.numpy as jnp

    from tgm_tpu.nn.modules.graph_conv import GCNConv

    ours = GCNConv(out_channels=dout, improved=improved)
    params = {"params": {"Dense_0": {"kernel": W}, "bias": b}}
    got_j = ours.apply(
        params, jnp.asarray(x), jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), jnp.asarray(ew),
    )
    np.testing.assert_allclose(np.asarray(got_j), expected, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# ChebConv
# --------------------------------------------------------------------------- #
def test_chebconv_literal_hand_values():
    """2-node undirected pair, x=[1,2], K=3, all Θ_k = I, b=0 (on paper):
    deg=[1,1] so L̂ = −A = [[0,−1],[−1,0]].
    Z0=[1,2]; Z1=[−2,−1]; Z2 = 2·L̂Z1 − Z0 = 2·[1,2] − [1,2] = [1,2];
    out = Z0+Z1+Z2 = [0, 3]."""
    from tools.refbridge import ChebConv as StubCheb

    expected = np.array([[0.0], [3.0]])
    stub = StubCheb(1, 1, K=3)
    with torch.no_grad():
        for lin in stub.lins:
            lin.weight.copy_(torch.eye(1))
        stub.bias.zero_()
        got = stub(
            torch.tensor([[1.0], [2.0]]), torch.tensor([[0, 1], [1, 0]])
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)

    import jax.numpy as jnp

    from tgm_tpu.nn.modules.graph_conv import ChebConv

    ours = ChebConv(out_channels=1, K=3)
    eye = np.eye(1, dtype=np.float32)
    params = {"params": {"lin_0": {"kernel": eye}, "lin_1": {"kernel": eye},
                         "lin_2": {"kernel": eye}, "bias": np.zeros(1, np.float32)}}
    got_j = ours.apply(
        params, jnp.array([[1.0], [2.0]]), jnp.array([0, 1]), jnp.array([1, 0])
    )
    np.testing.assert_allclose(np.asarray(got_j), expected, rtol=1e-6, atol=1e-7)


def test_chebconv_doc_formula():
    rng = np.random.default_rng(4)
    n, din, dout, K = 5, 3, 2, 4
    # Undirected edge list (both directions), as ChebConv expects.
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (1, 3)]
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
    x = rng.normal(size=(n, din)).astype(np.float32)
    Ws = [rng.normal(size=(din, dout)).astype(np.float32) for _ in range(K)]
    b = rng.normal(size=dout).astype(np.float32)
    expected = np_cheb(x, src, dst, Ws, b, n)

    from tools.refbridge import ChebConv as StubCheb

    stub = StubCheb(din, dout, K=K)
    with torch.no_grad():
        for lin, W in zip(stub.lins, Ws):
            lin.weight.copy_(torch.from_numpy(W.T))
        stub.bias.copy_(torch.from_numpy(b))
        got = stub(
            torch.from_numpy(x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    import jax.numpy as jnp

    from tgm_tpu.nn.modules.graph_conv import ChebConv

    ours = ChebConv(out_channels=dout, K=K)
    params = {"params": {f"lin_{k}": {"kernel": Ws[k]} for k in range(K)}}
    params["params"]["bias"] = b
    got_j = ours.apply(
        params, jnp.asarray(x), jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)),
    )
    np.testing.assert_allclose(np.asarray(got_j), expected, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# TransformerConv
# --------------------------------------------------------------------------- #
def test_transformerconv_literal_hand_values():
    """3 nodes, edges 0→2 and 1→2, dim 1, 1 head; W_q=W_k=1, W_v=2, W_e=3,
    W_skip=0.5, b_skip=0.1, all other biases 0 (on paper):
    q_2 = 3; keys = x + 3e = [1+3, 2+1.5] = [4, 3.5];
    logits = 3·[4, 3.5]/√1 = [12, 10.5]; α = σ([1.5, 0]) = [s, 1−s] with
    s = 1/(1+e^{−1.5}); values = 2x + 3e = [5, 5.5];
    out_2 = 5s + 5.5(1−s) + 0.5·3 + 0.1; out_0/1 = skip only = [0.6, 1.1]."""
    s = 1.0 / (1.0 + np.exp(-1.5))
    expected = np.array(
        [[0.6], [1.1], [5.0 * s + 5.5 * (1.0 - s) + 1.6]]
    )

    from tools.refbridge import TransformerConv as StubTC

    stub = StubTC(1, 1, heads=1, edge_dim=1)
    with torch.no_grad():
        stub.lin_query.weight.fill_(1.0)
        stub.lin_key.weight.fill_(1.0)
        stub.lin_value.weight.fill_(2.0)
        stub.lin_edge.weight.fill_(3.0)
        stub.lin_skip.weight.fill_(0.5)
        for lin in (stub.lin_query, stub.lin_key, stub.lin_value):
            lin.bias.zero_()
        stub.lin_skip.bias.fill_(0.1)
        got = stub(
            torch.tensor([[1.0], [2.0], [3.0]]),
            torch.tensor([[0, 1], [2, 2]]),
            torch.tensor([[1.0], [0.5]]),
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_transformerconv_doc_formula_multihead():
    rng = np.random.default_rng(5)
    n, e, din, dedge, heads, C = 5, 12, 4, 3, 2, 3
    x = rng.normal(size=(n, din)).astype(np.float32)
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ea = rng.normal(size=(e, dedge)).astype(np.float32)
    HC = heads * C
    Wq = rng.normal(size=(din, HC)).astype(np.float32)
    Wk = rng.normal(size=(din, HC)).astype(np.float32)
    Wv = rng.normal(size=(din, HC)).astype(np.float32)
    We = rng.normal(size=(dedge, HC)).astype(np.float32)
    Wskip = rng.normal(size=(din, HC)).astype(np.float32)
    bq, bk, bv = [rng.normal(size=HC).astype(np.float32) for _ in range(3)]
    bskip = rng.normal(size=HC).astype(np.float32)
    expected = np_transformer_conv(
        x, src, dst, ea, Wq, bq, Wk, bk, Wv, bv, We, Wskip, bskip, heads, C
    )

    from tools.refbridge import TransformerConv as StubTC

    stub = StubTC(din, C, heads=heads, edge_dim=dedge)
    with torch.no_grad():
        stub.lin_query.weight.copy_(torch.from_numpy(Wq.T))
        stub.lin_query.bias.copy_(torch.from_numpy(bq))
        stub.lin_key.weight.copy_(torch.from_numpy(Wk.T))
        stub.lin_key.bias.copy_(torch.from_numpy(bk))
        stub.lin_value.weight.copy_(torch.from_numpy(Wv.T))
        stub.lin_value.bias.copy_(torch.from_numpy(bv))
        stub.lin_edge.weight.copy_(torch.from_numpy(We.T))
        stub.lin_skip.weight.copy_(torch.from_numpy(Wskip.T))
        stub.lin_skip.bias.copy_(torch.from_numpy(bskip))
        got = stub(
            torch.from_numpy(x),
            torch.from_numpy(np.stack([src, dst]).astype(np.int64)),
            torch.from_numpy(ea),
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_edge_transformerconv_doc_formula():
    """tgm_tpu's phi (TransformerConv WITHOUT root weight — the CTAN phi)
    against the same loop derivation with the skip term dropped."""
    import jax.numpy as jnp

    from tgm_tpu.nn.encoder.ctan import _EdgeTransformerConv

    rng = np.random.default_rng(6)
    n, e, d, dedge = 5, 12, 4, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    ea = rng.normal(size=(e, dedge)).astype(np.float32)

    mod = _EdgeTransformerConv(out_channels=d)
    import jax

    params = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(src),
        jnp.asarray(dst), jnp.asarray(ea), jnp.ones(e, bool),
    )
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    # setup order in _EdgeTransformerConv.__call__: Dense_0=edge (no bias),
    # Dense_1=query, Dense_2=key, Dense_3=value.
    expected = np_transformer_conv(
        x, src, dst, ea,
        p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
        p["Dense_2"]["kernel"], p["Dense_2"]["bias"],
        p["Dense_3"]["kernel"], p["Dense_3"]["bias"],
        p["Dense_0"]["kernel"], None, None, heads=1, C=d,
    )
    got = mod.apply(
        params, jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(ea), jnp.ones(e, bool),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# AntiSymmetricConv
# --------------------------------------------------------------------------- #
def test_antisymmetricconv_literal_hand_values():
    """dim 2, W=[[0,1],[0,0]] so W−Wᵀ−γI = [[−0.1,1],[−1,−0.1]] (γ=0.1),
    phi≡0, ε=0.5, b=[0,−1.2]−Mx₀-style... worked on paper for ONE iter:
    x₀=[1,0]: Mx₀ = [−0.1,−1]; +b=[0.1,−0.2] gives [0,−1.2];
    x₁ = [1 + 0.5·tanh(0), 0 + 0.5·tanh(−1.2)] = [1, 0.5·tanh(−1.2)]."""
    from tools.refbridge import AntiSymmetricConv as StubASC

    class ZeroPhi(torch.nn.Module):
        def forward(self, x, edge_index, edge_attr=None):
            return torch.zeros_like(x)

    stub = StubASC(2, ZeroPhi(), num_iters=1, epsilon=0.5, gamma=0.1)
    with torch.no_grad():
        stub.W.copy_(torch.tensor([[0.0, 1.0], [0.0, 0.0]]))
        stub.bias.copy_(torch.tensor([0.1, -0.2]))
        got = stub(
            torch.tensor([[1.0, 0.0]]), torch.zeros((2, 0), dtype=torch.long)
        ).numpy()
    expected = np.array([[1.0, 0.5 * np.tanh(-1.2)]])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_antisymmetricconv_doc_formula_multi_iter():
    rng = np.random.default_rng(7)
    d, n = 3, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    W = rng.normal(size=(d, d)).astype(np.float32)
    b = rng.normal(size=d).astype(np.float32)
    expected = np_antisymmetric(
        x, W, b, gamma=0.2, eps=0.3, num_iters=3, phi_fn=lambda h: 0.0
    )

    from tools.refbridge import AntiSymmetricConv as StubASC

    class ZeroPhi(torch.nn.Module):
        def forward(self, x, edge_index, edge_attr=None):
            return torch.zeros_like(x)

    stub = StubASC(d, ZeroPhi(), num_iters=3, epsilon=0.3, gamma=0.2)
    with torch.no_grad():
        stub.W.copy_(torch.from_numpy(W))
        stub.bias.copy_(torch.from_numpy(b))
        got = stub(
            torch.from_numpy(x), torch.zeros((2, 0), dtype=torch.long)
        ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_ctan_antisymmetric_recurrence_doc_formula():
    """CTAN's inner loop (ctan.py:91-96) against the documented update with
    phi = the loop-derived TransformerConv (np_transformer_conv) — the full
    composition, derived independently in numpy."""
    import jax
    import jax.numpy as jnp

    from tgm_tpu.nn.encoder.ctan import CTAN

    rng = np.random.default_rng(8)
    U, E, MEM, ND, TD, ED = 5, 7, 4, 2, 4, 3
    node_x = rng.normal(size=(U, MEM + ND)).astype(np.float32)
    last_update = rng.integers(0, 9, size=U).astype(np.int32)
    src = rng.integers(0, U, size=E).astype(np.int32)
    dst = rng.integers(0, U, size=E).astype(np.int32)
    t = rng.integers(0, 9, size=E).astype(np.int32)
    msg = rng.normal(size=(E, ED)).astype(np.float32)

    mod = CTAN(edge_dim=ED, memory_dim=MEM, time_dim=TD, node_dim=ND,
               num_iters=2, epsilon=0.3, gamma=0.2)
    variables = mod.init(
        jax.random.PRNGKey(1), jnp.asarray(node_x), jnp.asarray(last_update),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(t), jnp.asarray(msg),
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    # Independent numpy composition of the documented pieces:
    rel_t = np.abs(last_update[src] - t).astype(np.float32)
    w_t, b_t = p["time_enc"]["w"], p["time_enc"]["b"]
    time_feat = np.cos(rel_t[:, None] @ w_t + b_t)
    edge_attr = np.concatenate([msg, time_feat], axis=-1)
    x0 = node_x @ p["enc_x"]["kernel"] + p["enc_x"]["bias"]
    phi = p["phi"]

    def phi_fn(h):
        return np_transformer_conv(
            h, src, dst, edge_attr,
            phi["Dense_1"]["kernel"], phi["Dense_1"]["bias"],
            phi["Dense_2"]["kernel"], phi["Dense_2"]["bias"],
            phi["Dense_3"]["kernel"], phi["Dense_3"]["bias"],
            phi["Dense_0"]["kernel"], None, None, heads=1, C=MEM,
        )

    expected = np.tanh(
        np_antisymmetric(x0, p["W"], p["b"], gamma=0.2, eps=0.3,
                         num_iters=2, phi_fn=phi_fn)
    )
    got = mod.apply(
        variables, jnp.asarray(node_x), jnp.asarray(last_update),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(t), jnp.asarray(msg),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
