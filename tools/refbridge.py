"""Bridge for driving the torch reference library (/root/reference) in-process.

The reference depends on ``torch_geometric`` and ``tgb``, neither of which is
installed in this image. This module installs a minimal functional stub of the
PyG surface the reference actually exercises at runtime — most importantly a
faithful ``TransformerConv`` (semantics of torch_geometric.nn.TransformerConv
as used by the reference's GraphAttentionEmbedding,
/root/reference/tgm/nn/encoder/tgn.py:14-40) — so that reference models can be
trained end-to-end on CPU for parity and baseline measurements.

Also provides torch->flax weight-copy helpers shared by the parity tests and
the end-to-end training-parity harness (tools/parity_harness.py).

This file contains no code derived from torch_geometric or the reference; the
TransformerConv math follows the published TransformerConv formulation
(Shi et al., "Masked Label Prediction", 2021) which our JAX
GraphAttentionEmbedding (tgm_tpu/nn/encoder/tgn.py:411-475) implements too.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE_PATH = "/root/reference"


# --------------------------------------------------------------------------- #
# Functional PyG-surface layers
# --------------------------------------------------------------------------- #
def _segment_softmax(logits: torch.Tensor, index: torch.Tensor, num_segments: int):
    """Softmax over groups given by ``index`` (per trailing-dim column)."""
    neg_inf = torch.full(
        (num_segments,) + logits.shape[1:], float("-inf"), dtype=logits.dtype
    )
    idx = index.view(-1, *([1] * (logits.dim() - 1))).expand_as(logits)
    seg_max = neg_inf.scatter_reduce(0, idx, logits, reduce="amax", include_self=True)
    shifted = logits - seg_max.gather(0, idx)
    exp = shifted.exp()
    denom = torch.zeros_like(neg_inf).scatter_add_(0, idx, exp)
    return exp / denom.gather(0, idx).clamp_min(1e-38)


class TransformerConv(torch.nn.Module):
    """Graph transformer layer matching torch_geometric.nn.TransformerConv.

    Messages flow edge_index[0] -> edge_index[1]; queries come from the target
    node, keys/values from the source node plus a learned edge projection;
    attention is a per-target softmax; heads are concatenated and a root
    (skip) linear of the target's input is added.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        heads: int = 1,
        dropout: float = 0.0,
        edge_dim: int | None = None,
        bias: bool = True,
        root_weight: bool = True,
        concat: bool = True,
    ) -> None:
        super().__init__()
        assert concat, "stub supports concat=True only"
        self.in_channels = in_channels
        self.out_channels = out_channels  # per-head width, as in PyG
        self.heads = heads
        self.dropout = dropout
        self.root_weight = root_weight
        H, C = heads, out_channels
        self.lin_key = torch.nn.Linear(in_channels, H * C)
        self.lin_query = torch.nn.Linear(in_channels, H * C)
        self.lin_value = torch.nn.Linear(in_channels, H * C)
        self.lin_edge = (
            torch.nn.Linear(edge_dim, H * C, bias=False) if edge_dim else None
        )
        self.lin_skip = (
            torch.nn.Linear(in_channels, H * C, bias=bias) if root_weight else None
        )

    def forward(
        self,
        x: torch.Tensor,
        edge_index: torch.Tensor,
        edge_attr: torch.Tensor | None = None,
    ) -> torch.Tensor:
        N = x.size(0)
        H, C = self.heads, self.out_channels
        src, dst = edge_index[0], edge_index[1]

        q = self.lin_query(x).view(N, H, C)[dst]
        k = self.lin_key(x).view(N, H, C)[src]
        v = self.lin_value(x).view(N, H, C)[src]
        if self.lin_edge is not None:
            e = self.lin_edge(edge_attr).view(-1, H, C)
            k = k + e
            v = v + e

        alpha = (q * k).sum(-1) / math.sqrt(C)  # (E, H)
        alpha = _segment_softmax(alpha, dst, N)
        alpha = F.dropout(alpha, p=self.dropout, training=self.training)

        out = torch.zeros(N, H, C, dtype=x.dtype)
        out.scatter_add_(
            0, dst.view(-1, 1, 1).expand(-1, H, C), v * alpha.unsqueeze(-1)
        )
        out = out.view(N, H * C)
        if self.lin_skip is not None:
            out = out + self.lin_skip(x)
        return out


# --------------------------------------------------------------------------- #
# torch_geometric stub installation
# --------------------------------------------------------------------------- #
class _Unused:
    """Placeholder for PyG layers the tested reference paths never execute."""

    def __init__(self, *a, **k):
        raise RuntimeError(
            f"pyg stub: {type(self).__name__} constructed but not implemented "
            "functionally; extend tools/refbridge.py"
        )


def pyg_scatter(src, index, dim=0, dim_size=None, reduce="sum"):
    """Functional torch_geometric.utils.scatter replacement."""
    assert dim == 0
    if dim_size is None:
        dim_size = int(index.max()) + 1
    shape = (dim_size,) + tuple(src.shape[1:])
    out = torch.zeros(shape, dtype=src.dtype)
    idx = index.long()
    if src.dim() > 1:
        idx = idx.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
    if reduce in ("max", "amax"):
        out.scatter_reduce_(0, idx, src, reduce="amax", include_self=True)
    elif reduce == "mean":
        out.scatter_reduce_(0, idx, src, reduce="mean", include_self=False)
    else:
        out.scatter_add_(0, idx, src)
    return out


class GCNConv(torch.nn.Module):
    """Functional stub of torch_geometric.nn.GCNConv (gcn_norm semantics):
    D^-1/2 (A + cI) D^-1/2 X W + b with c=1 (2 when improved), degree taken
    over edge_index[1] including self loops."""

    def __init__(self, in_channels, out_channels, improved=False, cached=False,
                 add_self_loops=True, normalize=True, bias=True):
        super().__init__()
        assert normalize
        self.improved = improved
        self.add_self_loops = add_self_loops
        self.lin = torch.nn.Linear(in_channels, out_channels, bias=False)
        self.bias = torch.nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x, edge_index, edge_weight=None):
        N = x.size(0)
        src, dst = edge_index[0].long(), edge_index[1].long()
        w = (
            edge_weight.float()
            if edge_weight is not None
            else torch.ones(src.numel(), dtype=x.dtype)
        )
        c = (2.0 if self.improved else 1.0) if self.add_self_loops else 0.0
        deg = torch.zeros(N, dtype=x.dtype).scatter_add_(0, dst, w) + c
        dis = deg.pow(-0.5)
        dis[torch.isinf(dis)] = 0.0
        h = self.lin(x)
        norm = dis[src] * w * dis[dst]
        out = torch.zeros_like(h).scatter_add_(
            0, dst.view(-1, 1).expand(-1, h.size(1)), h[src] * norm[:, None]
        )
        out = out + h * (c * dis * dis)[:, None]
        if self.bias is not None:
            out = out + self.bias
        return out


def gcn_conv_params(conv) -> dict:
    """GCNConv stub -> our tgm_tpu GCNConv param dict."""
    out = {"Dense_0": {"kernel": t2n(conv.lin.weight).T}}
    if conv.bias is not None:
        out["bias"] = t2n(conv.bias)
    return out


class ChebConv(torch.nn.Module):
    """Functional stub of torch_geometric.nn.ChebConv (sym normalization,
    lambda_max=2): scaled Laplacian L_hat = -D^-1/2 A D^-1/2, Chebyshev
    recurrence T_k = 2 L_hat T_{k-1} - T_{k-2}, out = sum_k T_k W_k + b.
    Assumes a self-loop-free edge list."""

    def __init__(self, in_channels, out_channels, K, normalization="sym", bias=True):
        super().__init__()
        assert normalization == "sym"
        self.K = K
        self.lins = torch.nn.ModuleList(
            [torch.nn.Linear(in_channels, out_channels, bias=False) for _ in range(K)]
        )
        self.bias = torch.nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x, edge_index, edge_weight=None, lambda_max=None):
        N = x.size(0)
        src, dst = edge_index[0].long(), edge_index[1].long()
        w = (
            edge_weight.float()
            if edge_weight is not None
            else torch.ones(src.numel(), dtype=x.dtype)
        )
        deg = torch.zeros(N, dtype=x.dtype).scatter_add_(0, dst, w)
        dis = deg.pow(-0.5)
        dis[torch.isinf(dis)] = 0.0
        norm = dis[src] * w * dis[dst]

        def lap(h):
            out = torch.zeros_like(h).scatter_add_(
                0, dst.view(-1, 1).expand(-1, h.size(1)), h[src] * norm[:, None]
            )
            return -out

        tx0 = x
        out = self.lins[0](tx0)
        if self.K > 1:
            tx1 = lap(x)
            out = out + self.lins[1](tx1)
            for k in range(2, self.K):
                tx2 = 2 * lap(tx1) - tx0
                out = out + self.lins[k](tx2)
                tx0, tx1 = tx1, tx2
        if self.bias is not None:
            out = out + self.bias
        return out


def cheb_conv_params(conv) -> dict:
    """ChebConv stub -> our tgm_tpu ChebConv param dict."""
    out = {f"lin_{k}": {"kernel": t2n(lin.weight).T} for k, lin in enumerate(conv.lins)}
    if conv.bias is not None:
        out["bias"] = t2n(conv.bias)
    return out


class AntiSymmetricConv(torch.nn.Module):
    """Functional stub of torch_geometric.nn.AntiSymmetricConv.

    x <- x + eps * act((W - W^T - gamma I) x + phi(x, E, edge_attr) + b),
    iterated ``num_iters`` times with shared weights (Gravina et al., 2023 —
    the formulation our tgm_tpu/nn/encoder/ctan.py:52-96 implements too).
    """

    def __init__(self, in_channels, phi, num_iters=1, epsilon=0.1, gamma=0.1,
                 act="tanh", act_kwargs=None, bias=True):
        super().__init__()
        assert act == "tanh"
        self.phi = phi
        self.num_iters = num_iters
        self.epsilon = epsilon
        self.gamma = gamma
        self.W = torch.nn.Parameter(torch.empty(in_channels, in_channels))
        torch.nn.init.kaiming_uniform_(self.W, a=math.sqrt(5))
        self.register_buffer("eye", torch.eye(in_channels))
        self.bias = torch.nn.Parameter(torch.zeros(in_channels)) if bias else None

    def forward(self, x, edge_index, edge_attr=None):
        aW = self.W - self.W.t() - self.gamma * self.eye
        for _ in range(self.num_iters):
            h = self.phi(x, edge_index, edge_attr)
            h = x @ aW.t() + h
            if self.bias is not None:
                h = h + self.bias
            x = x + self.epsilon * torch.tanh(h)
        return x


def stub_pyg() -> None:
    """Install the torch_geometric stub into sys.modules (idempotent)."""
    if "torch_geometric" in sys.modules:
        return
    pyg = types.ModuleType("torch_geometric")
    nn = types.ModuleType("torch_geometric.nn")
    utils = types.ModuleType("torch_geometric.utils")
    inits = types.ModuleType("torch_geometric.nn.inits")
    models = types.ModuleType("torch_geometric.nn.models")
    models_tgn = types.ModuleType("torch_geometric.nn.models.tgn")

    class PygLinear(torch.nn.Linear):
        """torch_geometric.nn.Linear stub (PyG arg names; same math)."""

        def __init__(self, in_channels, out_channels, bias=True, **kwargs):
            super().__init__(in_channels, out_channels, bias=bias)

    nn.Linear = PygLinear
    nn.TransformerConv = TransformerConv
    nn.AntiSymmetricConv = AntiSymmetricConv
    nn.GCNConv = GCNConv
    nn.ChebConv = ChebConv
    utils.scatter = pyg_scatter

    def glorot(x):
        if x is not None:
            torch.nn.init.xavier_uniform_(x)

    def zeros(x):
        if x is not None:
            torch.nn.init.zeros_(x)

    def ones(x):
        if x is not None:
            torch.nn.init.ones_(x)

    inits.glorot, inits.zeros, inits.ones = glorot, zeros, ones

    class TimeEncoder(torch.nn.Module):
        def __init__(self, out_channels):
            super().__init__()
            self.out_channels = out_channels
            self.lin = torch.nn.Linear(1, out_channels)

        def forward(self, t):
            return self.lin(t.view(-1, 1)).cos()

    models_tgn.TimeEncoder = TimeEncoder

    pyg.nn = nn
    pyg.utils = utils
    sys.modules["torch_geometric"] = pyg
    sys.modules["torch_geometric.nn"] = nn
    sys.modules["torch_geometric.utils"] = utils
    sys.modules["torch_geometric.nn.inits"] = inits
    sys.modules["torch_geometric.nn.models"] = models
    sys.modules["torch_geometric.nn.models.tgn"] = models_tgn


def import_reference():
    """Install stubs, put /root/reference on sys.path, import and return tgm."""
    stub_pyg()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tgm  # noqa: F401

    return sys.modules["tgm"]


# --------------------------------------------------------------------------- #
# torch -> flax weight copying
# --------------------------------------------------------------------------- #
def t2n(x) -> np.ndarray:
    return x.detach().cpu().numpy()


def dense_params(lin: torch.nn.Linear) -> dict:
    out = {"kernel": t2n(lin.weight).T}
    if lin.bias is not None:
        out["bias"] = t2n(lin.bias)
    return out


def time2vec_params(ref_time_enc) -> dict:
    """Reference Time2Vec (tgm/nn/modules/time_encoding.py:6-24) -> ours."""
    return {"w": t2n(ref_time_enc.w.weight).T, "b": t2n(ref_time_enc.w.bias)}


def gru_params(cell: torch.nn.GRUCell) -> dict:
    """torch GRUCell -> our TorchGRUCell param dict (identical leaf layout)."""
    return {
        "wi": t2n(cell.weight_ih).T,
        "bi": t2n(cell.bias_ih),
        "wh": t2n(cell.weight_hh).T,
        "bh": t2n(cell.bias_hh),
    }


def tgn_memory_params(ref_mem) -> dict:
    """Reference TGNMemory -> our TGNMemory flax params."""
    return {
        "params": {
            "time_enc": time2vec_params(ref_mem.time_enc),
            "gru": gru_params(ref_mem.memory_updater),
        }
    }


def graph_attn_params(ref_enc) -> dict:
    """Reference GraphAttentionEmbedding (around TransformerConv) -> ours.

    Works for both our segment-based GraphAttentionEmbedding and the rowwise
    variant (identical parameter structure).
    """
    conv = ref_enc.conv
    return {
        "params": {
            "time_enc": time2vec_params(ref_enc.time_enc),
            "lin_query": dense_params(conv.lin_query),
            "lin_key": dense_params(conv.lin_key),
            "lin_value": dense_params(conv.lin_value),
            "lin_edge": dense_params(conv.lin_edge),
            "lin_skip": dense_params(conv.lin_skip),
        }
    }


def layernorm_params(ln: torch.nn.LayerNorm) -> dict:
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def mha_params(mha: torch.nn.MultiheadAttention, num_heads: int) -> dict:
    """torch MultiheadAttention -> flax MultiHeadDotProductAttention params.

    torch packs q/k/v into in_proj_weight rows; flax splits heads into the
    trailing (H, head_dim) axes with head-major concat order — identical math.
    """
    E = mha.embed_dim
    hd = E // num_heads
    w = t2n(mha.in_proj_weight)
    b = t2n(mha.in_proj_bias)

    def proj(wx, bx):
        return {"kernel": wx.T.reshape(E, num_heads, hd),
                "bias": bx.reshape(num_heads, hd)}

    return {
        "query": proj(w[:E], b[:E]),
        "key": proj(w[E : 2 * E], b[E : 2 * E]),
        "value": proj(w[2 * E :], b[2 * E :]),
        "out": {
            "kernel": t2n(mha.out_proj.weight).T.reshape(num_heads, hd, E),
            "bias": t2n(mha.out_proj.bias),
        },
    }


def dygformer_params(ref, num_heads: int) -> dict:
    """Reference DyGFormer (tgm/nn/encoder/dygformer.py:146-444) -> ours."""
    seq = ref.co_occurrence_encoder.neighbor_co_occurrence_encoder
    linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
    out = {
        "time_encoder": time2vec_params(ref.time_encoder),
        "co_occurrence_encoder": {
            f"Dense_{i}": dense_params(lin) for i, lin in enumerate(linears)
        },
        "proj_node": dense_params(ref.projection_layer["node"]),
        "proj_edge": dense_params(ref.projection_layer["edge"]),
        "proj_time": dense_params(ref.projection_layer["time"]),
        "proj_cooc": dense_params(ref.projection_layer["neighbor_co_occurrence"]),
        "output_layer": dense_params(ref.output_layer),
    }
    for i, tr in enumerate(ref.transformers):
        out[f"transformers_{i}"] = {
            "LayerNorm_0": layernorm_params(tr.norm_layers[0]),
            "LayerNorm_1": layernorm_params(tr.norm_layers[1]),
            "MultiHeadDotProductAttention_0": mha_params(
                tr.multi_head_attention, num_heads
            ),
            "Dense_0": dense_params(tr.linear_layers[0]),
            "Dense_1": dense_params(tr.linear_layers[1]),
        }
    return {"params": out}


def time_encoder_params(te) -> dict:
    """PyG-style TimeEncoder stub (cos(lin(t))) -> our Time2Vec params."""
    return {"w": t2n(te.lin.weight).T, "b": t2n(te.lin.bias)}


def ctan_params(ref) -> dict:
    """Reference CTAN (tgm/nn/encoder/ctan.py:28-79) -> ours."""
    conv = ref.aconv.phi
    return {
        "params": {
            "time_enc": time_encoder_params(ref.time_enc),
            "enc_x": dense_params(ref.enc_x),
            "phi": {
                "Dense_0": dense_params(conv.lin_edge),
                "Dense_1": dense_params(conv.lin_query),
                "Dense_2": dense_params(conv.lin_key),
                "Dense_3": dense_params(conv.lin_value),
            },
            "W": t2n(ref.aconv.W),
            "b": t2n(ref.aconv.bias),
        }
    }


def tgat_params(ref_m, num_layers: int) -> dict:
    """Reference TGAT (tgm/nn/encoder/tgat.py:41-149) -> our flax TGAT."""
    out = {
        "time_encoder": time2vec_params(ref_m.time_encoder),
    }
    for i in range(num_layers):
        attn = ref_m.attn[i]
        out[f"attn_{i}"] = {
            "W_Q": {"kernel": t2n(attn.W_Q.weight).T},
            "W_KV": {"kernel": t2n(attn.W_KV.weight).T},
            "W_O": dense_params(attn.W_O),
            "layer_norm": layernorm_params(attn.layer_norm),
        }
        out[f"merge_layers_{i}"] = {
            "Dense_0": dense_params(ref_m.merge_layers[i].fc1),
            "Dense_1": dense_params(ref_m.merge_layers[i].fc2),
        }
    return {"params": out}


def mlp_mixer_params(ref_mixer) -> dict:
    """Reference MLPMixer (tgm/nn/modules/mlp_mixer.py:5-100) -> ours."""
    return {
        "LayerNorm_0": layernorm_params(ref_mixer.token_norm),
        "LayerNorm_1": layernorm_params(ref_mixer.channel_norm),
        "FeedForwardNet_0": {
            "Dense_0": dense_params(ref_mixer.token_feedforward.ffn[0]),
            "Dense_1": dense_params(ref_mixer.token_feedforward.ffn[3]),
        },
        "FeedForwardNet_1": {
            "Dense_0": dense_params(ref_mixer.channel_feedforward.ffn[0]),
            "Dense_1": dense_params(ref_mixer.channel_feedforward.ffn[3]),
        },
    }


def tpnet_params(ref) -> dict:
    """Reference TPNet + RandomProjectionModule (tgm/nn/encoder/tpnet.py) -> ours."""
    out = {
        "time_encoder": time2vec_params(ref.time_encoder),
        "proj_hidden": dense_params(ref.projection_layer[0]),
        "proj_out": dense_params(ref.projection_layer[2]),
    }
    for i, mixer in enumerate(ref.mlp_mixers):
        out[f"mlp_mixers_{i}"] = mlp_mixer_params(mixer)
    if ref.random_projections is not None:
        rp = ref.random_projections
        out["random_projections"] = {
            "Dense_0": dense_params(rp.mlp[0]),
            "Dense_1": dense_params(rp.mlp[2]),
        }
    return {"params": out}


def link_predictor_params(ref_dec) -> dict:
    """Reference LinkPredictor (2-layer MLP over concat) -> ours."""
    linears = [m for m in ref_dec.model if isinstance(m, torch.nn.Linear)]
    return {
        "params": {
            "mlp": {f"Dense_{i}": dense_params(lin) for i, lin in enumerate(linears)}
        }
    }


def ncn_params(ref_dec) -> dict:
    """Reference NCNPredictor -> ours. Only ``xsmlp`` carries into the
    forward pass (reference ncnpred.py:319-347); ``xslin`` is dead code."""
    return {
        "params": {
            "xsmlp": {
                "layers_0": dense_params(ref_dec.xsmlp[0]),
                "layers_2": dense_params(ref_dec.xsmlp[2]),
            }
        }
    }


def gclstm_params(ref) -> dict:
    """Reference GCLSTM cell (gclstm.py:44-227; per-gate input weight +
    ChebConv over the hidden state) -> our flax GCLSTM param dict."""
    p = {}
    for g in ("i", "f", "c", "o"):
        p[f"W_{g}"] = t2n(getattr(ref, f"W_{g}"))
        p[f"b_{g}"] = t2n(getattr(ref, f"b_{g}"))
        p[f"conv_{g}"] = cheb_conv_params(getattr(ref, f"conv_{g}"))
    return {"params": p}


def node_predictor_params(ref_dec) -> dict:
    """Reference NodePredictor (MLP over node embedding,
    tgm/nn/decoder/nodeproppred.py:6-45) -> ours (@nn.compact _MLP_0)."""
    linears = [m for m in ref_dec.model if isinstance(m, torch.nn.Linear)]
    return {
        "params": {
            "_MLP_0": {f"Dense_{i}": dense_params(lin) for i, lin in enumerate(linears)}
        }
    }
